"""StructType registry for every source entity.

The reference reads CSVs with header=True and NO schema (everything lands
as strings — claims.py:16, cpt_codes.py:15, hospitalA_mysqlToLanding.py:224);
we declare explicit all-string source schemas (same runtime semantics,
no inference scan — at 100 TB a schema-inference pass over the input is a
full extra read) and do typed casts in the silver conformance layer
(SAFE_CAST semantics), exactly where the reference does (silver.sql).

Source column names mirror the reference DDLs including hospital B's
renames (schemas/emr/hospital-b/ddl.sql:28-40) and the shipped-data drift
(Updated_Date vs ModifiedDate — data/emr/hospital-b/patients.csv:1).
"""

from __future__ import annotations

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _strings(*names: str) -> StructType:
    return StructType([StructField(n, StringType(), True) for n in names])


# EMR hospital A (schemas/emr/hospital-a/ddl.sql)
PATIENTS_A = _strings(
    "PatientID", "FirstName", "LastName", "MiddleName", "SSN",
    "PhoneNumber", "Gender", "DOB", "Address", "ModifiedDate",
)
# EMR hospital B: renamed PK/name columns; shipped CSV header drifts to
# Updated_Date (the reader tolerates either — see sources/readers.py)
PATIENTS_B = _strings(
    "ID", "F_Name", "L_Name", "M_Name", "SSN",
    "PhoneNumber", "Gender", "DOB", "Address", "Updated_Date",
)
ENCOUNTERS = _strings(
    "EncounterID", "PatientID", "EncounterDate", "EncounterType",
    "ProviderID", "DepartmentID", "ProcedureCode", "InsertedDate",
    "ModifiedDate",
)
TRANSACTIONS = _strings(
    "TransactionID", "EncounterID", "PatientID", "ProviderID", "DeptID",
    "VisitDate", "ServiceDate", "PaidDate", "VisitType", "Amount",
    "AmountType", "PaidAmount", "ClaimID", "PayorID", "ProcedureCode",
    "ICDCode", "LineOfBusiness", "MedicaidID", "MedicareID",
    "InsertDate", "ModifiedDate",
)
PROVIDERS = _strings(
    "ProviderID", "FirstName", "LastName", "Specialization", "DeptID", "NPI",
)
DEPARTMENTS = _strings("DeptID", "Name")
CLAIMS = _strings(
    "ClaimID", "TransactionID", "PatientID", "EncounterID", "ProviderID",
    "DeptID", "ServiceDate", "ClaimDate", "PayorID", "ClaimAmount",
    "PaidAmount", "ClaimStatus", "PayorType", "Deductible", "Coinsurance",
    "Copay", "InsertDate", "ModifiedDate",
)
# raw cptcodes headers contain spaces/mixed case (data/cptcodes/cptcodes.csv:1)
CPT_CODES_RAW = _strings(
    "Procedure Code Category", "CPT Codes",
    "Procedure Code Descriptions", "Code Status",
)
LOAD_CONFIG = _strings(
    "database", "datasource", "tablename", "loadtype", "watermark",
    "is_active", "targetpath",
)

# control tables (configs/audit_table_ddl.sql:1-8, init_bq_tables.py:54-61)
AUDIT_LOG = StructType(
    [
        StructField("data_source", StringType(), True),
        StructField("tablename", StringType(), True),
        StructField("load_type", StringType(), True),
        StructField("record_count", LongType(), True),
        StructField("load_timestamp", TimestampType(), True),
        StructField("status", StringType(), True),
    ]
)
PIPELINE_LOGS = StructType(
    [
        StructField("timestamp", TimestampType(), True),
        StructField("event_type", StringType(), True),
        StructField("message", StringType(), True),
        StructField("step", StringType(), True),
        StructField("tablename", StringType(), True),
        StructField("error_trace", StringType(), True),
    ]
)

EMR_TABLES = {
    "patients": {"hospital_a_db": PATIENTS_A, "hospital_b_db": PATIENTS_B},
    "encounters": {"hospital_a_db": ENCOUNTERS, "hospital_b_db": ENCOUNTERS},
    "transactions": {"hospital_a_db": TRANSACTIONS, "hospital_b_db": TRANSACTIONS},
    "providers": {"hospital_a_db": PROVIDERS, "hospital_b_db": PROVIDERS},
    "departments": {"hospital_a_db": DEPARTMENTS, "hospital_b_db": DEPARTMENTS},
}
