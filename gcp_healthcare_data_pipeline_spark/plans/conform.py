"""Silver conformance layer: per-source rename maps, typed SAFE_CASTs,
derived keys, quarantine flags, UNION + DISTINCT (reference silver.sql).

Each entity declares: per-datasource column mappings (hospital B renames,
silver.sql:126-138), the NULL-propagating CONCAT business key
(silver.sql:19,92), quarantine predicates incl. the ``LOWER(x)='null'``
sentinel (silver.sql:105-108), and which columns SCD2 tracks (§2.6).

All conformance is row-local projection — zero shuffles until the final
UNION+DISTINCT, which shuffles once on the full row (the reference's
``SELECT DISTINCT``); dedup-before-SCD2 keeps the merge join clean.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.functions.bq_compat import (
    null_prop_concat,
    quarantine_flag,
    safe_cast,
    string_null_sentinel,
)


@dataclass(frozen=True)
class EntitySpec:
    """Metadata driving conformance + SCD2 for one silver entity.

    ``null_cols``/``sentinel_cols`` reproduce each entity's reference
    quarantine CASE verbatim (silver.sql:22-25, 57-60, 105-108, 263-266,
    399-402, 540-543, 676-679): NULL checks and ``LOWER(x)='null'``
    sentinel checks apply to *different* column sets per entity, and are
    evaluated on the PRE-CAST raw values — in BigQuery the CASE references
    the raw subquery columns, not the cast aliases in the same SELECT.

    ``tracked`` mirrors the reference MERGE change comparator, which spans
    ALL data columns including datasource and is_quarantined (e.g.
    silver.sql:146-159 patients, :277-301 transactions) — not just the
    business attributes.
    """

    name: str
    key_col: str                      # derived business key (id + '-' + datasource)
    rename: dict[str, dict[str, str]]  # datasource -> {target: source col}
    casts: dict[str, str] = field(default_factory=dict)   # target col -> type
    null_cols: tuple[str, ...] = ()      # IS NULL => quarantined
    sentinel_cols: tuple[str, ...] = ()  # LOWER(x)='null' => quarantined
    tracked: tuple[str, ...] = ()        # SCD2 change-detector columns
    scd2: bool = True


def conform_source(
    df: DataFrame, spec: EntitySpec, datasource: str
) -> DataFrame:
    """One source branch of the entity's quality_checks staging table."""
    mapping = spec.rename[datasource]
    out = df.select(
        *[F.col(src).alias(tgt) for tgt, src in mapping.items()]
    ).withColumn("datasource", F.lit(datasource))

    id_source = next(iter(mapping))  # first mapped column is the natural id
    out = out.withColumn(
        spec.key_col,
        null_prop_concat(F.col(id_source).cast("string"), "-", datasource),
    )
    # quarantine BEFORE casts: the reference CASE sees raw strings, so a
    # malformed-but-present value (e.g. DOB='notadate') is NOT quarantined
    bad = [F.col(c).isNull() for c in spec.null_cols]
    bad += [
        string_null_sentinel(F.col(c).cast("string"))
        for c in spec.sentinel_cols
    ]
    out = out.withColumn("is_quarantined", quarantine_flag(*bad))
    for col, dtype in spec.casts.items():
        out = out.withColumn(col, safe_cast(F.col(col), dtype))
    return out


def conform_union(branches: list[DataFrame]) -> DataFrame:
    """UNION ALL of conformed branches + DISTINCT (silver.sql:91,139).

    unionByName, not positional — the reference's positional SELECT *
    over drifted schemas is the exact failure mode to avoid (SURVEY §1.3).
    """
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b, allowMissingColumns=True)
    return out.distinct()


# ---------------------------------------------------------------------------
# Entity registry (reference silver.sql:6-729)
# ---------------------------------------------------------------------------

_COMMON_EMR = ("hospital_a_db", "hospital_b_db")


def _same(cols: dict[str, str]) -> dict[str, dict[str, str]]:
    return {ds: dict(cols) for ds in _COMMON_EMR}


PATIENTS = EntitySpec(
    name="patients",
    key_col="Patient_Key",
    rename={
        "hospital_a_db": {
            "SRC_PatientID": "PatientID", "FirstName": "FirstName",
            "LastName": "LastName", "MiddleName": "MiddleName", "SSN": "SSN",
            "PhoneNumber": "PhoneNumber", "Gender": "Gender", "DOB": "DOB",
            "Address": "Address", "SRC_ModifiedDate": "ModifiedDate",
        },
        # hospital B renames (silver.sql:126-138); Updated_Date drift is
        # normalized by the reader into the declared B schema
        "hospital_b_db": {
            "SRC_PatientID": "ID", "FirstName": "F_Name", "LastName": "L_Name",
            "MiddleName": "M_Name", "SSN": "SSN", "PhoneNumber": "PhoneNumber",
            "Gender": "Gender", "DOB": "DOB", "Address": "Address",
            "SRC_ModifiedDate": "Updated_Date",
        },
    },
    casts={"DOB": "timestamp", "SRC_ModifiedDate": "timestamp"},
    null_cols=("SRC_PatientID", "DOB", "FirstName"),    # silver.sql:106
    sentinel_cols=("FirstName",),                       # silver.sql:106
    # full reference comparator (silver.sql:146-159)
    tracked=("SRC_PatientID", "FirstName", "LastName", "MiddleName", "SSN",
             "PhoneNumber", "Gender", "DOB", "Address", "SRC_ModifiedDate",
             "datasource", "is_quarantined"),
)

ENCOUNTERS = EntitySpec(
    name="encounters",
    key_col="Encounter_Key",
    rename=_same({
        "SRC_EncounterID": "EncounterID", "PatientID": "PatientID",
        "EncounterDate": "EncounterDate", "EncounterType": "EncounterType",
        "ProviderID": "ProviderID", "DepartmentID": "DepartmentID",
        "ProcedureCode": "ProcedureCode", "SRC_InsertedDate": "InsertedDate",
        "SRC_ModifiedDate": "ModifiedDate",
    }),
    casts={
        "EncounterDate": "timestamp", "ProcedureCode": "bigint",
        "SRC_InsertedDate": "timestamp", "SRC_ModifiedDate": "timestamp",
    },
    null_cols=("SRC_EncounterID", "PatientID", "EncounterDate"),  # :400
    sentinel_cols=("EncounterType",),                             # :400
    # full reference comparator (silver.sql:435-445; SRC_InsertedDate is
    # NOT compared there — it rides along as a carry column)
    tracked=("SRC_EncounterID", "PatientID", "ProviderID", "DepartmentID",
             "EncounterDate", "EncounterType", "ProcedureCode",
             "SRC_ModifiedDate", "datasource", "is_quarantined"),
)

TRANSACTIONS = EntitySpec(
    name="transactions",
    key_col="Transaction_Key",
    rename=_same({
        "SRC_TransactionID": "TransactionID", "EncounterID": "EncounterID",
        "PatientID": "PatientID", "ProviderID": "ProviderID",
        "DeptID": "DeptID", "VisitDate": "VisitDate",
        "ServiceDate": "ServiceDate", "PaidDate": "PaidDate",
        "VisitType": "VisitType", "Amount": "Amount",
        "AmountType": "AmountType", "PaidAmount": "PaidAmount",
        "ClaimID": "ClaimID", "PayorID": "PayorID",
        "ProcedureCode": "ProcedureCode", "ICDCode": "ICDCode",
        "LineOfBusiness": "LineOfBusiness", "MedicaidID": "MedicaidID",
        "MedicareID": "MedicareID", "SRC_InsertDate": "InsertDate",
        "SRC_ModifiedDate": "ModifiedDate",
    }),
    casts={
        "VisitDate": "timestamp", "ServiceDate": "timestamp",
        "PaidDate": "timestamp", "Amount": "double", "PaidAmount": "double",
        "ProcedureCode": "bigint", "SRC_InsertDate": "timestamp",
        "SRC_ModifiedDate": "timestamp",
    },
    null_cols=("EncounterID", "PatientID", "SRC_TransactionID",
               "VisitDate"),  # silver.sql:263-266 (no sentinel checks)
    # full reference comparator (silver.sql:277-301)
    tracked=("SRC_TransactionID", "EncounterID", "PatientID", "ProviderID",
             "DeptID", "VisitDate", "ServiceDate", "PaidDate", "VisitType",
             "Amount", "AmountType", "PaidAmount", "ClaimID", "PayorID",
             "ProcedureCode", "ICDCode", "LineOfBusiness", "MedicaidID",
             "MedicareID", "SRC_InsertDate", "SRC_ModifiedDate",
             "datasource", "is_quarantined"),
)

PROVIDERS = EntitySpec(
    name="providers",
    key_col="Provider_Key",
    rename=_same({
        "ProviderID": "ProviderID", "FirstName": "FirstName",
        "LastName": "LastName", "Specialization": "Specialization",
        "DeptID": "DeptID", "NPI": "NPI",
    }),
    casts={"NPI": "bigint"},  # SAFE_CAST AS INT64, silver.sql:55
    null_cols=("ProviderID", "DeptID"),  # silver.sql:57-60
    scd2=False,  # truncate-and-reload snapshot (silver.sql:35-65)
)

DEPARTMENTS = EntitySpec(
    name="departments",
    key_col="Dept_Id",  # CONCAT(deptid,'-',datasource), silver.sql:18
    rename=_same({"SRC_Dept_Id": "DeptID", "Name": "Name"}),
    null_cols=("SRC_Dept_Id", "Name"),  # silver.sql:22-25 (no sentinel)
    scd2=False,
)

CLAIMS = EntitySpec(
    name="claims",
    key_col="Claim_Key",
    rename={
        ds: {
            "SRC_ClaimID": "ClaimID", "TransactionID": "TransactionID",
            "PatientID": "PatientID", "EncounterID": "EncounterID",
            "ProviderID": "ProviderID", "DeptID": "DeptID",
            "ServiceDate": "ServiceDate", "ClaimDate": "ClaimDate",
            "PayorID": "PayorID", "ClaimAmount": "ClaimAmount",
            "PaidAmount": "PaidAmount", "ClaimStatus": "ClaimStatus",
            "PayorType": "PayorType", "Deductible": "Deductible",
            "Coinsurance": "Coinsurance", "Copay": "Copay",
            "SRC_InsertDate": "InsertDate", "SRC_ModifiedDate": "ModifiedDate",
        }
        for ds in ("hospital1", "hospital2")
    },
    casts={
        "ServiceDate": "timestamp", "ClaimDate": "timestamp",
        "ClaimAmount": "double", "PaidAmount": "double",
        "Deductible": "double", "Coinsurance": "double", "Copay": "double",
        "SRC_InsertDate": "timestamp", "SRC_ModifiedDate": "timestamp",
    },
    null_cols=("SRC_ClaimID", "TransactionID", "PatientID"),  # :540-543
    sentinel_cols=("ClaimStatus",),                           # :541
    # full reference comparator (silver.sql:572-592; SRC_InsertDate is
    # NOT compared there — carry column)
    tracked=("SRC_ClaimID", "TransactionID", "PatientID", "EncounterID",
             "ProviderID", "DeptID", "ServiceDate", "ClaimDate", "PayorID",
             "ClaimAmount", "PaidAmount", "ClaimStatus", "PayorType",
             "Deductible", "Coinsurance", "Copay", "SRC_ModifiedDate",
             "datasource", "is_quarantined"),
)

CPT_CODES = EntitySpec(
    name="cpt_codes",
    key_col="CP_Code_Key",  # silver.sql:692 naming
    rename={
        "cptcodes": {
            "cpt_codes": "cpt_codes",  # first mapped col drives the key
            "procedure_code_category": "procedure_code_category",
            "procedure_code_descriptions": "procedure_code_descriptions",
            "code_status": "code_status",
        }
    },
    null_cols=("cpt_codes",),          # silver.sql:676-679
    sentinel_cols=("code_status",),    # silver.sql:677
    # full reference comparator (silver.sql:694-701)
    tracked=("procedure_code_category", "cpt_codes",
             "procedure_code_descriptions", "code_status", "datasource",
             "is_quarantined"),
)

ENTITIES = {
    s.name: s
    for s in (PATIENTS, ENCOUNTERS, TRANSACTIONS, PROVIDERS, DEPARTMENTS,
              CLAIMS, CPT_CODES)
}


def normalize_cpt_headers(df: DataFrame) -> DataFrame:
    """Bulk rename: spaces -> underscores, lowercase (cpt_codes.py:18-20)."""
    return df.toDF(*[c.replace(" ", "_").lower() for c in df.columns])
