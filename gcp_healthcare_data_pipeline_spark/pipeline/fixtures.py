"""Reference-shaped fixture data (FIXTURES.md) as structured rows.

Single source of truth for BOTH sides of the pipeline correctness gate:

- ``write_fixtures`` materializes the CSVs the Spark pipeline ingests
  (landing -> bronze -> silver -> gold via pipeline/runner.py);
- ``values_sql`` renders the same rows as a DuckDB ``VALUES`` relation so
  the oracle SQL (queries/pipeline_queries.py) re-derives silver+gold
  from identical inputs with zero filesystem coupling.

Cell convention: each row is a list of raw CSV cell strings; ``""`` means
NULL (Spark's CSV reader maps empty to NULL under the all-string declared
schemas, and ``values_sql`` emits SQL NULL).

Edge cases preserved from round 1: NULL keys, 'null' string sentinels,
bad numerics (SAFE_CAST), exact duplicate rows (DISTINCT), hospital-B
renames + Updated_Date header drift, shared business keys across
hospitals, and the run-2 SCD2 delta (P002 address change).
"""

from __future__ import annotations

import os

# --------------------------------------------------------------------------
# fixture tables: name -> (header cells, rows)
# --------------------------------------------------------------------------

DEPARTMENTS_A = (
    ["DeptID", "Name"],
    [
        ["DEPT001", "Emergency"],
        ["DEPT002", "Cardiology"],
        ["DEPT003", ""],  # NULL name -> quarantined (silver.sql:23)
        ["DEPT004", "Oncology"],
    ],
)
DEPARTMENTS_B = (
    ["DeptID", "Name"],
    [
        ["DEPT001", "Emergency"],  # same business key as hospital A
        ["DEPT005", "Radiology"],
    ],
)
PROVIDERS_A = (
    ["ProviderID", "FirstName", "LastName", "Specialization", "DeptID", "NPI"],
    [
        ["PROV001", "Alice", "Adams", "Cardiology", "DEPT002", "1234567890"],
        ["PROV002", "Bob", "Brown", "Emergency", "DEPT001", "2345678901"],
        ["PROV003", "Cara", "Cole", "Oncology", "DEPT004", "notanumber"],
    ],
)
PROVIDERS_B = (
    ["ProviderID", "FirstName", "LastName", "Specialization", "DeptID", "NPI"],
    [["PROV101", "Dan", "Diaz", "Radiology", "DEPT005", "3456789012"]],
)
_PAT_HDR_A = ["PatientID", "FirstName", "LastName", "MiddleName", "SSN",
              "PhoneNumber", "Gender", "DOB", "Address", "ModifiedDate"]
PATIENTS_A = (
    _PAT_HDR_A,
    [
        ["P001", "John", "Doe", "Q", "111-11-1111", "555-0001", "Male",
         "1980-01-01", "1 Main St", "2024-01-10"],
        ["P002", "Jane", "Roe", "R", "222-22-2222", "555-0002", "Female",
         "1990-02-02", "2 Oak Ave", "2024-01-11"],
        ["P003", "null", "Smith", "S", "333-33-3333", "555-0003", "Male",
         "1970-03-03", "3 Elm Rd", "2024-01-12"],  # sentinel -> quarantined
        ["", "Missing", "Key", "T", "444-44-4444", "555-0004", "Female",
         "1985-04-04", "4 Pine Ln", "2024-01-13"],  # NULL key -> quarantined
        ["P001", "John", "Doe", "Q", "111-11-1111", "555-0001", "Male",
         "1980-01-01", "1 Main St", "2024-01-10"],  # exact dup -> DISTINCT
    ],
)
# run-2 delta: P002 moves house, fresh ModifiedDate past the watermark
PATIENTS_A_RUN2_P002 = ["P002", "Jane", "Roe", "R", "222-22-2222", "555-0002",
                        "Female", "1990-02-02", "99 New Addr", "2025-03-01"]
PATIENTS_B = (
    ["ID", "F_Name", "L_Name", "M_Name", "SSN", "PhoneNumber", "Gender",
     "DOB", "Address", "Updated_Date"],  # drifted header (FIXTURES.md §2)
    [
        ["P001", "Hans", "Huber", "H", "555-55-5555", "555-0101", "Male",
         "1975-05-05", "5 Berg Str", "2024-01-10"],  # same id as hospital A
        ["P102", "Mia", "Muller", "M", "666-66-6666", "555-0102", "Female",
         "1995-06-06", "6 Tal Weg", "2024-01-11"],
    ],
)
_ENC_HDR = ["EncounterID", "PatientID", "EncounterDate", "EncounterType",
            "ProviderID", "DepartmentID", "ProcedureCode", "InsertedDate",
            "ModifiedDate"]
ENCOUNTERS_A = (
    _ENC_HDR,
    [
        ["ENC001", "P001", "2024-01-05", "Inpatient", "PROV001", "DEPT002",
         "99213", "2024-01-05", "2024-01-05"],
        ["ENC002", "P002", "2024-01-06", "Outpatient", "PROV002", "DEPT001",
         "99214", "2024-01-06", "2024-01-06"],
        ["ENC003", "P001", "2024-01-07", "Emergency", "PROV002", "DEPT001",
         "99215", "2024-01-07", "2024-01-07"],
    ],
)
ENCOUNTERS_B = (
    _ENC_HDR,
    [["ENC101", "P101", "2024-01-05", "NULL", "PROV101", "DEPT005", "99213",
      "2024-01-05", "2024-01-05"]],
)
_TRX_HDR = ["TransactionID", "EncounterID", "PatientID", "ProviderID",
            "DeptID", "VisitDate", "ServiceDate", "PaidDate", "VisitType",
            "Amount", "AmountType", "PaidAmount", "ClaimID", "PayorID",
            "ProcedureCode", "ICDCode", "LineOfBusiness", "MedicaidID",
            "MedicareID", "InsertDate", "ModifiedDate"]
TRANSACTIONS_A = (
    _TRX_HDR,
    [
        ["TRX001", "ENC001", "P001", "PROV001", "DEPT002", "2024-01-05",
         "2024-01-05", "2024-01-20", "Routine", "100.50", "Charge", "80.00",
         "CLM001", "Medicare", "99213", "I10.1", "Commercial", "MA1", "MC1",
         "2024-01-05", "2024-01-05"],
        ["TRX002", "ENC002", "P002", "PROV002", "DEPT001", "2024-01-06",
         "2024-01-06", "2024-01-21", "Emergency", "200.25", "Charge",
         "150.00", "CLM002", "BlueCross", "99214", "I20.2", "Self-Pay",
         "MA2", "MC2", "2024-01-06", "2024-01-06"],
        ["TRX003", "ENC003", "P001", "PROV002", "DEPT001", "2024-01-07",
         "2024-01-07", "", "Routine", "badnum", "Charge", "0", "CLM003",
         "Medicare", "99215", "I30.3", "Commercial", "MA3", "MC3",
         "2024-01-07", "2024-01-07"],  # bad Amount -> SAFE_CAST NULL
    ],
)
TRANSACTIONS_B = (
    _TRX_HDR,
    [["TRX101", "ENC101", "P101", "PROV101", "DEPT005", "2024-01-05",
      "2024-01-05", "2024-01-22", "Routine", "300.75", "Charge", "250.00",
      "CLM101", "UnitedHealthcare", "99213", "I40.4", "Commercial", "MA4",
      "MC4", "2024-01-05", "2024-01-05"]],
)
_CLM_HDR = ["ClaimID", "TransactionID", "PatientID", "EncounterID",
            "ProviderID", "DeptID", "ServiceDate", "ClaimDate", "PayorID",
            "ClaimAmount", "PaidAmount", "ClaimStatus", "PayorType",
            "Deductible", "Coinsurance", "Copay", "InsertDate",
            "ModifiedDate"]
CLAIMS_H1 = (
    _CLM_HDR,
    [
        ["CLM001", "TRX001", "P001", "ENC001", "PROV001", "DEPT002",
         "2024-01-05", "2024-01-08", "Medicare", "100.50", "80.00",
         "Approved", "Government", "10", "5", "5", "2024-01-08",
         "2024-01-08"],
        ["CLM002", "TRX002", "P002", "ENC002", "PROV002", "DEPT001",
         "2024-01-06", "2024-01-09", "BlueCross", "200.25", "150.00",
         "Pending", "Private", "20", "10", "10", "2024-01-09", "2024-01-09"],
        ["CLM003", "TRX003", "P001", "ENC003", "PROV002", "DEPT001",
         "2024-01-07", "2024-01-10", "Medicare", "50.00", "0", "null",
         "Government", "0", "0", "0", "2024-01-10", "2024-01-10"],
    ],
)
CLAIMS_H2 = (
    _CLM_HDR,
    [["CLM101", "TRX101", "P101", "ENC101", "PROV101", "DEPT005",
      "2024-01-05", "2024-01-08", "UnitedHealthcare", "300.75", "250.00",
      "Approved", "Private", "30", "15", "15", "2024-01-08", "2024-01-08"]],
)
CPTCODES = (
    ["Procedure Code Category", "CPT Codes", "Procedure Code Descriptions",
     "Code Status"],
    [
        ["Evaluation", "99213", "Office visit established patient", "Active"],
        ["Evaluation", "99214", "Office visit moderate complexity", "Active"],
        ["Surgery", "10021", "Fine needle aspiration", "null"],  # sentinel
    ],
)


# --------------------------------------------------------------------------
# CSV side (pipeline input)
# --------------------------------------------------------------------------

def _w(path: str, header: list[str], rows: list[list[str]]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lines = [",".join(header)] + [",".join(r) for r in rows]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def write_fixtures(root: str) -> dict:
    emr_a = os.path.join(root, "emr", "hospital-a")
    emr_b = os.path.join(root, "emr", "hospital-b")
    _w(f"{emr_a}/departments.csv", *DEPARTMENTS_A)
    _w(f"{emr_b}/departments.csv", *DEPARTMENTS_B)
    _w(f"{emr_a}/providers.csv", *PROVIDERS_A)
    _w(f"{emr_b}/providers.csv", *PROVIDERS_B)
    _w(f"{emr_a}/patients.csv", *PATIENTS_A)
    _w(f"{emr_b}/patients.csv", *PATIENTS_B)
    _w(f"{emr_a}/encounters.csv", *ENCOUNTERS_A)
    _w(f"{emr_b}/encounters.csv", *ENCOUNTERS_B)
    _w(f"{emr_a}/transactions.csv", *TRANSACTIONS_A)
    _w(f"{emr_b}/transactions.csv", *TRANSACTIONS_B)

    claims_dir = os.path.join(root, "claims")
    _w(f"{claims_dir}/hospital1_claim_data.csv", *CLAIMS_H1)
    _w(f"{claims_dir}/hospital2_claim_data.csv", *CLAIMS_H2)

    cpt_dir = os.path.join(root, "cptcodes")
    _w(f"{cpt_dir}/cptcodes.csv", *CPTCODES)

    cfg_dir = os.path.join(root, "configs")
    rows = [["database", "datasource", "tablename", "loadtype", "watermark",
             "is_active", "targetpath"]]
    header, body = rows[0], []
    for ds in ("hospital_a_db", "hospital_b_db"):
        for t in ("patients", "encounters", "transactions"):
            wm = ("Updated_Date"
                  if (ds == "hospital_b_db" and t == "patients")
                  else "ModifiedDate")
            body.append(["devdb", ds, t, "Incremental", wm, "1",
                         f"landing/{ds}/{t}"])
        for t in ("providers", "departments"):
            body.append(["devdb", ds, t, "Full", "", "1", f"landing/{ds}/{t}"])
    body.append(["devdb", "hospital_a_db", "ignored_table", "Full", "", "0",
                 "landing/x"])  # inactive
    _w(f"{cfg_dir}/load_config.csv", header, body)

    emr = {
        ds: {
            t: f"{root}/emr/{h}/{t}.csv"
            for t in ("patients", "encounters", "transactions", "providers",
                      "departments")
        }
        for ds, h in (("hospital_a_db", "hospital-a"),
                      ("hospital_b_db", "hospital-b"))
    }
    return {
        "emr": emr,
        "claims_glob": f"{claims_dir}/*.csv",
        "cptcodes": f"{cpt_dir}/cptcodes.csv",
        "load_config": f"{cfg_dir}/load_config.csv",
    }


def patients_a_run2() -> tuple[list[str], list[list[str]]]:
    """Hospital-A patients table content as of run 2 (P002 delta applied)."""
    header, rows = PATIENTS_A
    out = [PATIENTS_A_RUN2_P002 if r[0] == "P002" else r for r in rows]
    return header, out


def update_patient_for_run2(root: str) -> None:
    """Second-run delta: P002 moves house (changed tracked column) with a
    fresh ModifiedDate; everything else untouched."""
    path = os.path.join(root, "emr", "hospital-a", "patients.csv")
    _w(path, *patients_a_run2())


# --------------------------------------------------------------------------
# SQL side (oracle input)
# --------------------------------------------------------------------------

def _sql_cell(cell: str) -> str:
    if cell == "":
        return "NULL"
    return "'" + cell.replace("'", "''") + "'"


def values_sql(header: list[str], rows: list[list[str]]) -> str:
    """Render fixture rows as a DuckDB VALUES relation with quoted
    all-string cells ('' -> NULL), matching Spark's declared-string CSV
    read exactly."""
    cols = ", ".join(f'"{c}"' for c in header)
    vals = ",\n    ".join(
        "(" + ", ".join(_sql_cell(c) for c in r) + ")" for r in rows
    )
    return f"(SELECT * FROM (VALUES\n    {vals}\n) AS _v({cols}))"
