"""Reference-shaped fixture CSVs (FIXTURES.md) with the documented edge
cases: NULL keys, 'null' string sentinels, bad numerics, duplicate rows,
hospital-B column renames + the Updated_Date header drift, shared business
keys across hospitals, and SCD2 second-run deltas."""

from __future__ import annotations

import os


def _w(path: str, lines: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def write_fixtures(root: str) -> dict:
    emr_a = os.path.join(root, "emr", "hospital-a")
    emr_b = os.path.join(root, "emr", "hospital-b")

    _w(f"{emr_a}/departments.csv", [
        "DeptID,Name",
        "DEPT001,Emergency",
        "DEPT002,Cardiology",
        "DEPT003,",            # NULL name -> quarantined (silver.sql:23)
        "DEPT004,Oncology",
    ])
    _w(f"{emr_b}/departments.csv", [
        "DeptID,Name",
        "DEPT001,Emergency",   # same business key as hospital A (key suffix test)
        "DEPT005,Radiology",
    ])
    _w(f"{emr_a}/providers.csv", [
        "ProviderID,FirstName,LastName,Specialization,DeptID,NPI",
        "PROV001,Alice,Adams,Cardiology,DEPT002,1234567890",
        "PROV002,Bob,Brown,Emergency,DEPT001,2345678901",
        "PROV003,Cara,Cole,Oncology,DEPT004,notanumber",  # SAFE_CAST -> NULL
    ])
    _w(f"{emr_b}/providers.csv", [
        "ProviderID,FirstName,LastName,Specialization,DeptID,NPI",
        "PROV101,Dan,Diaz,Radiology,DEPT005,3456789012",
    ])
    _w(f"{emr_a}/patients.csv", [
        "PatientID,FirstName,LastName,MiddleName,SSN,PhoneNumber,Gender,DOB,Address,ModifiedDate",
        "P001,John,Doe,Q,111-11-1111,555-0001,Male,1980-01-01,1 Main St,2024-01-10",
        "P002,Jane,Roe,R,222-22-2222,555-0002,Female,1990-02-02,2 Oak Ave,2024-01-11",
        "P003,null,Smith,S,333-33-3333,555-0003,Male,1970-03-03,3 Elm Rd,2024-01-12",  # 'null' sentinel -> quarantined
        ",Missing,Key,T,444-44-4444,555-0004,Female,1985-04-04,4 Pine Ln,2024-01-13",  # NULL key -> quarantined
        "P001,John,Doe,Q,111-11-1111,555-0001,Male,1980-01-01,1 Main St,2024-01-10",   # exact dup -> DISTINCT
    ])
    # hospital B: renamed columns AND the shipped-data drift header
    # Updated_Date (FIXTURES.md §2)
    _w(f"{emr_b}/patients.csv", [
        "ID,F_Name,L_Name,M_Name,SSN,PhoneNumber,Gender,DOB,Address,Updated_Date",
        "P001,Hans,Huber,H,555-55-5555,555-0101,Male,1975-05-05,5 Berg Str,2024-01-10",  # same id as hosp A
        "P102,Mia,Muller,M,666-66-6666,555-0102,Female,1995-06-06,6 Tal Weg,2024-01-11",
    ])
    _w(f"{emr_a}/encounters.csv", [
        "EncounterID,PatientID,EncounterDate,EncounterType,ProviderID,DepartmentID,ProcedureCode,InsertedDate,ModifiedDate",
        "ENC001,P001,2024-01-05,Inpatient,PROV001,DEPT002,99213,2024-01-05,2024-01-05",
        "ENC002,P002,2024-01-06,Outpatient,PROV002,DEPT001,99214,2024-01-06,2024-01-06",
        "ENC003,P001,2024-01-07,Emergency,PROV002,DEPT001,99215,2024-01-07,2024-01-07",
    ])
    _w(f"{emr_b}/encounters.csv", [
        "EncounterID,PatientID,EncounterDate,EncounterType,ProviderID,DepartmentID,ProcedureCode,InsertedDate,ModifiedDate",
        "ENC101,P101,2024-01-05,NULL,PROV101,DEPT005,99213,2024-01-05,2024-01-05",  # 'NULL' sentinel type
    ])
    _w(f"{emr_a}/transactions.csv", [
        "TransactionID,EncounterID,PatientID,ProviderID,DeptID,VisitDate,ServiceDate,PaidDate,VisitType,Amount,AmountType,PaidAmount,ClaimID,PayorID,ProcedureCode,ICDCode,LineOfBusiness,MedicaidID,MedicareID,InsertDate,ModifiedDate",
        "TRX001,ENC001,P001,PROV001,DEPT002,2024-01-05,2024-01-05,2024-01-20,Routine,100.50,Charge,80.00,CLM001,Medicare,99213,I10.1,Commercial,MA1,MC1,2024-01-05,2024-01-05",
        "TRX002,ENC002,P002,PROV002,DEPT001,2024-01-06,2024-01-06,2024-01-21,Emergency,200.25,Charge,150.00,CLM002,BlueCross,99214,I20.2,Self-Pay,MA2,MC2,2024-01-06,2024-01-06",
        "TRX003,ENC003,P001,PROV002,DEPT001,2024-01-07,2024-01-07,,Routine,badnum,Charge,0,CLM003,Medicare,99215,I30.3,Commercial,MA3,MC3,2024-01-07,2024-01-07",  # bad Amount -> SAFE_CAST NULL
    ])
    _w(f"{emr_b}/transactions.csv", [
        "TransactionID,EncounterID,PatientID,ProviderID,DeptID,VisitDate,ServiceDate,PaidDate,VisitType,Amount,AmountType,PaidAmount,ClaimID,PayorID,ProcedureCode,ICDCode,LineOfBusiness,MedicaidID,MedicareID,InsertDate,ModifiedDate",
        "TRX101,ENC101,P101,PROV101,DEPT005,2024-01-05,2024-01-05,2024-01-22,Routine,300.75,Charge,250.00,CLM101,UnitedHealthcare,99213,I40.4,Commercial,MA4,MC4,2024-01-05,2024-01-05",
    ])

    claims_dir = os.path.join(root, "claims")
    _w(f"{claims_dir}/hospital1_claim_data.csv", [
        "ClaimID,TransactionID,PatientID,EncounterID,ProviderID,DeptID,ServiceDate,ClaimDate,PayorID,ClaimAmount,PaidAmount,ClaimStatus,PayorType,Deductible,Coinsurance,Copay,InsertDate,ModifiedDate",
        "CLM001,TRX001,P001,ENC001,PROV001,DEPT002,2024-01-05,2024-01-08,Medicare,100.50,80.00,Approved,Government,10,5,5,2024-01-08,2024-01-08",
        "CLM002,TRX002,P002,ENC002,PROV002,DEPT001,2024-01-06,2024-01-09,BlueCross,200.25,150.00,Pending,Private,20,10,10,2024-01-09,2024-01-09",
        "CLM003,TRX003,P001,ENC003,PROV002,DEPT001,2024-01-07,2024-01-10,Medicare,50.00,0,null,Government,0,0,0,2024-01-10,2024-01-10",  # 'null' status -> quarantined
    ])
    _w(f"{claims_dir}/hospital2_claim_data.csv", [
        "ClaimID,TransactionID,PatientID,EncounterID,ProviderID,DeptID,ServiceDate,ClaimDate,PayorID,ClaimAmount,PaidAmount,ClaimStatus,PayorType,Deductible,Coinsurance,Copay,InsertDate,ModifiedDate",
        "CLM101,TRX101,P101,ENC101,PROV101,DEPT005,2024-01-05,2024-01-08,UnitedHealthcare,300.75,250.00,Approved,Private,30,15,15,2024-01-08,2024-01-08",
    ])

    cpt_dir = os.path.join(root, "cptcodes")
    _w(f"{cpt_dir}/cptcodes.csv", [
        "Procedure Code Category,CPT Codes,Procedure Code Descriptions,Code Status",
        "Evaluation,99213,Office visit established patient,Active",
        "Evaluation,99214,Office visit moderate complexity,Active",
        "Surgery,10021,Fine needle aspiration,null",  # sentinel -> quarantined
    ])

    cfg_dir = os.path.join(root, "configs")
    rows = ["database,datasource,tablename,loadtype,watermark,is_active,targetpath"]
    for ds in ("hospital_a_db", "hospital_b_db"):
        for t in ("patients", "encounters", "transactions"):
            wm = "Updated_Date" if (ds == "hospital_b_db" and t == "patients") else "ModifiedDate"
            rows.append(f"devdb,{ds},{t},Incremental,{wm},1,landing/{ds}/{t}")
        for t in ("providers", "departments"):
            rows.append(f"devdb,{ds},{t},Full,,1,landing/{ds}/{t}")
    rows.append("devdb,hospital_a_db,ignored_table,Full,,0,landing/x")  # inactive
    _w(f"{cfg_dir}/load_config.csv", rows)

    emr = {
        ds: {
            t: f"{root}/emr/{h}/{t}.csv"
            for t in ("patients", "encounters", "transactions", "providers",
                      "departments")
        }
        for ds, h in (("hospital_a_db", "hospital-a"), ("hospital_b_db", "hospital-b"))
    }
    return {
        "emr": emr,
        "claims_glob": f"{claims_dir}/*.csv",
        "cptcodes": f"{cpt_dir}/cptcodes.csv",
        "load_config": f"{cfg_dir}/load_config.csv",
    }


def update_patient_for_run2(root: str) -> None:
    """Second-run delta: P002 moves house (changed tracked column) with a
    fresh ModifiedDate; everything else untouched."""
    path = os.path.join(root, "emr", "hospital-a", "patients.csv")
    lines = open(path).read().splitlines()
    out = []
    for ln in lines:
        if ln.startswith("P002"):
            ln = "P002,Jane,Roe,R,222-22-2222,555-0002,Female,1990-02-02,99 New Addr,2025-03-01"
        out.append(ln)
    _w(path, out)
