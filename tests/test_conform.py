"""Unit tests for the silver conformance layer (plans/conform.py):
per-source rename maps, derived keys, SAFE_CASTs, quarantine rules,
drifting-schema union."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.plans.conform import (
    ENTITIES,
    conform_source,
    conform_union,
    normalize_cpt_headers,
)


def test_patients_hospital_b_rename_map(spark):
    df = spark.createDataFrame(
        [("P1", "Hans", "Huber", "H", "555", "1", "Male",
          "1975-05-05", "addr", "2024-01-10")],
        "ID string, F_Name string, L_Name string, M_Name string, SSN string, "
        "PhoneNumber string, Gender string, DOB string, Address string, "
        "Updated_Date string",
    )
    out = conform_source(df, ENTITIES["patients"], "hospital_b_db").first()
    assert out.SRC_PatientID == "P1"
    assert out.FirstName == "Hans" and out.LastName == "Huber"
    assert out.Patient_Key == "P1-hospital_b_db"
    assert out.datasource == "hospital_b_db"
    assert str(out.DOB) == "1975-05-05 00:00:00"  # cast applied
    assert out.is_quarantined is False


def test_quarantine_and_null_key(spark):
    df = spark.createDataFrame(
        [(None, "null", "L", "M", "s", "p", "g", "1980-01-01", "a", "2024-01-01")],
        "PatientID string, FirstName string, LastName string, MiddleName string, "
        "SSN string, PhoneNumber string, Gender string, DOB string, "
        "Address string, ModifiedDate string",
    )
    out = conform_source(df, ENTITIES["patients"], "hospital_a_db").first()
    assert out.is_quarantined is True          # NULL id + 'null' name
    assert out.Patient_Key is None             # NULL-propagating CONCAT


def test_union_tolerates_column_order_drift(spark):
    a = spark.createDataFrame([("D1", "Emergency")], "DeptID string, Name string")
    # same columns, different declaration order — positional union would
    # mis-assign; conform+unionByName must not
    b = spark.createDataFrame([("Radiology", "D2")], "Name string, DeptID string")
    ca = conform_source(a, ENTITIES["departments"], "hospital_a_db")
    cb = conform_source(b, ENTITIES["departments"], "hospital_b_db")
    rows = {r.Dept_Id: r.Name for r in conform_union([ca, cb]).collect()}
    assert rows == {"D1-hospital_a_db": "Emergency", "D2-hospital_b_db": "Radiology"}


def test_union_distinct_collapses_duplicates(spark):
    a = spark.createDataFrame(
        [("D1", "Emergency"), ("D1", "Emergency")], "DeptID string, Name string"
    )
    ca = conform_source(a, ENTITIES["departments"], "hospital_a_db")
    assert conform_union([ca]).count() == 1


def test_transactions_safe_casts(spark):
    spec = ENTITIES["transactions"]
    cols = list(spec.rename["hospital_a_db"].values())
    row = {c: "x" for c in cols}
    row.update(TransactionID="T1", Amount="12.5", PaidAmount="oops",
               VisitDate="2024-01-05", ProcedureCode="99213")
    df = spark.createDataFrame(
        [tuple(row[c] for c in cols)],
        ", ".join(f"{c} string" for c in cols),
    )
    out = conform_source(df, spec, "hospital_a_db").first()
    assert out.Amount == 12.5
    assert out.PaidAmount is None           # SAFE_CAST failure -> NULL
    assert out.ProcedureCode == 99213
    assert str(out.VisitDate).startswith("2024-01-05")


def test_cpt_header_normalization(spark):
    df = spark.createDataFrame(
        [("Evaluation", "99213", "desc", "Active")],
        ["Procedure Code Category", "CPT Codes",
         "Procedure Code Descriptions", "Code Status"],
    )
    out = normalize_cpt_headers(df)
    assert out.columns == [
        "procedure_code_category", "cpt_codes",
        "procedure_code_descriptions", "code_status",
    ]
