"""Source reader tests: JDBC pushdown subquery construction (S1) and
CSV drift tolerance (S2, FIXTURES.md §2)."""

from __future__ import annotations

import os

from gcp_healthcare_data_pipeline_spark.schemas import PATIENTS_B
from gcp_healthcare_data_pipeline_spark.sources.readers import (
    build_pushdown_subquery,
    read_csv,
)


def test_jdbc_full_load_subquery():
    assert build_pushdown_subquery("patients", None, None) == (
        "(SELECT * FROM patients) AS q"
    )


def test_jdbc_incremental_subquery_pushes_watermark():
    q = build_pushdown_subquery("patients", "ModifiedDate", "2024-01-01 05:00:00")
    assert q == (
        "(SELECT * FROM patients "
        "WHERE ModifiedDate > '2024-01-01 05:00:00') AS q"
    )


def test_csv_drift_tolerance(spark, tmp_path):
    """A file whose header drops/renames declared columns still loads:
    matching columns align by name, missing ones are NULL."""
    p = os.path.join(tmp_path, "drift.csv")
    with open(p, "w") as f:
        # ModifiedDate instead of declared Updated_Date; M_Name missing
        f.write("ID,F_Name,L_Name,SSN,PhoneNumber,Gender,DOB,Address,ModifiedDate\n")
        f.write("P1,A,B,111,555,Male,1980-01-01,addr,2024-01-01\n")
    df = read_csv(spark, p, PATIENTS_B)
    row = df.first()
    assert df.columns == PATIENTS_B.fieldNames()
    assert row.ID == "P1" and row.F_Name == "A"
    assert row.M_Name is None and row.Updated_Date is None
