"""Schema-drift DIAGNOSIS (SURVEY §1.3 tolerate/diagnose): the landing
stage must (a) still load a source whose header adds a novel unexpected
column or renames a declared one, and (b) record a DRIFT row in
pipeline_logs naming exactly the missing/unexpected columns — not
normalize silently."""

from __future__ import annotations

import csv
import os
from datetime import datetime

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.pipeline.runner import Runner, SourcePaths
from gcp_healthcare_data_pipeline_spark.schemas import PATIENTS_B
from gcp_healthcare_data_pipeline_spark.sources.readers import (
    read_csv_reporting,
)
from tests.fixtures import write_fixtures

CLOCK = datetime(2024, 6, 1, 5, 0, 0)


def test_report_flags_missing_and_unexpected(spark, tmp_path):
    p = os.path.join(tmp_path, "novel.csv")
    with open(p, "w") as f:
        f.write(
            "ID,F_Name,L_Name,SSN,PhoneNumber,Gender,DOB,Address,"
            "ModifiedDate,WearableDeviceID\n"
        )
        f.write("P1,A,B,111,555,Male,1980-01-01,addr,2024-01-01,W9\n")
    df, report = read_csv_reporting(spark, p, PATIENTS_B)
    assert report["missing"] == ["M_Name", "Updated_Date"]
    assert report["unexpected"] == ["ModifiedDate", "WearableDeviceID"]
    assert df.columns == PATIENTS_B.fieldNames()  # still loads, aligned
    assert df.count() == 1


def test_matching_header_reports_clean(spark, tmp_path):
    paths = write_fixtures(str(tmp_path / "src"))
    from gcp_healthcare_data_pipeline_spark.schemas import EMR_TABLES

    df, report = read_csv_reporting(
        spark,
        paths["emr"]["hospital_a_db"]["patients"],
        EMR_TABLES["patients"]["hospital_a_db"],
    )
    assert report == {"missing": [], "unexpected": []}


def test_pipeline_logs_drift_rows_and_still_loads(spark, tmp_path):
    paths = write_fixtures(str(tmp_path / "src"))
    # inject a NOVEL unexpected column into hospital-A patients
    src = paths["emr"]["hospital_a_db"]["patients"]
    with open(src) as f:
        rows = list(csv.reader(f))
    rows[0].append("WearableDeviceID")
    for r in rows[1:]:
        r.append("W-001")
    with open(src, "w", newline="") as f:
        csv.writer(f).writerows(rows)

    wh = str(tmp_path / "wh")
    runner = Runner(spark, wh, clock=CLOCK)
    runner.ingest_to_landing(
        SourcePaths(
            emr=paths["emr"],
            claims_glob=paths["claims_glob"],
            cptcodes=paths["cptcodes"],
            load_config=paths["load_config"],
        )
    )

    logs = spark.read.parquet(os.path.join(wh, "control", "pipeline_logs"))
    drift = logs.filter(F.col("event_type") == "DRIFT")
    # the injected novel column is diagnosed...
    inj = drift.filter(
        (F.col("tablename") == "patients")
        & F.col("message").contains("WearableDeviceID")
    )
    assert inj.count() >= 1
    # ...and the table still landed successfully
    audit = spark.read.parquet(os.path.join(wh, "control", "audit_log"))
    ok = audit.filter(
        (F.col("tablename") == "patients")
        & (F.col("data_source") == "hospital_a_db")
        & (F.col("status") == "success")
    )
    assert ok.count() == 1
