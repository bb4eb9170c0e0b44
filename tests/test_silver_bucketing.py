"""Bucketized silver must make the patient join chain exchange-free on
the fact sides (the gold.sql:75-81 shape at scale)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.pipeline.bucketing import (
    bucketize_silver,
)
from gcp_healthcare_data_pipeline_spark.pipeline.runner import Runner, SourcePaths
from tests.fixtures import write_fixtures


def test_patient_chain_join_is_colocated(spark, tmp_path):
    paths = write_fixtures(str(tmp_path / "src"))
    wh = str(tmp_path / "wh")
    Runner(spark, wh, clock=datetime(2024, 6, 1, 5)).run(SourcePaths(**paths))

    tables = bucketize_silver(spark, wh, n_buckets=4)
    assert set(tables) == {"patients", "encounters", "transactions", "claims"}

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = spark.table(tables["patients"]).filter(F.col("is_current"))
        e = spark.table(tables["encounters"]).select(
            F.col("PatientID").alias("E_PatientID"), "Encounter_Key"
        )
        t = spark.table(tables["transactions"]).select(
            F.col("PatientID").alias("T_PatientID"), "Amount"
        )
        chain = p.join(e, p.SRC_PatientID == e.E_PatientID, "left").join(
            t, p.SRC_PatientID == t.T_PatientID, "left"
        )
        plan = chain._jdf.queryExecution().executedPlan().toString()
        # all three inputs are bucketed on the patient id: the two joins
        # must introduce NO shuffle exchange
        assert "Exchange" not in plan, plan
        assert chain.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for tbl in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_runner_bucketize_mode_materializes_tables(spark, tmp_path):
    """Runner(..., bucketize=True) produces the bucketed silver catalog
    tables as part of the pipeline run (optional at-scale layout)."""
    paths = write_fixtures(str(tmp_path / "src"))
    wh = str(tmp_path / "wh")
    out = Runner(spark, wh, clock=datetime(2024, 6, 1, 5)).run(
        SourcePaths(**paths), bucketize=True
    )
    assert out["provider_charge_summary"] > 0  # pipeline still completes
    try:
        for entity in ("patients", "encounters", "transactions", "claims"):
            tbl = f"silver_{entity}_bucketed"
            assert spark.catalog.tableExists(tbl), tbl
            assert spark.table(tbl).count() > 0
    finally:
        for entity in ("patients", "encounters", "transactions", "claims"):
            spark.sql(f"DROP TABLE IF EXISTS silver_{entity}_bucketed")
