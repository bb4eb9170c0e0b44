"""Per-table retry analog of the reference DAG retry policy
(dags/parent_dag.py:16-17 / dags/bq_dag.py:39-40: retries=1 with delay).

A transient failure on the first attempt must succeed on retry and be
audited as ONE successful load; a permanent failure must exhaust retries
and land exactly one 'failed' audit row (C6 isolation preserved).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.pipeline.runner import Runner, SourcePaths
from tests.fixtures import write_fixtures

CLOCK = datetime(2024, 6, 1, 5, 0, 0)


class _FlakyEmr(dict):
    """Raises on the first N accesses of one datasource, then delegates."""

    def __init__(self, base, flaky_ds, failures):
        super().__init__(base)
        self._flaky_ds = flaky_ds
        self._failures = failures

    def __getitem__(self, key):
        if key == self._flaky_ds and self._failures > 0:
            self._failures -= 1
            raise IOError(f"transient source outage for {key}")
        return super().__getitem__(key)


def _audit(spark, wh):
    return spark.read.parquet(f"{wh}/control/audit_log")


def test_transient_failure_recovers_on_retry(spark, tmp_path):
    paths = write_fixtures(str(tmp_path / "src"))
    wh = str(tmp_path / "wh")
    flaky = _FlakyEmr(paths["emr"], "hospital_a_db", failures=1)
    sources = SourcePaths(
        emr=flaky,
        claims_glob=paths["claims_glob"],
        cptcodes=paths["cptcodes"],
        load_config=paths["load_config"],
    )
    runner = Runner(spark, wh, clock=CLOCK, retries=1, retry_delay_s=0.0)
    runner.ingest_to_landing(sources)

    audit = _audit(spark, wh)
    # the flaky table still landed successfully, with exactly one audit row
    flaky_rows = audit.filter(
        (F.col("data_source") == "hospital_a_db") & (F.col("status") == "failed")
    ).count()
    assert flaky_rows == 0
    per_table = (
        audit.groupBy("data_source", "tablename")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert all(r.n == 1 for r in per_table)
    assert audit.filter(F.col("status") == "success").count() == audit.count()


def test_permanent_failure_exhausts_retries(spark, tmp_path):
    paths = write_fixtures(str(tmp_path / "src"))
    wh = str(tmp_path / "wh")
    n_a_tables = len(paths["emr"]["hospital_a_db"])
    flaky = _FlakyEmr(paths["emr"], "hospital_a_db", failures=10_000)
    sources = SourcePaths(
        emr=flaky,
        claims_glob=paths["claims_glob"],
        cptcodes=paths["cptcodes"],
        load_config=paths["load_config"],
    )
    runner = Runner(spark, wh, clock=CLOCK, retries=1, retry_delay_s=0.0)
    runner.ingest_to_landing(sources)

    audit = _audit(spark, wh)
    failed = audit.filter(F.col("status") == "failed")
    # one failed row per hospital-A table; hospital-B unaffected (C6)
    assert failed.count() == n_a_tables
    assert {r.data_source for r in failed.collect()} == {"hospital_a_db"}
    ok_b = audit.filter(
        (F.col("data_source") == "hospital_b_db")
        & (F.col("status") == "success")
    )
    assert ok_b.count() > 0


def test_retry_attempt_wipes_partial_output_instead_of_archiving(
    spark, tmp_path
):
    """A retry must NOT move the failed attempt's partial landing output
    into the dated archive (that would pollute it alongside legitimate
    prior-run data); it wipes the landing dir and rewrites fresh."""
    import os

    paths = write_fixtures(str(tmp_path / "src"))
    wh = str(tmp_path / "wh")
    runner = Runner(spark, wh, clock=CLOCK)
    config = [
        r
        for r in runner.spark.read.csv(
            paths["load_config"], header=True
        ).collect()
        if r["datasource"] == "hospital_a_db" and r["tablename"] == "patients"
    ]
    row = config[0]
    sources = SourcePaths(
        emr=paths["emr"],
        claims_glob=paths["claims_glob"],
        cptcodes=paths["cptcodes"],
        load_config=paths["load_config"],
    )
    landing = os.path.join(wh, "landing", "hospital_a_db", "patients")
    archive = os.path.join(wh, "landing", "hospital_a_db", "archive", "patients")

    # seed the landing dir with a "partial output" file from a failed
    # first attempt, then land with attempt=2
    os.makedirs(landing, exist_ok=True)
    junk = os.path.join(landing, "part-partial-from-failed-attempt.json")
    with open(junk, "w") as f:
        f.write('{"broken": tru')
    n = runner._land_table(sources, row, attempt=2)
    assert n > 0
    # partial file gone from landing, and never archived
    assert not os.path.exists(junk)
    archived = []
    for root, _, files in os.walk(archive):
        archived += files
    assert "part-partial-from-failed-attempt.json" not in archived
