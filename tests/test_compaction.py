"""Small-file compaction (operators/compaction.py): content-identical
rewrite, file-count reduction, no-op heuristic, and crash recovery."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.operators.compaction import (
    compact,
    plan_compaction,
    recover_interrupted_swap,
)


def _fragmented_table(spark, path, n_files=40, rows=4000):
    df = spark.range(rows).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.rand(seed=1).alias("v")
    )
    df.repartition(n_files).write.parquet(path)
    return df


def _n_parquet_files(path):
    return sum(
        1
        for _root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    _fragmented_table(spark, path)
    before_rows = sorted(
        map(tuple, spark.read.parquet(path).collect())
    )
    assert _n_parquet_files(path) == 40

    result = compact(spark, path, target_bytes=1 << 30)
    assert result["compacted"] is True
    assert _n_parquet_files(path) < 40
    assert result["target_files"] == 1  # everything fits one target file

    after_rows = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after_rows == before_rows
    # no leftover temp/old directories
    assert not os.path.exists(path + ".old")
    assert not any(
        d.startswith("t.compact-") for d in os.listdir(tmp_path)
    )


def test_healthy_table_is_left_alone(spark, tmp_path):
    path = str(tmp_path / "h")
    spark.range(100).coalesce(1).write.parquet(path)
    files_before = _n_parquet_files(path)
    result = compact(spark, path, target_bytes=1 << 20)
    assert result["compacted"] is False
    assert _n_parquet_files(path) == files_before


def test_plan_scales_output_count_with_size(spark, tmp_path):
    path = str(tmp_path / "s")
    _fragmented_table(spark, path, n_files=20, rows=20000)
    total = plan_compaction(spark, path)["total_bytes"]
    plan = plan_compaction(spark, path, target_bytes=max(total // 4, 1))
    assert plan["target_files"] >= 4


def test_crash_recovery_restores_old_dir(spark, tmp_path):
    path = str(tmp_path / "c")
    _fragmented_table(spark, path, n_files=4, rows=100)
    rows = sorted(map(tuple, spark.read.parquet(path).collect()))
    # simulate a crash after live -> .old but before tmp -> live
    os.rename(path, path + ".old")
    assert recover_interrupted_swap(path) is True
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == rows
    assert recover_interrupted_swap(path) is False  # idempotent no-op


def test_runner_compact_zone_after_fragmented_silver(spark, tmp_path):
    """compact_zone sweeps every table dir in a zone, fixes fragmented
    ones, skips healthy ones, and the data survives byte-identical."""
    from gcp_healthcare_data_pipeline_spark.pipeline.runner import Runner

    wh = str(tmp_path / "wh")
    os.makedirs(os.path.join(wh, "silver"))
    frag = os.path.join(wh, "silver", "frag")
    healthy = os.path.join(wh, "silver", "healthy")
    _fragmented_table(spark, frag, n_files=30, rows=3000)
    spark.range(50).coalesce(1).write.parquet(healthy)
    rows_before = sorted(map(tuple, spark.read.parquet(frag).collect()))

    r = Runner(spark, wh)
    results = r.compact_zone("silver", target_bytes=1 << 30)
    assert results["frag"]["compacted"] is True
    assert results["healthy"]["compacted"] is False
    assert _n_parquet_files(frag) < 30
    assert sorted(map(tuple, spark.read.parquet(frag).collect())) == rows_before


def test_compact_zone_recovers_crash_between_swap_renames(spark, tmp_path):
    """Crash AFTER live->.old but BEFORE tmp->live: the zone listing
    holds only '<t>.old' and an orphaned '<t>.compact-*' temp. The sweep
    must restore the live dir from .old and discard the temp — never
    treat the temp as a real table."""
    from gcp_healthcare_data_pipeline_spark.pipeline.runner import Runner

    wh = str(tmp_path / "wh")
    os.makedirs(os.path.join(wh, "silver"))
    t = os.path.join(wh, "silver", "t")
    _fragmented_table(spark, t, n_files=4, rows=200)
    rows = sorted(map(tuple, spark.read.parquet(t).collect()))
    # simulate the crash point: rewrite temp written, live renamed away
    spark.read.parquet(t).coalesce(1).write.parquet(t + ".compact-deadbeef")
    os.rename(t, t + ".old")

    results = Runner(spark, wh).compact_zone("silver", target_bytes=1 << 30)
    assert os.path.isdir(t), "live table restored from .old"
    assert not os.path.exists(t + ".old")
    assert not os.path.exists(t + ".compact-deadbeef"), "temp swept"
    assert "t.compact-deadbeef" not in results, "temp never compacted"
    assert sorted(map(tuple, spark.read.parquet(t).collect())) == rows


def test_compact_zone_finishes_crash_after_swap(spark, tmp_path):
    """Crash AFTER tmp->live but BEFORE .old cleanup: both live and .old
    exist. The sweep keeps the new live state and drops the leftover."""
    from gcp_healthcare_data_pipeline_spark.pipeline.runner import Runner

    wh = str(tmp_path / "wh")
    os.makedirs(os.path.join(wh, "silver"))
    t = os.path.join(wh, "silver", "t")
    _fragmented_table(spark, t, n_files=3, rows=100)
    rows = sorted(map(tuple, spark.read.parquet(t).collect()))
    spark.range(5).write.parquet(t + ".old")  # stale pre-swap copy

    Runner(spark, wh).compact_zone("silver", target_bytes=1 << 30)
    assert not os.path.exists(t + ".old"), "leftover .old dropped"
    assert sorted(map(tuple, spark.read.parquet(t).collect())) == rows


def test_file_inventory_rejects_remote_schemes(spark):
    import pytest

    from gcp_healthcare_data_pipeline_spark.operators import compaction

    class _FakeDF:
        def inputFiles(self):
            return ["s3a://bucket/table/part-0.parquet"]

    class _FakeReader:
        def parquet(self, path):
            return _FakeDF()

    class _FakeSpark:
        read = _FakeReader()

    with pytest.raises(NotImplementedError, match="local file:"):
        compaction.file_inventory(_FakeSpark(), "s3a://bucket/table")
