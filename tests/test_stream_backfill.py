"""Checkpoint-resumed incremental ingestion (streaming/backfill.py):
files arriving between runs are processed exactly once; idle reruns
append nothing; already-seen files are never reprocessed."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from gcp_healthcare_data_pipeline_spark.streaming.backfill import (
    run_incremental,
)

_SCHEMA = StructType(
    [StructField("id", LongType()), StructField("v", LongType())]
)


def _arrive(spark, src, lo, hi, tag):
    """New files land in the watched dir root (file stream sources list
    the directory, they don't recurse into non-partition subdirs)."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    (
        spark.range(lo, hi)
        .select(F.col("id"), (F.col("id") * 10).alias("v"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    for i, f in enumerate(sorted(os.listdir(tmp))):
        if f.endswith(".parquet"):
            shutil.move(
                os.path.join(tmp, f), os.path.join(src, f"{tag}_{i}.parquet")
            )
    shutil.rmtree(tmp, ignore_errors=True)


def _double(df):
    return df.select("id", (F.col("v") * 2).alias("v"))


def test_backfill_is_exactly_once_across_runs(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # run 1: first batch of files
    _arrive(spark, src, 0, 100, "batch1")
    n1 = run_incremental(spark, src, sink, ckpt, _SCHEMA, _double)
    assert n1 == 100
    assert spark.read.parquet(sink).count() == 100

    # run 2: new files arrived; old files still present in src
    _arrive(spark, src, 100, 150, "batch2")
    n2 = run_incremental(spark, src, sink, ckpt, _SCHEMA, _double)
    assert n2 == 50  # ONLY the new files were read
    out = spark.read.parquet(sink)
    assert out.count() == 150  # no duplicates from batch1
    assert sorted(r.id for r in out.collect()) == list(range(150))
    # transform applied everywhere
    assert out.filter(F.col("v") != F.col("id") * 20).count() == 0

    # run 3: nothing new -> nothing appended
    n3 = run_incremental(spark, src, sink, ckpt, _SCHEMA, _double)
    assert n3 == 0
    assert spark.read.parquet(sink).count() == 150


def test_fresh_checkpoint_reprocesses_from_scratch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _arrive(spark, src, 0, 40, "b1")
    n = run_incremental(
        spark,
        src,
        str(tmp_path / "sink_a"),
        str(tmp_path / "ckpt_a"),
        _SCHEMA,
        None,
    )
    assert n == 40
    # a different checkpoint is an independent consumer: sees everything
    n_b = run_incremental(
        spark,
        src,
        str(tmp_path / "sink_b"),
        str(tmp_path / "ckpt_b"),
        _SCHEMA,
        None,
    )
    assert n_b == 40


def test_backfill_tolerates_added_column_in_new_files(spark, tmp_path):
    """Schema drift mid-stream: later files carry an extra column. The
    declared reader schema governs — new files still ingest (extra
    column ignored), exactly once, no crash. The medallion CSV path has
    the same contract (tests/test_drift_diagnosis.py); this pins it for
    the streaming file source."""
    import shutil
    import tempfile

    src = str(tmp_path / "src")
    os.makedirs(src)
    _arrive(spark, src, 0, 30, "v1")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    assert run_incremental(spark, src, sink, ckpt, _SCHEMA, None) == 30

    # evolved producer: same columns plus a new one
    tmp = tempfile.mkdtemp()
    (
        spark.range(30, 50)
        .select(
            F.col("id"),
            (F.col("id") * 10).alias("v"),
            F.lit("new").alias("extra_col"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    for i, f in enumerate(sorted(os.listdir(tmp))):
        if f.endswith(".parquet"):
            shutil.move(
                os.path.join(tmp, f), os.path.join(src, f"v2_{i}.parquet")
            )
    assert run_incremental(spark, src, sink, ckpt, _SCHEMA, None) == 20
    out = spark.read.parquet(sink)
    assert out.columns == ["id", "v"]  # declared schema governs
    assert sorted(r.id for r in out.collect()) == list(range(50))
