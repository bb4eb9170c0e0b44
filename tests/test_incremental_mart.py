"""Partition-level incremental mart refresh (operators/incremental_mart.py).

Pins the two contracts the oracle-gated q_mart_refresh can't see:
1. the materialized dynamic-partition-overwrite refresh rewrites ONLY the
   affected partition directories (untouched partitions keep their exact
   files), and
2. the refreshed mart equals a from-scratch rebuild, including the
   partial-overlap partition that must be recomputed from the full
   source rather than the delta alone.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.operators.incremental_mart import (
    affected_partitions,
    incremental_mart,
    refresh_mart_path,
)


def _mart_fn(df):
    return df.groupBy("part_key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("amount").alias("total"),
    )


def _source(spark):
    rows = [
        # (id, part_key, amount) — partitions 2000..2003
        (i, 2000 + (i % 4), float(i)) for i in range(80)
    ]
    return spark.createDataFrame(rows, "id long, part_key int, amount double")


def _files_by_partition(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        part = [p for p in root.split(os.sep) if p.startswith("part_key=")]
        if part:
            for f in files:
                if f.endswith(".parquet"):
                    full = os.path.join(root, f)
                    out.setdefault(part[0], set()).add(
                        (full, os.path.getmtime(full), os.path.getsize(full))
                    )
    return out


def test_refresh_rewrites_only_affected_partitions(spark, tmp_path):
    mart_path = str(tmp_path / "mart")
    src = _source(spark)
    # initial full build from the base state (delta rows not yet arrived)
    base = src.filter(F.col("id") < 60)
    _mart_fn(base).write.partitionBy("part_key").parquet(mart_path)
    before = _files_by_partition(mart_path)

    # delta: late rows, all landing in partitions 2002 and 2003
    delta = src.filter((F.col("id") >= 60) & (F.col("part_key") >= 2002))
    refresh_mart_path(
        spark, mart_path, src, delta, ["part_key"], _mart_fn
    )
    after = _files_by_partition(mart_path)

    # untouched partitions keep their exact files (same path/mtime/size)
    assert after["part_key=2000"] == before["part_key=2000"]
    assert after["part_key=2001"] == before["part_key=2001"]
    # affected partitions were rewritten
    assert after["part_key=2002"] != before["part_key=2002"]
    assert after["part_key=2003"] != before["part_key=2003"]

    # the refreshed mart equals the from-scratch rebuild over base+delta
    refreshed = (
        spark.read.parquet(mart_path)
        .select("part_key", "n_rows", "total")
        .collect()
    )
    expected = _mart_fn(base.unionByName(delta)).collect()
    assert sorted(map(tuple, refreshed)) == sorted(map(tuple, expected))


def test_partial_overlap_partition_recomputed_from_full_source(spark):
    src = _source(spark)
    # base holds SOME rows of partition 2002; delta adds more to 2002
    base = src.filter(F.col("id") < 40)
    delta = src.filter((F.col("id") >= 40) & (F.col("part_key") == 2002))
    full = base.unionByName(delta)
    out = incremental_mart(
        _mart_fn(base), full, delta, ["part_key"], _mart_fn
    ).collect()
    expected = _mart_fn(full).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, expected))


def test_affected_partitions_is_distinct_and_scoped(spark):
    src = _source(spark)
    delta = src.filter(F.col("part_key") == 2001)
    keys = affected_partitions(delta, ["part_key"]).collect()
    assert [r.part_key for r in keys] == [2001]
