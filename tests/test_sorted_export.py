"""Physical-order export contract: repartition(key) +
sortWithinPartitions gives every output file internally-ordered rows —
the 'time-ordered per-user training sequences' guarantee a sequence
exporter relies on (each user's events contiguous and ordered within
one file, no cross-file interleaving)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_sorted_within_partitions_survives_parquet_roundtrip(
    spark, tmp_path
):
    path = str(tmp_path / "export")
    df = spark.range(5000).select(
        (F.col("id") % 37).alias("user_id"),
        ((F.col("id") * 7919) % 100000).alias("ts"),
        F.col("id").alias("payload"),
    )
    (
        df.repartition(4, "user_id")
        .sortWithinPartitions("user_id", "ts")
        .write.parquet(path)
    )
    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    assert len(files) == 4
    seen_users: dict[int, str] = {}
    total = 0
    for f in files:
        rows = spark.read.parquet(f).collect()
        total += len(rows)
        # within-file: rows ordered by (user_id, ts)
        keys = [(r.user_id, r.ts) for r in rows]
        assert keys == sorted(keys)
        # cross-file: each user appears in exactly one file
        for u in {r.user_id for r in rows}:
            assert seen_users.setdefault(u, f) == f
    assert total == 5000
