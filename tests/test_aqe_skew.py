"""AQE skew-join instrument (r15 verdict item 7).

q_salted_join proves the MANUAL skew split; the 100 TB posture also
leans on AQE's OptimizeSkewedJoin (session.py turns
``spark.sql.adaptive.skewJoin.enabled`` on), which until this test no
cell pinned. A synthetic hot key (80% of the left side) must make the
optimizer split the skewed shuffle partition — visible as
``SortMergeJoin(skew=true)`` + an ``AQEShuffleRead .. skewed`` reader in
the FINAL adaptive plan — and the split must not change the join
result.

The thresholds are scoped DOWN for the fixture (the defaults are
256 MB / factor 5 — cluster-sized, untestable at dev scale); what's
pinned is that the session's AQE pipeline performs the split and that
the split is answer-preserving, not the production threshold values.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

# scoped knobs: force a shuffle join (no broadcast) and shrink the skew
# detection thresholds to fixture scale
_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
}


@contextmanager
def _scoped_conf(spark, confs):
    prev = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset key
            prev[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skewed_frames(spark):
    # hot key 0 carries 80% of the left side; the rest spreads over
    # 1000 uniform keys that all match the right side
    left = spark.range(0, 200_000).select(
        F.when(F.col("id") % 5 != 0, F.lit(0))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(0, 1_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
    )
    return left, right


def test_aqe_skew_split_fires_and_preserves_result(spark):
    left, right = _skewed_frames(spark)

    with _scoped_conf(spark, _SKEW_CONFS):
        j = left.join(right, "k")
        skew_rows = sorted(map(tuple, j.collect()))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, "AQE final plan not reached"
        assert "skew=true" in plan, (
            "OptimizeSkewedJoin did not split the hot partition:\n"
            + plan[:2000]
        )
        assert "skewed" in plan  # the AQEShuffleRead split reader

        # identical data, skew-split OFF: the ground truth the split
        # must reproduce row-for-row
        with _scoped_conf(
            spark, {"spark.sql.adaptive.skewJoin.enabled": "false"}
        ):
            j2 = left.join(right, "k")
            plain_rows = sorted(map(tuple, j2.collect()))
            plan2 = j2._jdf.queryExecution().executedPlan().toString()
            assert "skew=true" not in plan2

    assert len(skew_rows) == 200_000
    assert skew_rows == plain_rows


def test_aqe_skew_split_respects_downstream_distribution(spark):
    """A groupBy on the join key AFTER the join requires hash
    distribution on that key — splitting the skewed partition would
    break it, so AQE must (and does) decline the split there and the
    aggregation stays correct. Pinned so a future Spark upgrade that
    changes this trade-off surfaces loudly instead of silently
    reshaping co-partitioned pipelines."""
    left, right = _skewed_frames(spark)
    with _scoped_conf(spark, _SKEW_CONFS):
        agg = (
            left.join(right, "k")
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        rows = {r.k: r.n for r in agg.collect()}
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" not in plan  # split declined, correctly
    # key 0: the 160k hot rows plus the ids ≡ 0 (mod 1000) routed there
    # by the id % 1000 arm
    assert rows[0] == 160_000 + 200_000 // 1000
    assert len(rows) == 200  # ids ≡ 0 (mod 5) cover 200 distinct keys
