"""Sketch estimates must land within their configured error of the exact
answer: approx_count_distinct (rsd=0.02 -> allow 3 sigma ~ 6%) and
approx_percentile (accuracy=10000 -> rank error <= 1/10000 of the group,
checked via the exact values at the bounding ranks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries.extended_queries import (
    q_approx_distinct,
    q_approx_quantiles,
)

SF_DIR = "/root/testdata/sf0.01"


def test_approx_distinct_within_error_bounds(spark):
    approx = {r.return_flag: r for r in q_approx_distinct(spark, SF_DIR).collect()}
    exact = {
        r.return_flag: r
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, ex in exact.items():
        ap = approx[flag]
        assert abs(ap.approx_orders - ex.orders) <= 0.06 * ex.orders
        assert abs(ap.approx_parts - ex.parts) <= 0.06 * ex.parts


def test_approx_quantiles_within_rank_error(spark):
    approx = {r.return_flag: r for r in q_approx_quantiles(spark, SF_DIR).collect()}
    # exact value at p +/- 2x the sketch's rank tolerance brackets the
    # acceptable band for the estimate
    delta = 2.0 / 10000
    bounds = {}
    for p in (0.5, 0.95, 0.99):
        lo, hi = max(0.0, p - delta), min(1.0, p + delta)
        bounds[p] = (
            F.expr(f"percentile(l_extendedprice, {lo})").alias(f"lo_{int(p*100)}"),
            F.expr(f"percentile(l_extendedprice, {hi})").alias(f"hi_{int(p*100)}"),
        )
    exact = {
        r.return_flag: r
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(*[c for pair in bounds.values() for c in pair])
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, ex in exact.items():
        ap = approx[flag]
        for p, name in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            val = getattr(ap, name)
            assert getattr(ex, f"lo_{int(p*100)}") <= val <= getattr(
                ex, f"hi_{int(p*100)}"
            ), (flag, name, val)


def test_hll_incremental_union_matches_exact(spark):
    """Daily-sketch union estimate stays within the lgConfigK=12 error
    band (~1.6% rsd -> allow 3 sigma ~ 5%) and the output self-certifies
    via its rel_err column."""
    from gcp_healthcare_data_pipeline_spark.queries.extended_queries import (
        q_hll_incremental,
    )

    row = q_hll_incremental(spark, SF_DIR).collect()[0]
    assert row.n_daily_sketches > 1  # genuinely merged across days
    assert row.exact_users > 0
    assert abs(row.approx_users - row.exact_users) <= 0.05 * row.exact_users
    assert row.rel_err <= 0.05
