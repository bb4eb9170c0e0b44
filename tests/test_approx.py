"""Sketch estimates must land within their configured error of the exact
answer: approx_count_distinct (rsd=0.02 -> allow 3 sigma ~ 6%) and
approx_percentile (accuracy=10000 -> rank error <= 1/10000 of the group,
checked via the exact values at the bounding ranks).

The queries themselves now hash their self-certification (exact counts +
bound booleans, oracle-checked by the driver); these tests additionally
bound the RAW sketch estimates, which no longer appear in the query
output precisely because they are engine-specific.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries.extended_queries import (
    q_approx_distinct,
    q_approx_quantiles,
)

SF_DIR = "/root/testdata/sf0.01"


def test_approx_distinct_within_error_bounds(spark):
    out = {r.return_flag: r for r in q_approx_distinct(spark, SF_DIR).collect()}
    raw = {
        r.return_flag: r
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("ao"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("ap"),
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
        )
        .collect()
    }
    assert set(out) == set(raw)
    for flag, ex in raw.items():
        row = out[flag]
        # the hashed contract: exact counts + all-green bound booleans
        assert row.exact_orders == ex.orders
        assert row.exact_parts == ex.parts
        assert row.orders_within_3rsd and row.parts_within_3rsd
        # and the raw estimates really are inside the bound
        assert abs(ex.ao - ex.orders) <= 0.06 * ex.orders
        assert abs(ex.ap - ex.parts) <= 0.06 * ex.parts


def test_approx_quantiles_within_rank_error(spark):
    out = {r.return_flag: r for r in q_approx_quantiles(spark, SF_DIR).collect()}
    # exact value at p +/- 2x the sketch's rank tolerance brackets the
    # acceptable band for the raw estimate (the query itself uses 5x)
    delta = 2.0 / 10000
    aggs = [
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)"
        ).alias("pcts")
    ]
    for p in (0.5, 0.95, 0.99):
        lo, hi = max(0.0, p - delta), min(1.0, p + delta)
        aggs.append(
            F.expr(f"percentile(l_extendedprice, {lo})").alias(f"lo_{int(p*100)}")
        )
        aggs.append(
            F.expr(f"percentile(l_extendedprice, {hi})").alias(f"hi_{int(p*100)}")
        )
    raw = {
        r.return_flag: r
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(*aggs)
        .collect()
    }
    assert set(out) == set(raw)
    for flag, ex in raw.items():
        row = out[flag]
        assert row.p50_in_bracket and row.p95_in_bracket and row.p99_in_bracket
        for i, p in enumerate((50, 95, 99)):
            val = ex.pcts[i]
            assert getattr(ex, f"lo_{p}") <= val <= getattr(ex, f"hi_{p}"), (
                flag, p, val,
            )


def test_hll_incremental_union_matches_exact(spark):
    """Daily-sketch union estimate stays within the lgConfigK=12 error
    band (~1.6% rsd -> allow 3 sigma ~ 5%); the query output hashes the
    within_3rsd boolean the driver oracle expects TRUE."""
    from gcp_healthcare_data_pipeline_spark.queries.extended_queries import (
        q_hll_incremental,
    )

    row = q_hll_incremental(spark, SF_DIR).collect()[0]
    assert row.n_daily_sketches > 1  # genuinely merged across days
    assert row.exact_users > 0
    assert row.within_3rsd
