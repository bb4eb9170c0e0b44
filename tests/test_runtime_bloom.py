"""Runtime bloom-filter join pruning (Catalyst InjectRuntimeFilter).

At 100 TB the classic pain is a shuffle join where the fact side scans and
shuffles everything even though the (filtered) dim side would prune most
of it. Spark's runtime filtering injects a ``bloom_filter_agg`` on the
creation side and a ``might_contain`` predicate on the application side,
so fact rows drop BEFORE the exchange. This is the engine's answer to the
"semi-join pushdown" family — declarative, no hand-built bloom plumbing —
and this test pins (a) that our session shape actually triggers the
injection and (b) result equivalence with the filter on and off.

Thresholds are lowered only because the test tables are tiny; at real
scale the defaults (10 MB creation side / 10 GB application side) gate
the same rewrite.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


@pytest.fixture()
def bloom_spark(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _fact_dim_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
    )


def test_bloom_filter_is_injected(bloom_spark):
    df = _fact_dim_join(bloom_spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in plan, "no bloom built on the dim side"
    assert "might_contain" in plan, "no runtime filter on the fact side"


def test_bloom_filter_preserves_results(bloom_spark):
    sf_dir = "/root/testdata/sf0.001"
    with_bloom = {
        tuple(r) for r in _fact_dim_join(bloom_spark, sf_dir).collect()
    }
    bloom_spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    without = {tuple(r) for r in _fact_dim_join(bloom_spark, sf_dir).collect()}
    assert with_bloom == without and len(with_bloom) == 1
