"""Bucketed-table writes must make same-key joins exchange-free — the
physical-plan proof behind the 100 TB co-located-join claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.sources.writers import (
    write_bucketed_table,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark):
    cus = spark.range(0, 2000).select(
        F.col("id").alias("custkey"), (F.col("id") % 7).alias("seg")
    )
    orders = spark.range(0, 8000).select(
        F.col("id").alias("okey"),
        (F.col("id") % 2000).alias("custkey"),
        (F.col("id") * 1.5).alias("amount"),
    )
    write_bucketed_table(cus, "t_bkt_customer", ("custkey",), n_buckets=8)
    write_bucketed_table(orders, "t_bkt_orders", ("custkey",), n_buckets=8)

    joined = spark.table("t_bkt_orders").join(
        spark.table("t_bkt_customer"), "custkey"
    )
    # disable broadcast so the join must use the distribution of its inputs
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined.groupBy("seg").agg(F.sum("amount")))
        pre_agg = plan.split("HashAggregate")[-1]  # below the aggregation
        assert "Exchange" not in pre_agg, pre_agg
        # and the result is right despite the exchange-free plan
        total = joined.agg(F.sum("amount")).first()[0]
        assert total == sum(i * 1.5 for i in range(8000))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bkt_customer")
        spark.sql("DROP TABLE IF EXISTS t_bkt_orders")
