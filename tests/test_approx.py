"""approx_count_distinct must land within its configured relative error
of the exact count (rsd=0.02 -> allow 3 sigma ~ 6%)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries.extended_queries import (
    q_approx_distinct,
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
