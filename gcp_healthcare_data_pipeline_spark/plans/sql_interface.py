"""SQL-first interface: register the warehouse tables as views and run
plain Spark SQL text (the reference's users write SQL — bq_dag.py ships
SQL files to BigQuery; here the same habit lands on ``spark.sql``).

Catalyst treats SQL text and DataFrame calls identically (same logical
plans, same optimizations), so this is a front-end choice, not an engine
fork; q_sql_revenue_by_segment proves the text path end-to-end against
the oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every parquet table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)


REVENUE_BY_SEGMENT_SQL = """
SELECT
  c.c_mktsegment AS segment,
  n.n_name AS nation,
  COUNT(DISTINCT o.o_orderkey) AS num_orders,
  ROUND(SUM(COALESCE(o.o_totalprice, 0.0)), 2) AS total_revenue
FROM customer c
LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
WHERE n.n_name IS NOT NULL
GROUP BY 1, 2
"""


def revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(REVENUE_BY_SEGMENT_SQL)
