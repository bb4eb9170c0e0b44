"""Window-function / top-k / JSON extension queries.

The reference has no ORDER BY, LIMIT, or window functions anywhere
(SURVEY §2.8) and no JSON functions (§2.5) — these come free with Spark
and are part of the engine's extension surface: per-group top-k ranking,
running totals, lag deltas, and JSON property extraction from the events
``props`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries.registry import QuerySpec
from gcp_healthcare_data_pipeline_spark.session import load_tables


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by totalprice within each priority (row_number with
    deterministic tie-break)."""
    orders = load_tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("o_orderpriority").alias("order_priority"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_totalprice").alias("total_price"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


_ORACLE_TOPK_ORDERS = """
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
)
SELECT o_orderpriority AS order_priority,
       o_orderkey AS order_key,
       o_totalprice AS total_price,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
"""


def q_customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running order total per customer (cumulative sum window) with the
    previous order's amount (lag) — classic sessionless history view."""
    orders = load_tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderkey").alias("order_key"),
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("running_total"),
        F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)).alias(
            "prev_order_price"
        ),
    )


_ORACLE_CUSTOMER_RUNNING_TOTAL = """
SELECT
  o_custkey AS cust_key,
  o_orderkey AS order_key,
  ROUND(SUM(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
  COALESCE(LAG(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0.0)
    AS prev_order_price
FROM orders
"""


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from the events ``props`` column,
    aggregated per event type (get_json_object — schema-on-read JSON)."""
    ev = load_tables(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


_ORACLE_EVENTS_JSON_PROPS = """
SELECT event_type,
  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
FROM events
GROUP BY 1
"""


def q_events_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics on Spark 4's VARIANT type: ``props``
    parsed once into the binary variant encoding, fields extracted with
    typed path access, plus the inferred per-row variant schema — the
    modern engine path for schema-on-read JSON (binary-encoded columnar
    variant access beats repeated string re-parsing; get_json_object
    q_events_json_props is the legacy twin).

    The oracle runs DuckDB's native JSON extraction — the point is that
    typed variant access produces EXACTLY the values the JSON text
    defines.
    """
    ev = load_tables(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return ev.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.count_distinct(F.schema_of_variant(v)).alias("n_schemas"),
    )


_ORACLE_EVENTS_VARIANT = """
SELECT event_type,
  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS sum_k,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  COUNT(DISTINCT json_structure(props)) AS n_schemas
FROM events
GROUP BY 1
"""


def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) price quartiles within each priority, rolled up to
    quartile boundaries (min/max per bucket)."""
    orders = load_tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("quartile", F.ntile(4).over(w))
        .groupBy(
            F.col("o_orderpriority").alias("order_priority"),
            F.col("quartile").cast("int").alias("quartile"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


_ORACLE_NTILE_QUARTILES = """
WITH t AS (
  SELECT o_orderpriority, o_totalprice,
    NTILE(4) OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile
  FROM orders
)
SELECT o_orderpriority AS order_priority,
       CAST(quartile AS INT) AS quartile,
       COUNT(*) AS n_orders,
       ROUND(MIN(o_totalprice), 2) AS min_price,
       ROUND(MAX(o_totalprice), 2) AS max_price
FROM t
GROUP BY 1, 2
"""


def q_order_items_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested aggregation: the sorted part list of each order collected
    into one string column (collect_list -> array_sort -> join)."""
    li = load_tables(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % 50 == 0)
        .groupBy(F.col("l_orderkey").alias("order_key"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.array_join(
                F.array_sort(F.collect_list(F.col("l_partkey").cast("string"))),
                ",",
            ).alias("part_list"),
        )
    )


_ORACLE_ORDER_ITEMS_AGG = """
SELECT l_orderkey AS order_key,
       COUNT(*) AS n_items,
       array_to_string(list_sort(list(CAST(l_partkey AS VARCHAR))), ',')
         AS part_list
FROM lineitem
WHERE l_orderkey % 50 = 0
GROUP BY 1
"""


def q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery decorrelation: orders priced above THEIR OWN
    customer's average order value (the textbook `WHERE o_totalprice >
    (SELECT AVG … correlated on custkey)`). Spark-first this is one
    window aggregate — a single hash-partition by customer, no per-row
    subquery execution.

    Money arithmetic is done in exact integer CENTS: `price*n > sum` in
    cents is an integer comparison and `sum/n` a single IEEE division of
    exact operands — bit-identical across engines. Rounding a bare
    AVG(double) is NOT portable (Spark rounds the binary double,
    DuckDB the decimal rendering; averages of 2-decimal money values
    land on x.xx5 boundaries constantly — measured 55/7540 flips).
    """
    orders = load_tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    df = (
        orders.withColumn("cents", cents)
        .withColumn("sum_cents", F.sum("cents").over(w))
        .withColumn("n_orders", F.count(F.lit(1)).over(w))
    )
    return df.filter(
        F.col("cents") * F.col("n_orders") > F.col("sum_cents")
    ).select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_totalprice").alias("total_price"),
        (
            (F.col("sum_cents").cast("double") / F.col("n_orders")) / 100.0
        ).alias("cust_avg_price"),
    )


_ORACLE_ABOVE_AVG_ORDERS = """
WITH c AS (
  SELECT *, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
), a AS (
  SELECT o_custkey, SUM(cents) AS sum_cents, COUNT(*) AS n_orders
  FROM c GROUP BY 1
)
SELECT c.o_orderkey AS order_key,
       c.o_custkey AS cust_key,
       c.o_totalprice AS total_price,
       (CAST(sum_cents AS DOUBLE) / n_orders) / 100.0 AS cust_avg_price
FROM c JOIN a ON c.o_custkey = a.o_custkey
WHERE c.cents * n_orders > sum_cents
"""


QUERIES = [
    QuerySpec("q_topk_orders", q_topk_orders, _ORACLE_TOPK_ORDERS, "ext:window"),
    QuerySpec(
        "q_above_avg_orders", q_above_avg_orders, _ORACLE_ABOVE_AVG_ORDERS,
        "ext:correlated-subquery decorrelation (window rewrite)",
    ),
    QuerySpec(
        "q_ntile_quartiles", q_ntile_quartiles, _ORACLE_NTILE_QUARTILES,
        "ext:window ntile",
    ),
    QuerySpec(
        "q_order_items_agg", q_order_items_agg, _ORACLE_ORDER_ITEMS_AGG,
        "ext:nested-agg collect_list",
    ),
    QuerySpec(
        "q_customer_running_total", q_customer_running_total,
        _ORACLE_CUSTOMER_RUNNING_TOTAL, "ext:window",
    ),
    QuerySpec(
        "q_events_json_props", q_events_json_props, _ORACLE_EVENTS_JSON_PROPS,
        "ext:json",
    ),
    QuerySpec(
        "q_events_variant", q_events_variant, _ORACLE_EVENTS_VARIANT,
        "ext:json (Spark 4 VARIANT typed path access + schema inference)",
    ),
]
