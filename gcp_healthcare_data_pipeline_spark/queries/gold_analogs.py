"""Gold-mart analytics: the reference's four analytics marts re-expressed
over the test star schema.

Reference parity map (each mart keeps its join/aggregate shape, with the
healthcare entities swapped for the TPC-H-ish equivalents):

- provider_charge_summary (gold.sql:13-25)  -> q_charge_summary
  transactions⟕providers⟕departments       -> lineitem⟕supplier⟕nation,
  incl. the computed-key join SPLIT(id,'-')[SAFE_OFFSET(0)] (gold.sql:22)
  as split(s_name,'#')[1]::bigint.
- patient_history (gold.sql:53-82)          -> q_patient_history
  4-way left-join fan-out chain             -> customer⟕orders⟕lineitem.
- provider_performance (gold.sql:103-128)   -> q_provider_performance
  COUNT(DISTINCT), conditional distinct count (gold.sql:115),
  ROUND(SAFE_DIVIDE(x, NULLIF(y,0))*100, 2) (gold.sql:118-120).
- department_performance (gold.sql:145-162) -> q_department_performance.

Scale notes (100 TB posture):
- supplier/nation/customer are dimensions: Catalyst auto-broadcasts under
  autoBroadcastJoinThreshold; we add an explicit ``F.broadcast`` on the
  provably-small sides (nation: 25 rows at every SF) so the plan never
  degrades to sort-merge when statistics are missing.
- Aggregations are expressed as plain groupBy/agg -> Spark plans
  partial (map-side) + final aggregation automatically; no driver loops.
- All money math stays in JVM whole-stage codegen; ROUND(…, 2) applied at
  the end for float-sum determinism vs the oracle (SURVEY §7 risk c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.functions.bq_compat import (
    safe_cast,
    safe_divide,
    safe_offset,
)
from gcp_healthcare_data_pipeline_spark.queries.registry import QuerySpec
from gcp_healthcare_data_pipeline_spark.session import load_tables


def q_charge_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by supplier x nation (provider_charge_summary analog).

    Joins: fact ⟕ dim on a computed key (parse numeric id out of
    's_name'), dim ⟕ dim on equi-key; SUM over COALESCE; null-rejecting
    filter — gold.sql:13-25 shape.
    """
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    li, sup, nat = t["lineitem"], t["supplier"], t["nation"]

    # computed join key: SPLIT(s_name, '#')[SAFE_OFFSET(1)] cast to bigint
    sup_k = sup.withColumn(
        "sup_key_parsed", safe_cast(safe_offset(F.split("s_name", "#"), 1), "bigint")
    )
    joined = (
        li.join(
            F.broadcast(sup_k), li.l_suppkey == sup_k.sup_key_parsed, "left"
        )
        .join(F.broadcast(nat), sup_k.s_nationkey == nat.n_nationkey, "left")
        .filter(F.col("n_name").isNotNull())
    )
    return (
        joined.groupBy(
            F.col("s_name").alias("provider_name"),
            F.col("n_name").alias("dept_name"),
        )
        .agg(
            F.round(
                F.sum(
                    F.coalesce(
                        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                        F.lit(0.0),
                    )
                ),
                2,
            ).alias("total_charge_amount")
        )
    )


_ORACLE_CHARGE_SUMMARY = """
SELECT
  s.s_name AS provider_name,
  n.n_name AS dept_name,
  ROUND(SUM(COALESCE(l.l_extendedprice * (1.0 - l.l_discount), 0.0)), 2)
    AS total_charge_amount
FROM lineitem l
LEFT JOIN supplier s
  ON TRY_CAST(split_part(s.s_name, '#', 2) AS BIGINT) = l.l_suppkey
LEFT JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name IS NOT NULL
GROUP BY 1, 2
"""


def q_patient_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-join fan-out chain (patient_history analog, gold.sql:53-82).

    customer ⟕ orders ⟕ lineitem with COALESCE'd projections and a
    current-flag-style filter. Deliberately preserves the reference's
    fan-out semantics (every order row repeats per line item).
    """
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cus, orders, li = t["customer"], t["orders"], t["lineitem"]

    return (
        cus.filter(F.col("c_acctbal").isNotNull())
        .join(orders, orders.o_custkey == cus.c_custkey, "left")
        .join(li, li.l_orderkey == orders.o_orderkey, "left")
        .select(
            F.col("c_custkey").alias("patient_key"),
            F.col("c_name").alias("patient_name"),
            F.col("o_orderkey").alias("encounter_id"),
            F.col("l_linenumber").alias("transaction_line"),
            F.coalesce(F.col("o_totalprice"), F.lit(0.0)).alias("order_amount"),
            F.coalesce(F.col("l_extendedprice"), F.lit(0.0)).alias("line_amount"),
        )
    )


_ORACLE_PATIENT_HISTORY = """
SELECT
  c.c_custkey AS patient_key,
  c.c_name AS patient_name,
  o.o_orderkey AS encounter_id,
  l.l_linenumber AS transaction_line,
  COALESCE(o.o_totalprice, 0.0) AS order_amount,
  COALESCE(l.l_extendedprice, 0.0) AS line_amount
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_acctbal IS NOT NULL
"""


def q_provider_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate mart with conditional distinct count and safe ratio
    (provider_performance analog, gold.sql:103-128)."""
    t = load_tables(spark, sf_dir, "supplier", "lineitem", "orders")
    sup, li, orders = t["supplier"], t["lineitem"], t["orders"]

    joined = sup.join(li, li.l_suppkey == sup.s_suppkey, "left").join(
        orders, orders.o_orderkey == li.l_orderkey, "left"
    )
    num_orders = F.countDistinct(F.col("o_orderkey"))
    finished = F.countDistinct(
        F.when(F.col("o_orderstatus") == "F", F.col("o_orderkey"))
    )
    return (
        joined.groupBy(
            F.col("s_suppkey").alias("provider_key"),
            F.col("s_name").alias("provider_name"),
        )
        .agg(
            num_orders.alias("num_orders"),
            finished.alias("finished_orders"),
            F.round(
                F.sum(F.coalesce(F.col("l_extendedprice"), F.lit(0.0))), 2
            ).alias("total_charge_amount"),
            F.round(
                safe_divide(finished * F.lit(100.0), F.nullif(num_orders, F.lit(0))),
                2,
            ).alias("finished_pct"),
        )
    )


_ORACLE_PROVIDER_PERFORMANCE = """
SELECT
  s.s_suppkey AS provider_key,
  s.s_name AS provider_name,
  COUNT(DISTINCT o.o_orderkey) AS num_orders,
  COUNT(DISTINCT CASE WHEN o.o_orderstatus = 'F' THEN o.o_orderkey END)
    AS finished_orders,
  ROUND(SUM(COALESCE(l.l_extendedprice, 0.0)), 2) AS total_charge_amount,
  ROUND(
    COUNT(DISTINCT CASE WHEN o.o_orderstatus = 'F' THEN o.o_orderkey END)
      * 100.0
      / NULLIF(COUNT(DISTINCT o.o_orderkey), 0),
    2) AS finished_pct
FROM supplier s
LEFT JOIN lineitem l ON l.l_suppkey = s.s_suppkey
LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
"""


def q_department_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension rollup mart (department_performance analog,
    gold.sql:145-162): nation ⟕ customer ⟕ orders, COUNT DISTINCT + AVG."""
    t = load_tables(spark, sf_dir, "nation", "customer", "orders")
    nat, cus, orders = t["nation"], t["customer"], t["orders"]

    joined = (
        nat.join(cus, cus.c_nationkey == nat.n_nationkey, "left")
        .join(orders, orders.o_custkey == cus.c_custkey, "left")
        .filter(F.col("n_name").isNotNull())
    )
    return (
        joined.groupBy(
            F.col("n_nationkey").alias("dept_key"),
            F.col("n_name").alias("dept_name"),
        )
        .agg(
            F.countDistinct("c_custkey").alias("num_patients"),
            F.countDistinct("o_orderkey").alias("num_encounters"),
            F.round(
                F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))), 2
            ).alias("total_amount"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_amount"),
        )
    )


_ORACLE_DEPARTMENT_PERFORMANCE = """
SELECT
  n.n_nationkey AS dept_key,
  n.n_name AS dept_name,
  COUNT(DISTINCT c.c_custkey) AS num_patients,
  COUNT(DISTINCT o.o_orderkey) AS num_encounters,
  ROUND(SUM(COALESCE(o.o_totalprice, 0.0)), 2) AS total_amount,
  ROUND(AVG(o.o_totalprice), 2) AS avg_amount
FROM nation n
LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
WHERE n.n_name IS NOT NULL
GROUP BY 1, 2
"""


def q_sql_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure spark.sql text over registered views — the SQL front-end path
    (same Catalyst plans as the DataFrame API)."""
    from gcp_healthcare_data_pipeline_spark.plans.sql_interface import (  # noqa: PLC0415
        revenue_by_segment,
    )

    return revenue_by_segment(spark, sf_dir)


_ORACLE_SQL_REVENUE = """
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


QUERIES = [
    QuerySpec(
        "q_charge_summary", q_charge_summary, _ORACLE_CHARGE_SUMMARY,
        "J1 J2 A1 P6 P7 F6 F7 F9",
    ),
    QuerySpec(
        "q_sql_revenue_by_segment", q_sql_revenue_by_segment,
        _ORACLE_SQL_REVENUE, "ext:sql-interface S4",
    ),
    QuerySpec(
        "q_patient_history", q_patient_history, _ORACLE_PATIENT_HISTORY,
        "J3 P1 P6 F6",
    ),
    QuerySpec(
        "q_provider_performance", q_provider_performance,
        _ORACLE_PROVIDER_PERFORMANCE, "J4 A2 A3 A4 F9 F10",
    ),
    QuerySpec(
        "q_department_performance", q_department_performance,
        _ORACLE_DEPARTMENT_PERFORMANCE, "J5 A2 F6 F9",
    ),
]
