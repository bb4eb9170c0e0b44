"""Decision-support analytics + data-quality + scale-pattern queries.

The reference's gold layer is mart-style aggregation over a star schema
(reference gold.sql:13-169). These queries extend the same shape to the
classic decision-support patterns the reference cannot express — multi-way
star joins with region/nation dimension chains, TakeOrdered top-k, and
production data-quality gating — plus one distributed-systems pattern
(contiguous global ID assignment) that every 100 TB training-data pipeline
eventually needs.

Scale notes (local[32] tests, 1000-executor design):

- Star joins: ``region``/``nation`` are tiny -> explicit ``broadcast``;
  ``customer`` joins stay shuffle (it scales with SF). Catalyst reorders
  the chain; AQE re-plans the build side at runtime.
- Top-k: ``orderBy().limit(k)`` compiles to TakeOrderedAndProject —
  per-partition heaps + driver merge of k rows, NOT a global sort.
- DQ checks: ONE aggregation pass computes every metric; the per-check
  rows are exploded from that single row. No second scan, no union of
  scans.
- Stable IDs: the classic two-phase trick — per-range counts (tiny
  aggregate), prefix-sum offsets over the range table, broadcast join
  back, shard-local row_number. The only full-data shuffle is the one
  hash-partition by range bucket; no global single-partition sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.functions.windows import (
    tiny_frame_window,
)
from gcp_healthcare_data_pipeline_spark.queries.registry import QuerySpec
from gcp_healthcare_data_pipeline_spark.session import load_tables


# --------------------------------------------------------------------------
# TPC-H Q5-style: local supplier volume per nation within one region
# --------------------------------------------------------------------------

def q_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation where the customer and the line's supplier sit in
    the same nation, within one region and one order-date year band.

    Six-way star join (region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈
    supplier). ``region``/``nation`` are broadcast (constant-size dims);
    ``supplier`` scales linearly with SF (SF × 10k rows) so it is NOT
    force-broadcast — like customer, Catalyst/AQE picks the build side
    from runtime stats, which broadcasts at small SF and shuffles at the
    100 TB design point instead of OOMing on a multi-GB broadcast. The
    orders date filter is a parquet-pushable predicate, so the fact scan
    prunes at the source.
    """
    t = load_tables(
        spark, sf_dir, "region", "nation", "customer", "orders",
        "lineitem", "supplier",
    )
    nations_in_region = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = t["customer"].join(
        F.broadcast(nations_in_region),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_nationkey", "n_name")
    ord_f = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    return (
        t["lineitem"]
        .join(ord_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        # "local" volume: the supplying nation must equal the customer's
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


_ORACLE_REGIONAL_SUPPLIER_VOLUME = """
SELECT n_name AS nation,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1999-01-01'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# TPC-H Q3-style: shipping priority — top-10 unshipped-revenue orders
# --------------------------------------------------------------------------

def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by outstanding revenue for one market segment: booked
    before the cutoff, with line items still shipping after it.

    ``orderBy().limit(10)`` compiles to TakeOrderedAndProject (bounded
    per-partition heaps, driver merges 10 rows) — no global sort even at
    100 TB. Ties broken by order key for a deterministic result set.
    """
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    ord_f = t["orders"].filter(F.col("o_orderdate") < cutoff)
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(ord_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("l_orderkey").alias("order_key"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("order_key").asc())
        .limit(10)
    )


_ORACLE_SHIPPING_PRIORITY = """
SELECT l_orderkey AS order_key,
       o_orderdate AS order_date,
       o_orderpriority AS order_priority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, order_key ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Deequ-style single-scan data-quality gate
# --------------------------------------------------------------------------

def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production data-quality gate over ``orders``: completeness,
    key-uniqueness, domain membership, and value-bound checks — all
    computed in ONE aggregation scan, then exploded into one row per
    check (the Deequ/great-expectations report shape).

    The reference's quality surface is the quarantine CASE flag
    (reference silver.sql:55 LOWER(x)='null' sentinel handling); this
    generalizes it to a declarative check suite whose output can gate a
    load the same way `audit.py` gates watermarks.
    """
    orders = load_tables(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    # every metric is a fraction in [0,1]; one wide agg row -> explode
    agg = orders.agg(
        n.alias("n_rows"),
        (F.count_distinct(F.col("o_orderkey")) / n).alias("key_unique"),
        (F.count(F.col("o_custkey")) / n).alias("custkey_complete"),
        (
            F.sum(
                F.col("o_orderstatus").isin("O", "F", "P").cast("bigint")
            ) / n
        ).alias("status_in_domain"),
        (F.sum((F.col("o_totalprice") > 0).cast("bigint")) / n).alias(
            "price_positive"
        ),
        (
            F.sum(
                (
                    (F.col("o_orderdate") >= F.lit("1990-01-01").cast("timestamp"))
                    & (F.col("o_orderdate") < F.lit("2010-01-01").cast("timestamp"))
                ).cast("bigint")
            ) / n
        ).alias("orderdate_in_range"),
    )
    checks = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.round(F.col(name), 6).alias("metric"),
                (F.col(name) >= F.lit(1.0)).alias("passed"),
            )
            for name in [
                "key_unique",
                "custkey_complete",
                "status_in_domain",
                "price_positive",
                "orderdate_in_range",
            ]
        ]
    )
    return (
        agg.select(F.explode(checks).alias("c"))
        .select("c.check_name", "c.metric", "c.passed")
    )


_ORACLE_DQ_CHECKS = """
WITH m AS (
  SELECT
    CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(*) AS key_unique,
    CAST(COUNT(o_custkey) AS DOUBLE) / COUNT(*) AS custkey_complete,
    CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
      AS DOUBLE) / COUNT(*) AS status_in_domain,
    CAST(SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS DOUBLE)
      / COUNT(*) AS price_positive,
    CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1990-01-01'
                   AND o_orderdate <  TIMESTAMP '2010-01-01'
             THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS orderdate_in_range
  FROM orders
)
SELECT 'key_unique' AS check_name, ROUND(key_unique, 6) AS metric,
       key_unique >= 1.0 AS passed FROM m
UNION ALL
SELECT 'custkey_complete', ROUND(custkey_complete, 6),
       custkey_complete >= 1.0 FROM m
UNION ALL
SELECT 'status_in_domain', ROUND(status_in_domain, 6),
       status_in_domain >= 1.0 FROM m
UNION ALL
SELECT 'price_positive', ROUND(price_positive, 6),
       price_positive >= 1.0 FROM m
UNION ALL
SELECT 'orderdate_in_range', ROUND(orderdate_in_range, 6),
       orderdate_in_range >= 1.0 FROM m
"""


# --------------------------------------------------------------------------
# Contiguous global ID assignment without a global sort
# --------------------------------------------------------------------------

def q_stable_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign contiguous global row IDs (0..N-1 in doc_id order) WITHOUT
    ``row_number() OVER (ORDER BY ...)`` — the single-partition global
    window that melts at 100 TB.

    Two-phase shard-offset pattern: (1) count rows per monotone range
    bucket (tiny aggregate), (2) exclusive prefix-sum over the bucket
    table (a window over ~N/width rows, driver-scale), (3) broadcast the
    offsets back and take a bucket-LOCAL row_number. The only full-data
    exchange is one hash partition by bucket. Range buckets (``doc_id
    DIV width``), not hash buckets, keep bucket order == global order; on
    arbitrary keys the production version samples range boundaries first
    (same trick Spark's own RangePartitioner uses).
    """
    docs = load_tables(spark, sf_dir, "documents").select("doc_id")
    # integral division (DIV), not double division + cast-truncation —
    # exact for all bigint doc_ids, incl. beyond 2^53
    bucket = F.expr("doc_id DIV 100").alias("bucket")
    bucketed = docs.select("doc_id", bucket)
    offsets = (
        bucketed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("cnt").over(
                    # frame = |buckets| rows (n/100), post-aggregation
                    tiny_frame_window("bucket", "bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "offset")
    )
    w_local = Window.partitionBy("bucket").orderBy("doc_id")
    return (
        bucketed.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            (F.col("offset") + F.row_number().over(w_local) - 1).alias(
                "stable_id"
            ),
        )
    )


_ORACLE_STABLE_IDS = """
SELECT doc_id,
       ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS stable_id
FROM documents
"""


# --------------------------------------------------------------------------
# CDC apply: merge an insert/update/delete change feed into a snapshot
# --------------------------------------------------------------------------

def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC feed (op ∈ I/U/D) onto a base snapshot — the INVERSE of
    q_snapshot_diff (extended_queries.py), closing the CDC round-trip:
    ``apply(base, diff(base, next)) == next``.

    Type-1 MERGE semantics via one full outer join on the key:
    feed D -> row dropped, feed U/I -> feed row wins, no feed row -> base
    row survives. One shuffle on the key; on a transactional table format
    this is the literal MERGE statement, and the reference's MERGE
    (reference silver.sql SCD2 load) is the Type-2 sibling already
    covered by operators/scd2.py.

    The feed is derived deterministically from the data itself so the
    oracle can rebuild it: orderkey%10==0 -> U (price bump), %10==1 -> D,
    plus synthetic I rows keyed past the base key space.
    """
    from gcp_healthcare_data_pipeline_spark.operators.cdc import apply_feed

    orders = load_tables(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    feed = (
        orders.filter(F.col("o_orderkey") % 10 < 2)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 10 == 0, F.lit("update"))
            .otherwise(F.lit("delete"))
            .alias("change_type"),
            F.col("o_orderstatus").alias("new_o_orderstatus"),
            F.round(F.col("o_totalprice") + 100.0, 2).alias(
                "new_o_totalprice"
            ),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 1000 == 2).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                F.lit("insert").alias("change_type"),
                F.lit("O").alias("new_o_orderstatus"),
                F.lit(1.0).alias("new_o_totalprice"),
            )
        )
    )
    return apply_feed(
        orders, feed, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    ).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("order_status"),
        F.round("o_totalprice", 2).alias("total_price"),
    )


_ORACLE_CDC_APPLY = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
),
feed AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN 'U' ELSE 'D' END AS op,
         o_orderstatus,
         ROUND(o_totalprice + 100.0, 2) AS o_totalprice
  FROM base WHERE o_orderkey % 10 < 2
  UNION ALL
  SELECT o_orderkey + 10000000, 'I', 'O', 1.0
  FROM base WHERE o_orderkey % 1000 = 2
)
SELECT COALESCE(f.o_orderkey, b.o_orderkey) AS o_orderkey,
       COALESCE(f.o_orderstatus, b.o_orderstatus) AS order_status,
       ROUND(COALESCE(f.o_totalprice, b.o_totalprice), 2) AS total_price
FROM base b
FULL OUTER JOIN feed f ON b.o_orderkey = f.o_orderkey
WHERE COALESCE(f.op != 'D', TRUE)
"""


# --------------------------------------------------------------------------
# Skew diagnosis: per-key distribution profile for shuffle planning
# --------------------------------------------------------------------------

def q_skew_diagnose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profile for ``lineitem.l_orderkey`` — the ops
    query you run BEFORE picking a salting factor (operators/skew.py):
    top-5 hottest keys with their share of all rows, plus the
    total-distinct and mean-rows-per-key context columns.

    Two aggregations over one scan (per-key counts, then top-k of the
    tiny count table via TakeOrdered); no driver-side loop.
    """
    li = load_tables(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = per_key.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        per_key.crossJoin(F.broadcast(totals))
        .orderBy(F.col("n_rows").desc(), F.col("key").asc())
        .limit(5)
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("total_rows"), 6).alias(
                "row_share"
            ),
            "n_keys",
            F.round(F.col("total_rows") / F.col("n_keys"), 4).alias(
                "mean_rows_per_key"
            ),
        )
    )


_ORACLE_SKEW_DIAGNOSE = """
WITH per_key AS (
  SELECT l_orderkey AS key, COUNT(*) AS n_rows FROM lineitem GROUP BY 1
),
totals AS (
  SELECT SUM(n_rows) AS total_rows, COUNT(*) AS n_keys FROM per_key
)
SELECT key, n_rows,
       ROUND(CAST(n_rows AS DOUBLE) / total_rows, 6) AS row_share,
       n_keys,
       ROUND(CAST(total_rows AS DOUBLE) / n_keys, 4) AS mean_rows_per_key
FROM per_key CROSS JOIN totals
ORDER BY n_rows DESC, key ASC
LIMIT 5
"""


# --------------------------------------------------------------------------
# TPC-H Q7-style: bilateral trade volume between two nations by year
# --------------------------------------------------------------------------

def q_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping volume between two specific nations, both directions, by
    ship year — the TPC-H Q7 shape: fact ⋈ supplier-nation ⋈
    customer-nation with a PAIR predicate, where naive SQL writes an OR
    over two nation orderings.

    Plan shape: ``nation`` broadcasts twice under different aliases
    (supp side / cust side); the pair predicate collapses to a filter on
    the two broadcast-joined name columns, so the fact scans once and
    shuffles only for the final small groupBy. Supplier/customer scale
    with SF and stay AQE-decided joins, same posture as
    q_regional_supplier_volume.
    """
    t = load_tables(
        spark, sf_dir, "nation", "customer", "orders", "lineitem", "supplier"
    )
    n1, n2 = "NATION_1", "NATION_2"
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name").isin(n1, n2))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t["customer"]
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name").isin(n1, n2))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    # exact integer revenue unit (cents x integer discount percent) so
    # the sum is order-independent across engines — see q_market_share
    rev_i = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100).cast("bigint")
        - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    return (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.sum(rev_i).alias("_vol_i"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .select(
            "supp_nation",
            "cust_nation",
            "ship_year",
            F.round(F.col("_vol_i") / 10000.0, 2).alias("volume"),
            "n_lineitems",
        )
    )


_ORACLE_NATION_TRADE = """
WITH agg AS (
  SELECT ns.n_name AS supp_nation,
         nc.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS ship_year,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS vol_i,
         COUNT(*) AS n_lineitems
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE ns.n_name IN ('NATION_1', 'NATION_2')
    AND nc.n_name IN ('NATION_1', 'NATION_2')
    AND ns.n_name != nc.n_name
  GROUP BY 1, 2, 3
)
SELECT supp_nation, cust_nation, ship_year,
       ROUND(vol_i / 10000.0, 2) AS volume,
       n_lineitems
FROM agg
"""


# --------------------------------------------------------------------------
# TPC-H Q8-style: one nation's market share within a product segment
# --------------------------------------------------------------------------

def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's share of PROMO-part revenue by order year — the TPC-H
    Q8 shape: a conditional-sum ratio (CASE inside SUM) over a five-way
    star join, the single-pass alternative to self-joining totals
    against a filtered subset.

    The nation tag rides a broadcast; the PROMO filter pushes into the
    ``part`` scan before its join. One aggregation computes numerator
    and denominator together — no second pass, no join of aggregates.
    Revenue accumulates in EXACT integer ten-thousandths of a dollar
    (price cents × integer discount percent — both exact in the data),
    so the sum is order-independent and the final ROUND can't flip on a
    half-cent boundary between engines (the q_above_avg_orders lesson;
    a double SUM here differed at the last cent at sf0.001).
    """
    t = load_tables(
        spark, sf_dir, "nation", "orders", "lineitem", "supplier", "part"
    )
    promo = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    # exact integer revenue unit: cents * (100 - discount_pct)
    rev_i = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100).cast("bigint")
        - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    nation_i = F.when(
        F.col("supp_nation") == "NATION_3", rev_i
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        t["lineitem"]
        .join(promo, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(rev_i).alias("_tot_i"), F.sum(nation_i).alias("_nat_i")
        )
        .select(
            "order_year",
            F.round(F.col("_tot_i") / 10000.0, 2).alias("total_revenue"),
            F.round(F.col("_nat_i") / 10000.0, 2).alias("nation_revenue"),
            F.round(
                F.col("_nat_i").cast("double") / F.col("_tot_i"), 6
            ).alias("mkt_share"),
        )
    )


_ORACLE_MARKET_SHARE = """
WITH agg AS (
  SELECT CAST(year(o_orderdate) AS INT) AS order_year,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS tot_i,
         SUM(CASE WHEN n_name = 'NATION_3'
                  THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                  ELSE 0 END) AS nat_i
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_type = 'PROMO'
  GROUP BY 1
)
SELECT order_year,
       ROUND(tot_i / 10000.0, 2) AS total_revenue,
       ROUND(nat_i / 10000.0, 2) AS nation_revenue,
       ROUND(CAST(nat_i AS DOUBLE) / tot_i, 6) AS mkt_share
FROM agg
"""


# --------------------------------------------------------------------------
# Market-basket affinity: co-ordered part pairs with support and lift
# --------------------------------------------------------------------------

_BASKET_MIN_PAIR = 3  # co-occurrence support floor
_BASKET_TOPK = 20


def q_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets: which part pairs are
    co-ordered more than independence predicts — support counts and
    LIFT = P(a,b) / (P(a)·P(b)) for the top pairs, the recommendation /
    assortment primitive.

    Pair generation is keyed by the basket (self-join on l_orderkey),
    so fan-out is bounded by lines-per-order squared (~7² here), never
    |parts|² — the same bounded-block discipline as the dedup family.
    Item priors join back on the support-filtered pair table (hint-free
    — AQE sizes the build side); the final top-k is a TakeOrdered. All counts are exact integers; lift is one
    deterministic double expression rounded at the end.
    """
    li = (
        load_tables(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    # one-row basket count, broadcast — keeps the plan fully lazy
    n_orders = li.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_orders")
    )
    item = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count(F.lit(1)).alias("n_item")
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= _BASKET_MIN_PAIR)
    )
    lift = (
        F.col("n_pair").cast("double")
        * F.col("n_orders")
        / (F.col("n_a").cast("double") * F.col("n_b"))
    )
    # no broadcast hint on the item priors: their cardinality is
    # O(|part|), unbounded at 100 TB. pairs is already support-filtered
    # (the small side after _BASKET_MIN_PAIR), so AQE picks the right
    # strategy per scale instead of a hint forcing an over-limit build
    return (
        pairs.join(item.withColumnRenamed("part", "part_a"), "part_a")
        .withColumnRenamed("n_item", "n_a")
        .join(item.withColumnRenamed("part", "part_b"), "part_b")
        .withColumnRenamed("n_item", "n_b")
        .crossJoin(F.broadcast(n_orders))
        .withColumn("lift", F.round(lift, 6))
        .orderBy(
            F.col("lift").desc(), F.col("part_a").asc(), F.col("part_b").asc()
        )
        .limit(_BASKET_TOPK)
        .select("part_a", "part_b", "n_pair", "n_a", "n_b", "lift")
    )


_ORACLE_BASKET_AFFINITY = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM li
), item AS (
  SELECT l_partkey AS part, CAST(COUNT(*) AS BIGINT) AS n_item
  FROM li GROUP BY 1
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_BASKET_MIN_PAIR}
)
SELECT part_a, part_b, n_pair,
       ia.n_item AS n_a, ib.n_item AS n_b,
       ROUND(CAST(n_pair AS DOUBLE) * n_orders
             / (CAST(ia.n_item AS DOUBLE) * ib.n_item), 6) AS lift
FROM pairs
JOIN item ia ON ia.part = part_a
JOIN item ib ON ib.part = part_b
CROSS JOIN n
ORDER BY lift DESC, part_a ASC, part_b ASC
LIMIT {_BASKET_TOPK}
"""


# --------------------------------------------------------------------------
# Revenue concentration: per-segment Gini coefficient
# --------------------------------------------------------------------------

def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-revenue inequality per market segment: the Gini
    coefficient G = (2·Σᵢ i·xᵢ)/(n·Σx) − (n+1)/n over each segment's
    rank-ordered customer revenues — the concentration metric behind
    'what share of revenue depends on how few customers'.

    Per-customer revenue accumulates in exact integer cents; the rank
    is a window WITHIN each segment (partitioned, never global), and
    Σ i·xᵢ / Σx / n are integer aggregates per segment — so the final
    double arithmetic is identical across engines. Two shuffles total:
    the per-customer aggregate and the per-segment rank/reduce.
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    cust_rev = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.sum(cents).alias("rev_c"))
        .join(
            t["customer"].select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"), "o_custkey", "rev_c"
        )
    )
    w = Window.partitionBy("segment").orderBy(
        F.col("rev_c").asc(), F.col("o_custkey").asc()
    )
    ranked = cust_rev.withColumn("i", F.row_number().over(w))
    agg = ranked.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev_c").alias("_sum_c"),
        F.sum(F.col("i").cast("bigint") * F.col("rev_c")).alias("_isum_c"),
    )
    n = F.col("n_customers").cast("double")
    gini = (
        F.lit(2.0) * F.col("_isum_c") / (n * F.col("_sum_c"))
        - (n + 1.0) / n
    )
    return agg.select(
        "segment",
        "n_customers",
        F.round(F.col("_sum_c") / 100.0, 2).alias("total_revenue"),
        F.round(gini, 6).alias("gini"),
    )


_ORACLE_REVENUE_GINI = """
WITH cust_rev AS (
  SELECT c_mktsegment AS segment, o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY segment
             ORDER BY rev_c ASC, o_custkey ASC) AS i
  FROM cust_rev
), agg AS (
  SELECT segment,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         SUM(rev_c) AS sum_c,
         SUM(i * rev_c) AS isum_c
  FROM ranked GROUP BY 1
)
SELECT segment, n_customers,
  ROUND(sum_c / 100.0, 2) AS total_revenue,
  ROUND(2.0 * isum_c / (CAST(n_customers AS DOUBLE) * sum_c)
        - (n_customers + 1.0) / n_customers, 6) AS gini
FROM agg
"""


# --------------------------------------------------------------------------
# Z-order layout statistics: Morton-curve clustering for data skipping
# --------------------------------------------------------------------------

_Z_BITS = 5  # 32 range buckets per dimension -> 1024 Morton cells
_Z_FILES = 16  # contiguous Morton ranges -> target files


def q_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-curve (Z-order) clustering of ``lineitem`` on
    (l_partkey, l_suppkey): per target file, the covered bucket ranges of
    BOTH dimensions plus the covered-cell area — the statistics that
    prove every file spans a narrow square of the key grid, so min/max
    footer stats prune scans filtered on EITHER column.

    The whole layout computation (range-bucket, bit interleave, file
    assignment — operators/layout.py) is exact integer arithmetic emitted
    identically for Spark and DuckDB, so the oracle hash-checks the
    layout itself, not a proxy. Plan shape: one broadcast min/max
    aggregate, map-side bucket/Morton math, one groupBy over ``n_files``
    groups. The materialized write path (write_zordered) is pinned by
    tests/test_layout.py.
    """
    from gcp_healthcare_data_pipeline_spark.operators.layout import (
        zorder_assign,
    )

    li = load_tables(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    assigned = zorder_assign(
        li, "l_partkey", "l_suppkey", bits=_Z_BITS, n_files=_Z_FILES
    )
    return (
        assigned.groupBy(F.col("_zfile").alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_za").alias("a_min"),
            F.max("_za").alias("a_max"),
            F.min("_zb").alias("b_min"),
            F.max("_zb").alias("b_max"),
        )
        .withColumn(
            "span_cells",
            (F.col("a_max") - F.col("a_min") + 1)
            * (F.col("b_max") - F.col("b_min") + 1),
        )
    )


def _zorder_oracle() -> str:
    from gcp_healthcare_data_pipeline_spark.operators.layout import (
        bucket_sql,
        morton_sql,
    )

    za = bucket_sql("l_partkey", "amin", "amax", _Z_BITS, "duck")
    zb = bucket_sql("l_suppkey", "bmin", "bmax", _Z_BITS, "duck")
    per_file = (1 << (2 * _Z_BITS)) // _Z_FILES
    return f"""
WITH stats AS (
  SELECT MIN(l_partkey) AS amin, MAX(l_partkey) AS amax,
         MIN(l_suppkey) AS bmin, MAX(l_suppkey) AS bmax
  FROM lineitem
), bucketed AS (
  SELECT {za} AS za, {zb} AS zb FROM lineitem CROSS JOIN stats
), coded AS (
  SELECT za, zb, {morton_sql("za", "zb", _Z_BITS)} AS zval FROM bucketed
)
SELECT zval // {per_file} AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(za) AS a_min, MAX(za) AS a_max,
       MIN(zb) AS b_min, MAX(zb) AS b_max,
       (MAX(za) - MIN(za) + 1) * (MAX(zb) - MIN(zb) + 1) AS span_cells
FROM coded GROUP BY 1
"""


def q_fanout_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join fan-out profile for the orders→lineitem one-to-many: the
    full distribution of lines-per-order (histogram rows) plus exact
    p50/p95/max context on every row — the companion to
    q_skew_diagnose's hottest-keys view, and the number you check
    before trusting any per-order explode or interval fan-out estimate.

    Two tiny aggregations over one scan: per-order counts (bounded by
    |orders|), then the |distinct fan-out|-row histogram; percentile
    context rides a broadcast one-row aggregate.
    """
    li = load_tables(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    ctx = per_order.agg(
        F.expr("percentile(n_lines, 0.5)").alias("p50"),
        F.expr("percentile(n_lines, 0.95)").alias("p95"),
        F.max("n_lines").alias("max_lines"),
    )
    return (
        per_order.groupBy("n_lines")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .crossJoin(F.broadcast(ctx))
        .select(
            "n_lines",
            "n_orders",
            F.round("p50", 4).alias("p50"),
            F.round("p95", 4).alias("p95"),
            "max_lines",
        )
    )


_ORACLE_FANOUT_PROFILE = """
WITH per_order AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY 1
), ctx AS (
  SELECT quantile_cont(n_lines::DOUBLE, 0.5) AS p50,
         quantile_cont(n_lines::DOUBLE, 0.95) AS p95,
         MAX(n_lines) AS max_lines
  FROM per_order
)
SELECT n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(p50, 4) AS p50, ROUND(p95, 4) AS p95, max_lines
FROM per_order CROSS JOIN ctx
GROUP BY 1, p50, p95, max_lines
"""


def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply concentration per nation: the Herfindahl–Hirschman index
    (Σ shareᵢ², share = supplier's fraction of the nation's line
    revenue) — the market-concentration metric (HHI > 0.25 ≈ highly
    concentrated), the squared-share companion to the rank-based Gini.

    Per-(nation, supplier) revenue accumulates in exact integer revenue
    units; shares and the squared-sum reduce per nation from integer
    aggregates, so both engines run identical double arithmetic. Two
    aggregations and one broadcast dim join — no windows at all.
    """
    t = load_tables(spark, sf_dir, "nation", "supplier", "lineitem")
    rev_i = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100).cast("bigint")
        - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    supp = t["supplier"].join(
        F.broadcast(t["nation"]),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    per_supp = (
        t["lineitem"]
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", "s_suppkey")
        .agg(F.sum(rev_i).alias("rev_i"))
    )
    return (
        per_supp.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("rev_i").alias("_tot"),
            F.sum(
                F.col("rev_i").cast("double") * F.col("rev_i")
            ).alias("_sq"),
        )
        .select(
            "nation",
            "n_suppliers",
            F.round(F.col("_tot") / 10000.0, 2).alias("total_revenue"),
            F.round(
                F.col("_sq")
                / (F.col("_tot").cast("double") * F.col("_tot")),
                6,
            ).alias("hhi"),
        )
    )


_ORACLE_SUPPLIER_HHI = """
WITH per_supp AS (
  SELECT n_name AS nation, s_suppkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_i
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT nation,
  CAST(COUNT(*) AS BIGINT) AS n_suppliers,
  ROUND(SUM(rev_i) / 10000.0, 2) AS total_revenue,
  ROUND(SUM(CAST(rev_i AS DOUBLE) * rev_i)
        / (CAST(SUM(rev_i) AS DOUBLE) * SUM(rev_i)), 6) AS hhi
FROM per_supp
GROUP BY 1
"""


def q_catalog_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assortment coverage per part type: how much of the catalog has
    EVER been ordered — dead-stock share, mean order depth over the
    covered portion — the inverse view of the customers-without-orders
    anti-join, aggregated to a merchandising report.

    One left join from the catalog to per-part order counts (the fact
    side pre-aggregates to |parts| rows before joining, so the join is
    dim-sized on both sides), then a per-type rollup. No windows.
    """
    t = load_tables(spark, sf_dir, "part", "lineitem")
    per_part = t["lineitem"].groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    j = t["part"].select("p_partkey", "p_type").join(
        per_part, F.col("p_partkey") == F.col("l_partkey"), "left"
    )
    never = F.col("n_lines").isNull().cast("bigint")
    return j.groupBy(F.col("p_type").alias("part_type")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(never).alias("n_never_ordered"),
        F.round(
            F.lit(1.0) - F.sum(never).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("coverage"),
        F.round(
            F.avg(F.col("n_lines").cast("double")), 4
        ).alias("avg_lines_when_ordered"),
    )


_ORACLE_CATALOG_COVERAGE = """
WITH per_part AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY 1
)
SELECT p_type AS part_type,
  CAST(COUNT(*) AS BIGINT) AS n_parts,
  CAST(SUM(CASE WHEN n_lines IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_never_ordered,
  ROUND(1.0 - CAST(SUM(CASE WHEN n_lines IS NULL THEN 1 ELSE 0 END)
                   AS DOUBLE) / COUNT(*), 6) AS coverage,
  ROUND(AVG(CAST(n_lines AS DOUBLE)), 4) AS avg_lines_when_ordered
FROM part LEFT JOIN per_part ON p_partkey = l_partkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# TPC-H Q4-style: EXISTS correlated semi-join on late-shipping orders
# --------------------------------------------------------------------------

def q_priority_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: COUNT orders per priority WHERE EXISTS a lineitem
    violating the shipping SLA (shipped > 20 days after order date) —
    the correlated-EXISTS pattern expressed as a LEFT SEMI join.

    The semi join shuffles on the equi key (orderkey) and applies the
    date-band predicate inside the join; the quarter filter pushes into
    the orders scan. A semi join never duplicates the left side, so the
    count needs no DISTINCT — the property EXISTS gives you for free and
    an inner join would not.
    """
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    sla_violated = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 20 DAYS")),
        "left_semi",
    )
    return sla_violated.groupBy(
        F.col("o_orderpriority").alias("order_priority")
    ).agg(F.count(F.lit(1)).alias("order_count"))


_ORACLE_PRIORITY_LATE_EXISTS = """
SELECT o_orderpriority AS order_priority,
       COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 20 DAY)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# TPC-H Q11-style: group-HAVING against a global scalar aggregate
# --------------------------------------------------------------------------

def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds a FRACTION of the
    global total — a per-group aggregate filtered against a whole-table
    scalar (HAVING SUM(...) > global * 0.001).

    Revenue accumulates in exact integer ten-thousandths (cents x
    integer discount percent, the q_market_share discipline), and the
    threshold compares integers (value_i * n_parts * 10 > 14 *
    total_i, i.e. parts above 1.4x the MEAN part value) so no float sum-order
    difference can flip membership at the boundary — and the cut is
    scale-invariant: it selects the same fraction-of-distribution at
    sf0.001 and at 100 TB, where TPC-H's fixed 0.0001 fraction returns
    nothing below full scale. The global total is a 1-row broadcast —
    the same partial aggregation pass Catalyst already runs, reused.
    """
    li = load_tables(spark, sf_dir, "lineitem")
    rev_i = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100).cast("bigint")
        - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.sum(rev_i).alias("_value_i")
    )
    total = per_part.agg(
        F.sum("_value_i").alias("_total_i"),
        F.count(F.lit(1)).alias("_n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("_value_i") * F.col("_n_parts") * 10
            > F.col("_total_i") * 14
        )
        .select(
            "part_key",
            # exact: value_i < 2^53, so bigint->double is lossless and
            # one IEEE division is bit-identical in both engines — a
            # ROUND(...,2) here can flip on x.xx5 ties (value_i is exact
            # ten-thousandths, so ties are COMMON, not corner cases)
            (F.col("_value_i") / 10000.0).alias("part_value"),
        )
    )


_ORACLE_IMPORTANT_PARTS = """
WITH per_part AS (
  SELECT l_partkey AS part_key,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS value_i
  FROM lineitem GROUP BY 1
), total AS (
  SELECT SUM(value_i) AS total_i, COUNT(*) AS n_parts FROM per_part
)
SELECT part_key, value_i / 10000.0 AS part_value
FROM per_part CROSS JOIN total
WHERE value_i * n_parts * 10 > total_i * 14
"""


# --------------------------------------------------------------------------
# TPC-H Q15-style: top supplier(s) by windowed revenue (view + MAX)
# --------------------------------------------------------------------------

def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a revenue 'view' per supplier over one quarter,
    then the supplier(s) whose revenue EQUALS the view's maximum — the
    aggregate-of-aggregate pattern (ties all returned, like the spec).

    Same exact-integer revenue units, so the equality against MAX is an
    integer compare (a double == double would be engine-fragile). The
    max is a 1-row broadcast against the (already small) per-supplier
    aggregate; supplier names ride a broadcast dim join.
    """
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    rev_i = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100).cast("bigint")
        - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_key"))
        .agg(F.sum(rev_i).alias("_rev_i"))
    )
    top = revenue.agg(F.max("_rev_i").alias("_max_i"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("_rev_i") == F.col("_max_i"))
        .join(
            F.broadcast(t["supplier"]),
            F.col("supplier_key") == F.col("s_suppkey"),
        )
        .select(
            "supplier_key",
            F.col("s_name").alias("supplier_name"),
            (F.col("_rev_i") / 10000.0).alias("total_revenue"),
        )
    )


_ORACLE_TOP_SUPPLIER = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_key,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_i
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT supplier_key, s_name AS supplier_name,
       rev_i / 10000.0 AS total_revenue
FROM revenue JOIN supplier ON supplier_key = s_suppkey
WHERE rev_i = (SELECT MAX(rev_i) FROM revenue)
"""


# --------------------------------------------------------------------------
# TPC-H Q21-style: multi-correlated semi + anti join (waiting suppliers)
# --------------------------------------------------------------------------

def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers of NATION_5 who were the SOLE late
    supplier on a finished multi-supplier order — one correlated EXISTS
    (another supplier participated) and one correlated NOT EXISTS (no
    other supplier was late), composed as LEFT SEMI + LEFT ANTI joins
    with a non-equi residual (suppkey <>) on the orderkey shuffle key.

    'Late' = shipped > 30 days after order date. The per-order line set
    is shuffled once on orderkey and reused by candidate generation and
    both correlated probes; nation/supplier dims are broadcast. Count is
    per supplier over DISTINCT (order, supplier) candidacy.
    """
    t = load_tables(
        spark, sf_dir, "orders", "lineitem", "supplier", "nation"
    )
    fo = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    lines = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(fo, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "is_late",
            F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 30 DAYS"),
        )
        .select("l_orderkey", "l_suppkey", "is_late")
    )
    cand = (
        lines.filter(F.col("is_late"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    others = lines.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
        "is_late",
    )
    # EXISTS: another supplier has a line on the same order
    cand = cand.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    # NOT EXISTS: no OTHER supplier was late on that order
    cand = cand.join(
        others.filter(F.col("is_late")),
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_anti",
    )
    nation5 = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].filter(F.col("n_name") == "NATION_5")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        cand.join(
            F.broadcast(nation5), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy(F.col("s_name").alias("supplier_name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


_ORACLE_WAITING_SUPPLIERS = """
WITH fo AS (
  SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
), l AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 30 DAY AS is_late
  FROM lineitem JOIN fo ON l_orderkey = o_orderkey
), cand AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM l WHERE is_late
)
SELECT s_name AS supplier_name, COUNT(*) AS numwait
FROM cand c
JOIN supplier s ON c.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_5'
WHERE EXISTS (SELECT 1 FROM l l2
              WHERE l2.l_orderkey = c.l_orderkey
                AND l2.l_suppkey <> c.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l l3
                  WHERE l3.l_orderkey = c.l_orderkey
                    AND l3.l_suppkey <> c.l_suppkey
                    AND l3.is_late)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# TPC-H Q17-style: correlated scalar AVG per part (small-quantity revenue)
# --------------------------------------------------------------------------

def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lines whose quantity is below 20%
    of the part's own average quantity — the correlated-scalar-AVG
    pattern (``l_quantity < (SELECT 0.2*AVG(..) WHERE l2.partkey =
    p.partkey)``), decorrelated as a per-part aggregate joined back to
    the fact on the same shuffle key; grouped by brand over ECONOMY
    parts so the signature is a rows-per-brand vector, not one scalar.

    Exactness: quantities are integer-valued, so the 20%-of-avg cut
    compares integers (qty*5*cnt < sum_qty — avg never materialized as
    a float), and revenue accumulates as exact bigint cents; the only
    float ops are one lossless bigint->double and one IEEE division by
    700.0 (Q17's yearly divisor), bit-identical in both engines.

    100 TB shape: ONE shuffle of the fact on l_partkey feeds both the
    per-part aggregate and the join back (Catalyst reuses the
    exchange); the part dim prunes to one p_type and broadcasts.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    econ = t["part"].filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey", "p_brand"
    )
    li = t["lineitem"].select(
        "l_partkey",
        F.round(F.col("l_quantity")).cast("bigint").alias("qty_i"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias(
            "price_cents"
        ),
    ).join(F.broadcast(econ), F.col("l_partkey") == F.col("p_partkey"))
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum("qty_i").alias("_sum_qty"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    return (
        li.join(per_part, F.col("l_partkey") == F.col("pp_key"))
        .filter(
            F.col("qty_i") * F.lit(5) * F.col("_cnt") < F.col("_sum_qty")
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            (F.sum("price_cents") / F.lit(700.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


_ORACLE_SMALL_QUANTITY_REVENUE = """
WITH li AS (
  SELECT l_partkey, p_brand,
         CAST(ROUND(l_quantity) AS BIGINT) AS qty_i,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'ECONOMY'
), per_part AS (
  SELECT l_partkey AS pp_key, SUM(qty_i) AS sum_qty, COUNT(*) AS cnt
  FROM li GROUP BY 1
)
SELECT p_brand AS brand,
       CAST(SUM(price_cents) AS BIGINT) / 700.0 AS avg_yearly,
       COUNT(*) AS n_small_lines
FROM li JOIN per_part ON l_partkey = pp_key
WHERE qty_i * 5 * cnt < sum_qty
GROUP BY 1
"""


# --------------------------------------------------------------------------
# TPC-H Q20-style: nested semi-join with a correlated scalar threshold
# --------------------------------------------------------------------------

def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers (in one region) who DOMINATED supply
    of some red part in 1996 — ``s_suppkey IN (SELECT .. GROUP BY
    supp,part HAVING SUM(qty) > 0.3 * <correlated per-part total>)``,
    the nested-IN + correlated-scalar pattern (the reference's partsupp
    availability threshold re-expressed over shipped quantities, since
    the test schema has no partsupp table).

    Decorrelation: one shuffle of the 1996 red-part lines on
    (suppkey, partkey) builds the inner aggregate; the per-part total
    re-aggregates THAT (tiny) result rather than rescanning the fact;
    the dominance cut compares exact integers (sp*10 > 3*total); the
    outer IN becomes a LEFT SEMI against the supplier dim, with the
    nation->region chain broadcast.
    """
    t = load_tables(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    red = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    l96 = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_suppkey",
            "l_partkey",
            F.round(F.col("l_quantity")).cast("bigint").alias("qty_i"),
        )
    )
    sp = l96.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("qty_i").alias("_sp_qty")
    )
    pt = sp.groupBy(F.col("l_partkey").alias("pt_key")).agg(
        F.sum("_sp_qty").alias("_pt_qty")
    )
    dominant = (
        sp.join(pt, F.col("l_partkey") == F.col("pt_key"))
        .filter(F.col("_sp_qty") * 10 > F.col("_pt_qty") * 3)
        .select("l_suppkey")
    )
    europe = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    return (
        t["supplier"]
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(
            F.broadcast(europe),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation_name"),
            F.col("s_suppkey").alias("supplier_key"),
            F.col("s_name").alias("supplier_name"),
        )
    )


_ORACLE_DOMINANT_SUPPLIERS = """
WITH l96 AS (
  SELECT l_suppkey, l_partkey, CAST(ROUND(l_quantity) AS BIGINT) AS qty_i
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
), sp AS (
  SELECT l_suppkey, l_partkey, SUM(qty_i) AS sp_qty FROM l96 GROUP BY 1, 2
), pt AS (
  SELECT l_partkey, SUM(sp_qty) AS pt_qty FROM sp GROUP BY 1
)
SELECT n_name AS nation_name, s_suppkey AS supplier_key,
       s_name AS supplier_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
WHERE s_suppkey IN (
  SELECT sp.l_suppkey FROM sp JOIN pt USING (l_partkey)
  WHERE sp.sp_qty * 10 > pt.pt_qty * 3)
"""


# --------------------------------------------------------------------------
# TPC-H Q1-style: full-scan pricing summary (the map-side-combine workhorse)
# --------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the wide multi-aggregate pricing report per
    (returnflag, linestatus) — eight aggregates in ONE scan pass.

    All money/quantity math in exact integer units (cents, percent):
    sum_charge accumulates cents x (100-disc) x (100+tax) as bigint
    (< 2^53 per row, < 2^63 summed at any plausible sf), and every
    reported average is ONE IEEE division of exact operands — no float
    accumulation anywhere, so the hash is partition-order-free.

    At 100 TB this is the best-case distributed aggregate: 6 grouping
    keys total, so partial (map-side) aggregation collapses each input
    partition to ≤6 rows before the one tiny exchange; the date filter
    pushes into the parquet scan.
    """
    li = load_tables(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp")
    )
    qty_i = F.round(F.col("l_quantity")).cast("bigint")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_i = F.round(F.col("l_discount") * 100).cast("bigint")
    tax_i = F.round(F.col("l_tax") * 100).cast("bigint")
    return (
        li.groupBy(
            F.col("l_returnflag").alias("return_flag"),
            F.col("l_linestatus").alias("line_status"),
        )
        .agg(
            F.sum(qty_i).alias("sum_qty"),
            (F.sum(cents) / 100.0).alias("sum_base_price"),
            (F.sum(cents * (F.lit(100) - disc_i)) / 10000.0).alias(
                "sum_disc_price"
            ),
            (
                F.sum(cents * (F.lit(100) - disc_i) * (F.lit(100) + tax_i))
                / 1000000.0
            ).alias("sum_charge"),
            (F.sum(qty_i) / F.count(F.lit(1)).cast("double")).alias(
                "avg_qty"
            ),
            (F.sum(cents) / (F.count(F.lit(1)) * F.lit(100)).cast("double"))
            .alias("avg_price"),
            (F.sum(disc_i) / (F.count(F.lit(1)) * F.lit(100)).cast("double"))
            .alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_ORACLE_PRICING_SUMMARY = """
WITH li AS (
  SELECT l_returnflag, l_linestatus,
         CAST(ROUND(l_quantity) AS BIGINT) AS qty_i,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_i,
         CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_i
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
)
SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
       CAST(SUM(qty_i) AS BIGINT) AS sum_qty,
       CAST(SUM(cents) AS BIGINT) / 100.0 AS sum_base_price,
       CAST(SUM(cents * (100 - disc_i)) AS BIGINT) / 10000.0
         AS sum_disc_price,
       CAST(SUM(cents * (100 - disc_i) * (100 + tax_i)) AS BIGINT)
         / 1000000.0 AS sum_charge,
       CAST(SUM(qty_i) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
       CAST(SUM(cents) AS BIGINT) / CAST(COUNT(*) * 100 AS DOUBLE)
         AS avg_price,
       CAST(SUM(disc_i) AS BIGINT) / CAST(COUNT(*) * 100 AS DOUBLE)
         AS avg_disc,
       COUNT(*) AS count_order
FROM li GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# TPC-H Q6-style: pushed-predicate scan + forecast-revenue aggregate
# --------------------------------------------------------------------------

def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue increase if small-quantity 1996
    discounts had been dropped — a pure filter-and-aggregate whose
    entire predicate (date band, discount band, quantity cap) pushes
    into the parquet scan; grouped by the integer discount percent so
    each band lands in its own hash-checked row.

    Revenue = Σ price x discount in exact ten-thousandths. The
    discount-band predicate compares INTEGER percents — the float form
    (l_discount BETWEEN 0.05 AND 0.07) is the classic Q6 trap, since
    0.05/0.07 have no exact binary representation and engines disagree
    on the boundary rows.
    """
    li = load_tables(spark, sf_dir, "lineitem")
    disc_i = F.round(F.col("l_discount") * 100).cast("bigint")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.round(F.col("l_quantity")).cast("bigint") < 24)
        )
        .filter(disc_i.between(5, 7))
        .groupBy(disc_i.alias("discount_pct"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum(cents * disc_i) / 10000.0).alias("revenue_increase"),
        )
    )


_ORACLE_FORECAST_REVENUE = """
WITH li AS (
  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_i,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
    AND CAST(ROUND(l_quantity) AS BIGINT) < 24
)
SELECT disc_i AS discount_pct, COUNT(*) AS n_lines,
       CAST(SUM(cents * disc_i) AS BIGINT) / 10000.0 AS revenue_increase
FROM li WHERE disc_i BETWEEN 5 AND 7 GROUP BY 1
"""


# --------------------------------------------------------------------------
# TPC-H Q10-style: returned-item loss, top-k customers
# --------------------------------------------------------------------------

def q_returned_item_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who cost the most in returned
    items over one quarter — fact-to-orders join on the orderkey
    shuffle, customer + nation dims broadcast, then top-k via
    ``orderBy().limit()`` which compiles to TakeOrderedAndProject
    (per-partition heaps + a 20-row driver merge, never a global sort).

    Revenue is exact integer ten-thousandths, and the ordering
    tie-breaks on custkey so the top-20 MEMBERSHIP is deterministic in
    both engines (a bare ORDER BY revenue LIMIT 20 can differ across
    engines when row 20 and 21 tie).
    """
    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    rev_i = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100).cast("bigint")
        - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", rev_i.alias("rev_i"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("rev_i").alias("_rev_i"))
    )
    return (
        per_cust.join(
            F.broadcast(t["customer"]),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("c_custkey").alias("customer_key"),
            F.col("c_name").alias("customer_name"),
            F.col("n_name").alias("nation_name"),
            (F.col("_rev_i") / 10000.0).alias("lost_revenue"),
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("customer_key"))
        .limit(20)
    )


_ORACLE_RETURNED_ITEM_LOSS = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_i
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT c_custkey AS customer_key, c_name AS customer_name,
       n_name AS nation_name, rev_i / 10000.0 AS lost_revenue
FROM per_cust
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY lost_revenue DESC, customer_key LIMIT 20
"""


# --------------------------------------------------------------------------
# TPC-H Q14-style: conditional-sum ratio per month (promo revenue share)
# --------------------------------------------------------------------------

def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the percentage of each 1996 month's revenue
    that came from PROMO parts — numerator (CASE-gated sum) and
    denominator computed in the SAME aggregation pass, never two scans.

    Both sums are exact bigint ten-thousandths; the share is
    numerator x 100 (still exact) divided once by the denominator —
    bit-identical across engines. Part dim joins hint-free on partkey
    (broadcast at test sf, AQE-planned at 100 TB where part scales).
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    rev_i = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100).cast("bigint")
        - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_partkey", F.month("l_shipdate").alias("ship_month"),
             rev_i.alias("rev_i"))
    joined = li.join(
        t["part"].select("p_partkey", "p_type"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo_i = F.when(F.col("p_type") == "PROMO", F.col("rev_i")).otherwise(
        F.lit(0).cast("bigint")
    )
    return joined.groupBy("ship_month").agg(
        (F.sum(promo_i) * F.lit(100) / F.sum("rev_i")).alias(
            "promo_share_pct"
        ),
        (F.sum("rev_i") / 10000.0).alias("total_revenue"),
    )


_ORACLE_PROMO_REVENUE_SHARE = """
WITH li AS (
  SELECT MONTH(l_shipdate) AS ship_month, p_type,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev_i
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
)
SELECT ship_month,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_i ELSE 0 END) * 100
            AS BIGINT) / CAST(SUM(rev_i) AS DOUBLE) AS promo_share_pct,
       CAST(SUM(rev_i) AS BIGINT) / 10000.0 AS total_revenue
FROM li GROUP BY 1
"""


# --------------------------------------------------------------------------
# TPC-H Q2-style: correlated MIN subquery over a derived partsupp relation
# --------------------------------------------------------------------------
# The test schema has no partsupp/shipmode/commitdate columns, so the Q2/
# Q9/Q12 shapes derive them deterministically (distinct (part, supp)
# pairs from lineitem; integer-hash supply cost; modular ship modes and
# date offsets) — pure arithmetic both engines replicate exactly, the
# q_pipeline_sf synthetic-feed discipline. The SHAPES are the point:
# correlated MIN, multi-way profit rollup, conditional class counts.

def _supply_cost_cents() -> "F.Column":
    """Deterministic integer supply cost per (part, supplier) pair."""
    return (
        F.col("l_partkey") * 31 + F.col("l_suppkey") * 17
    ) % 10000 + 1


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each SMALL part, the EUROPE supplier(s)
    offering it at the region's MINIMUM derived supply cost — the
    correlated-MIN-subquery pattern (``ps_supplycost = (SELECT MIN(..)
    WHERE ps_partkey = p_partkey AND <region>)``), decorrelated as a
    per-part MIN aggregate joined back on (part, cost) equality; cost
    is an exact integer so the equality never wobbles and ties keep
    every minimal supplier, like the spec.

    The partsupp relation is the DISTINCT (partkey, suppkey) projection
    of lineitem — one shuffle, reused by both the MIN aggregate and the
    join back; supplier->nation->region prune-then-broadcast.
    """
    t = load_tables(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    europe_supp = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"]
                .join(
                    F.broadcast(
                        t["region"].filter(F.col("r_name") == "EUROPE")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
                .select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    ps = (
        t["lineitem"]
        .select(
            "l_partkey",
            "l_suppkey",
            _supply_cost_cents().alias("cost_cents"),
        )
        .distinct()
        .join(
            F.broadcast(europe_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    small = t["part"].filter(F.col("p_type") == "SMALL").select(
        "p_partkey", "p_name"
    )
    ps = ps.join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
    min_cost = ps.groupBy(F.col("l_partkey").alias("mc_key")).agg(
        F.min("cost_cents").alias("min_cents")
    )
    return (
        ps.join(
            min_cost,
            (F.col("l_partkey") == F.col("mc_key"))
            & (F.col("cost_cents") == F.col("min_cents")),
        )
        .select(
            F.col("l_partkey").alias("part_key"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supplier_name"),
            F.col("n_name").alias("nation_name"),
            (F.col("cost_cents") / 100.0).alias("supply_cost"),
        )
    )


_ORACLE_MIN_COST_SUPPLIER = """
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey,
         (l_partkey * 31 + l_suppkey * 17) % 10000 + 1 AS cost_cents
  FROM lineitem
), eps AS (
  SELECT ps.*, s_name, n_name
  FROM ps
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
), sp AS (
  SELECT eps.*, p_name FROM eps
  JOIN part ON l_partkey = p_partkey AND p_type = 'SMALL'
)
SELECT l_partkey AS part_key, p_name AS part_name,
       s_name AS supplier_name, n_name AS nation_name,
       cost_cents / 100.0 AS supply_cost
FROM sp
WHERE cost_cents = (SELECT MIN(cost_cents) FROM sp sp2
                    WHERE sp2.l_partkey = sp.l_partkey)
"""


# --------------------------------------------------------------------------
# TPC-H Q9-style: multi-way profit rollup by nation and year
# --------------------------------------------------------------------------

def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) for
    'bolt' parts — revenue minus derived supply cost x quantity, the
    five-way join + computed-measure rollup. All terms exact integer
    ten-thousandths (rev_i as elsewhere; cost_cents x qty x 100 lifts
    cost into the same unit), one lossless final division.

    The fact joins orders on the orderkey shuffle for the year; part
    (name-pruned) and supplier->nation broadcast.
    """
    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "part", "supplier", "nation"
    )
    bolts = t["part"].filter(F.col("p_name").like("%bolt%")).select(
        "p_partkey"
    )
    supp_nation = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    rev_i = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100).cast("bigint")
        - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    profit_i = rev_i - (
        _supply_cost_cents().cast("bigint")
        * F.round(F.col("l_quantity")).cast("bigint")
        * F.lit(100).cast("bigint")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(bolts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(supp_nation),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            t["orders"].select("o_orderkey", F.year("o_orderdate").alias(
                "order_year"
            )),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("n_name").alias("nation_name"), "order_year")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum(profit_i) / 10000.0).alias("profit"),
        )
    )


_ORACLE_PRODUCT_PROFIT = """
SELECT n_name AS nation_name,
       YEAR(o_orderdate) AS order_year,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                - ((l_partkey * 31 + l_suppkey * 17) % 10000 + 1)
                  * CAST(ROUND(l_quantity) AS BIGINT) * 100)
            AS BIGINT) / 10000.0 AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# TPC-H Q12-style: shipmode SLA audit with conditional priority counts
# --------------------------------------------------------------------------

def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: for the cheap ship modes (MAIL/SHIP, derived
    modularly from the line identity), count high- vs low-priority
    orders among 1996-received lines that MISSED their commit date —
    the conditional-CASE-count pair over a date-predicate join.

    Derived columns: ship_mode = one of 7 modes by (orderkey +
    linenumber) % 7; commit = shipdate + (partkey%30 - 15) days;
    receipt = shipdate + (suppkey%10 + 1) days. Integer day offsets on
    DATE arithmetic — identical in both engines, no timezone math.
    """
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    mode_idx = (F.col("l_orderkey") + F.col("l_linenumber")) % 7
    ship_mode = (
        F.when(mode_idx == 0, "MAIL")
        .when(mode_idx == 1, "SHIP")
        .when(mode_idx == 2, "RAIL")
        .when(mode_idx == 3, "AIR")
        .when(mode_idx == 4, "TRUCK")
        .when(mode_idx == 5, "FOB")
        .otherwise("REG AIR")
    )
    ship_date = F.to_date("l_shipdate")
    commit_date = F.date_add(
        ship_date, (F.col("l_partkey") % 30 - 15).cast("int")
    )
    receipt_date = F.date_add(
        ship_date, (F.col("l_suppkey") % 10 + 1).cast("int")
    )
    li = (
        t["lineitem"]
        .select(
            "l_orderkey",
            ship_mode.alias("ship_mode"),
            commit_date.alias("commit_date"),
            receipt_date.alias("receipt_date"),
        )
        .filter(F.col("ship_mode").isin("MAIL", "SHIP"))
        .filter(
            (F.col("receipt_date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("receipt_date") < F.lit("1997-01-01").cast("date"))
        )
        .filter(F.col("commit_date") < F.col("receipt_date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            t["orders"].select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("ship_mode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


_ORACLE_SHIPMODE_PRIORITY = """
WITH li AS (
  SELECT l_orderkey,
         CASE (l_orderkey + l_linenumber) % 7
           WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' WHEN 2 THEN 'RAIL'
           WHEN 3 THEN 'AIR' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'FOB'
           ELSE 'REG AIR' END AS ship_mode,
         CAST(l_shipdate AS DATE)
           + CAST(l_partkey % 30 - 15 AS INT) * INTERVAL 1 DAY
           AS commit_date,
         CAST(l_shipdate AS DATE)
           + CAST(l_suppkey % 10 + 1 AS INT) * INTERVAL 1 DAY
           AS receipt_date
  FROM lineitem
)
SELECT ship_mode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM li JOIN orders ON l_orderkey = o_orderkey
WHERE ship_mode IN ('MAIL', 'SHIP')
  AND receipt_date >= DATE '1996-01-01'
  AND receipt_date <  DATE '1997-01-01'
  AND commit_date < receipt_date
GROUP BY 1
"""


# --------------------------------------------------------------------------
# TPC-H Q16-style: NOT-IN exclusion + COUNT DISTINCT rollup
# --------------------------------------------------------------------------

def q_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can ship each
    (type, size-band) of non-STANDARD part — with a NOT IN exclusion
    list of 'complaint' suppliers (name containing '7', the test
    schema's stand-in for Q16's LIKE '%Complaints%'; the supplier-part
    relation comes from lineitem since the schema has no partsupp).

    The NOT IN over a never-NULL key column is expressed as LEFT ANTI
    against the (tiny, broadcast) blacklist — same semantics, no
    driver-side collect. COUNT(DISTINCT suppkey) shuffles (type, band,
    suppkey) once with map-side dedup, then counts per group — Spark's
    two-phase distinct-aggregate, the plan that survives a 100x fact
    scale-up.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    p = t["part"].filter(F.col("p_type") != "STANDARD").select(
        "p_partkey", "p_type",
        F.floor(F.col("p_size") / 10).cast("int").alias("size_band"),
    )
    blacklist = t["supplier"].filter(F.col("s_name").contains("7")).select(
        "s_suppkey"
    )
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(blacklist),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_type").alias("part_type"), "size_band")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_ORACLE_PART_SUPPLIER_COUNTS = """
SELECT p_type AS part_type,
       CAST(FLOOR(p_size / 10.0) AS INT) AS size_band,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'STANDARD'
  AND l_suppkey NOT IN
    (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# TPC-H Q13-style: left-outer fan count -> distribution histogram
# --------------------------------------------------------------------------

def q_customer_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of customers by how many
    non-urgent orders they placed — a LEFT OUTER join with the filter in
    the JOIN CONDITION (not the WHERE clause, which would turn the outer
    join inner and silently drop zero-order customers), then two stacked
    aggregations (orders per customer, customers per order-count).

    At scale: the first groupBy reuses the join's hash partitioning on
    c_custkey (no second exchange); the histogram aggregate shuffles
    only the per-customer counts (one row per customer), and its key
    space (~tens of distinct counts) is tiny — partial map-side combine
    collapses it before the exchange.
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    o = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


_ORACLE_CUSTOMER_ORDER_DIST = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY 1
)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# TPC-H Q18-style: IN over a grouped-HAVING subquery (large-volume orders)
# --------------------------------------------------------------------------

def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind orders whose total lineitem
    quantity exceeds 250 units — ``o_orderkey IN (SELECT .. GROUP BY ..
    HAVING SUM(qty) > 250)`` built as the aggregate itself joined back
    (the HAVING output is both the filter and the total_qty payload, so
    no second pass over the fact).

    Quantities are integer-valued, so the HAVING cut and the reported
    totals are exact bigints; o_totalprice passes through untouched
    (same parquet bits in both engines, no float arithmetic). The big
    aggregate shuffles the fact once on orderkey and the orders join
    reuses that partitioning; the customer join shuffles only the
    ~0.1% surviving rows.
    """
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias(
                "total_qty"
            )
        )
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_custkey").alias("customer_key"),
            F.col("c_name").alias("customer_name"),
            F.col("o_orderkey").alias("order_key"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
            "total_qty",
        )
    )


_ORACLE_LARGE_VOLUME_CUSTOMERS = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
           AS total_qty
  FROM lineitem GROUP BY 1 HAVING total_qty > 250
)
SELECT c_custkey AS customer_key, c_name AS customer_name,
       o_orderkey AS order_key,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice AS total_price, total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --------------------------------------------------------------------------
# TPC-H Q19-style: equi join with a disjunctive (OR-of-ANDs) residual
# --------------------------------------------------------------------------

def q_disjunct_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd (type, size-band,
    quantity-band) predicate branches — the disjunctive residual that a
    naive planner turns into three scans + UNION. Here it's ONE equi
    join on partkey with the OR applied as a residual filter; the size
    bound (p_size <= 15 covers every branch) is a conjunct Catalyst
    pushes into the part scan, pruning ~70% of the dim before the join.

    Revenue in exact integer ten-thousandths (cents x integer discount
    percent); grouped by branch type so each OR arm is independently
    hash-pinned. Join is hint-free: at test sf the pruned part side
    broadcasts, at 100 TB (where part scales with SF) AQE picks the
    shuffle join — both plans honor the same pushed scan filter.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    p = t["part"].filter(F.col("p_size") <= 15).select(
        "p_partkey", "p_type", "p_size"
    )
    li = t["lineitem"].select(
        "l_partkey",
        F.round(F.col("l_quantity")).cast("bigint").alias("qty_i"),
        (
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (
                F.lit(100).cast("bigint")
                - F.round(F.col("l_discount") * 100).cast("bigint")
            )
        ).alias("rev_i"),
    )
    branch = (
        ((F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 5)
         & F.col("qty_i").between(1, 11))
        | ((F.col("p_type") == "SMALL") & (F.col("p_size") <= 10)
           & F.col("qty_i").between(10, 20))
        | ((F.col("p_type") == "MEDIUM") & (F.col("p_size") <= 15)
           & F.col("qty_i").between(20, 30))
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .groupBy(F.col("p_type").alias("part_type"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum("rev_i") / 10000.0).alias("revenue"),
        )
    )


_ORACLE_DISJUNCT_REVENUE = """
WITH li AS (
  SELECT l_partkey, CAST(ROUND(l_quantity) AS BIGINT) AS qty_i,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev_i
  FROM lineitem
)
SELECT p_type AS part_type, COUNT(*) AS n_lines,
       CAST(SUM(rev_i) AS BIGINT) / 10000.0 AS revenue
FROM li JOIN part ON l_partkey = p_partkey
WHERE (p_type = 'ECONOMY' AND p_size <= 5  AND qty_i BETWEEN 1 AND 11)
   OR (p_type = 'SMALL'   AND p_size <= 10 AND qty_i BETWEEN 10 AND 20)
   OR (p_type = 'MEDIUM'  AND p_size <= 15 AND qty_i BETWEEN 20 AND 30)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# TPC-H Q22-style: global-scalar threshold + NOT EXISTS anti join
# --------------------------------------------------------------------------

def q_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per-nation count/balance of customers from a
    fixed nation set whose balance beats the set's positive-balance
    average AND who placed no order since 2000 — a whole-table scalar
    aggregate feeding a threshold, composed with a NOT EXISTS expressed
    as LEFT ANTI (Q22's phone-country-code list becomes a nationkey
    list; its no-orders-at-all becomes no-recent-orders, since every
    test customer has some order).

    The average is never materialized as a float: ``bal_cents * n >
    sum_cents`` is an exact integer comparison (the q_above_avg_orders
    discipline), and the reported balance is an exact cents sum with
    one lossless final division. The scalar is a 1-row broadcast; the
    anti join shuffles only the date-pruned orders projection.
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    nations = [1, 3, 5, 7, 9, 11, 13]
    cust = t["customer"].filter(F.col("c_nationkey").isin(nations)).select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    pos = cust.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("_sum_cents"),
        F.count(F.lit(1)).alias("_n"),
    )
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(F.col("bal_cents") * F.col("_n") > F.col("_sum_cents"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_cents") / 100.0).alias("totacctbal"),
        )
    )


_ORACLE_DORMANT_RICH_CUSTOMERS = """
WITH cust AS (
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
), pos AS (
  SELECT CAST(SUM(bal_cents) AS BIGINT) AS sum_cents, COUNT(*) AS n
  FROM cust WHERE bal_cents > 0
)
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(bal_cents) AS BIGINT) / 100.0 AS totacctbal
FROM cust, pos
WHERE bal_cents * n > sum_cents
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
"""


QUERIES = [
    QuerySpec(
        "q_min_cost_supplier", q_min_cost_supplier,
        _ORACLE_MIN_COST_SUPPLIER,
        "ext:tpch-q2 (correlated MIN over derived partsupp, exact ties)",
    ),
    QuerySpec(
        "q_product_profit", q_product_profit, _ORACLE_PRODUCT_PROFIT,
        "ext:tpch-q9 (five-way profit rollup, exact integer measure)",
    ),
    QuerySpec(
        "q_shipmode_priority", q_shipmode_priority,
        _ORACLE_SHIPMODE_PRIORITY,
        "ext:tpch-q12 (derived shipmode SLA, conditional class counts)",
    ),
    QuerySpec(
        "q_pricing_summary", q_pricing_summary, _ORACLE_PRICING_SUMMARY,
        "ext:tpch-q1 (wide multi-aggregate, exact integer units)",
    ),
    QuerySpec(
        "q_forecast_revenue", q_forecast_revenue, _ORACLE_FORECAST_REVENUE,
        "ext:tpch-q6 (fully-pushed predicate scan, integer bands)",
    ),
    QuerySpec(
        "q_returned_item_loss", q_returned_item_loss,
        _ORACLE_RETURNED_ITEM_LOSS,
        "ext:tpch-q10 (top-k via TakeOrdered, deterministic ties)",
    ),
    QuerySpec(
        "q_promo_revenue_share", q_promo_revenue_share,
        _ORACLE_PROMO_REVENUE_SHARE,
        "ext:tpch-q14 (conditional-sum ratio, one pass)",
    ),
    QuerySpec(
        "q_part_supplier_counts", q_part_supplier_counts,
        _ORACLE_PART_SUPPLIER_COUNTS,
        "ext:tpch-q16 (NOT-IN exclusion + two-phase COUNT DISTINCT)",
    ),
    QuerySpec(
        "q_customer_order_dist", q_customer_order_dist,
        _ORACLE_CUSTOMER_ORDER_DIST,
        "ext:tpch-q13 (outer-join fan count -> histogram)",
    ),
    QuerySpec(
        "q_large_volume_customers", q_large_volume_customers,
        _ORACLE_LARGE_VOLUME_CUSTOMERS,
        "ext:tpch-q18 (IN over grouped HAVING, aggregate reused)",
    ),
    QuerySpec(
        "q_disjunct_revenue", q_disjunct_revenue,
        _ORACLE_DISJUNCT_REVENUE,
        "ext:tpch-q19 (disjunctive residual on one equi join)",
    ),
    QuerySpec(
        "q_dormant_rich_customers", q_dormant_rich_customers,
        _ORACLE_DORMANT_RICH_CUSTOMERS,
        "ext:tpch-q22 (global-scalar threshold + anti join)",
    ),
    QuerySpec(
        "q_small_quantity_revenue", q_small_quantity_revenue,
        _ORACLE_SMALL_QUANTITY_REVENUE,
        "ext:tpch-q17 (correlated scalar AVG per part, exact cut)",
    ),
    QuerySpec(
        "q_dominant_suppliers", q_dominant_suppliers,
        _ORACLE_DOMINANT_SUPPLIERS,
        "ext:tpch-q20 (nested IN + correlated scalar threshold)",
    ),
    QuerySpec(
        "q_priority_late_exists", q_priority_late_exists,
        _ORACLE_PRIORITY_LATE_EXISTS,
        "ext:tpch-q4 (correlated EXISTS as LEFT SEMI)",
    ),
    QuerySpec(
        "q_important_parts", q_important_parts, _ORACLE_IMPORTANT_PARTS,
        "ext:tpch-q11 (group HAVING vs global scalar, exact units)",
    ),
    QuerySpec(
        "q_top_supplier", q_top_supplier, _ORACLE_TOP_SUPPLIER,
        "ext:tpch-q15 (view + MAX aggregate-of-aggregate)",
    ),
    QuerySpec(
        "q_waiting_suppliers", q_waiting_suppliers,
        _ORACLE_WAITING_SUPPLIERS,
        "ext:tpch-q21 (multi-correlated SEMI + ANTI, non-equi residual)",
    ),
    QuerySpec(
        "q_regional_supplier_volume", q_regional_supplier_volume,
        _ORACLE_REGIONAL_SUPPLIER_VOLUME,
        "ext:star-join J1 A1 (TPC-H Q5 shape)",
    ),
    QuerySpec(
        "q_shipping_priority", q_shipping_priority,
        _ORACLE_SHIPPING_PRIORITY, "ext:top-k join (TPC-H Q3 shape)",
    ),
    QuerySpec(
        "q_dq_checks", q_dq_checks, _ORACLE_DQ_CHECKS,
        "ext:data-quality F2 C3 (single-scan check suite)",
    ),
    QuerySpec(
        "q_stable_ids", q_stable_ids, _ORACLE_STABLE_IDS,
        "ext:scale (global IDs without global sort)",
    ),
    QuerySpec(
        "q_cdc_apply", q_cdc_apply, _ORACLE_CDC_APPLY,
        "ext:cdc-apply J6-sibling (Type-1 MERGE with deletes)",
    ),
    QuerySpec(
        "q_skew_diagnose", q_skew_diagnose, _ORACLE_SKEW_DIAGNOSE,
        "ext:scale (shuffle-key skew profile)",
    ),
    QuerySpec(
        "q_zorder_stats", q_zorder_stats, _zorder_oracle(),
        "ext:layout (Morton-curve clustering for 2-D data skipping)",
    ),
    QuerySpec(
        "q_nation_trade", q_nation_trade, _ORACLE_NATION_TRADE,
        "ext:star-join (TPC-H Q7 shape, bilateral pair predicate)",
    ),
    QuerySpec(
        "q_market_share", q_market_share, _ORACLE_MARKET_SHARE,
        "ext:star-join (TPC-H Q8 shape, conditional-sum ratio)",
    ),
    QuerySpec(
        "q_basket_affinity", q_basket_affinity, _ORACLE_BASKET_AFFINITY,
        "ext:affinity (basket-bounded pair mining, support + lift)",
    ),
    QuerySpec(
        "q_revenue_gini", q_revenue_gini, _ORACLE_REVENUE_GINI,
        "ext:stats (per-segment Gini concentration, integer-exact)",
    ),
    QuerySpec(
        "q_fanout_profile", q_fanout_profile, _ORACLE_FANOUT_PROFILE,
        "ext:scale (join fan-out distribution + percentiles)",
    ),
    QuerySpec(
        "q_supplier_hhi", q_supplier_hhi, _ORACLE_SUPPLIER_HHI,
        "ext:stats (Herfindahl concentration per nation)",
    ),
    QuerySpec(
        "q_catalog_coverage", q_catalog_coverage, _ORACLE_CATALOG_COVERAGE,
        "ext:anti-join (assortment coverage rollup)",
    ),
]
