"""Silver-layer semantics mapped onto the test star schema.

Reference parity map:

- q_conform_union     — per-source conformance SELECT lists + literal
  datasource tags + provenance tagging + NULL-propagating CONCAT keys +
  SAFE_CAST + UNION ALL + DISTINCT (silver.sql:17-30,91-139; claims.py:19-25).
- q_quarantine_documents — data-quality CASE flags incl. the
  ``LOWER(x)='null'`` string sentinel (silver.sql:105-108).
- q_scd2_customer     — the SCD Type 2 MERGE (silver.sql:142-199) via the
  generic :func:`scd2_merge` operator, on two deterministic snapshots
  derived from ``customer``; replicates the NULL-unsafe ``<>`` change
  detector and the half-SCD2 quirk (SURVEY §2.6).
- q_incremental_watermark — high-watermark incremental load: scalar MAX
  lookup then filter + aggregate (hospitalA_mysqlToLanding.py:124-151).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.functions.bq_compat import (
    null_prop_concat,
    quarantine_flag,
    safe_cast,
    safe_offset,
    string_null_sentinel,
)
from gcp_healthcare_data_pipeline_spark.operators.scd2 import (
    scd2_initial,
    scd2_merge,
)
from gcp_healthcare_data_pipeline_spark.queries.registry import QuerySpec
from gcp_healthcare_data_pipeline_spark.session import load_tables


def _conform(df: DataFrame, key: str, name: str, bal: str, tag: str) -> DataFrame:
    """One source's conformance SELECT list (silver.sql:110-138 shape)."""
    # provenance tag from the file path (claims.py:19-22 pattern);
    # falls back to 'unknown' exactly like the reference's otherwise()
    datasource = F.when(F.input_file_name().contains(tag), F.lit(tag)).otherwise(
        F.lit("unknown")
    )
    return df.select(
        # NULL-propagating derived key CONCAT(id, '-', datasource)
        null_prop_concat(F.col(key).cast("string"), "-", tag).alias("entity_key"),
        F.col(name).alias("entity_name"),
        safe_cast(safe_offset(F.split(F.col(name), "#"), 1), "bigint").alias(
            "parsed_id"
        ),
        F.col(bal).alias("acctbal"),
        datasource.alias("datasource"),
        quarantine_flag(
            F.col(name).isNull(),
            string_null_sentinel(F.col(name)),
            F.col(bal).isNull(),
        ).alias("is_quarantined"),
    )


def q_conform_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two drifting sources conformed to one entity table: rename maps,
    datasource tags, derived keys, quality flags, UNION ALL, DISTINCT."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    a = _conform(t["customer"], "c_custkey", "c_name", "c_acctbal", "customer")
    b = _conform(t["supplier"], "s_suppkey", "s_name", "s_acctbal", "supplier")
    # unionByName, not positional union: the reference's positional
    # SELECT * over drifted schemas is exactly what breaks (SURVEY §1.3)
    return a.unionByName(b).distinct()


_ORACLE_CONFORM_UNION = """
SELECT DISTINCT * FROM (
  SELECT
    CAST(c_custkey AS VARCHAR) || '-' || 'customer' AS entity_key,
    c_name AS entity_name,
    TRY_CAST(split_part(c_name, '#', 2) AS BIGINT) AS parsed_id,
    c_acctbal AS acctbal,
    'customer' AS datasource,
    CASE WHEN c_name IS NULL OR LOWER(c_name) = 'null' OR c_acctbal IS NULL
         THEN TRUE ELSE FALSE END AS is_quarantined
  FROM customer
  UNION ALL
  SELECT
    CAST(s_suppkey AS VARCHAR) || '-' || 'supplier' AS entity_key,
    s_name AS entity_name,
    TRY_CAST(split_part(s_name, '#', 2) AS BIGINT) AS parsed_id,
    s_acctbal AS acctbal,
    'supplier' AS datasource,
    CASE WHEN s_name IS NULL OR LOWER(s_name) = 'null' OR s_acctbal IS NULL
         THEN TRUE ELSE FALSE END AS is_quarantined
  FROM supplier
)
"""


def q_quarantine_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level data-quality flags over documents (silver.sql:105-108)."""
    docs = load_tables(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.lower("lang").alias("lang_norm"),
        quarantine_flag(
            F.col("text").isNull(),
            F.length("text") == 0,
            string_null_sentinel("lang"),
            F.col("n_chars").isNull(),
            F.col("n_chars") <= 0,
        ).alias("is_quarantined"),
    )


_ORACLE_QUARANTINE_DOCUMENTS = """
SELECT
  doc_id,
  LOWER(lang) AS lang_norm,
  CASE WHEN text IS NULL OR LENGTH(text) = 0 OR LOWER(lang) = 'null'
            OR n_chars IS NULL OR n_chars <= 0
       THEN TRUE ELSE FALSE END AS is_quarantined
FROM documents
"""

_TS1 = "2024-01-01"
_TS2 = "2024-06-01"


def _scd2_snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two deterministic customer snapshots.

    target: keys with custkey%10 < 8 (so %10 in {8,9} are later inserts);
    source: keys with custkey%10 >= 2 (so %10 in {0,1} go untouched);
    source mutations: acctbal bumped where custkey%3=0 (changed rows),
    segment nulled where custkey%7=0 (exercises NULL-unsafe <>).
    """
    cus = load_tables(spark, sf_dir, "customer")
    base = cus.select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    target_rows = base.filter(F.col("entity_key") % 10 < 8)
    source = base.filter(F.col("entity_key") % 10 >= 2).select(
        "entity_key",
        "name",
        F.when(
            F.col("entity_key") % 3 == 0, F.round(F.col("acctbal") + 10.0, 2)
        )
        .otherwise(F.col("acctbal"))
        .alias("acctbal"),
        F.when(F.col("entity_key") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("segment"))
        .alias("segment"),
    )
    target = scd2_initial(target_rows, F.lit(_TS1).cast("timestamp"))
    return target, source


def q_scd2_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One SCD2 merge run (strict reference semantics) over the snapshots."""
    target, source = _scd2_snapshots(spark, sf_dir)
    return scd2_merge(
        target,
        source,
        key_cols=["entity_key"],
        tracked_cols=["name", "acctbal", "segment"],
        ts=F.lit(_TS2).cast("timestamp"),
    )


_ORACLE_SCD2_CUSTOMER = f"""
WITH target AS (
  SELECT c_custkey AS entity_key, c_name AS name, c_acctbal AS acctbal,
         c_mktsegment AS segment,
         TIMESTAMP '{_TS1}' AS inserted_date,
         TIMESTAMP '{_TS1}' AS modified_date,
         TRUE AS is_current
  FROM customer WHERE c_custkey % 10 < 8
), source AS (
  SELECT c_custkey AS entity_key, c_name AS name,
         CASE WHEN c_custkey % 3 = 0 THEN ROUND(c_acctbal + 10.0, 2)
              ELSE c_acctbal END AS acctbal,
         CASE WHEN c_custkey % 7 = 0 THEN NULL
              ELSE c_mktsegment END AS segment
  FROM customer WHERE c_custkey % 10 >= 2
), j AS (
  SELECT t.entity_key AS t_key, s.entity_key AS s_key,
         t.name AS t_name, s.name AS s_name,
         t.acctbal AS t_acctbal, s.acctbal AS s_acctbal,
         t.segment AS t_segment, s.segment AS s_segment,
         t.inserted_date AS inserted_date, t.modified_date AS modified_date,
         (t.name <> s.name OR t.acctbal <> s.acctbal
          OR t.segment <> s.segment) AS changed
  FROM target t FULL OUTER JOIN source s ON t.entity_key = s.entity_key
)
SELECT t_key AS entity_key, t_name AS name, t_acctbal AS acctbal,
       t_segment AS segment, inserted_date,
       CASE WHEN s_key IS NOT NULL AND changed THEN TIMESTAMP '{_TS2}'
            ELSE modified_date END AS modified_date,
       CASE WHEN s_key IS NOT NULL AND changed THEN FALSE
            ELSE TRUE END AS is_current
FROM j WHERE t_key IS NOT NULL
UNION ALL
SELECT s_key, s_name, s_acctbal, s_segment,
       TIMESTAMP '{_TS2}', TIMESTAMP '{_TS2}', TRUE
FROM j WHERE t_key IS NULL
"""


def q_scd2_corrected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corrected SCD2 merge (``strict_reference_semantics=False``):
    unlike the reference's half-SCD2 (silver.sql:142-199, which expires a
    changed row but never inserts its new version), changed keys get BOTH
    an expired old version and a fresh current version."""
    target, source = _scd2_snapshots(spark, sf_dir)
    return scd2_merge(
        target,
        source,
        key_cols=["entity_key"],
        tracked_cols=["name", "acctbal", "segment"],
        ts=F.lit(_TS2).cast("timestamp"),
        strict_reference_semantics=False,
    )


_ORACLE_SCD2_CORRECTED = f"""
WITH target AS (
  SELECT c_custkey AS entity_key, c_name AS name, c_acctbal AS acctbal,
         c_mktsegment AS segment,
         TIMESTAMP '{_TS1}' AS inserted_date,
         TIMESTAMP '{_TS1}' AS modified_date,
         TRUE AS is_current
  FROM customer WHERE c_custkey % 10 < 8
), source AS (
  SELECT c_custkey AS entity_key, c_name AS name,
         CASE WHEN c_custkey % 3 = 0 THEN ROUND(c_acctbal + 10.0, 2)
              ELSE c_acctbal END AS acctbal,
         CASE WHEN c_custkey % 7 = 0 THEN NULL
              ELSE c_mktsegment END AS segment
  FROM customer WHERE c_custkey % 10 >= 2
), j AS (
  SELECT t.entity_key AS t_key, s.entity_key AS s_key,
         t.name AS t_name, s.name AS s_name,
         t.acctbal AS t_acctbal, s.acctbal AS s_acctbal,
         t.segment AS t_segment, s.segment AS s_segment,
         t.inserted_date AS inserted_date, t.modified_date AS modified_date,
         (t.name <> s.name OR t.acctbal <> s.acctbal
          OR t.segment <> s.segment) AS changed
  FROM target t FULL OUTER JOIN source s ON t.entity_key = s.entity_key
)
SELECT t_key AS entity_key, t_name AS name, t_acctbal AS acctbal,
       t_segment AS segment, inserted_date,
       CASE WHEN s_key IS NOT NULL AND changed THEN TIMESTAMP '{_TS2}'
            ELSE modified_date END AS modified_date,
       CASE WHEN s_key IS NOT NULL AND changed THEN FALSE
            ELSE TRUE END AS is_current
FROM j WHERE t_key IS NOT NULL
UNION ALL
SELECT s_key, s_name, s_acctbal, s_segment,
       TIMESTAMP '{_TS2}', TIMESTAMP '{_TS2}', TRUE
FROM j
WHERE t_key IS NULL
   OR (s_key IS NOT NULL AND COALESCE(changed, FALSE))
"""


def q_incremental_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental load: scalar MAX watermark lookup, then filter + agg.

    Mirrors the reference's audit-ledger watermark pattern: the single
    watermark value is fetched to the driver (one row, like
    hospitalA_mysqlToLanding.py:124-137) and pushed into the scan filter,
    where Catalyst turns it into a parquet predicate.
    """
    orders = load_tables(spark, sf_dir, "orders")
    wm = (
        orders.filter(F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
        .agg(F.max("o_orderdate"))
        .first()[0]
    )
    inc = orders.filter(F.col("o_orderdate") > F.lit(wm))
    return inc.groupBy(F.col("o_orderpriority").alias("order_priority")).agg(
        F.count(F.lit(1)).alias("num_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_amount"),
    )


_ORACLE_INCREMENTAL_WATERMARK = """
SELECT
  o_orderpriority AS order_priority,
  COUNT(*) AS num_orders,
  ROUND(SUM(o_totalprice), 2) AS total_amount
FROM orders
WHERE o_orderdate > (
  SELECT MAX(o_orderdate) FROM orders
  WHERE o_orderdate <= TIMESTAMP '1997-12-31'
)
GROUP BY 1
"""


QUERIES = [
    QuerySpec(
        "q_conform_union", q_conform_union, _ORACLE_CONFORM_UNION,
        "U1 P1 P2 P3 P4 P5 A8 F1 F2 F4 F5 F11",
    ),
    QuerySpec(
        "q_quarantine_documents", q_quarantine_documents,
        _ORACLE_QUARANTINE_DOCUMENTS, "F2 F5 P6",
    ),
    QuerySpec(
        "q_scd2_customer", q_scd2_customer, _ORACLE_SCD2_CUSTOMER, "J6 §2.6",
    ),
    QuerySpec(
        "q_scd2_corrected", q_scd2_corrected, _ORACLE_SCD2_CORRECTED,
        "J6 §2.6 corrected mode",
    ),
    QuerySpec(
        "q_incremental_watermark", q_incremental_watermark,
        _ORACLE_INCREMENTAL_WATERMARK, "P9 A5 A6",
    ),
]
