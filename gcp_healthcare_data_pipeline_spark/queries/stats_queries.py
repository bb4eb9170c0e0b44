"""Statistical aggregates + fuzzy record linkage.

- q_percentiles: exact linear-interpolation percentiles (Spark
  ``percentile`` == DuckDB ``quantile_cont`` on DOUBLE inputs).
- q_stats_by_flag: correlation / sample stddev / variance per group —
  distribution-profiling surface for data-quality monitoring.
- q_fuzzy_name_match: levenshtein-based near-match pairs — the healthcare
  record-linkage primitive (same-patient detection across hospitals).
  Blocked by FastSS deletion neighborhoods (Bocek et al. 2007, public
  algorithm): every string emits itself plus each delete-one-char
  variant; any pair within edit distance 1 shares at least one variant
  key, so the block join is LOSSLESS while candidate blocks stay tiny
  (a variant key collides only for genuinely near-identical names).
  This replaces round-1 length-equality blocking, which was degenerate
  on fixed-width names (one block -> O(n^2) pairs on a single key).
  The oracle is the naive all-pairs SQL — the hash match proves the
  blocked plan recovers the full ground-truth pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries.registry import QuerySpec
from gcp_healthcare_data_pipeline_spark.session import load_tables


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median / p95 order value per priority (exact percentiles)."""
    orders = load_tables(spark, sf_dir, "orders")
    return orders.groupBy(
        F.col("o_orderpriority").alias("order_priority")
    ).agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


_ORACLE_PERCENTILES = """
SELECT o_orderpriority AS order_priority,
  ROUND(quantile_cont(o_totalprice::DOUBLE, 0.5), 4) AS p50,
  ROUND(quantile_cont(o_totalprice::DOUBLE, 0.95), 4) AS p95,
  ROUND(MIN(o_totalprice), 2) AS min_price,
  ROUND(MAX(o_totalprice), 2) AS max_price
FROM orders
GROUP BY 1
"""


def q_stats_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag distribution profile: corr, stddev, variance."""
    li = load_tables(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("return_flag")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_samp("l_discount"), 6).alias("discount_var"),
    )


_ORACLE_STATS_BY_FLAG = """
SELECT l_returnflag AS return_flag,
  COUNT(*) AS n_rows,
  ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
  ROUND(stddev_samp(l_quantity), 6) AS qty_stddev,
  ROUND(var_samp(l_discount), 6) AS discount_var
FROM lineitem
GROUP BY 1
"""


def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage: supplier-name pairs within edit distance 1.

    FastSS blocking: each name emits its deletion neighborhood — the name
    itself plus every delete-one-char variant.  Two strings with
    levenshtein <= 1 ALWAYS share a variant key (substitution: both
    delete the differing position; insert/delete: the longer one's
    deletion equals the shorter string itself), so joining on the variant
    key is a lossless candidate generator.  Levenshtein runs only on the
    candidate pairs.  Shuffle volume is O(n * len) variant rows with
    near-unique keys — no single hot key, unlike length-blocking on
    fixed-width names.
    """
    sup = load_tables(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    variants = sup.select(
        "s_suppkey",
        "s_name",
        F.explode(
            F.expr(
                "transform(sequence(0, length(s_name)), i -> "
                "concat(substring(s_name, 1, i), substring(s_name, i + 2)))"
            )
        ).alias("vkey"),
    )
    a = variants.select(
        F.col("s_suppkey").alias("id_a"),
        F.col("s_name").alias("name_a"),
        "vkey",
    )
    b = variants.select(
        F.col("s_suppkey").alias("id_b"),
        F.col("s_name").alias("name_b"),
        "vkey",
    )
    candidates = (
        a.join(b, "vkey")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "name_a", "id_b", "name_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        candidates.select(
            "id_a",
            "id_b",
            F.levenshtein("name_a", "name_b").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= 1)
    )


_ORACLE_FUZZY_NAME_MATCH = """
SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
       levenshtein(a.s_name, b.s_name) AS edit_distance
FROM supplier a
JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
"""


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width document-length histogram per language, with each
    bin's share of its language.

    Binning is pure integer arithmetic (``n_chars div 50 * 50``) so both
    engines bucket identically; the share denominator is a partition-wide
    window sum (no second shuffle — reuses the groupBy partitioning).
    """
    from pyspark.sql import Window

    docs = load_tables(spark, sf_dir, "documents")
    binned = docs.select(
        "lang", F.expr("(n_chars div 50) * 50").alias("bin_start")
    )
    hist = binned.groupBy("lang", "bin_start").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = F.sum("n_docs").over(Window.partitionBy("lang"))
    return hist.select(
        "lang",
        F.col("bin_start").cast("bigint").alias("bin_start"),
        "n_docs",
        F.round(F.col("n_docs").cast("double") / total, 6).alias("lang_share"),
    )


_ORACLE_LENGTH_HISTOGRAM = """
WITH hist AS (
  SELECT lang, CAST((n_chars // 50) * 50 AS BIGINT) AS bin_start,
    CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1, 2
)
SELECT lang, bin_start, n_docs,
  ROUND(CAST(n_docs AS DOUBLE)
        / CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE), 6)
    AS lang_share
FROM hist
"""


QUERIES = [
    QuerySpec("q_percentiles", q_percentiles, _ORACLE_PERCENTILES, "ext:stats"),
    QuerySpec(
        "q_length_histogram", q_length_histogram, _ORACLE_LENGTH_HISTOGRAM,
        "ext:stats (fixed-width histogram + partition share)",
    ),
    QuerySpec(
        "q_stats_by_flag", q_stats_by_flag, _ORACLE_STATS_BY_FLAG, "ext:stats",
    ),
    QuerySpec(
        "q_fuzzy_name_match", q_fuzzy_name_match, _ORACLE_FUZZY_NAME_MATCH,
        "ext:record-linkage",
    ),
]
