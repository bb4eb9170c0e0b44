"""Training-data curation: the composed end-to-end selection pipeline.

q_corpus_curation chains the extension operators the way a real
LLM-data pipeline would: quality scoring -> language filter -> near-dup
removal (MinHash-LSH losers dropped, min-doc_id kept) -> surviving corpus
with per-source stats. One oracle checks the whole composition.

q_events_sliding is the batch twin of the streaming sliding window
(each event lands in exactly two overlapping 10-min/5-min windows).

q_user_zscore is per-user z-score normalization via built-in window
functions (JVM-side); user_zscore_grouped_map is the same computation on
the Arrow grouped-map (applyInPandas) surface, kept for API coverage and
asserted equivalent in tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from gcp_healthcare_data_pipeline_spark.functions.text import STOPWORDS, tokens
from gcp_healthcare_data_pipeline_spark.operators.dedup import (
    lsh_candidate_pairs,
    jaccard,
    minhash_signatures,
    with_shingles,
)
from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (
    _corpus_lsh_params,
    _lsh_sql_cte,
)
from gcp_healthcare_data_pipeline_spark.queries.registry import QuerySpec
from gcp_healthcare_data_pipeline_spark.session import event_ts_us, load_tables

_QUALITY_MIN = 0.6
_JACCARD_MIN = 0.6


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality >= 0.6, known language, near-dup losers removed; per-source
    survivor stats."""
    docs = load_tables(spark, sf_dir, "documents")
    docs = docs.withColumn("_toks", tokens("text"))
    n_tok = F.size("_toks").cast("double")
    stop = F.size(
        F.filter(
            F.col("_toks"),
            lambda t: F.array_contains(F.array(*[F.lit(w) for w in STOPWORDS]), t),
        )
    ).cast("double")
    punct_ratio = F.length(
        F.regexp_replace(F.col("text"), "[a-z0-9 ]", "")
    ).cast("double") / F.length("text")
    score = (
        F.lit(0.4) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + F.lit(0.4) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.2) * F.least(stop / n_tok * F.lit(5.0), F.lit(1.0))
    )
    scored = docs.select(
        "doc_id", "source", "lang", "text", F.round(score, 6).alias("q")
    )
    kept = scored.filter(
        (F.col("q") >= _QUALITY_MIN)
        & F.col("lang").isin("en", "fr", "de", "es", "zh")
    )

    # near-dup losers (doc_b of verified pairs) computed on the FULL corpus
    sh = with_shingles(
        load_tables(spark, sf_dir, "documents").select("doc_id", "text"),
        "text", n=3,
    ).localCheckpoint(eager=False)
    r, nb, k = _corpus_lsh_params(spark, sf_dir)
    sig = minhash_signatures(sh, "doc_id", "shingles", k=k).localCheckpoint(
        eager=False
    )
    cand = lsh_candidate_pairs(sig, "doc_id", "sig", bands=nb, rows_per_band=r)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    losers = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .filter(
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6) >= _JACCARD_MIN
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    survivors = kept.join(losers, "doc_id", "left_anti")
    return survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("q"), 6).alias("avg_quality"),
        F.min("doc_id").alias("min_doc_id"),
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)
_ORACLE_CORPUS_CURATION = f"""
WITH d AS (
  SELECT doc_id, source, lang, text, string_split(text, ' ') AS toks
  FROM documents
), m AS (
  SELECT doc_id, source, lang,
    CAST(len(toks) AS DOUBLE) AS n_tok,
    CAST(len(list_filter(toks, t -> t IN ({_STOP_SQL}))) AS DOUBLE) AS stop,
    CAST(LENGTH(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
         AS DOUBLE) / LENGTH(text) AS punct_ratio
  FROM d
), scored AS (
  SELECT doc_id, source, lang,
    ROUND(0.4 * LEAST(n_tok / 100.0, 1.0)
        + 0.4 * (1.0 - punct_ratio)
        + 0.2 * LEAST(stop / n_tok * 5.0, 1.0), 6) AS q
  FROM m
), kept AS (
  SELECT * FROM scored
  WHERE q >= {_QUALITY_MIN} AND lang IN ('en','fr','de','es','zh')
), sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, len(toks) - 1),
      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS shingles
  FROM d WHERE len(toks) >= 3
), {_lsh_sql_cte("sh")}, cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
), losers AS (
  SELECT DISTINCT c.doc_b AS doc_id
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b
  WHERE ROUND(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
        / len(list_distinct(x.shingles || y.shingles)), 6) >= {_JACCARD_MIN}
), survivors AS (
  SELECT k.* FROM kept k
  WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = k.doc_id)
)
SELECT source,
       COUNT(*) AS n_docs,
       ROUND(AVG(q), 6) AS avg_quality,
       MIN(doc_id) AS min_doc_id
FROM survivors
GROUP BY 1
"""


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sliding windows (10 min window, 5 min slide): each event
    contributes to exactly two overlapping windows (explode of the two
    covering window starts)."""
    ev = load_tables(spark, sf_dir, "events")
    base = (F.floor(event_ts_us(ev) / 300_000_000) * 300).cast("bigint")
    win = F.explode(F.array(base - 300, base)).alias("window_start")
    n_err = F.count(F.when(F.col("event_type") == "error", F.lit(1)))
    return (
        ev.select(win, "event_type", "value")
        .groupBy("window_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            n_err.alias("n_errors"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_ORACLE_EVENTS_SLIDING = """
WITH e AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 300000000) * 300 AS BIGINT) AS base,
         event_type, value
  FROM events
), exploded AS (
  SELECT base - 300 AS window_start, event_type, value FROM e
  UNION ALL
  SELECT base AS window_start, event_type, value FROM e
)
SELECT window_start,
       COUNT(*) AS n_events,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
       ROUND(SUM(value), 2) AS total_value
FROM exploded
GROUP BY 1
"""

_Z_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("user_id", LongType(), True),
        StructField("zscore", DoubleType(), True),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mu = pdf["value"].mean()
    sd = pdf["value"].std(ddof=1)  # sample std == SQL stddev_samp
    z = (pdf["value"] - mu) / sd if sd and sd == sd else pdf["value"] * float("nan")
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "zscore": z.round(4),
        }
    )


def user_zscore_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score via grouped applyInPandas — kept as the API
    demonstration / test surface for the Arrow grouped-map path.  NOT the
    registry plan: the same math is expressible with built-in window
    functions (pure JVM, no Arrow hop), which is what q_user_zscore uses.
    """
    ev = load_tables(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    return ev.groupBy("user_id").applyInPandas(_zscore_group, schema=_Z_SCHEMA)


def q_user_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score normalization with built-in window functions.

    (value - avg) / stddev_samp over Window.partitionBy(user_id): one
    shuffle on user_id, whole-stage-codegen window evaluation, no Python
    workers.  Replaces the round-1 applyInPandas plan (~3.3s -> ~0.3s at
    sf0.1); the grouped-map variant survives as user_zscore_grouped_map,
    asserted equivalent in tests/test_curation.py.
    """
    ev = load_tables(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    w = Window.partitionBy("user_id")
    return ev.select(
        "event_id",
        "user_id",
        (
            F.round(
                (F.col("value") - F.avg("value").over(w))
                / F.stddev_samp("value").over(w),
                4,
            )
            + F.lit(0.0)  # -0.0 + 0.0 = +0.0: normalize IEEE negative zero
        ).alias("zscore"),
    )


_ORACLE_USER_ZSCORE = """
SELECT event_id, user_id,
  ROUND((value - AVG(value) OVER (PARTITION BY user_id))
        / STDDEV_SAMP(value) OVER (PARTITION BY user_id), 4) + 0.0 AS zscore
FROM events
"""


_BOILER_MIN_DF = 2  # shingle counts as boilerplate if >= this many docs of a source share it


def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level boilerplate detection (CCNet/RefinedWeb line-dedup
    analog, adapted to token shingles since the corpus has no newlines).

    A 3-gram shingle is boilerplate *within a source* when >=
    ``_BOILER_MIN_DF`` documents of that source contain it (headers,
    footers, navigation chrome repeat across a crawl domain's pages).
    Emits each doc's boilerplate fraction — the upstream signal a real
    pipeline thresholds on before training.

    Plan shape: ONE explode of distinct shingles, ONE exchange on
    (source, shingle) where a window count supplies each shingle's
    document frequency in place, then the per-doc re-aggregation. The
    window replaces the earlier groupBy-then-join-back plan, which
    evaluated the shingling subtree twice and shuffled the exploded
    strings twice (22.6s -> 5.0s at sf0.1). No self-join; shuffle volume
    is bounded by the exploded (doc, shingle) space.
    """
    docs = load_tables(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    sh = with_shingles(docs, "text", n=3)
    ex = sh.select("doc_id", "source", F.explode("shingles").alias("s"))
    w = Window.partitionBy("source", "s")
    counted = ex.withColumn("shingle_df", F.count(F.lit(1)).over(w))
    is_boiler = (F.col("shingle_df") >= _BOILER_MIN_DF).cast("int")
    return (
        counted.groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(is_boiler).alias("n_boiler"),
            F.round(
                F.sum(is_boiler).cast("double") / F.count(F.lit(1)), 6
            ).alias("boiler_ratio"),
        )
    )


_ORACLE_BOILERPLATE = f"""
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
), sh AS (
  SELECT doc_id, source,
    list_distinct(list_transform(range(1, len(toks) - 1),
      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS shingles
  FROM d WHERE len(toks) >= 3
), ex AS (
  SELECT doc_id, source, UNNEST(shingles) AS s FROM sh
), dfc AS (
  SELECT source, s, COUNT(*) AS shingle_df FROM ex GROUP BY 1, 2
)
SELECT ex.doc_id, ex.source,
  CAST(COUNT(*) AS BIGINT) AS n_shingles,
  CAST(SUM(CASE WHEN dfc.shingle_df >= {_BOILER_MIN_DF} THEN 1 ELSE 0 END)
       AS BIGINT) AS n_boiler,
  ROUND(CAST(SUM(CASE WHEN dfc.shingle_df >= {_BOILER_MIN_DF} THEN 1 ELSE 0
             END) AS DOUBLE) / COUNT(*), 6) AS boiler_ratio
FROM ex JOIN dfc USING (source, s)
GROUP BY 1, 2
"""


QUERIES = [
    QuerySpec(
        "q_corpus_curation", q_corpus_curation, _ORACLE_CORPUS_CURATION,
        "ext:curation (quality+lang+dedup composition)",
    ),
    QuerySpec(
        "q_boilerplate", q_boilerplate, _ORACLE_BOILERPLATE,
        "ext:curation (per-source boilerplate shingle fraction)",
    ),
    QuerySpec(
        "q_events_sliding", q_events_sliding, _ORACLE_EVENTS_SLIDING,
        "ext:streaming-batch sliding",
    ),
    QuerySpec(
        "q_user_zscore", q_user_zscore, _ORACLE_USER_ZSCORE,
        "ext:applyInPandas grouped-map",
    ),
]
