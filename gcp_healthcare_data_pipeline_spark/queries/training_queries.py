"""Training-data curation queries over ``documents`` (north-star ops).

The operations an LLM training-data pipeline runs after dedup/quality:
deterministic split assignment, stratified downsampling, per-document
salient-term extraction (TF-IDF), benchmark-contamination detection, PII
redaction, and fixed-budget sequence packing. All JVM built-ins (no
Python UDFs); every hash/threshold decision is md5-based so the DuckDB
oracle reproduces it bit-for-bit (the ``conv(substr(md5ꞏ16ꞏ10))`` ↔
``('0x'||substr(md5))::BIGINT`` parity proven by the dedup family).

Scale posture (100 TB): split/sample/redaction are pure map stages (no
shuffle beyond the final tiny agg); TF-IDF and contamination are
explode → groupBy inverted-index plans (the canonical distributed
shapes); packing windows are SHARD-LOCAL (partitionBy shard) so the
cumulative sums parallelize instead of serializing on one global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.functions.windows import tiny_frame_window
from gcp_healthcare_data_pipeline_spark.queries.registry import QuerySpec
from gcp_healthcare_data_pipeline_spark.session import load_tables

# ---------------------------------------------------------------------------
# shared: deterministic hash bucket (0..99) from a document id
# ---------------------------------------------------------------------------


_AES_K = 50
_AES_DENOM = float(16**12) + 1.0  # md5 48-bit prefix -> u in (0, 1]


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language sampling (alpha = 0.5): resample so
    language volumes go as n^alpha instead of n — the standard
    multilingual rebalancing (T5/mC4-style) that upweights low-resource
    languages without flattening the mixture entirely. Rates derive from
    the data: rate_lang = sqrt(n_min / n_lang), so the scarcest language
    keeps 100% and heavier ones are hash-downsampled toward the
    temperature curve.

    Scale shape: the per-language counts are a tiny aggregate; the rate
    table broadcasts back; keep/drop is the map-side md5 bucket filter —
    the corpus is never shuffled (same discipline as q_domain_mix, which
    targets a FIXED weighted mixture; this derives the mixture from a
    temperature).
    """
    docs = load_tables(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    allw = tiny_frame_window("lang")  # one row per language: tiny frame
    rates = counts.withColumn(
        "keep_pct",
        F.floor(
            100.0
            * F.sqrt(
                F.min("n_docs").over(allw).cast("double") / F.col("n_docs")
            )
        ).cast("bigint"),
    )
    kept = (
        docs.join(F.broadcast(rates), "lang")
        .filter(_hash_bucket(F.col("doc_id")) < F.col("keep_pct"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return rates.join(kept, "lang", "left").select(
        "lang",
        "n_docs",
        "keep_pct",
        F.coalesce("n_kept", F.lit(0).cast("bigint")).alias("n_kept"),
    )


_ORACLE_TEMPERATURE_MIX = """
WITH c AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1
), m AS (
  SELECT MIN(n_docs) AS mn FROM c
), r AS (
  SELECT lang, n_docs,
    CAST(FLOOR(100.0 * sqrt(CAST(mn AS DOUBLE) / n_docs)) AS BIGINT)
      AS keep_pct
  FROM c CROSS JOIN m
), k AS (
  SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM documents d JOIN r USING (lang)
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100
        < keep_pct
  GROUP BY 1
)
SELECT lang, n_docs, keep_pct, COALESCE(n_kept, 0) AS n_kept
FROM r LEFT JOIN k USING (lang)
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the A-ES exponential
    jumps key (Efraimidis & Spirakis 2006, public algorithm): each doc
    draws a deterministic uniform u from its md5, and the k largest
    ``ln(u) / weight`` keys ARE a weighted sample without replacement —
    one pass, no rejection loop, no sequential state. Weight here is
    ``n_chars``, the 'sample proportional to token cost' policy a
    data-mix pipeline uses when an epoch can't afford the full corpus.

    Scale shape: key computation is map-side arithmetic on the scan;
    selection is ``orderBy().limit(k)`` = TakeOrderedAndProject
    (per-partition heaps, driver merges k rows) — the same no-global-sort
    discipline as q_shipping_priority. The md5-derived u makes the draw
    reproducible AND cross-engine identical, so the oracle replays the
    exact sample.
    """
    docs = load_tables(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / F.lit(_AES_DENOM)
    key = F.log(u) / F.col("n_chars")
    return (
        docs.withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), F.col("doc_id").asc())
        .limit(_AES_K)
        .select(
            "doc_id",
            "n_chars",
            F.round("sample_key", 9).alias("sample_key"),
        )
    )


_ORACLE_WEIGHTED_SAMPLE = f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
    ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
        + 1.0) / {_AES_DENOM!r}) / n_chars AS sample_key
  FROM documents
)
SELECT doc_id, n_chars, ROUND(sample_key, 9) AS sample_key
FROM keyed
ORDER BY sample_key DESC, doc_id ASC
LIMIT {_AES_K}
"""


def _hash_bucket(col) -> F.Column:
    """md5(doc_id) -> first 6 hex chars -> int48 -> mod 100. Stable across
    engines, executors, and reruns — the property random() lacks."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % 100
    )


_SQL_BUCKET = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100)"


# ---------------------------------------------------------------------------
# q_train_split: deterministic train/val/test assignment + per-split stats
# ---------------------------------------------------------------------------


def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 split by id-hash bucket; per-split corpus stats.

    Pure map stage + 3-row aggregate: at 100 TB the split column is
    computed inline during the scan and the shuffle moves three rows.
    """
    docs = load_tables(spark, sf_dir, "documents")
    b = _hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 90, F.lit("train"))
        .when(b < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.withColumn("split", split)
        .withColumn("n_tokens", F.size(F.split(F.col("text"), " ")))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )


_ORACLE_TRAIN_SPLIT = f"""
SELECT
  CASE WHEN {_SQL_BUCKET} < 90 THEN 'train'
       WHEN {_SQL_BUCKET} < 95 THEN 'val'
       ELSE 'test' END AS split,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
  ROUND(AVG(n_chars), 2) AS avg_chars
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q_stratified_sample: per-language deterministic downsampling
# ---------------------------------------------------------------------------

# per-stratum keep-rates (percent): downweight the dominant language,
# keep the long tail — the standard corpus-rebalancing move
_STRATA_RATES = {"en": 20, "es": 60, "de": 60, "fr": 60, "zh": 60}
_DEFAULT_RATE = 50


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sample: keep a doc iff its hash bucket
    falls under its stratum's rate. Returns the sampled membership
    (value-checked, not just counted). Map-only — no shuffle at all."""
    docs = load_tables(spark, sf_dir, "documents")
    rate = F.lit(_DEFAULT_RATE)
    for lang, r in _STRATA_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    b = _hash_bucket(F.col("doc_id"))
    return (
        docs.withColumn("bucket", b)
        .filter(F.col("bucket") < rate)
        .select("doc_id", "lang", "bucket")
    )


_RATE_SQL = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {r}" for lang, r in _STRATA_RATES.items()
) + f" ELSE {_DEFAULT_RATE} END"

_ORACLE_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, {_SQL_BUCKET} AS bucket
FROM documents
WHERE {_SQL_BUCKET} < ({_RATE_SQL})
"""


# ---------------------------------------------------------------------------
# q_tfidf_topterms: per-document top-3 salient terms
# ---------------------------------------------------------------------------

_TFIDF_TOPN = 3


def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed TF-IDF: explode tokens -> (doc,term) tf counts ->
    term df counts -> idf join -> per-doc window top-3.

    The df side aggregates to |vocab| rows (small vs corpus) and joins
    back on term — the canonical inverted-index shape; the doc count
    rides a broadcast 1-row frame, never a driver collect."""
    docs = load_tables(spark, sf_dir, "documents").select("doc_id", "text")
    terms = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    # tf feeds BOTH the score join and the df aggregate — checkpoint so
    # the token explode runs once, not once per branch
    tf = (
        terms.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.col("_n") + 1.0) / (F.col("df") + 1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TFIDF_TOPN)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


_ORACLE_TFIDF_TOPTERMS = f"""
WITH terms AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM terms GROUP BY 1, 2
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         ROUND(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
  FROM tf JOIN df USING (term), n
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_TFIDF_TOPN}
"""


# ---------------------------------------------------------------------------
# q_contamination: benchmark n-gram containment against the training corpus
# ---------------------------------------------------------------------------

_CONTAM_THRESHOLD = 0.5


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: docs with doc_id % 10 == 0 play the
    held-out eval set; for each, the fraction of its 3-gram shingles that
    appear ANYWHERE in the training corpus (the rest of the table).

    Plan: benchmark shingles explode -> left join the training corpus's
    DISTINCT shingle set (inverted index, shuffle on shingle string) ->
    per-doc containment. No doc x doc pairs ever form — the join is
    shingle-keyed, so 100 TB of training text reduces to its distinct
    shingle set once."""
    from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (  # noqa: PLC0415
        _shared_shingles,
    )

    # same 3-gram shingling as the near-dup family — reuse its
    # checkpointed per-(session, sf_dir) corpus instead of re-tokenizing
    sh = _shared_shingles(spark, sf_dir)
    bench = sh.filter(F.col("doc_id") % 10 == 0)
    train_shingles = (
        sh.filter(F.col("doc_id") % 10 != 0)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
        .withColumn("_in_train", F.lit(1))
    )
    bench_sh = bench.select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    return (
        bench_sh.join(train_shingles, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_in_train"), F.lit(0))).alias(
                "n_contaminated"
            ),
        )
        .withColumn(
            "containment",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6),
        )
        .withColumn(
            "is_contaminated",
            (F.col("containment") > _CONTAM_THRESHOLD).cast("boolean"),
        )
    )


_ORACLE_CONTAMINATION = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, len(toks) - 1),
    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS shingles
  FROM toks WHERE len(toks) >= 3
), train AS (
  SELECT DISTINCT s.shingle
  FROM sh, UNNEST(sh.shingles) AS s(shingle)
  WHERE doc_id % 10 <> 0
), bench AS (
  SELECT doc_id, s.shingle
  FROM sh, UNNEST(sh.shingles) AS s(shingle)
  WHERE doc_id % 10 = 0
), agg AS (
  SELECT b.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_contaminated
  FROM bench b LEFT JOIN train t ON b.shingle = t.shingle
  GROUP BY 1
)
SELECT doc_id, n_shingles, n_contaminated,
       ROUND(CAST(n_contaminated AS DOUBLE) / n_shingles, 6) AS containment,
       (CAST(n_contaminated AS DOUBLE) / n_shingles) > {_CONTAM_THRESHOLD}
         AS is_contaminated
FROM agg
"""


# ---------------------------------------------------------------------------
# q_pii_redaction: regex scrub with per-pattern hit counts
# ---------------------------------------------------------------------------

_SSN_RE = r"\d{3}-\d{2}-\d{4}"
_EMAIL_RE = r"[a-z0-9.]+@[a-z0-9.]+"


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over an enriched corpus: the raw documents carry no PII,
    so each doc is deterministically enriched with an id-derived SSN and
    email (both engines build the identical string), then redacted with
    the healthcare-standard patterns. The md5 of the redacted text is
    value-checked — proving the REDACTION output, not just the counts.
    Map-only stage: regexp_count + regexp_replace in codegen."""
    docs = load_tables(spark, sf_dir, "documents").select("doc_id", "text")
    ssn = F.concat_ws(
        "-",
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    email = F.concat(
        F.lit("user"), F.col("doc_id").cast("string"), F.lit("@example.com")
    )
    enriched = F.concat(
        F.col("text"), F.lit(" ssn "), ssn, F.lit(" contact "), email
    )
    redacted = F.regexp_replace(
        F.regexp_replace(enriched, _SSN_RE, "[SSN]"), _EMAIL_RE, "[EMAIL]"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(enriched, F.lit(_SSN_RE)).cast("bigint").alias("n_ssn"),
        F.regexp_count(enriched, F.lit(_EMAIL_RE))
        .cast("bigint")
        .alias("n_email"),
        F.length(redacted).cast("bigint").alias("redacted_len"),
        F.md5(redacted).alias("redacted_md5"),
    )


_ORACLE_PII_REDACTION = rf"""
WITH enriched AS (
  SELECT doc_id,
    text || ' ssn '
      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
      || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'
      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      AS etext
  FROM documents
), red AS (
  SELECT doc_id, etext,
    regexp_replace(
      regexp_replace(etext, '{_SSN_RE}', '[SSN]', 'g'),
      '{_EMAIL_RE}', '[EMAIL]', 'g') AS rtext
  FROM enriched
)
SELECT doc_id,
  CAST(len(regexp_extract_all(etext, '{_SSN_RE}')) AS BIGINT) AS n_ssn,
  CAST(len(regexp_extract_all(etext, '{_EMAIL_RE}')) AS BIGINT) AS n_email,
  CAST(strlen(rtext) AS BIGINT) AS redacted_len,
  md5(rtext) AS redacted_md5
FROM red
"""


# ---------------------------------------------------------------------------
# q_sequence_packing: shard-local fixed-budget context packing
# ---------------------------------------------------------------------------

_PACK_BUDGET = 256  # tokens per context window
_PACK_SHARDS = 8


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed-token-budget contexts, shard-locally.

    A doc joins the pack where its cumulative-token START offset falls
    (contiguous streaming packing; a doc that straddles a boundary
    belongs to its start pack). The window partitions by shard — at
    100 TB each shard's running sum runs independently instead of one
    global ORDER BY serializing the corpus through a single partition."""
    docs = load_tables(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = docs.withColumn("_cum", F.sum("n_tokens").over(w)).withColumn(
        "pack_id",
        F.floor((F.col("_cum") - F.col("n_tokens")) / F.lit(_PACK_BUDGET)),
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(_PACK_BUDGET)), 4).alias(
            "fill_ratio"
        ),
    )


_ORACLE_SEQUENCE_PACKING = f"""
WITH docs AS (
  SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), cum AS (
  SELECT shard, doc_id, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS c
  FROM docs
)
SELECT shard, CAST(FLOOR((c - n_tokens) / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       ROUND(SUM(n_tokens) / {_PACK_BUDGET}.0, 4) AS fill_ratio
FROM cum
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q_domain_mix: rebalance sources toward a weighted target mixture
# ---------------------------------------------------------------------------

# premium sources get twice the target share of the rest — the usual
# "upweight curated domains, downsample the crawl" rebalancing move
_PREMIUM_SOURCES = ("src0", "src1", "src2", "src3", "src4")


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compute per-source keep-rates FROM the target mixture and the
    observed counts, then hash-filter to them. Unlike the fixed-rate
    stratified sample, the rates here are derived: every source is
    scaled so per-target-share volume matches the most constrained
    source (integer percent, deterministic md5 bucketing).

    Shape at 100 TB: one groupBy for source counts (tiny result — one
    row per source), a window-min over that tiny frame, a broadcast
    join of the rates back onto the corpus, and a map-side filter. The
    corpus is never shuffled.
    """
    docs = load_tables(spark, sf_dir, "documents").select("doc_id", "source")
    w = F.when(F.col("source").isin(*_PREMIUM_SOURCES), F.lit(2)).otherwise(
        F.lit(1)
    )
    counts = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("_w", w)
        .withColumn("_scaled2", F.expr("(2 * n_docs) div _w"))
    )
    allw = tiny_frame_window("source")  # one row per source: tiny frame
    rates = (
        counts.withColumn("_m2", F.min("_scaled2").over(allw))
        .withColumn(
            "keep_rate",
            F.least(
                F.lit(100).cast("bigint"), F.expr("(100 * _m2) div _scaled2")
            ),
        )
        .select("source", "n_docs", "keep_rate")
    )
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(_hash_bucket(F.col("doc_id")) < F.col("keep_rate"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return rates.join(kept, "source", "left").select(
        "source",
        "n_docs",
        "keep_rate",
        F.coalesce("n_kept", F.lit(0).cast("bigint")).alias("n_kept"),
    )


_PREMIUM_SQL = ", ".join(f"'{s}'" for s in _PREMIUM_SOURCES)

_ORACLE_DOMAIN_MIX = f"""
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CASE WHEN source IN ({_PREMIUM_SQL}) THEN 2 ELSE 1 END AS w
  FROM documents GROUP BY 1
), s AS (
  SELECT source, n_docs, (2 * n_docs) // w AS scaled2 FROM c
), r AS (
  SELECT source, n_docs,
    LEAST(CAST(100 AS BIGINT),
          (100 * (MIN(scaled2) OVER ())) // scaled2) AS keep_rate
  FROM s
), k AS (
  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM documents d JOIN r ON d.source = r.source
  WHERE {_SQL_BUCKET} < r.keep_rate
  GROUP BY 1
)
SELECT r.source, r.n_docs, r.keep_rate,
  COALESCE(k.n_kept, CAST(0 AS BIGINT)) AS n_kept
FROM r LEFT JOIN k USING (source)
"""


# ---------------------------------------------------------------------------
# q_token_budget: best-quality docs per language under a token budget
# ---------------------------------------------------------------------------

_TOKEN_BUDGET = 10_000  # per-language token budget

# same stopword lexicon as the quality score (functions/text.py) — the
# oracle inlines it so both engines rank by the identical score
from gcp_healthcare_data_pipeline_spark.functions.text import (  # noqa: E402
    STOPWORDS as _QUALITY_STOPWORDS,
)

_STOP_SQL = ", ".join(f"'{w}'" for w in _QUALITY_STOPWORDS)


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select the highest-quality documents per language until the token
    budget fills: rank by quality (tie-break doc_id), cumulative token
    sum, keep while the running total fits. The 'give me the best N
    tokens per slice' selection every data-mix recipe needs.

    The window is per-language; a heavy language at 100 TB would be
    range-partitioned by the ORDER BY key (Spark's window exchange
    does this), so the cumulative sum stays parallel across partitions
    of the sort order, not serialized on one task.
    """
    from gcp_healthcare_data_pipeline_spark.queries.text_queries import (
        q_text_quality,
    )

    scored = q_text_quality(spark, sf_dir).select("doc_id", "quality_score")
    docs = load_tables(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.join(scored, "doc_id")
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= _TOKEN_BUDGET)
        .select("doc_id", "lang", "quality_score", "n_tokens", "cum_tokens")
    )


_ORACLE_TOKEN_BUDGET = f"""
WITH d AS (
  SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id, lang,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(len(toks) AS DOUBLE) AS n_tok,
    CAST(len(list_filter(toks, t -> t IN ({_STOP_SQL}))) AS DOUBLE) AS stop,
    CAST(LENGTH(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
         AS DOUBLE) / LENGTH(text) AS punct_ratio
  FROM d
), scored AS (
  SELECT doc_id, lang, n_tokens,
    ROUND(0.4 * LEAST(n_tok / 100.0, 1.0)
        + 0.4 * (1.0 - punct_ratio)
        + 0.2 * LEAST(stop / n_tok * 5.0, 1.0), 6) AS quality_score
  FROM m
), cum AS (
  SELECT doc_id, lang, quality_score, n_tokens,
    CAST(SUM(n_tokens) OVER (
      PARTITION BY lang ORDER BY quality_score DESC, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum_tokens
  FROM scored
)
SELECT doc_id, lang, quality_score, n_tokens, cum_tokens
FROM cum WHERE cum_tokens <= {_TOKEN_BUDGET}
"""


# ---------------------------------------------------------------------------
# q_importance_weights: DSIR-style target-domain importance scoring
# ---------------------------------------------------------------------------


def q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights for data selection: score every
    document by the mean per-token log-likelihood ratio of a
    target-domain unigram LM (the ``lang='en'`` slice stands in for the
    curated target corpus) against the full-corpus LM, add-1 smoothed.
    Positive score = looks like the target domain; downstream selection
    keeps the top mass (the hashed-ngram variant of Xie et al.'s data
    selection reduces to exactly this shape with tokens replaced by
    hashed n-grams).

    Scale shape (100 TB): two token-frequency aggregates shuffle the
    VOCABULARY, not the corpus (map-side combine); they join into one
    per-token log-ratio table that broadcasts into the per-doc scoring
    pass — explode, broadcast hash join, one corpus shuffle on doc_id.
    With a web-scale vocabulary the broadcast degrades to a shuffle
    join that is still vocab-sized per partition, never corpus-paired.
    """
    docs = load_tables(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    # ONE corpus aggregation (map-side combined, vocab x lang rows out)
    # feeds both LMs; checkpointed so raw/tgt don't re-explode the corpus
    by_lang = (
        toks.groupBy("tok", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    raw = by_lang.groupBy("tok").agg(F.sum("n").alias("n_raw"))
    tgt = (
        by_lang.filter(F.col("lang") == "en")
        .groupBy("tok")
        .agg(F.sum("n").alias("n_tgt"))
    )
    stats_raw = raw.agg(
        F.sum("n_raw").alias("tot_raw"), F.count(F.lit(1)).alias("V")
    )
    stats_tgt = tgt.agg(F.coalesce(F.sum("n_tgt"), F.lit(0)).alias("tot_tgt"))
    lr = (
        raw.join(tgt, "tok", "left")
        .crossJoin(F.broadcast(stats_raw))
        .crossJoin(F.broadcast(stats_tgt))
        .select(
            "tok",
            (
                F.log(
                    (F.coalesce(F.col("n_tgt"), F.lit(0)) + F.lit(1.0))
                    / (F.col("tot_tgt") + F.col("V"))
                )
                - F.log(
                    (F.col("n_raw") + F.lit(1.0))
                    / (F.col("tot_raw") + F.col("V"))
                )
            ).alias("lr"),
        )
    )
    return (
        toks.join(F.broadcast(lr), "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            # + 0.0 normalizes IEEE negative zero: a doc whose log-ratios
            # cancel can round to -0.0 in one engine and +0.0 in the
            # other (seen at sf0.1), and the driver's str()-hash compare
            # distinguishes them
            (F.round(F.sum("lr") / F.count(F.lit(1)), 6) + F.lit(0.0)).alias(
                "dsir_score"
            ),
        )
    )


_ORACLE_IMPORTANCE_WEIGHTS = """
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
), raw AS (
  SELECT tok, COUNT(*) AS n_raw FROM toks GROUP BY 1
), tgt AS (
  SELECT tok, COUNT(*) AS n_tgt FROM toks WHERE lang = 'en' GROUP BY 1
), stats AS (
  SELECT (SELECT SUM(n_raw) FROM raw) AS N_raw,
         (SELECT COUNT(*) FROM raw) AS V,
         (SELECT COALESCE(SUM(n_tgt), 0) FROM tgt) AS N_tgt
), lr AS (
  SELECT r.tok,
    ln((COALESCE(t.n_tgt, 0) + 1.0) / (s.N_tgt + s.V))
    - ln((r.n_raw + 1.0) / (s.N_raw + s.V)) AS lr
  FROM raw r LEFT JOIN tgt t USING (tok) CROSS JOIN stats s
)
SELECT k.doc_id, k.lang,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  ROUND(SUM(l.lr) / COUNT(*), 6) + 0.0 AS dsir_score
FROM toks k JOIN lr l USING (tok)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q_shuffle_export: deterministic corpus shuffle + shard manifest
# ---------------------------------------------------------------------------

_N_SHARDS = 16


def q_shuffle_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shuffle-and-shard for a training export: every doc
    gets a reproducible pseudorandom position from md5(doc_id, seed);
    shard = position mod N, read order within a shard = the position
    itself. Emits the per-shard manifest (doc count, token mass, head
    doc, position span) a downstream trainer would consume.

    Scale shape (100 TB): shard assignment is a pure map-side expression
    — NO global sort and NO global row_number (either would funnel the
    whole corpus through one partition/driver). The physical export is
    ``df.repartition(N, shard_id).sortWithinPartitions(pos)`` — each
    shard sorts independently; this query materializes the manifest the
    same plan produces. The hash seed makes reshuffles (new seed) and
    reproductions (same seed) both one-liner changes.
    """
    docs = load_tables(spark, sf_dir, "documents")
    pos = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id").cast("string"),
                                  F.lit("seed42"))),
                1, 12,
            ),
            16, 10,
        ).cast("bigint")
    )  # int48 position: collision-free in practice, range-safe in int64
    d = docs.select(
        "doc_id",
        pos.alias("pos"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    ).withColumn("shard_id", (F.col("pos") % _N_SHARDS).cast("int"))
    return d.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min_by("doc_id", "pos").alias("head_doc_id"),
        F.min("pos").alias("first_pos"),
        F.max("pos").alias("last_pos"),
    )


_ORACLE_SHUFFLE_EXPORT = f"""
WITH d AS (
  SELECT doc_id,
    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':seed42'), 1, 12))::BIGINT
      AS pos,
    len(string_split(text, ' ')) AS n_tokens
  FROM documents
)
SELECT CAST(pos % {_N_SHARDS} AS INT) AS shard_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  arg_min(doc_id, pos) AS head_doc_id,
  MIN(pos) AS first_pos,
  MAX(pos) AS last_pos
FROM d
GROUP BY 1
"""


def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/val/test split: the unit of assignment is the
    USER, not the event — every event of a user lands in one split, so
    no entity leaks across the train/eval boundary (the classic flaw of
    row-level splits on grouped data; q_train_split is the row-level
    doc-hash sibling). Same md5 bucketing, applied to the group key:
    bucket(user) < 80 -> train, < 90 -> val, else test.

    Pure map-side assignment (the hash is a row-local expression on the
    grouping column — no join against a user table needed), then one
    aggregation; at 100 TB nothing shuffles except the final tiny
    per-split rollup.
    """
    ev = load_tables(spark, sf_dir, "events")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 6), 16, 10
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        ev.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_ORACLE_GROUP_SPLIT = """
WITH b AS (
  SELECT *,
    (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 6))::BIGINT % 100)
      AS bucket
  FROM events
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 2) AS total_value
FROM b
GROUP BY 1
"""


QUERIES = [
    QuerySpec(
        "q_train_split", q_train_split, _ORACLE_TRAIN_SPLIT,
        "ext:training split",
    ),
    QuerySpec(
        "q_weighted_sample", q_weighted_sample, _ORACLE_WEIGHTED_SAMPLE,
        "ext:training (A-ES weighted sampling without replacement)",
    ),
    QuerySpec(
        "q_temperature_mix", q_temperature_mix, _ORACLE_TEMPERATURE_MIX,
        "ext:training (alpha=0.5 temperature-scaled language rebalance)",
    ),
    QuerySpec(
        "q_group_split", q_group_split, _ORACLE_GROUP_SPLIT,
        "ext:training group-aware leakage-free split",
    ),
    QuerySpec(
        "q_shuffle_export", q_shuffle_export, _ORACLE_SHUFFLE_EXPORT,
        "ext:training shuffle-and-shard export manifest",
    ),
    QuerySpec(
        "q_importance_weights", q_importance_weights,
        _ORACLE_IMPORTANCE_WEIGHTS,
        "ext:training DSIR importance-weighted data selection",
    ),
    QuerySpec(
        "q_stratified_sample", q_stratified_sample,
        _ORACLE_STRATIFIED_SAMPLE, "ext:training sample",
    ),
    QuerySpec(
        "q_tfidf_topterms", q_tfidf_topterms, _ORACLE_TFIDF_TOPTERMS,
        "ext:training tfidf",
    ),
    QuerySpec(
        "q_contamination", q_contamination, _ORACLE_CONTAMINATION,
        "ext:training contamination",
    ),
    QuerySpec(
        "q_pii_redaction", q_pii_redaction, _ORACLE_PII_REDACTION,
        "ext:training pii",
    ),
    QuerySpec(
        "q_sequence_packing", q_sequence_packing, _ORACLE_SEQUENCE_PACKING,
        "ext:training packing",
    ),
    QuerySpec(
        "q_domain_mix", q_domain_mix, _ORACLE_DOMAIN_MIX,
        "ext:training mixture rebalancing",
    ),
    QuerySpec(
        "q_token_budget", q_token_budget, _ORACLE_TOKEN_BUDGET,
        "ext:training token-budget selection",
    ),
]
