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

from gcp_healthcare_data_pipeline_spark.queries.registry import QuerySpec
from gcp_healthcare_data_pipeline_spark.session import load_tables

# ---------------------------------------------------------------------------
# shared: deterministic hash bucket (0..99) from a document id
# ---------------------------------------------------------------------------


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


QUERIES = [
    QuerySpec(
        "q_train_split", q_train_split, _ORACLE_TRAIN_SPLIT,
        "ext:training split",
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
]
