"""Deduplication queries over ``documents`` (north-star ops).

- q_dedup_exact: hash-groupBy dedup of a re-ingested batch (the reference's
  claims double-load scenario, claims.py:25) with deterministic keeper.
- q_dedup_minhash_lsh: MinHash banding -> candidate pairs -> exact Jaccard
  verify. The oracle reproduces the identical md5-based signatures, so the
  candidate set (not just the final answer) is engine-portable.
- q_dedup_ngram_jaccard: inverted-index n-gram join with a document-
  frequency cap — the classic exact near-dup path at scale.
- q_dedup_simhash: bit-voted simhash signatures (rows checked vs oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    jaccard,
    lsh_candidate_pairs,
    with_minhash,
    with_shingles,
    with_simhash,
)
from gcp_healthcare_data_pipeline_spark.queries.registry import QuerySpec
from gcp_healthcare_data_pipeline_spark.session import load_tables

_JACCARD_THRESHOLD = 0.6
_DF_CAP = 50  # n-gram inverted-index document-frequency cap


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-ingest simulation: documents ∪ (documents with offset ids),
    dedup on content hash, keep min doc_id."""
    docs = load_tables(spark, sf_dir, "documents").select("doc_id", "text")
    reingested = docs.select(
        (F.col("doc_id") + F.lit(100000)).alias("doc_id"), "text"
    )
    return exact_dedup(docs.unionByName(reingested), "text", "doc_id")


_ORACLE_DEDUP_EXACT = """
WITH all_rows AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
)
SELECT md5(text) AS content_hash,
       MIN(doc_id) AS keeper_id,
       COUNT(*) AS n_copies
FROM all_rows
GROUP BY 1
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(k=12) + LSH(6 bands x 2 rows) candidates, exact-Jaccard
    verified at >= 0.6."""
    docs = load_tables(spark, sf_dir, "documents").select("doc_id", "text")
    sh = with_shingles(docs, "text", n=3)
    sig = with_minhash(sh, "shingles", k=12)
    cand = lsh_candidate_pairs(sig, "doc_id", "sig", bands=6, rows_per_band=2)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )


_ORACLE_DEDUP_MINHASH = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, len(toks) - 1),
      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS shingles
  FROM d WHERE len(toks) >= 3
), sig AS (
  SELECT doc_id, shingles,
    list_transform(range(0, 12),
      j -> list_min(list_transform(shingles,
             s -> md5(CAST(j AS VARCHAR) || ':' || s)))) AS sig
  FROM sh
), bands AS (
  SELECT doc_id,
         CAST(b AS VARCHAR) || ':' || md5(sig[2 * b + 1] || sig[2 * b + 2])
           AS band_key
  FROM sig, UNNEST(range(0, 6)) AS t(b)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
  ROUND(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
        / len(list_distinct(x.shingles || y.shingles)), 6) AS jaccard
FROM cand c
JOIN sh x ON x.doc_id = c.doc_a
JOIN sh y ON y.doc_id = c.doc_b
WHERE CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
      / len(list_distinct(x.shingles || y.shingles)) >= {_JACCARD_THRESHOLD}
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard via inverted index.

    Explode shingles -> per-shingle posting list -> pair join, with a
    document-frequency cap on shingles (common shingles add candidates
    without adding information — the cap bounds the worst-case join
    fan-out at scale). Pairs sharing >= 5 rare shingles are scored.
    """
    docs = load_tables(spark, sf_dir, "documents").select("doc_id", "text")
    sh = with_shingles(docs, "text", n=3)
    posting = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    rare = (
        posting.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= _DF_CAP))
    )
    posting = posting.join(rare.select("shingle"), "shingle")
    pairs = (
        posting.alias("a")
        .join(
            posting.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 5)
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("n_shared"),
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )


_ORACLE_DEDUP_NGRAM = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, len(toks) - 1),
      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS shingles
  FROM d WHERE len(toks) >= 3
), posting AS (
  SELECT doc_id, UNNEST(shingles) AS shingle FROM sh
), rare AS (
  SELECT shingle FROM posting GROUP BY 1
  HAVING COUNT(*) >= 2 AND COUNT(*) <= {_DF_CAP}
), rp AS (
  SELECT p.doc_id, p.shingle FROM posting p JOIN rare r USING (shingle)
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM rp a JOIN rp b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= 5
)
SELECT p.doc_a, p.doc_b, p.n_shared,
  ROUND(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
        / len(list_distinct(x.shingles || y.shingles)), 6) AS jaccard
FROM pairs p
JOIN sh x ON x.doc_id = p.doc_a
JOIN sh y ON y.doc_id = p.doc_b
WHERE CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
      / len(list_distinct(x.shingles || y.shingles)) >= {_JACCARD_THRESHOLD}
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit simhash signature per document."""
    docs = load_tables(spark, sf_dir, "documents").select("doc_id", "text")
    return with_simhash(docs, "text", bits=16).select("doc_id", "simhash")


_ORACLE_DEDUP_SIMHASH = """
WITH d AS (
  SELECT doc_id,
    list_transform(string_split(text, ' '), t -> md5(t)) AS hs
  FROM documents
)
SELECT doc_id,
  list_sum(list_transform(range(0, 16), j ->
    CASE WHEN 2 * len(list_filter(hs, h ->
        ((strpos('0123456789abcdef', substr(h, 1 + (j // 4), 1)) - 1)
          >> (j % 4)) & 1 = 1)) >= len(hs)
      THEN (1::BIGINT << j) ELSE 0 END)) AS simhash
FROM d
"""


QUERIES = [
    QuerySpec("q_dedup_exact", q_dedup_exact, _ORACLE_DEDUP_EXACT, "ext:dedup A7"),
    QuerySpec(
        "q_dedup_minhash_lsh", q_dedup_minhash_lsh, _ORACLE_DEDUP_MINHASH,
        "ext:dedup",
    ),
    QuerySpec(
        "q_dedup_ngram_jaccard", q_dedup_ngram_jaccard, _ORACLE_DEDUP_NGRAM,
        "ext:dedup",
    ),
    QuerySpec(
        "q_dedup_simhash", q_dedup_simhash, _ORACLE_DEDUP_SIMHASH, "ext:dedup",
    ),
]
