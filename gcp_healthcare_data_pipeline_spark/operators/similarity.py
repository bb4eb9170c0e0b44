"""Similarity search over embedding columns.

- :func:`brute_force_topk` — exact cosine top-k: broadcast the (small)
  query set against the corpus, window-rank per query. The corpus-side
  scan is embarrassingly parallel; the only shuffle is the per-query
  top-k (tiny). This is the correctness baseline.
- :func:`lsh_bucket_topk` — the scale path: deterministic random-
  hyperplane LSH (signs derived from md5 of dimension index, so the
  "random" planes are reproducible without a seed exchange) buckets the
  corpus; each query only scores its own bucket ± probes. At 100 TB the
  bucket join replaces the full cross product; recall is tunable by
  signature bits / number of probe permutations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.functions.vectors import (
    as_double,
    cosine,
)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (self-matches excluded).

    Ranking is on cosine rounded to 6dp with id tie-break, making the
    result deterministic and oracle-comparable.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qv")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def lsh_signature(vec_col: str, bits: int, dims: int) -> F.Column:
    """Random-hyperplane signature: bit b = sign of sum_i(w_bi * v_i),
    with deterministic pseudo-random weights w_bi ∈ {-1,+1} derived from
    md5(b:i) parity — reproducible across engines and runs."""
    terms = (
        f"aggregate(sequence(0, {dims - 1}), cast(0.0 as double), (acc, i) -> acc + "
        f"CASE WHEN (instr('0123456789abcdef', substr(md5(concat(cast(b as string), ':', cast(i as string))), 1, 1)) - 1) % 2 = 0 "
        f"THEN element_at({vec_col}, i + 1) ELSE -element_at({vec_col}, i + 1) END)"
    )
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), (acc, b) -> "
        f"acc + CASE WHEN ({terms}) >= 0.0 THEN shiftleft(cast(1 as bigint), b) "
        f"ELSE cast(0 as bigint) END)"
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    bits: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing the query's
    LSH bucket. Trades recall for a bucket-local join."""
    sig = lsh_signature("_v", bits, dims)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_v")
    ).withColumn("bucket", sig)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("_v")
    ).withColumn("bucket", sig)
    scored = (
        F.broadcast(q.select("query_id", "bucket", F.col("_v").alias("_qv")))
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
