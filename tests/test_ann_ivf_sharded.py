"""Contract tests for the scatter-gather sharded IVF (r13 verdict
item 1: the shard driver generalized from q_semdedup_sharded to the
search family).

Pins: (a) n_shards=1 degrades to EXACTLY the unsharded q_ann_ivf plan
(the global re-rank is a no-op on one shard's top-k); (b) when every
shard's index falls back to one centroid (sparse id space), the
scatter-gather equals EXACT brute force — per-shard truncation is
lossless for the global top-k; (c) degenerate corpora stay
schema-stable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
)
from gcp_healthcare_data_pipeline_spark.queries import vector_queries as vq

SF_DIR = "/root/testdata/sf0.001"


def test_single_shard_equals_unsharded(spark):
    """n_shards=1: one shard IS the corpus, so the per-shard ivf_topk is
    q_ann_ivf's exact plan and the gather re-rank reproduces its ranks
    row-for-row."""
    emb = vq.load_tables(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    got = sorted(
        map(tuple, vq._ann_ivf_sharded_result(emb, queries, 1).collect())
    )
    want = sorted(map(tuple, vq.q_ann_ivf(spark, SF_DIR).collect()))
    assert got == want
    assert len(got) > 0


def _copies_corpus(spark, n_groups=20, copies=4, dims=32):
    """Groups of EXACT copies of one-hot vectors: within-group cosine
    1.0, cross-group 0.0. Ids are dense 0..n-1, far below the dim-aware
    seed mod (16384/32 = 512), so every shard except possibly id-0's
    takes the empty-seed fallback -> one centroid -> per-shard brute
    force."""
    return spark.range(n_groups * copies).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dims - 1}), "
            f"i -> CASE WHEN i = CAST(id / {copies} AS INT) "
            "THEN cast(1.0 as double) ELSE cast(0.0 as double) END)"
        ).alias("embedding"),
    )


def test_fallback_shards_equal_brute_force(spark):
    """With one centroid per shard (fallback regime) every query scores
    ALL of every shard's members, so scatter + per-shard top-k + global
    re-rank must equal EXACT brute-force top-k — the losslessness of
    per-shard truncation, exercised end to end."""
    emb = _copies_corpus(spark).localCheckpoint(eager=False)
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    got = sorted(
        map(tuple, vq._ann_ivf_sharded_result(emb, queries, 3).collect())
    )
    want = sorted(
        map(tuple, brute_force_topk(emb, queries, k=vq._K).collect())
    )
    assert got == want
    # rank-1 of every query is an identical copy (cosine 1.0): the
    # query's twin lives in SOME shard and that shard must surface it
    rank1 = {
        r["query_id"]: r["cos_sim"]
        for r in vq._ann_ivf_sharded_result(emb, queries, 3)
        .filter(F.col("rank") == 1)
        .collect()
    }
    assert set(rank1) == {0, 10, 20, 30, 40, 50, 60, 70}
    assert all(v == 1.0 for v in rank1.values())


def test_empty_corpus_schema_stable(spark):
    empty = _copies_corpus(spark).filter(F.col("vec_id") < 0)
    out = vq._ann_ivf_sharded_result(empty, empty, 3)
    assert out.columns == ["query_id", "neighbor_id", "cos_sim", "rank"]
    assert out.count() == 0


def test_tiny_corpus_fewer_rows_than_shards(spark):
    """2 vectors over 3 shards: at least one shard is empty; the empty
    shard contributes nothing and the populated ones still answer."""
    emb = _copies_corpus(spark, n_groups=1, copies=2)
    out = vq._ann_ivf_sharded_result(emb, emb, 3).collect()
    got = {(r["query_id"], r["neighbor_id"], r["cos_sim"]) for r in out}
    assert got == {(0, 1, 1.0), (1, 0, 1.0)}
