"""Contract tests for the semantic shard driver over the kNN graph
(q_knn_graph_sharded): the shard key is a coarse nearest-centroid
route, so identical vectors ALWAYS co-route — on an exact-copies corpus
every true neighbor edge survives sharding, which is the property the
semantic split exists for (a hash split would scatter them).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries import vector_queries as vq

N_GROUPS, COPIES, DIMS = 30, 4, 32


def _copies_corpus(spark):
    """30 groups x 4 EXACT copies of one-hot 32-dim vectors: within-group
    cosine 1.0, cross-group cosine 0.0."""
    return spark.range(N_GROUPS * COPIES).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIMS - 1}), "
            f"i -> CASE WHEN i = CAST(id / {COPIES} AS INT) "
            "THEN cast(1.0 as double) ELSE cast(0.0 as double) END)"
        ).alias("v"),
    )


def test_copies_keep_all_true_edges(spark):
    """Identical vectors co-route to the same semantic shard AND
    co-assign within it, so every vector's top-3 neighbors are exactly
    its 3 group twins at cosine 1.0 — the full true edge set, with no
    cross-shard loss."""
    emb = _copies_corpus(spark).localCheckpoint(eager=False)
    rows = vq._knn_graph_sharded_result(spark, emb).collect()
    # every vector appears with its full top-3
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["vec_id"], []).append(r)
    assert set(by_src) == set(range(N_GROUPS * COPIES))
    for src, edges in by_src.items():
        group = src // COPIES
        twins = {group * COPIES + i for i in range(COPIES)} - {src}
        assert {e["neighbor_id"] for e in edges} == twins
        assert all(e["cos_sim"] == 1.0 for e in edges)
        assert sorted(e["rank"] for e in edges) == [1, 2, 3]


def test_matches_unsharded_on_copies(spark):
    """On the exact-copies corpus the unsharded cluster-blocked graph
    finds the same edge set (both reduce to the analytic ground truth),
    so the semantic split costs nothing here — edge-set equality,
    rank-for-rank."""
    emb = _copies_corpus(spark).localCheckpoint(eager=False)
    got = sorted(
        map(tuple, vq._knn_graph_sharded_result(spark, emb).collect())
    )
    want = sorted(map(tuple, vq._knn_graph_block(emb).collect()))
    assert got == want


def test_empty_corpus_schema_stable(spark):
    empty = _copies_corpus(spark).filter(F.col("vec_id") < 0)
    out = vq._knn_graph_sharded_result(spark, empty)
    assert out.columns == ["vec_id", "rank", "neighbor_id", "cos_sim"]
    assert out.count() == 0
