"""Degenerate-corpus contracts for the late-round-14 vector queries
(same discipline as tests/test_multimodal_chain_degenerate.py): empty
and single-vector corpora must yield schema-stable EMPTY results —
never a crash, never a partial row — because at 100 TB a filter chain
can legally hand any operator an empty partition-pruned input.
"""

from __future__ import annotations

import pytest

from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
    q_ann_ivfpq,
    q_ann_pq,
    q_hard_negatives,
    q_label_denoise,
    q_pq_incremental,
)

CASES = [
    (q_ann_pq, ["query_id", "neighbor_id", "approx_dist", "rank"]),
    (q_ann_ivfpq, ["query_id", "neighbor_id", "approx_cos", "rank"]),
    (
        q_label_denoise,
        [
            "vec_id", "label", "predicted_label",
            "n_neighbors", "n_agree", "is_relabel",
        ],
    ),
    (
        q_hard_negatives,
        ["vec_id", "rank", "neighbor_id", "neg_label", "cos_sim"],
    ),
    (q_pq_incremental, ["vec_id", "sub", "code_id", "qdist"]),
]


def _write(spark, tmp_path, rows, name):
    d = str(tmp_path / name)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(d + "/embeddings.parquet")
    return d


@pytest.mark.parametrize("fn,cols", CASES, ids=[c[0].__name__ for c in CASES])
def test_empty_corpus_is_schema_stable_empty(spark, tmp_path, fn, cols):
    d = _write(spark, tmp_path, [], "sfe")
    out = fn(spark, d)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == cols


@pytest.mark.parametrize("fn,cols", CASES, ids=[c[0].__name__ for c in CASES])
def test_single_vector_corpus_is_empty(spark, tmp_path, fn, cols):
    """One vector: no query ids (% 100), no delta ids (% 10), no pairs,
    no different-label neighbors — every query must return zero rows
    with its declared schema rather than raising."""
    d = _write(spark, tmp_path, [(1, [1.0, 2.0, 3.0, 4.0], 0)], "sf1")
    out = fn(spark, d)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == cols
