"""Degenerate-corpus contracts for the round-15 vector queries —
the same discipline as tests/test_vector_degenerate_r14.py (empty /
single-vector corpora stay schema-stable and empty), plus the
ZERO-VECTOR case the r15 review called out: an all-zero embedding has
an undefined cosine, and the guards (q_ann_rerank's _qn/_cn > 0
filter, q_ann_ivfpq's _den > 0) must DROP those pairs identically in
Spark and the oracle instead of ranking a NULL/NaN where the engines'
window ordering diverges.
"""

from __future__ import annotations

import duckdb
import pytest

from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
    _ORACLE_ANN_RERANK,
    q_ann_ivf_deletes,
    q_ann_rerank,
    q_dedup_reinstate,
    q_index_roundtrip,
    q_ivf_roundtrip,
    q_pq_roundtrip,
)

CASES = [
    (q_ann_rerank, ["query_id", "rank", "neighbor_id", "cos_sim", "approx_dist"]),
    (q_ann_ivf_deletes, [
        "centroid_id", "n_rows", "n_dead", "n_live", "dead_pct",
        "needs_compaction",
    ]),
    (q_index_roundtrip, [
        "vec_id", "centroid_id", "duplicate_of", "cos_sim", "is_dup",
    ]),
    (q_pq_roundtrip, ["vec_id", "sub", "code_id", "qdist"]),
    (q_ivf_roundtrip, ["centroid_id", "n_before", "n_appended", "growth_pct"]),
    (q_dedup_reinstate, [
        "vec_id", "centroid_id", "old_keeper", "new_duplicate_of",
        "cos_sim", "reinstated",
    ]),
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


def test_rerank_drops_zero_vectors_identically_to_oracle(spark, tmp_path):
    """A corpus containing all-zero embeddings (as corpus members AND
    as a query, vec_id % 100 == 0): both engines must drop the
    undefined-cosine pairs and return hash-identical survivors."""
    dims = 8
    rows = []
    for i in range(1, 160):
        if i % 9 == 0:
            v = [0.0] * dims  # zero vectors sprinkled through the corpus
        else:
            v = [float(((i * (j + 3)) % 17) - 8) for j in range(dims)]
        rows.append((i, v, i % 3))
    rows.append((300, [0.0] * dims, 0))  # a zero QUERY vector
    rows.append((200, [1.0] * dims, 1))  # a live query vector
    d = _write(spark, tmp_path, rows, "sfz")

    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in q_ann_rerank(spark, d).collect()
    )
    con = duckdb.connect()
    con.sql(
        # Spark writes the table as a directory of part files
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    want = sorted(
        (q, rk, n, c)
        for q, rk, n, c, _a in con.sql(_ORACLE_ANN_RERANK).fetchall()
    )
    assert got == want
    assert got, "fixture produced no reranked rows"
    # the zero query emitted nothing; the live query emitted no
    # zero-vector neighbor
    qids = {g[0] for g in got}
    assert 300 not in qids and 200 in qids
    zero_ids = {i for i in range(1, 160) if i % 9 == 0}
    assert not any(g[2] in zero_ids for g in got if g[0] == 200)
