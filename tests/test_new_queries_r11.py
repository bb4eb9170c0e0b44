"""Semantic tests for the round-11 additions: exact-substring window
dedup and per-cluster coreset selection. Tiny hand-built corpora with
hand-computed expectations — the DuckDB oracle gate (tools/check.py)
covers the engine-parity side.
"""

from __future__ import annotations

from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (
    _SUBSTR_S,
    _SUBSTR_W,
    q_dedup_substring,
)
from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
    _CORESET_M,
    q_coreset_select,
)

SF001 = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "sfx")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        d + "/documents.parquet"
    )
    return d


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_substring_full_dup_and_unique(spark, tmp_path):
    """A verbatim copy shares every window (fraction 1.0); an unrelated
    doc shares none (0.0); a doc below W tokens emits no row."""
    n = _SUBSTR_W + _SUBSTR_S  # exactly 2 windows per doc
    sf_dir = _write_docs(
        spark,
        tmp_path,
        [
            (0, _words("a", n)),
            (1, _words("a", n)),          # verbatim copy of doc 0
            (2, _words("z", n)),          # unrelated
            (3, _words("q", _SUBSTR_W - 1)),  # too short: dropped
        ],
    )
    out = {r.doc_id: r for r in q_dedup_substring(spark, sf_dir).collect()}
    assert set(out) == {0, 1, 2}
    for d in (0, 1):
        assert out[d].n_windows == 2
        assert out[d].n_dup_windows == 2
        assert out[d].dup_fraction == 1.0
    assert out[2].n_windows == 2 and out[2].n_dup_windows == 0
    assert out[2].dup_fraction == 0.0


def test_substring_catches_embedded_quote(spark, tmp_path):
    """The headline case shingle-Jaccard misses: one long verbatim span
    inside otherwise-unrelated documents is detected by both sides."""
    span = _words("s", _SUBSTR_W)  # one window-sized shared span
    sf_dir = _write_docs(
        spark,
        tmp_path,
        [
            # span at position 0 in doc 0, after W+S filler tokens in
            # doc 1 — both aligned to the stride grid so the window
            # hashes coincide
            (0, span + " " + _words("x", _SUBSTR_S)),
            (1, _words("y", _SUBSTR_W + _SUBSTR_S * 2) + " " + span),
        ],
    )
    out = {r.doc_id: r for r in q_dedup_substring(spark, sf_dir).collect()}
    assert out[0].n_dup_windows >= 1
    assert out[1].n_dup_windows >= 1


def test_coreset_rank_and_cap(spark):
    """Per-cluster output is at most _CORESET_M rows with contiguous
    ranks 1..m and non-decreasing distances; every emitted vec_id is
    unique (a vector represents only its own cluster)."""
    rows = q_coreset_select(spark, SF001).collect()
    assert rows, "coreset empty on sf0.001"
    by_c = {}
    for r in rows:
        by_c.setdefault(r.centroid_id, []).append(r)
    vec_ids = [r.vec_id for r in rows]
    assert len(vec_ids) == len(set(vec_ids))
    for c, members in by_c.items():
        members.sort(key=lambda r: r.rank)
        assert 1 <= len(members) <= _CORESET_M
        assert [m.rank for m in members] == list(range(1, len(members) + 1))
        dists = [m.dist for m in members]
        assert dists == sorted(dists)
