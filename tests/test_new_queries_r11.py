"""Semantic tests for the round-11 additions: exact-substring window
dedup and per-cluster coreset selection. Tiny hand-built corpora with
hand-computed expectations — the DuckDB oracle gate (tools/check.py)
covers the engine-parity side.
"""

from __future__ import annotations

from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (
    _SUBSTR_K,
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
    """A verbatim copy shares every fingerprint (fraction 1.0); an
    unrelated doc shares none (0.0); a doc below W+K-1 tokens emits no
    row."""
    n = _SUBSTR_W + _SUBSTR_K + 5
    sf_dir = _write_docs(
        spark,
        tmp_path,
        [
            (0, _words("a", n)),
            (1, _words("a", n)),          # verbatim copy of doc 0
            (2, _words("z", n)),          # unrelated
            (3, _words("q", _SUBSTR_W + _SUBSTR_K - 2)),  # too short
        ],
    )
    out = {r.doc_id: r for r in q_dedup_substring(spark, sf_dir).collect()}
    assert set(out) == {0, 1, 2}
    for d in (0, 1):
        assert out[d].n_fingerprints >= 1
        assert out[d].n_dup_fingerprints == out[d].n_fingerprints
        assert out[d].dup_fraction == 1.0
    assert out[2].n_fingerprints >= 1 and out[2].n_dup_fingerprints == 0
    assert out[2].dup_fraction == 0.0


def test_substring_catches_quote_at_every_alignment(spark, tmp_path):
    """The winnowing guarantee, exhaustively: one shared verbatim span
    of exactly W+K-1 tokens must be detected at EVERY offset of the
    containing document — including offsets that do not agree between
    the two documents. (A fixed-stride sampler fails all offsets whose
    difference isn't 0 mod the stride; this test is the regression pin
    for that bug class.)"""
    span = _words("s", _SUBSTR_W + _SUBSTR_K - 1)
    rows = [(0, span)]  # span at offset 0, bare
    # embed the same span after 1..K+2 filler tokens (every residue
    # class mod K represented, plus past one full window)
    for off in range(1, _SUBSTR_K + 3):
        rows.append((off, _words(f"f{off}x", off) + " " + span))
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in q_dedup_substring(spark, sf_dir).collect()}
    for off in range(0, _SUBSTR_K + 3):
        assert out[off].n_dup_fingerprints >= 1, (
            f"shared {_SUBSTR_W + _SUBSTR_K - 1}-token span missed at "
            f"offset {off}"
        )


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
