"""Semantic tests for the round-5 additions: corpus-wide passage-level
dedup and the deterministic shuffle-and-shard export manifest. Tiny
hand-built corpora with hand-computed expectations — the DuckDB oracle
gate (tools/check.py) covers the engine-parity side."""

from __future__ import annotations

import hashlib

from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (
    q_dedup_passages,
)
from gcp_healthcare_data_pipeline_spark.queries.training_queries import (
    _N_SHARDS,
    q_shuffle_export,
)

P0 = "a b c d e"
P1 = "f g h i j"
UNIQ = "k l m n o"


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "sfx")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        d + "/documents.parquet"
    )
    return d


def test_passage_dedup_keeps_first_occurrence_only(spark, tmp_path):
    sf_dir = _write_docs(
        spark,
        tmp_path,
        [
            (0, f"{P0} {P1}"),          # both passages original
            (1, f"{P0} {UNIQ}"),        # P0 already seen in doc 0
            (2, f"{P0} {P1}"),          # fully duplicate of doc 0
        ],
    )
    out = {r.doc_id: r for r in q_dedup_passages(spark, sf_dir).collect()}
    assert out[0].n_passages == 2 and out[0].n_kept == 2
    assert out[0].cleaned_text == f"{P0} {P1}"
    assert out[1].n_passages == 2 and out[1].n_kept == 1
    assert out[1].cleaned_text == UNIQ
    assert out[2].n_passages == 2 and out[2].n_kept == 0
    assert out[2].cleaned_text == ""


def test_passage_dedup_short_tail_passage(spark, tmp_path):
    # 7 words -> one full passage + a 2-word tail passage; the tail is its
    # own dedup unit
    sf_dir = _write_docs(
        spark, tmp_path, [(0, f"{P0} x y"), (1, f"{P1} x y")]
    )
    out = {r.doc_id: r for r in q_dedup_passages(spark, sf_dir).collect()}
    assert out[0].n_passages == 2 and out[0].n_kept == 2
    # doc 1's full passage differs but its "x y" tail is a corpus dup
    assert out[1].n_passages == 2 and out[1].n_kept == 1
    assert out[1].cleaned_text == P1


def _pos(doc_id: int) -> int:
    return int(hashlib.md5(f"{doc_id}:seed42".encode()).hexdigest()[:12], 16)


def test_shuffle_export_matches_reference_hash_assignment(spark, tmp_path):
    n = 64
    sf_dir = _write_docs(
        spark, tmp_path, [(i, "w " * (i % 7 + 1).__int__() + "end") for i in range(n)]
    )
    rows = q_shuffle_export(spark, sf_dir).collect()
    # full coverage, valid shard range
    assert sum(r.n_docs for r in rows) == n
    assert all(0 <= r.shard_id < _N_SHARDS for r in rows)
    # recompute the manifest from first principles in python
    by_shard: dict[int, list[int]] = {}
    for i in range(n):
        by_shard.setdefault(_pos(i) % _N_SHARDS, []).append(i)
    for r in rows:
        docs = by_shard[r.shard_id]
        assert r.n_docs == len(docs)
        assert r.head_doc_id == min(docs, key=_pos)
        assert r.first_pos == min(_pos(i) for i in docs)
        assert r.last_pos == max(_pos(i) for i in docs)
