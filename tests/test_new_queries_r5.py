"""Semantic tests for the round-5 additions: corpus-wide passage-level
dedup, the deterministic shuffle-and-shard export manifest, int8
embedding quantization, and tokenizer OOV-rate. Tiny hand-built corpora
with hand-computed expectations — the DuckDB oracle gate
(tools/check.py) covers the engine-parity side."""

from __future__ import annotations

import hashlib
import math

import pytest

from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (
    q_dedup_passages,
)
from gcp_healthcare_data_pipeline_spark.queries.text_queries import (
    _VOCAB_V,
    q_oov_rate,
)
from gcp_healthcare_data_pipeline_spark.queries.training_queries import (
    _N_SHARDS,
    q_shuffle_export,
)
from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
    q_embedding_quantize,
)

P0 = "a b c d e"
P1 = "f g h i j"
UNIQ = "k l m n o"


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "sfx")
    spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'xx' AS lang"
    ).write.parquet(d + "/documents.parquet")
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


def test_importance_weights_favor_target_domain(spark, tmp_path):
    from gcp_healthcare_data_pipeline_spark.queries.training_queries import (
        q_importance_weights,
    )

    d = str(tmp_path / "sfd")
    rows = [(i, "alpha beta alpha beta gamma", "en") for i in range(4)] + [
        (i, "delta epsilon delta epsilon zeta", "zh") for i in range(4, 8)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in q_importance_weights(spark, d).collect()}
    assert len(out) == 8
    # docs made of target-domain (en) tokens must outscore the others
    for en_doc in range(4):
        for zh_doc in range(4, 8):
            assert out[en_doc].dsir_score > out[zh_doc].dsir_score
    assert all(out[i].n_tokens == 5 for i in out)


def test_embedding_quantize_reconstruction_error(spark, tmp_path):
    d = str(tmp_path / "sfe")
    vecs = [(0, [1.0, -0.5, 0.25, 0.0]), (1, [127.0, 1.0, 0.0, -127.0])]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    ).write.parquet(d + "/embeddings.parquet")
    out = {r.vec_id: r for r in q_embedding_quantize(spark, d).collect()}
    for vid, v in vecs:
        scale = max(abs(x) for x in v) / 127.0
        err = [x - math.floor(x / scale + 0.5) * scale for x in v]
        assert out[vid].scale == pytest.approx(scale, abs=1e-9)
        assert out[vid].mse == pytest.approx(
            sum(e * e for e in err) / len(v), abs=1e-11
        )
        assert out[vid].max_err == pytest.approx(
            max(abs(e) for e in err), abs=1e-8
        )
    # vec 1's values are exact int8 multiples of scale=1.0 -> zero error
    assert out[1].mse == 0.0 and out[1].max_err == 0.0


def test_oov_rate_vocab_boundary(spark, tmp_path):
    # corpus with _VOCAB_V + 2 distinct tokens: t00..t25, frequency
    # strictly decreasing with index, so the vocab is exactly t00..t23
    # and every occurrence of t24/t25 counts as OOV
    n_tok = _VOCAB_V + 2
    words = []
    for i in range(n_tok):
        words += [f"t{i:02d}"] * (n_tok + 1 - i)
    # spread across 9 docs round-robin
    docs = [(i, " ".join(words[i::9])) for i in range(9)]
    d = _write_docs(spark, tmp_path, docs)
    out = {r.doc_id: r for r in q_oov_rate(spark, d).collect()}
    exp_oov = {
        i: sum(1 for w in words[i::9] if w in ("t24", "t25")) for i in range(9)
    }
    for i, text in docs:
        n = len(text.split(" "))
        assert out[i].n_tokens == n
        assert out[i].n_oov == exp_oov[i]
        assert out[i].oov_pct == pytest.approx(
            round(exp_oov[i] * 100.0 / n, 4), abs=1e-9
        )
