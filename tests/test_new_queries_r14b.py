"""Contract tests for the late-round-14 additions: PQ ANN, incremental
kNN-graph append, canonicalized exact dedup, bigram-LM gate. Tiny
hand-built corpora with hand-computed expectations — the DuckDB oracle
gate (tools/check.py) covers the engine-parity side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries.text_queries import (
    q_bigram_logprob,
    q_text_canonical,
)
from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
    _KNN_K,
    _PQ_CODES,
    _PQ_SUBS,
    _pq_codebook_and_codes,
    _pq_subvectors,
    q_ann_pq,
    q_knn_graph_incremental,
)


def _write_emb(spark, tmp_path, rows, name="sfe"):
    d = str(tmp_path / name)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.parquet(d + "/embeddings.parquet")
    return d


def _write_docs(spark, tmp_path, rows, name="sfd"):
    d = str(tmp_path / name)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        d + "/documents.parquet"
    )
    return d


# ---- PQ -----------------------------------------------------------------


def test_pq_subvector_slices_partition_the_vector(spark):
    """Slice boundaries floor(s*d/m) must partition the vector exactly —
    including dims NOT divisible by _PQ_SUBS (d=7 -> lengths 1,2,2,2)."""
    for dims in (7, 8, 9, 64):
        emb = spark.range(3).select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(1, {dims}), "
                "i -> CAST(id * 100 + i AS DOUBLE))"
            ).alias("v"),
        )
        back = (
            _pq_subvectors(emb)
            .groupBy("vec_id")
            .agg(
                F.flatten(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("sub", "sv"))),
                        lambda s: s["sv"],
                    )
                ).alias("rejoined")
            )
        )
        rows = {r.vec_id: r.rejoined for r in back.collect()}
        for vid in range(3):
            assert rows[vid] == [
                float(vid * 100 + i) for i in range(1, dims + 1)
            ], f"dims={dims} vec={vid}"


def test_pq_codes_structure_and_copy_consistency(spark):
    """The encoded table is exactly n x _PQ_SUBS rows, every subspace
    uses at most _PQ_CODES codewords, and EXACT COPIES of a vector get
    identical codes (assignment is a pure function of the subvector)."""
    copies, groups, dims = 3, 10, 8
    emb = spark.range(groups * copies).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dims - 1}), "
            f"i -> CASE WHEN i = CAST(id / {copies} AS INT) % {dims} "
            "THEN 4.0 ELSE 0.0 END)"
        ).alias("v"),
    )
    _cb, codes = _pq_codebook_and_codes(spark, emb)
    rows = codes.collect()
    assert len(rows) == groups * copies * _PQ_SUBS
    per_sub = {}
    by_vec = {}
    for r in rows:
        per_sub.setdefault(r.sub, set()).add(r.code_id)
        by_vec.setdefault(r.vec_id, {})[r.sub] = r.code_id
    assert set(per_sub) == set(range(1, _PQ_SUBS + 1))
    for s, cs in per_sub.items():
        assert len(cs) <= _PQ_CODES
    # identical vectors -> identical code tuples
    for g in range(groups):
        first = by_vec[g * copies]
        for c in range(1, copies):
            assert by_vec[g * copies + c] == first, f"group {g}"


def test_pq_topk_ranks_exact_duplicates_first(spark, tmp_path):
    """Queries (vec_id % 100 == 0) with exact duplicates in the corpus:
    the duplicate shares every code, so its ADC distance is the MINIMUM
    possible for that query — it must appear at rank 1 (lowest
    neighbor_id among the query's own copies wins the tie)."""
    dims = 8
    rows = []
    # 4 well-separated directions x 3 copies; ids chosen so vec 0 and
    # vec 100 are queries (% 100 == 0) with exact copies at 1, 2 / 101
    for base, direction in ((0, 0), (100, 1), (200, 2), (300, 3)):
        for c in range(3):
            v = [0.0] * dims
            v[direction] = 4.0
            rows.append((base + c, v))
    d = _write_emb(spark, tmp_path, rows)
    out = q_ann_pq(spark, d)
    top1 = {
        r.query_id: r.neighbor_id for r in out.filter("rank = 1").collect()
    }
    # every id divisible by 100 is a query; its rank-1 neighbor is its
    # own lowest-id exact copy
    assert top1[0] == 1
    assert top1[100] == 101
    assert top1[200] == 201
    assert top1[300] == 301


# ---- incremental kNN graph ----------------------------------------------


def test_knn_incremental_exact_twin_is_rank_one(spark, tmp_path):
    """A delta vector (% 10 == 0) that exactly copies a standing vector
    routes to the same cluster (assignment is a function of v) and must
    report that twin at rank 1 with cos_sim 1.0; no standing-side ids
    ever appear as sources, no delta ids as neighbors."""
    dims = 8
    rows = []
    # standing corpus: 4 directions x 3 copies, ids NOT divisible by 10
    vid = 1
    for direction in range(4):
        for _ in range(3):
            v = [0.0] * dims
            v[direction] = 4.0
            rows.append((vid, v))
            vid += 1
            if vid % 10 == 0:
                vid += 1
    # delta: ids 10, 20 copy standing directions 0 and 2 exactly
    v0 = [0.0] * dims
    v0[0] = 4.0
    v2 = [0.0] * dims
    v2[2] = 4.0
    rows += [(10, v0), (20, v2)]
    d = _write_emb(spark, tmp_path, rows)
    out = q_knn_graph_incremental(spark, d).collect()
    assert {r.vec_id for r in out} == {10, 20}
    for r in out:
        assert r.neighbor_id % 10 != 0
        assert 1 <= r.rank <= _KNN_K
    rank1 = {r.vec_id: r for r in out if r.rank == 1}
    assert rank1[10].cos_sim == 1.0
    assert rank1[20].cos_sim == 1.0


def test_knn_incremental_empty_delta(spark, tmp_path):
    """No ids divisible by 10 -> empty (schema-stable) result."""
    dims = 4
    rows = [(i, [float(i)] * dims) for i in (1, 2, 3, 11, 12)]
    d = _write_emb(spark, tmp_path, rows)
    out = q_knn_graph_incremental(spark, d)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "rank", "neighbor_id", "cos_sim",
    ]


# ---- canonicalized dedup -------------------------------------------------


def test_text_canonical_reunites_case_and_spacing_variants(spark, tmp_path):
    """Three re-encodings of one sentence canonicalize together (plus
    their mangled twins): one group of 6 copies / 6 raw variants. A
    unique doc still forms a group of 2 with its own mangled twin."""
    d = _write_docs(
        spark,
        tmp_path,
        [
            (0, "Hello, World!"),
            (1, "hello world"),
            (2, "HELLO  world"),
            (3, "something else entirely"),
        ],
    )
    out = q_text_canonical(spark, d).collect()
    by_keeper = {r.keeper_id: r for r in out}
    assert set(by_keeper) == {0, 3}
    g = by_keeper[0]
    assert g.n_copies == 6
    assert g.n_raw_variants == 6
    u = by_keeper[3]
    assert u.n_copies == 2  # raw + mangled twin
    assert u.n_raw_variants == 2


# ---- bigram LM gate --------------------------------------------------------


def test_bigram_logprob_orders_structured_above_shuffled(spark, tmp_path):
    """Docs whose bigrams repeat corpus-wide outscore a doc of the same
    TOKENS in an order whose bigrams never repeat — the sequence
    signal a unigram gate cannot see. Docs under 2 tokens emit no row."""
    # 60 copies put every token's unigram count above _LM_MIN_DF (50),
    # so the bigram term is LIVE (w1 in vocab) — with a sub-min-df
    # vocab the gate correctly degrades to backoff-only and the two
    # docs would tie (the regime the review-found denominator-floor
    # fix pinned: an out-of-vocab w1 must zero the bigram term, never
    # floor its denominator)
    common = "the cat sat on the mat"
    rows = [(i, common) for i in range(60)]
    rows.append((100, "mat the on sat cat the"))  # same tokens, new order
    rows.append((101, "single"))  # < 2 tokens: no bigrams, no row
    d = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in q_bigram_logprob(spark, d).collect()}
    assert 101 not in out
    assert set(out) == set(range(60)) | {100}
    assert out[0].n_bigrams == 5
    assert out[0].n_seen_bigrams == 5  # every bigram repeats 60x
    assert out[100].n_seen_bigrams == 0  # shuffled order: none repeat
    assert out[0].avg_logprob > out[100].avg_logprob
    assert out[0].avg_logprob < 0  # p <= 1 always: no positive logs

# ---- IVF-PQ composition ----------------------------------------------------


def test_ivfpq_rank_one_is_same_direction(spark, tmp_path):
    """On orthogonal direction clusters, ADC cosine to a same-direction
    copy is ~1 and to any other direction ~0 — rank 1 must stay within
    the query's own direction group, and output is capped at 5/query."""
    from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
        q_ann_ivfpq,
    )

    dims, copies = 8, 3
    rows = []
    groups = {}
    for base, direction in ((0, 0), (100, 1), (200, 2), (300, 3)):
        ids = [base + c for c in range(copies)]
        groups[base] = set(ids)
        for vid in ids:
            v = [0.0] * dims
            v[direction] = 4.0
            rows.append((vid, v))
    d = _write_emb(spark, tmp_path, rows)
    out = q_ann_ivfpq(spark, d).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == {0, 100, 200, 300}
    for qid, rs in per_q.items():
        assert len(rs) <= 5
        top = min(rs, key=lambda r: r.rank)
        assert top.neighbor_id in groups[qid] - {qid}, (
            f"query {qid} rank-1 left its direction group: {top}"
        )


# ---- label denoising -------------------------------------------------------


def test_label_denoise_flags_the_flipped_label(spark, tmp_path):
    """Two orthogonal groups with direction-consistent labels, one
    vector mislabeled: only the flipped vector is flagged, its
    predicted label is the group majority, and agreement counts see
    the flipped neighbor."""
    from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
        q_label_denoise,
    )

    dims, per_group = 8, 6
    rows = []
    for g in range(2):
        for c in range(per_group):
            v = [0.0] * dims
            v[g] = 4.0
            vid = g * per_group + c
            label = g if not (g == 0 and c == 0) else 1  # flip vec 0
            rows.append((vid, v, label))
    d = str(tmp_path / "sfl")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(d + "/embeddings.parquet")
    out = {r.vec_id: r for r in q_label_denoise(spark, d).collect()}
    assert len(out) == 2 * per_group
    assert out[0].is_relabel == 1
    assert out[0].predicted_label == 0  # the group majority
    assert out[0].n_agree == 0  # no neighbor carries the flipped label
    for vid, r in out.items():
        if vid == 0:
            continue
        assert r.is_relabel == 0, f"clean vector {vid} flagged: {r}"

# ---- hard negatives & incremental PQ --------------------------------------


def test_hard_negatives_finds_mixed_label_neighbors(spark, tmp_path):
    """One direction cluster with alternating labels: every vector's
    hard negatives are the other-label members (cos 1.0), top-K by
    lowest neighbor id; a pure-label corpus yields no rows."""
    from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
        q_hard_negatives,
    )

    dims, n = 8, 8
    rows = []
    for vid in range(n):
        v = [0.0] * dims
        v[0] = 4.0
        rows.append((vid, v, vid % 2))  # labels alternate 0/1
    d = str(tmp_path / "sfh")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(d + "/embeddings.parquet")
    out = {}
    for r in q_hard_negatives(spark, d).collect():
        out.setdefault(r.vec_id, []).append(r)
    assert set(out) == set(range(n))
    for vid, rs in out.items():
        assert len(rs) == 3  # _KNN_K other-label members exist
        expect = [i for i in range(n) if i % 2 != vid % 2][:3]
        got = [r.neighbor_id for r in sorted(rs, key=lambda r: r.rank)]
        assert got == expect, f"vec {vid}: {got} != {expect}"
        assert all(r.cos_sim == 1.0 for r in rs)
        assert all(r.neg_label != vid % 2 for r in rs)


def test_pq_incremental_codes_come_from_standing_codebook(spark, tmp_path):
    """Delta rows = |delta| x _PQ_SUBS; every code_id is a STANDING
    corpus id (the codebook was trained without the delta); qdist >= 0;
    and a delta vector that exactly copies a standing vector gets that
    vector's standing code tuple."""
    from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
        _pq_codebook_and_codes,
        q_pq_incremental,
    )
    from pyspark.sql import functions as F

    dims = 8
    rows = []
    vid = 1
    for direction in range(4):
        for _ in range(4):
            v = [0.0] * dims
            v[direction] = 4.0
            rows.append((vid, v))
            vid += 1
            if vid % 10 == 0:
                vid += 1
    v0 = [0.0] * dims
    v0[0] = 4.0
    rows.append((10, v0))  # delta copy of standing direction 0
    d = _write_emb(spark, tmp_path, rows)
    out = q_pq_incremental(spark, d).collect()
    delta_ids = {r.vec_id for r in out}
    assert delta_ids == {10}
    assert len(out) == 1 * 4  # _PQ_SUBS rows
    assert all(r.code_id % 10 != 0 for r in out)
    assert all(r.qdist >= 0.0 for r in out)
    # the standing twin (vec 1, same vector) must carry the same codes
    emb = (
        spark.read.parquet(d + "/embeddings.parquet")
        .filter(F.col("vec_id") % 10 != 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    _cb, codes = _pq_codebook_and_codes(spark, emb)
    standing = {
        r.sub: r.code_id for r in codes.filter("vec_id = 1").collect()
    }
    got = {r.sub: r.code_id for r in out}
    assert got == standing
