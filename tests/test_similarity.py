"""Similarity-search operator tests: exactness of brute force, recall of LSH."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucket_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_brute_force_matches_numpy(spark):
    import numpy as np

    emb = _emb(spark)
    rows = emb.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    q = vecs[0]
    sims = {
        i: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for i, v in vecs.items()
        if i != 0
    }
    expected = sorted(sims, key=lambda i: (-round(sims[i], 6), i))[:5]

    out = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=5)
    got = [r.neighbor_id for r in out.orderBy("rank").collect()]
    assert got == expected
    top = out.filter(F.col("rank") == 1).first()
    assert math.isclose(top.cos_sim, round(sims[got[0]], 6), abs_tol=1e-6)


def test_python_plane_weights_match_engine_derivation(spark):
    """lsh_bucket_topk derives hyperplane weights in Python (hashlib md5
    parity); lsh_signature is the in-engine twin. They must stay in
    lockstep or buckets silently change."""
    import hashlib

    from pyspark.sql import functions as F

    from gcp_healthcare_data_pipeline_spark.operators.similarity import (
        lsh_signature,
    )

    dims, bits = 8, 4
    vec = [0.3, -0.2, 0.9, -0.5, 0.1, 0.7, -0.8, 0.4]
    df = spark.createDataFrame([(vec,)], "_v array<double>")
    engine_bucket = df.select(
        lsh_signature("_v", bits, dims, plane_offset=0).alias("b")
    ).first().b

    python_bucket = 0
    for b in range(bits):
        s = 0.0
        for i, v in enumerate(vec):
            h = hashlib.md5(f"{b}:{i}".encode()).hexdigest()
            s += v if int(h[0], 16) % 2 == 0 else -v
        if s >= 0.0:
            python_bucket += 1 << b
    assert engine_bucket == python_bucket


def test_lsh_topk_subset_of_bucket_and_sane(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    out = lsh_bucket_topk(emb, queries, k=5, bits=2, dims=64)
    rows = out.collect()
    assert len(rows) > 0
    # ranks are dense per query, cosine within [-1, 1]
    for r in rows:
        assert 1 <= r.rank <= 5
        assert -1.0 <= r.cos_sim <= 1.0
    # with 2-bit buckets (~4 buckets), recall vs brute force should be
    # meaningful for at least one query
    bf = brute_force_topk(emb, queries, k=5)
    bf_pairs = {(r.query_id, r.neighbor_id) for r in bf.collect()}
    lsh_pairs = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(bf_pairs & lsh_pairs) > 0


def test_q_ann_lsh_embeds_perfect_subsample_recall(spark):
    """The registry query's self-reported quality pin: every result row
    carries subsample_recall (vs exact brute force on the fixed
    vec_id % 1000 == 0 query subsample), and at test SF it is 1.0."""
    from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
        q_ann_lsh,
    )

    df = q_ann_lsh(spark, "/root/testdata/sf0.001")
    assert "subsample_recall" in df.columns
    vals = {r[0] for r in df.select("subsample_recall").distinct().collect()}
    assert vals == {1.0}


def test_lsh_probe_depth_zero_rejected(spark):
    from gcp_healthcare_data_pipeline_spark.operators.similarity import (
        lsh_bucket_topk,
    )
    import pytest

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    with pytest.raises(ValueError, match="probe_depth"):
        lsh_bucket_topk(emb, queries, k=5, probe_depth=0)


def test_kmeans_block_count_scales_with_corpus(spark):
    """The derived block count k = max(K_MIN, ceil(n/block_rows)) grows
    with corpus size, with block_rows DIM-AWARE (max(1, floor(
    TARGET_BLOCK_FLOATS/dims)) — 2048 rows at these 8-dim vectors), and
    the resulting k-means blocks stay within a small factor of the
    target — the bound that keeps the semdedup / kNN-graph within-block
    self-join FOLD WORK (rows x dims per block) from going quadratic at
    scale regardless of embedding width."""
    import math

    from gcp_healthcare_data_pipeline_spark.queries import (
        vector_queries as vq,
    )

    block = max(1, vq._TARGET_BLOCK_FLOATS // 8)  # 8-dim vectors below
    for n in (500, 2048, 8192, 40000):
        emb = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(0, 7), "
                "i -> sin(cast(id * (i + 3) as double)))"
            ).alias("v"),
        )
        expect_k = max(vq._KMEANS_K_MIN, math.ceil(n / block))
        assert vq._derived_k(emb).collect()[0]["_k"] == expect_k
        cent = vq._seed_centroids(emb)
        assert cent.count() == min(expect_k, n)
        refined = vq._kmeans_recompute(vq._kmeans_assign(emb, cent))
        assigned = vq._kmeans_assign(emb, refined)
        sizes = [
            r["cnt"]
            for r in assigned.groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        ]
        assert sum(sizes) == n  # every vector assigned exactly once
        # k-means gives no hard balance guarantee; empirically blocks
        # stay within a small factor of the target on this data shape
        assert max(sizes) <= 4 * block


def test_ivf_adaptive_mod_scales_centroids(spark):
    """centroid_mod=None uses the fixed target-cluster mod, DIM-AWARE
    as of r13 (floor(TARGET_FLOATS/dims) — 2048 at these 8-dim vectors,
    256 at the 64-dim testdata): nlist grows with the corpus while
    probed clusters hold a constant float volume, same result contract
    (rank column, k rows cap)."""
    from gcp_healthcare_data_pipeline_spark.operators.similarity import (
        IVF_TARGET_CLUSTER_FLOATS,
        ivf_topk,
    )

    assert IVF_TARGET_CLUSTER_FLOATS // 64 == 256  # 64-dim testdata mod
    n = 4000
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 7), "
            "i -> sin(cast(id * (i + 3) as double)))"
        ).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") % 1000 == 0)
    out = ivf_topk(emb, queries, k=3, centroid_mod=None, probes=2)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1000, 2000, 3000}
    assert all(1 <= r["rank"] <= 3 for r in rows)
    # mod floor(16384/8)=2048 at 8 dims -> 2 centroids here; each query
    # probes 2 clusters, and the probed FLOAT volume stays constant at
    # ANY corpus size and embedding width
    assert len(rows) == 4 * 3


def test_near_identical_supers_drop_no_vectors(spark):
    """Regression (r12 review finding): two NEAR-identical vectors both
    hash-chosen as super-centroids tie at rounded distance 0.000000 in
    the centroid->super map; without the self-preference tie-break the
    higher-id super maps under the lower one, ends up CHILDLESS, and
    any vector whose 6dp-rounded distance strictly prefers it VANISHES
    through the inner child join. This fixture constructs that exact
    geometry against the real hash-derived seeds/supers of a 500-id
    corpus (seeds 138..433, supers {168, 363} — pure md5 arithmetic,
    stable by construction) and asserts the every-vector-assigned
    contract plus the discriminating routing."""
    import hashlib

    from gcp_healthcare_data_pipeline_spark.queries import (
        vector_queries as vq,
    )

    n, dims = 500, 8

    def h(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)

    k = max(
        vq._KMEANS_K_MIN,
        math.ceil(n / max(1, vq._TARGET_BLOCK_FLOATS // dims)),
    )
    buckets: dict = {}
    for i in range(n):
        b = h(i) % k
        if b not in buckets or (h(i), i) < buckets[b]:
            buckets[b] = (h(i), i)
    seeds = sorted(i for _, i in buckets.values())
    m = max(1, math.ceil(math.sqrt(k)))
    sb: dict = {}
    for c in seeds:
        b = h(c) % m
        if b not in sb or (h(c), c) < sb[b]:
            sb[b] = (h(c), c)
    supers = sorted(c for _, c in sb.values())
    assert len(supers) >= 2, "fixture degenerate: need two supers"
    sup_a, sup_b = supers[0], supers[1]
    w_id = next(i for i in range(n) if i not in seeds)

    def vec(i: int) -> list:
        if i == sup_a:
            return [0.0] * dims
        if i == sup_b:
            return [2e-7] + [0.0] * (dims - 1)  # rounds to dist 0.0 of A
        if i == w_id:
            # dist to B = 4e-7 -> rounds 0.000000; dist to A = 6e-7 ->
            # rounds 0.000001: strictly prefers super B
            return [6e-7] + [0.0] * (dims - 1)
        return [1000.0 + i, float(i % 7)] + [0.0] * (dims - 2)

    rows = [(i, vec(i)) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    assigned = vq._kmeans_assign(emb, vq._seed_centroids(emb))
    got = {r["vec_id"]: r["centroid_id"] for r in assigned.collect()}
    assert len(got) == n, f"vectors dropped: {n - len(got)}"
    # the discriminating row: w routes to super B and must find B there
    assert got[w_id] == sup_b


def test_degenerate_corpora_assignment_contract(spark):
    """The every-vector-assigned-exactly-once contract under the two
    degenerate shapes a dedup engine actually meets: a corpus where
    EVERY vector is identical (all distances tie at every level — the
    maximal-duplication regime), and a corpus smaller than K_MIN (some
    seed hash-buckets empty, m supers over fewer centroids)."""
    from gcp_healthcare_data_pipeline_spark.queries import (
        vector_queries as vq,
    )

    # 1) 300 identical vectors: ties everywhere, nothing may drop
    emb = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.expr("array(1.0d, 2.0d, 3.0d, 4.0d)").alias("v"),
    )
    assigned = vq._kmeans_assign(emb, vq._seed_centroids(emb))
    rows = assigned.collect()
    assert len(rows) == 300
    assert len({r["vec_id"] for r in rows}) == 300
    # all ties resolve to ONE deterministic centroid
    assert len({r["centroid_id"] for r in rows}) == 1
    assert all(r["dist"] == 0.0 for r in rows)

    # 2) corpus smaller than K_MIN: n=5 -> k=8 buckets, several empty
    tiny = spark.range(5).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 3), i -> cast(id * (i + 1) as double))"
        ).alias("v"),
    )
    got = vq._kmeans_assign(tiny, vq._seed_centroids(tiny)).collect()
    assert len(got) == 5
    assert len({r["vec_id"] for r in got}) == 5


def test_ivf_empty_seed_fallback(spark):
    """r12 ADVICE: ``id % mod == 0`` seed sampling yields ZERO seeds on a
    corpus whose ids are sparse / non-0-aligned (odd 1-based ids here —
    no multiple of the adaptive mod exists), and zero centroids used to
    make ivf_topk return an empty result SILENTLY. The guard falls back
    to the single hash-minimal corpus row, so the search degrades to
    brute force within one cluster instead of vanishing."""
    from gcp_healthcare_data_pipeline_spark.operators.similarity import (
        ivf_topk,
    )

    n = 100
    emb = spark.range(n).select(
        (F.col("id") * 2 + 1).alias("vec_id"),  # 1, 3, ..., 199
        F.expr(
            "transform(sequence(0, 7), "
            "i -> sin(cast(id * (i + 3) as double)))"
        ).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") <= 5)
    for mod in (None, 50):  # adaptive (2048 at 8 dims) and explicit
        out = ivf_topk(emb, queries, k=3, centroid_mod=mod, probes=2)
        rows = out.collect()
        assert {r["query_id"] for r in rows} == {1, 3, 5}, mod
        assert all(1 <= r["rank"] <= 3 for r in rows)


def test_ivf_empty_corpus_stays_empty(spark):
    """The fallback must not conjure a centroid out of nothing: an empty
    corpus still returns an empty (not failing) result."""
    from gcp_healthcare_data_pipeline_spark.operators.similarity import (
        ivf_topk,
    )

    emb = _emb(spark)
    empty = emb.filter(F.col("vec_id") < 0)
    out = ivf_topk(empty, emb.limit(2), k=3, centroid_mod=None)
    assert out.count() == 0


def test_ivf_validate_ids_rejects_duplicates(spark):
    """r12 ADVICE: duplicate ids silently collapse in the keep-1
    aggregation (first(payload) per id group). validate_ids=True makes
    that corpus fail loudly at execution time; on a unique-id corpus the
    validated plan returns the identical result."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.base import PySparkException

    from gcp_healthcare_data_pipeline_spark.operators.similarity import (
        ivf_topk,
    )

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 100 == 0)

    clean = ivf_topk(emb, queries, k=3, centroid_mod=31)
    checked = ivf_topk(emb, queries, k=3, centroid_mod=31, validate_ids=True)
    assert sorted(map(tuple, clean.collect())) == sorted(
        map(tuple, checked.collect())
    )

    dup = emb.unionByName(emb.limit(1))  # one duplicated vec_id
    # Depending on suite order PySpark surfaces the raise_error guard
    # either as the raw Py4JJavaError or converted to a
    # SparkRuntimeException (r14 verdict item 4) — accept both; the
    # contract is the guard MESSAGE, not the wrapper type.
    with pytest.raises(
        (Py4JJavaError, PySparkException), match="duplicate vec_id"
    ):
        ivf_topk(dup, queries, k=3, centroid_mod=31, validate_ids=True).collect()
