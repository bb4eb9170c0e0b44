"""Dedup operator unit tests on tiny corpora with known structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    jaccard,
    lsh_candidate_pairs,
    minhash_signatures,
    with_shingles,
    with_simhash,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 1
    (3, "completely different content about spark distributed query engines"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (5, "tiny"),  # < 3 tokens: dropped by shingling
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_deterministic_keeper(spark):
    out = {
        r.content_hash: (r.keeper_id, r.n_copies)
        for r in exact_dedup(_docs(spark), "text", "doc_id").collect()
    }
    # 1 and 4 collapse; keeper is min id
    assert (1, 2) in out.values()
    assert len(out) == 4


def test_shingles_guard_short_docs(spark):
    sh = with_shingles(_docs(spark), "text", n=3)
    ids = [r.doc_id for r in sh.select("doc_id").collect()]
    assert 5 not in ids and len(ids) == 4
    row = {r.doc_id: r.shingles for r in sh.collect()}
    assert "the quick brown" in row[1]


def test_lsh_finds_near_and_exact_dups(spark):
    sig = minhash_signatures(with_shingles(_docs(spark), "text", 3), "doc_id", "shingles", k=12)
    pairs = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sig, "doc_id", "sig", 6, 2).collect()
    }
    assert (1, 4) in pairs  # exact dup always collides
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup found
    assert (1, 3) not in pairs  # unrelated docs don't collide


def test_jaccard_values(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c"], ["b", "c", "d"])], "sa array<string>, sb array<string>"
    )
    assert df.select(jaccard(F.col("sa"), F.col("sb")).alias("j")).first().j == 0.5


def test_simhash_exact_dups_equal_signatures(spark):
    out = {r.doc_id: r.simhash for r in with_simhash(_docs(spark), "text").collect()}
    assert out[1] == out[4]
    assert 0 <= out[1] < 2**16
    # near-dup should be closer in hamming distance than unrelated doc
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(out[1], out[2]) <= ham(out[1], out[3])


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    # pair 10-11, and an untouched vertex pair 20-21
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (21, 20)],
        "id_a bigint, id_b bigint",
    )
    got = {
        r.id: r.component for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_max_iter_caps_rounds(spark):
    # a long chain with max_iter=1: one propagation round cannot carry
    # the min label to the far end — labels are a valid partial state
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a bigint, id_b bigint"
    )
    got = {
        r.id: r.component
        for r in connected_components(edges, max_iter=1).collect()
    }
    assert got[2] == 1 and got[5] == 4  # one hop of min-propagation only


def test_connected_components_matches_union_find(spark):
    # property check vs a driver-side union-find reference on a few
    # deterministic pseudo-random graphs (hypothesis-style, but with
    # fixed seeds: a Spark session per example is too slow for shrinking)
    import random

    for seed in (7, 42, 1337):
        rng = random.Random(seed)
        n, m = 40, 55
        es = sorted(
            {
                tuple(sorted((rng.randrange(n), rng.randrange(n))))
                for _ in range(m)
            }
        )
        es = [(a, b) for a, b in es if a != b]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in es:
            parent[find(a)] = find(b)
        want = {
            v: min(u for u in range(n) if find(u) == find(v))
            for v in range(n)
            if any(v in e for e in es)
        }
        edges = spark.createDataFrame(es, "id_a bigint, id_b bigint")
        got = {
            r.id: r.component for r in connected_components(edges).collect()
        }
        assert got == want, f"seed {seed}"


def test_lsh_params_adaptive_shape():
    """r grows one row per corpus decade, b holds recall >= 0.9 at
    J=0.6, and the historical (2, 6, 12) is reproduced for n <= 1000 so
    small-corpus results are unchanged by the adaptive switch."""
    from gcp_healthcare_data_pipeline_spark.operators.dedup import lsh_params

    assert lsh_params(50) == (2, 6, 12)
    assert lsh_params(1000) == (2, 6, 12)
    assert lsh_params(5000) == (3, 10, 30)
    assert lsh_params(50000) == (4, 17, 68)
    # the r-clamp: uncapped r would be 5 at 10^6 (k=145) and 9 at 10^10
    # (k>2000) — past spark.sql.codegen.maxFields=100 the k-MIN groupBy
    # drops out of whole-stage codegen, so the shape pins at (4, 17, 68)
    assert lsh_params(10**6) == (4, 17, 68)
    assert lsh_params(10**10) == (4, 17, 68)
    prev_r = 0
    for n in (10, 100, 1000, 10**4, 10**5, 10**6, 10**7):
        r, b, k = lsh_params(n)
        assert r >= prev_r  # band width monotone in corpus size
        prev_r = r
        assert k == r * b
        assert k <= 68 < 100  # signature agg stays inside codegen
        # the S-curve recall guarantee the b formula encodes
        assert 1 - (1 - 0.6**r) ** b >= 0.9


def test_lsh_params_match_duckdb_oracle_formula():
    """The oracle-side param CTE (_lsh_sql_cte) must compute the SAME
    (r, nb) as the Python lsh_params for every corpus size the oracles
    can see — IEEE-double parity of LOG10/LN/POWER/CEIL across engines
    is what keeps candidate sets bit-identical. Runs the PRODUCTION CTE
    string verbatim against a synthetic ``documents`` view of each size
    (a hand-copied formula here once masked a missing zero guard in the
    real CTE), including n=0: both engines must fall back to the n=1
    shape on an empty corpus instead of erroring on LOG10(0)."""
    import duckdb

    from gcp_healthcare_data_pipeline_spark.operators.dedup import lsh_params
    from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (
        _lsh_sql_cte,
    )

    con = duckdb.connect()
    for n in (
        0, 1, 50, 500, 999, 1000, 1001, 5000, 15000, 50000,
        10**6, 10**7, 10**9,  # clamp territory: both engines pin r=4
    ):
        con.sql(
            "CREATE OR REPLACE VIEW documents AS "
            f"SELECT range AS doc_id FROM range({n})"
        )
        got = con.sql(
            "WITH sh AS (SELECT 0 AS doc_id, ['a'] AS shingles), "
            f"{_lsh_sql_cte('sh')} SELECT r, nb FROM lshp"
        ).fetchone()
        r, b, _k = lsh_params(n)
        assert got == (r, b), f"n={n}: sql={got} python={(r, b)}"
