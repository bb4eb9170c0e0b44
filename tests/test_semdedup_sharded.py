"""Shard-driver contract tests (r13 verdict item 1).

The executable shard policy must (a) keep every per-shard centroid
table under the budget the shard size implies, (b) produce the SAME
final survivor set as the unsharded q_semdedup plan on a corpus of
exact-duplicate groups spanning several shards — the regime where
"sharding + boundary reconciliation" has a well-defined ground truth —
and (c) degrade to exactly the unsharded plan when the corpus fits one
shard.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.operators.similarity import (
    SHARD_CENTROID_BUDGET_FLOATS,
    shard_vectors,
)
from gcp_healthcare_data_pipeline_spark.queries import vector_queries as vq

N_GROUPS, COPIES, DIMS = 30, 4, 32


def _copies_corpus(spark):
    """30 groups x 4 EXACT copies of one-hot-ish 32-dim vectors:
    within-group cosine 1.0 (>= threshold), cross-group cosine 0.0
    (< threshold), and identical vectors co-assign in ANY deterministic
    clustering — so the true survivor set is exactly {min id per group}
    for sharded and unsharded plans alike."""
    return spark.range(N_GROUPS * COPIES).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIMS - 1}), "
            f"i -> CASE WHEN i = CAST(id / {COPIES} AS INT) "
            "THEN 1.0 ELSE 0.0 END)"
        ).alias("v"),
    )


def _sharded_result(emb):
    """Run the q_semdedup_sharded pipeline on an arbitrary corpus frame
    (the registry fn reads parquet; tests need synthetic corpora)."""
    from concurrent.futures import ThreadPoolExecutor

    sharded = shard_vectors(emb, max_rows_per_shard=40).localCheckpoint(
        eager=True
    )
    top = sharded.agg(F.max("shard_id")).first()[0]

    def one(s):
        return (
            vq._semdedup_drops(
                sharded.filter(F.col("shard_id") == s).select("vec_id", "v")
            )
            .drop("centroid_id")
            .localCheckpoint(eager=True)
        )

    with ThreadPoolExecutor(max_workers=8) as ex:
        ds = list(ex.map(one, range(int(top) + 1)))
    drops1 = ds[0]
    for d in ds[1:]:
        drops1 = drops1.unionByName(d)
    survivors = sharded.join(
        drops1.select(F.col("id_drop").alias("vec_id")), "vec_id", "left_anti"
    ).localCheckpoint(eager=False)
    cross = vq._semdedup_cross_shard_drops(survivors)
    return sharded, drops1.withColumn("stage", F.lit("shard")).unionByName(
        cross.withColumn("stage", F.lit("cross"))
    )


def test_sharded_survivors_match_unsharded(spark):
    """On the exact-copies corpus split over >= 2 shards, per-shard
    dedup + cross-shard reconciliation ends at the SAME survivor set as
    the single-corpus q_semdedup plan: the group-minimum ids."""
    emb = _copies_corpus(spark).localCheckpoint(eager=False)
    sharded, result = _sharded_result(emb)
    n_shards = sharded.agg(F.max("shard_id")).first()[0] + 1
    assert n_shards >= 2  # the split must actually be live

    rows = result.collect()
    # reconciliation must be live too: the hash split scatters every
    # group over shards, so cross-shard drops are structurally required
    assert any(r["stage"] == "cross" for r in rows)
    dropped = {r["id_drop"] for r in rows}
    survivors = set(range(N_GROUPS * COPIES)) - dropped
    expect = {g * COPIES for g in range(N_GROUPS)}  # min id per group
    assert survivors == expect

    unsharded = vq._semdedup_drops(emb)
    u_dropped = {r["id_drop"] for r in unsharded.collect()}
    assert set(range(N_GROUPS * COPIES)) - u_dropped == expect


def test_single_shard_degrades_to_unsharded_exactly(spark):
    """A budget >= n gives one shard: the shard stage IS q_semdedup and
    the reconcile stage finds nothing (no cross-shard pair exists) —
    row-for-row identity, not just survivor-set equality."""
    emb = _copies_corpus(spark).localCheckpoint(eager=False)
    sharded = shard_vectors(emb, max_rows_per_shard=10_000)
    assert sharded.agg(F.max("shard_id")).first()[0] == 0

    shard0 = sharded.filter(F.col("shard_id") == 0).select("vec_id", "v")
    got = sorted(
        map(tuple, vq._semdedup_drops(shard0).drop("centroid_id").collect())
    )
    want = sorted(
        map(tuple, vq._semdedup_drops(emb).drop("centroid_id").collect())
    )
    assert got == want
    survivors = sharded.join(
        vq._semdedup_drops(emb).select(F.col("id_drop").alias("vec_id")),
        "vec_id",
        "left_anti",
    )
    assert vq._semdedup_cross_shard_drops(survivors).count() == 0


def test_per_shard_centroid_tables_bounded(spark):
    """The bound the shard driver exists for: every shard's k (and so
    its centroid broadcast) derives from the SHARD's row count, not the
    corpus's. With hash-split shards the per-shard count concentrates
    around the budget; assert the hard k arithmetic per shard."""
    n = 2000
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 31), "
            "i -> sin(cast(id * (i + 3) as double)))"
        ).alias("v"),
    )
    budget = 200
    sharded = shard_vectors(emb, max_rows_per_shard=budget)
    sizes = {
        r["shard_id"]: r["c"]
        for r in sharded.groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert len(sizes) == math.ceil(n / budget)
    block = vq._TARGET_BLOCK_FLOATS // 32  # 512 rows at 32 dims
    for s, rows in sizes.items():
        shard = sharded.filter(F.col("shard_id") == s).select("vec_id", "v")
        k = vq._derived_k(shard).collect()[0]["_k"]
        assert k == max(vq._KMEANS_K_MIN, math.ceil(rows / block))
        # hash-split concentration: no shard collapses or balloons
        assert rows < 2 * budget


def test_shard_budget_dim_aware_default(spark):
    """max_rows_per_shard=None derives floor(BUDGET x block / dims):
    102.4M rows at 64 dims (the documented ~200 MB-of-centroids
    policy), 400k at 1024 dims — the shard budget shrinks by dims^2 so
    the centroid BYTE budget stays constant at any embedding width."""
    for dims, expect in ((64, 102_400_000), (1024, 400_000)):
        emb = spark.range(10).select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(0, {dims - 1}), i -> 0.5)"
            ).alias("v"),
        )
        block = 16384 // dims
        assert expect == SHARD_CENTROID_BUDGET_FLOATS * block // dims
        # tiny corpus -> 1 shard either way; pin the derivation through
        # the n_shards arithmetic instead: ceil(10 / expect) == 1
        out = shard_vectors(emb)
        assert out.agg(F.max("shard_id")).first()[0] == 0
        assert "shard_id" in out.columns


def test_recursive_reconcile_when_survivors_exceed_budget(spark):
    """r13 verdict item 3: survivors of the per-shard pass EXCEED one
    shard budget, so the one-level global reconcile is over-budget and
    the recursion must (a) actually shard the survivors (a level-2 row
    exists in the output), and (b) still end at the unsharded plan's
    survivor set — the group-minimum ids."""
    emb = _copies_corpus(spark).localCheckpoint(eager=False)
    budget = 40
    sharded = shard_vectors(emb, max_rows_per_shard=budget).localCheckpoint(
        eager=True
    )
    top = int(sharded.agg(F.max("shard_id")).first()[0])
    assert top >= 1

    drops1 = None
    for s in range(top + 1):
        d = vq._semdedup_drops(
            sharded.filter(F.col("shard_id") == s).select("vec_id", "v")
        ).drop("centroid_id")
        drops1 = d if drops1 is None else drops1.unionByName(d)
    drops1 = drops1.localCheckpoint(eager=True)
    survivors = sharded.join(
        drops1.select(F.col("id_drop").alias("vec_id")), "vec_id", "left_anti"
    ).localCheckpoint(eager=True)
    n_surv = survivors.count()
    assert n_surv > budget  # the overflow regime this test exists for

    rec = vq._semdedup_reconcile_recursive(survivors, budget).collect()
    # the recursion was LIVE: at least two levels ran (level 1 = the
    # re-sharded pass, the final global pass stamps a higher level)
    assert max(r["level"] for r in rec) >= 2

    dropped = {r["id_drop"] for r in drops1.collect()} | {
        r["id_drop"] for r in rec
    }
    survivors_final = set(range(N_GROUPS * COPIES)) - dropped
    expect = {g * COPIES for g in range(N_GROUPS)}
    assert survivors_final == expect

    u_dropped = {r["id_drop"] for r in vq._semdedup_drops(emb).collect()}
    assert set(range(N_GROUPS * COPIES)) - u_dropped == expect


def test_sharded_empty_and_tiny_corpora(spark):
    """Degenerate shapes: the registry fn returns a schema-stable empty
    frame on an empty corpus, and a corpus below K_MIN still dedups."""
    empty = _copies_corpus(spark).filter(F.col("vec_id") < 0)
    sharded = shard_vectors(empty, max_rows_per_shard=40)
    assert sharded.count() == 0

    tiny = _copies_corpus(spark).filter(F.col("vec_id") < 4)  # one group
    drops = vq._semdedup_drops(tiny).collect()
    assert {r["id_drop"] for r in drops} == {1, 2, 3}
    assert all(r["duplicate_of"] == 0 for r in drops)
