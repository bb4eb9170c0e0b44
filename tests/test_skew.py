"""Salted aggregation must reproduce the plain groupBy exactly, including
on a heavily skewed key distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.operators.skew import salted_agg


def test_salted_matches_plain_on_skew(spark):
    # 10k rows for the hot key, 10 for the cold one
    rows = [(i, "hot" if i < 10000 else "cold", float(i % 97) / 7.0)
            for i in range(10010)]
    df = spark.createDataFrame(rows, "uid long, k string, v double")

    salted = {
        r.k: (r.n_rows, r.total, r.avg)
        for r in salted_agg(df, ["k"], "v", "uid", salts=16).collect()
    }
    plain = {
        r.k: (r.n, round(r.s, 2), round(r.s / r.n, 4))
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert set(salted) == set(plain)
    for k in plain:
        assert salted[k][0] == plain[k][0]
        assert salted[k][1] == pytest.approx(plain[k][1], abs=0.011)
        assert salted[k][2] == pytest.approx(plain[k][2], abs=0.00011)


def test_salted_spreads_hot_key(spark):
    # the partial phase must produce multiple rows for a hot key
    rows = [(i, "hot", 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "uid long, k string, v double")
    partial = df.groupBy(
        "k", F.pmod(F.col("uid"), F.lit(16)).alias("_salt")
    ).count()
    assert partial.count() == 16


class _SkewConfs:
    """Temporarily lower AQE skew thresholds so unit-test-sized data can
    trigger (or demonstrably NOT trigger) skew-join splitting."""

    _VALUES = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }

    def __init__(self, spark):
        self.spark = spark
        self.saved = {}

    def __enter__(self):
        for k, v in self._VALUES.items():
            self.saved[k] = self.spark.conf.get(k, None)
            self.spark.conf.set(k, v)
        return self

    def __exit__(self, *exc):
        for k, v in self.saved.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


def test_lsh_band_join_aqe_skew_split(spark):
    """A hot LSH band bucket (one bucket = 25% of the corpus side) must
    be split by AQE skew-join handling in the asymmetric batch-vs-corpus
    band join (q_dedup_incremental's shape): the join is INNER, so Spark
    replicates the batch side's matching partition and splits the skewed
    corpus partition. Asserts the executed plan carries the skew marker
    — the runtime evidence behind the 100 TB claim that a skewed band
    bucket does not serialize onto one task."""
    from pyspark.sql import functions as F

    n_corpus, n_hot = 60000, 15000
    corpus = spark.range(n_corpus).select(
        F.col("id").alias("corpus_id"),
        F.when(F.col("id") < n_hot, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 997).cast("string"))
        ).alias("band_key"),
        # stand-in for signature/shingle payload riding the shuffle —
        # makes partition byte sizes realistic for the size thresholds
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    batch = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 2, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 997).cast("string"))
        ).alias("band_key"),
    )
    with _SkewConfs(spark):
        res = batch.join(corpus, "band_key").select(
            F.count(F.lit(1)).alias("n_candidates"),
            # aggregate over the payload so column pruning can't drop it
            # before the shuffle — skew detection reads the MapStatus
            # partition BYTES, and 15k copies of a 3-char key alone
            # compress below the (test-lowered) 1KB skew threshold
            F.max("pad").alias("sig_check"),
        )
        # collect() (not count()) so the plan we inspect is the ONE that
        # executed — count() wraps the df in a separate QueryExecution
        n_pairs = res.collect()[0].n_candidates
        plan = res._jdf.queryExecution().executedPlan().toString()
    assert n_pairs >= 2 * n_hot  # the two hot batch docs hit the bucket
    assert "skew=true" in plan, plan[:2000]


def test_scd2_merge_null_key_bypass_and_full_outer_skew_fact(spark):
    """Two pinned facts about the SCD2 merge under a skewed key
    distribution (10% NULL business keys — the realistic hot key,
    since every NULL hashes to the same shuffle partition):

    1. AQE can never split a FULL OUTER sort-merge join (splitting a
       side would duplicate its unmatched rows) — but Catalyst
       DECOMPOSES the merge's full-outer join into a LeftOuter branch
       (the kept/expired target rows) and a RightOuter branch (the
       inserts) by pushing the union's presence filters into the join.
       Each branch's preserved side IS AQE-splittable, so the merge
       never depends on an unsplittable full-outer exchange. Asserted:
       the final plan contains LeftOuter and RightOuter and no
       FullOuter.
    2. The NULL-key hot partition is avoided structurally: NULL-key
       rows are routed AROUND the join (they can never match under
       MERGE-ON semantics). Asserted via exact semantics: NULL-key
       current rows survive untouched, NULL-key source rows insert as
       new current versions, and the union has join-free bypass
       branches.
    """
    from pyspark.sql import functions as F

    from gcp_healthcare_data_pipeline_spark.operators.scd2 import scd2_merge

    n = 2000
    nullify = (F.col("id") % 10 == 0)  # 10% NULL keys
    target = spark.range(n).select(
        F.when(~nullify, F.col("id")).alias("k"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("attr"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("inserted_date"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("modified_date"),
        F.lit(True).alias("is_current"),
    )
    source = spark.range(n).select(
        F.when(~nullify, F.col("id")).alias("k"),
        # change attrs for half the non-null keys; all NULL-key rows new
        F.when(
            F.col("id") % 2 == 0, F.concat(F.lit("v"), F.col("id"))
        ).otherwise(F.lit("changed")).alias("attr"),
    )
    ts = F.lit("2024-06-01 00:00:00").cast("timestamp")
    with _SkewConfs(spark):
        out = scd2_merge(target, source, ["k"], ["attr"], ts)
        rows = out.collect()  # executes out's own QueryExecution
        plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "LeftOuter" in final and "RightOuter" in final, final[:2000]
    assert "FullOuter" not in final  # fact 1: decomposed, splittable
    # fact 2 (plan side): the NULL-key bypass branches read the source
    # relations directly — more Union branches than join outputs
    assert final.count("Union") >= 1 and final.count("Filter") >= 4
    nullkey = [r for r in rows if r.k is None]
    # 200 target NULL-key rows kept + 200 source NULL-key inserts
    assert len(nullkey) == 2 * (n // 10)
    kept = [r for r in nullkey if str(r.inserted_date).startswith("2024-01")]
    ins = [r for r in nullkey if str(r.inserted_date).startswith("2024-06")]
    assert len(kept) == n // 10 and len(ins) == n // 10
    assert all(
        r.is_current and str(r.modified_date).startswith("2024-01")
        for r in kept
    ), "NULL-key current rows must never be expired (MERGE-ON never matches)"
    assert all(r.is_current for r in ins)
    # non-null odd keys expired (attr changed), evens kept current
    changed = [r for r in rows if r.k is not None and r.k % 2 == 1]
    assert changed and all(not r.is_current for r in changed)
