"""Focused tests for the round-18 optimization internals:

- functions.vectors.argmin_fold must equal array_min(transform(...))
  on every regime the packed argmin folds see (ties, NaN distances,
  empty and NULL candidate arrays);
- operators.similarity.ivf_assign's keep==1 fast path is gated on
  super_keep==1 (r17 ADVICE): keep==1 with super_keep>1 must reduce
  across the probed supers like the window path always did;
- operators.versioning.write_versions_concurrently settles ALL writes
  and raises one aggregated error on partial failure (r17 ADVICE).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.functions.vectors import (
    argmin_fold,
    norm,
)


def test_argmin_fold_equals_array_min_transform(spark):
    rows = [
        # (id, candidate array of (i, d-key)) — keys engineered for ties,
        # NaN (sorts greatest), and identical distances with id tie-break
        (1, [(3, 2.0), (1, 2.0), (2, 5.0)]),          # tie on d -> min i
        (2, [(7, float("nan")), (8, 1.0)]),            # NaN loses
        (3, [(9, float("nan"))]),                      # all-NaN: NaN wins
        (4, []),                                       # empty -> NULL
        (5, None),                                     # NULL arr -> NULL
    ]
    df = spark.createDataFrame(
        rows, "id int, arr array<struct<i:int,d:double>>"
    )
    mk = lambda s: F.struct(s["d"].alias("d"), s["i"].alias("i"))  # noqa: E731
    got = df.select(
        "id",
        argmin_fold(F.col("arr"), mk).alias("fold"),
        F.array_min(F.transform(F.col("arr"), mk)).alias("ref"),
    ).collect()

    def eq(a, b):  # NaN-aware struct equality (nan != nan in Python)
        if a is None or b is None:
            return a is None and b is None
        return all(
            (x != x and y != y) or x == y for x, y in zip(a, b)
        )

    for r in got:
        assert eq(r["fold"], r["ref"]), (r["id"], r["fold"], r["ref"])


def test_argmin_fold_skips_null_elements_like_array_min(spark):
    df = spark.createDataFrame(
        [(1, [None, (2, 1.5), None, (1, 1.5)])],
        "id int, arr array<struct<i:int,d:double>>",
    )
    mk = lambda s: F.struct(s["d"].alias("d"), s["i"].alias("i"))  # noqa: E731
    r = df.select(
        argmin_fold(F.col("arr"), mk).alias("fold"),
        F.array_min(F.transform(F.col("arr"), mk)).alias("ref"),
    ).collect()[0]
    # transform maps a NULL element to a struct of NULL fields; both
    # forms then order NULL fields the same way — assert lockstep
    assert r["fold"] == r["ref"]


def _mini_index(spark):
    """Two supers, two children each, unit-ish vectors: super 10 owns
    children 10/11 near +x, super 20 owns children 20/21 near +y."""
    sup = spark.createDataFrame(
        [(10, [1.0, 0.0]), (20, [0.0, 1.0])], "super_id bigint, _sv array<double>"
    ).withColumn("_sn", norm(F.col("_sv")))
    cmap = spark.createDataFrame(
        [
            (10, [1.0, 0.0], 10),
            (11, [0.9, 0.1], 10),
            (20, [0.0, 1.0], 20),
            (21, [0.1, 0.9], 20),
        ],
        "centroid_id bigint, _cv array<double>, super_id bigint",
    ).withColumn("_ccn", norm(F.col("_cv")))
    return sup, cmap


def test_ivf_assign_keep1_multiprobe_reduces_across_supers(spark):
    from gcp_healthcare_data_pipeline_spark.operators.similarity import (
        ivf_assign,
    )

    sup, cmap = _mini_index(spark)
    # query halfway between the supers, slightly x-leaning: with
    # super_keep=2 BOTH supers are probed and the single global best
    # child must come back (one row, centroid 10) — not one per super
    q = spark.createDataFrame(
        [(1, [0.8, 0.6])], "qid bigint, _qv array<double>"
    ).withColumn("_qn", norm(F.col("_qv")))
    out = ivf_assign(q, "_qv", "_qn", 1, sup, cmap, super_keep=2).collect()
    assert len(out) == 1, out
    assert out[0]["centroid_id"] == 11  # cos 0.8614, the global best
    # and the fast path (super_keep=1) still routes+assigns one row
    out1 = ivf_assign(q, "_qv", "_qn", 1, sup, cmap, super_keep=1).collect()
    assert len(out1) == 1 and out1[0]["centroid_id"] == 11


def test_write_versions_concurrently_aggregates_failures(spark, tmp_path):
    from gcp_healthcare_data_pipeline_spark.operators.versioning import (
        list_versions,
        write_versions_concurrently,
    )

    ok = spark.range(3).select(F.col("id").alias("k"))
    bad = spark.range(3).select(
        F.assert_true(F.col("id") < 0, F.lit("boom")).alias("x"), "id"
    )
    with pytest.raises(RuntimeError) as ei:
        write_versions_concurrently(
            {
                "good": (ok, os.path.join(str(tmp_path), "good"), {}),
                "bad": (bad, os.path.join(str(tmp_path), "bad"), {}),
            }
        )
    msg = str(ei.value)
    assert "bad" in msg and "1 table write(s) failed" in msg
    # the sibling write settled (not cancelled): its version committed
    # and is named as an orphan pin in the error
    assert "good" in msg
    assert list_versions(os.path.join(str(tmp_path), "good")) == [0]
