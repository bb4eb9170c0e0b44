"""SCD2 merge golden tests — the run-twice scenarios from SURVEY §5.2/§2.6.

Covers: unchanged / changed / new / removed keys, the NULL-unsafe ``<>``
change detector (NULL on either side => unchanged), the half-SCD2 strict
mode vs corrected mode, and history preservation across runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.operators.scd2 import (
    scd2_initial,
    scd2_merge,
)

def T1():
    return F.lit("2024-01-01").cast("timestamp")


def T2():
    return F.lit("2024-06-01").cast("timestamp")


def T3():
    return F.lit("2024-12-01").cast("timestamp")


def _src(spark, rows):
    return spark.createDataFrame(rows, "k string, a string, b double")


def _merge(target, source, **kw):
    return scd2_merge(target, source, ["k"], ["a", "b"], T2(), **kw)


def _state(df):
    return {
        (r.k, r.is_current): (r.a, r.b, str(r.inserted_date.date()), str(r.modified_date.date()))
        for r in df.collect()
    }


def test_initial_load_all_current(spark):
    out = scd2_initial(_src(spark, [("k1", "x", 1.0)]), T1())
    st = _state(out)
    assert st == {("k1", True): ("x", 1.0, "2024-01-01", "2024-01-01")}


def test_unchanged_changed_new_removed(spark):
    target = scd2_initial(
        _src(spark, [("same", "x", 1.0), ("chg", "x", 1.0), ("gone", "x", 1.0)]),
        T1(),
    )
    source = _src(spark, [("same", "x", 1.0), ("chg", "y", 1.0), ("new", "z", 9.0)])
    st = _state(_merge(target, source))
    # unchanged + removed keys stay current and untouched
    assert st[("same", True)] == ("x", 1.0, "2024-01-01", "2024-01-01")
    assert st[("gone", True)] == ("x", 1.0, "2024-01-01", "2024-01-01")
    # changed key expired at T2 (old attribute values retained)...
    assert st[("chg", False)] == ("x", 1.0, "2024-01-01", "2024-06-01")
    # ...and per the reference's half-SCD2 quirk, NOT re-inserted
    assert ("chg", True) not in st
    # brand-new key inserted current at T2
    assert st[("new", True)] == ("z", 9.0, "2024-06-01", "2024-06-01")
    assert len(st) == 4


def test_null_unsafe_change_detector(spark):
    """A NULL on either side of a tracked column must read as unchanged
    (reference silver.sql:147-158 NULL-unsafe <>)."""
    target = scd2_initial(
        _src(spark, [("n1", None, 1.0), ("n2", "x", 1.0), ("n3", None, 1.0)]), T1()
    )
    source = _src(
        spark,
        [
            ("n1", "x", 1.0),   # NULL -> value: term NULL => unchanged
            ("n2", None, 1.0),  # value -> NULL: term NULL => unchanged
            ("n3", None, 2.0),  # NULL vs NULL on a, but b differs => changed
        ],
    )
    st = _state(_merge(target, source))
    assert st[("n1", True)][2:] == ("2024-01-01", "2024-01-01")
    assert st[("n2", True)][2:] == ("2024-01-01", "2024-01-01")
    assert ("n3", False) in st and st[("n3", False)][3] == "2024-06-01"


def test_null_key_rows_survive_merges(spark):
    """NULL business keys never match (MERGE ON semantics): a NULL-key
    target row stays current untouched; a NULL-key source row inserts."""
    target = scd2_initial(_src(spark, [(None, "t", 1.0), ("k1", "x", 1.0)]), T1())
    source = _src(spark, [(None, "s", 2.0), ("k1", "x", 1.0)])
    rows = _merge(target, source).collect()
    triples = [(r.k, r.a, r.is_current, str(r.inserted_date.date())) for r in rows]
    assert (None, "t", True, "2024-01-01") in triples  # target kept untouched
    assert (None, "s", True, "2024-06-01") in triples  # source inserted
    assert ("k1", "x", True, "2024-01-01") in triples  # unchanged
    assert len(triples) == 3


def test_corrected_mode_reinserts_new_version(spark):
    target = scd2_initial(_src(spark, [("chg", "x", 1.0)]), T1())
    source = _src(spark, [("chg", "y", 2.0)])
    st = _state(_merge(target, source, strict_reference_semantics=False))
    assert st[("chg", False)] == ("x", 1.0, "2024-01-01", "2024-06-01")
    assert st[("chg", True)] == ("y", 2.0, "2024-06-01", "2024-06-01")


def test_second_run_preserves_history(spark):
    target = scd2_initial(_src(spark, [("k", "v1", 1.0)]), T1())
    run1 = scd2_merge(
        target, _src(spark, [("k", "v2", 1.0)]), ["k"], ["a", "b"], T2(),
        strict_reference_semantics=False,
    )
    run2 = scd2_merge(
        run1, _src(spark, [("k", "v3", 1.0)]), ["k"], ["a", "b"], T3(),
        strict_reference_semantics=False,
    )
    rows = sorted(run2.collect(), key=lambda r: str(r.modified_date))
    assert [(r.a, r.is_current) for r in rows] == [
        ("v1", False), ("v2", False), ("v3", True),
    ]


def test_scd2_merge_join_shuffle_free_on_bucketed_tables(spark):
    """The operators/scd2.py docstring promise, proven: with target and
    source both bucketed on the merge key (same bucket count), the
    full-outer merge join reuses the bucketing as its hash distribution
    and the WHOLE merge plan contains no shuffle Exchange."""
    from gcp_healthcare_data_pipeline_spark.sources.writers import (
        write_bucketed_table,
    )

    target = scd2_initial(
        _src(spark, [(f"k{i}", "v", float(i)) for i in range(50)]), T1()
    )
    source = _src(
        spark,
        [(f"k{i}", "v" if i % 2 else "w", float(i)) for i in range(40, 90)],
    )
    write_bucketed_table(target, "scd2_target_b", ("k",), 4)
    write_bucketed_table(source, "scd2_source_b", ("k",), 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        merged = scd2_merge(
            spark.table("scd2_target_b"),
            spark.table("scd2_source_b"),
            ["k"], ["a", "b"], T2(),
        )
        plan = merged._jdf.queryExecution().executedPlan().toString()
        # Catalyst specializes the full-outer into LeftOuter + RightOuter
        # branches (the presence-marker filters make each side's outer
        # null rows separable) — either way it must be a sort-merge over
        # the bucketed scans with NO shuffle exchange anywhere
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert merged.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for tbl in ("scd2_target_b", "scd2_source_b"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
