"""Semantic pins for the sf-scale SCD2 merge batches (q_scd2_sf).

The DuckDB oracle proves value parity; these pin the MERGE-branch
semantics directly — in particular the reference's NULL-unsafe ``<>``
quirk (silver.sql:147-158): a row whose only "change" is a tracked
column going to NULL must NOT expire, because ``t.status <> NULL`` is
unknown and the OR of terms never reaches literal TRUE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries.pipeline_queries import (
    scd2_sf_batches,
    scd2_sf_merge,
)

SF_DIR = "/root/testdata/sf0.001"
_NEW_KEY_OFFSET = 1000000000000


def test_merge_branch_classification(spark):
    target, source = scd2_sf_batches(spark, SF_DIR)
    merged = scd2_sf_merge(target, source).cache()
    try:
        n_target = target.count()
        inserts = merged.filter(F.col("txn_id") >= _NEW_KEY_OFFSET)
        # every inserted row is a brand-new %10 key, current, stamped TS2
        assert inserts.count() == source.filter(
            F.col("txn_id") >= _NEW_KEY_OFFSET
        ).count()
        assert inserts.filter(~F.col("is_current")).count() == 0
        # half-SCD2: no key ever has two versions after one merge run
        # (changed rows expire WITHOUT re-insert), so total rows =
        # target rows + brand-new inserts exactly
        assert merged.count() == n_target + inserts.count()
        # expired rows carry the merge timestamp; current target rows
        # keep the load timestamp
        bad_stamp = merged.filter(
            (F.col("txn_id") < _NEW_KEY_OFFSET)
            & (
                F.col("is_current")
                != (F.col("modified_date") == F.col("inserted_date"))
            )
        )
        assert bad_stamp.count() == 0
    finally:
        merged.unpersist()


def test_null_unsafe_change_detector_quirk(spark):
    """%31-and-not-%3 keys: status -> NULL is the ONLY delta, so the OR
    of <> terms is NULL (not TRUE) and the row must stay current.
    %93 keys (both %3 and %31): the amount term is literally TRUE, so
    they expire even though the status term is NULL."""
    target, source = scd2_sf_batches(spark, SF_DIR)
    merged = scd2_sf_merge(target, source)
    # _ok = txn_id // 10 // 10... reconstruct: txn_id = ok*10 + linenumber
    ok = F.floor(F.col("txn_id") / 10)
    old = merged.filter(F.col("txn_id") < _NEW_KEY_OFFSET)
    null_only = old.filter(
        (ok % 31 == 0) & (ok % 3 != 0) & (ok % 17 != 0)
    )
    n_null_only = null_only.count()
    assert n_null_only > 0, "fixture must exercise the NULL-quirk branch"
    assert null_only.filter(~F.col("is_current")).count() == 0
    both = old.filter((ok % 93 == 0) & (ok % 17 != 0))
    n_both = both.count()
    assert n_both > 0
    assert both.filter(F.col("is_current")).count() == 0


def test_absent_keys_stay_current(spark):
    """%17 keys are absent from batch 2; BigQuery MERGE has no
    NOT-MATCHED-BY-SOURCE clause, so they must remain current."""
    target, source = scd2_sf_batches(spark, SF_DIR)
    merged = scd2_sf_merge(target, source)
    ok = F.floor(F.col("txn_id") / 10)
    absent = merged.filter(
        (F.col("txn_id") < _NEW_KEY_OFFSET) & (ok % 17 == 0)
    )
    assert absent.count() > 0
    assert absent.filter(~F.col("is_current")).count() == 0
