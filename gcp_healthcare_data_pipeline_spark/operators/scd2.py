"""Generic SCD Type 2 merge — the reference's one nontrivial operator.

The reference repeats ~460 lines of BigQuery ``MERGE`` across five entities
(silver.sql:142-199, 273-363, 431-482, 568-648, 690-729); this is the single
metadata-driven Spark implementation: parameterized by (key columns, tracked
columns, timestamp), it reproduces the exact reference semantics:

1. Match on ``target.key = source.key AND target.is_current = TRUE``
   (silver.sql:144-145).
2. ``WHEN MATCHED AND (any tracked column <>)`` -> expire the current row:
   ``is_current=FALSE, modified_date=ts`` (silver.sql:146-162). The change
   detector is the reference's NULL-**unsafe** ``<>`` per column: a NULL on
   either side makes that term unknown, and a row only expires if the OR
   of terms is literally TRUE (silver.sql:147-158).
3. ``WHEN NOT MATCHED`` -> insert with ``inserted_date=modified_date=ts,
   is_current=TRUE`` (silver.sql:163-199).
4. The reference's half-SCD2 quirk: a changed row is expired but its new
   version is NOT re-inserted in the same run (MERGE's NOT-MATCHED clause
   never fires for matched keys). ``strict_reference_semantics=True``
   (default) replicates this for oracle parity; ``False`` gives the
   corrected behavior (expire + insert new version).

Spark-first design (no Delta dependency, no driver collect):

    history ∪ reclassify(current ⟗ source) written back per run.

The full-outer join shuffles both sides by the key once; everything else
is row-local projection, so the whole operator is one exchange. At 100 TB
the target table should be bucketed by the key so the join degenerates to
a co-located sort-merge without re-shuffle; AQE handles skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCD2_COLS = ("inserted_date", "modified_date", "is_current")


def scd2_initial(source: DataFrame, ts: Column) -> DataFrame:
    """First load: every source row becomes a current version."""
    return source.select(
        "*",
        ts.alias("inserted_date"),
        ts.alias("modified_date"),
        F.lit(True).alias("is_current"),
    )


def _any_tracked_differs(tracked: Sequence[str]) -> Column:
    """OR of NULL-unsafe ``<>`` terms — TRUE only if some term is TRUE.

    NULL terms stay NULL through the OR (three-valued logic), and callers
    gate on ``cond == TRUE`` via when(), matching BigQuery MERGE's
    ``WHEN MATCHED AND (...)`` which fires only on literal TRUE.
    """
    cond: Column | None = None
    for c in tracked:
        term = F.col(f"t_{c}") != F.col(f"s_{c}")
        cond = term if cond is None else (cond | term)
    assert cond is not None, "tracked columns must be non-empty"
    return cond


def scd2_merge(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    ts: Column,
    *,
    carry_cols: Sequence[str] = (),
    strict_reference_semantics: bool = True,
) -> DataFrame:
    """Apply one SCD2 run; returns the complete new target state.

    ``target`` columns: key_cols + tracked_cols + carry_cols +
    (inserted_date, modified_date, is_current); ``source``: the same data
    columns. ``carry_cols`` ride along each row version (e.g. datasource,
    is_quarantined) but do NOT participate in change detection — matching
    the reference MERGE, whose UPDATE clause only compares the tracked
    attribute list (silver.sql:147-158).
    """
    data_cols = [*key_cols, *tracked_cols, *carry_cols]

    current = target.filter(F.col("is_current"))
    history = target.filter(~F.col("is_current"))

    # NULL-key bypass: under MERGE-ON semantics a row with ANY NULL key
    # column can never match (the AND of equalities is never TRUE), yet
    # hash partitioning sends every NULL key to the SAME shuffle
    # partition — and AQE's skew-join splitting cannot split a FULL
    # OUTER join (splitting a side would duplicate its unmatched rows),
    # so a corpus with 10% NULL keys becomes one unsplittable hot
    # partition at scale. NULL-key rows are therefore routed AROUND the
    # join: a NULL-key current row is always kept unchanged (it can
    # never be matched-and-expired), a NULL-key source row is always an
    # insert. Bit-identical results, no hot partition in the join.
    any_key_null: Column | None = None
    for k in key_cols:
        term = F.col(k).isNull()
        any_key_null = term if any_key_null is None else (any_key_null | term)
    current_nullkey = current.filter(any_key_null)
    current = current.filter(~any_key_null)
    source_nullkey = source.filter(any_key_null)
    source = source.filter(~any_key_null)

    # presence markers classify join sides without relying on key nullity
    # for the remaining (non-NULL-key) rows.
    t = current.select(
        *[F.col(c).alias(f"t_{c}") for c in data_cols],
        "inserted_date",
        "modified_date",
        F.lit(True).alias("_t_present"),
    )
    s = source.select(
        *[F.col(c).alias(f"s_{c}") for c in data_cols],
        F.lit(True).alias("_s_present"),
    )

    join_cond = None
    for k in key_cols:
        term = F.col(f"t_{k}") == F.col(f"s_{k}")
        join_cond = term if join_cond is None else (join_cond & term)
    j = t.join(s, join_cond, "full_outer")

    matched = F.col("_t_present").isNotNull() & F.col("_s_present").isNotNull()
    # fires only when the OR of <> terms is literally TRUE (see module doc)
    expire = matched & _any_tracked_differs(tracked_cols)

    # target-side rows: keep; expire the changed ones
    from_target = j.filter(F.col("_t_present").isNotNull()).select(
        *[F.col(f"t_{c}").alias(c) for c in data_cols],
        F.col("inserted_date"),
        F.when(expire, ts).otherwise(F.col("modified_date")).alias(
            "modified_date"
        ),
        F.when(expire, F.lit(False)).otherwise(F.lit(True)).alias("is_current"),
    )

    # source-side inserts: NOT MATCHED only (strict), or also new versions
    # of changed keys (corrected mode)
    insert_filter = F.col("_s_present").isNotNull() & F.col(
        "_t_present"
    ).isNull()
    if not strict_reference_semantics:
        insert_filter = insert_filter | expire
    inserts = j.filter(insert_filter).select(
        *[F.col(f"s_{c}").alias(c) for c in data_cols],
        ts.alias("inserted_date"),
        ts.alias("modified_date"),
        F.lit(True).alias("is_current"),
    )

    # the bypassed NULL-key rows re-enter here: current rows unchanged,
    # source rows as fresh inserts — exactly what the full-outer join
    # would have produced for them as unmatched rows.
    kept_nullkey = current_nullkey.select(*data_cols, *SCD2_COLS)
    inserted_nullkey = source_nullkey.select(
        *data_cols,
        ts.alias("inserted_date"),
        ts.alias("modified_date"),
        F.lit(True).alias("is_current"),
    )

    return (
        history.select(*data_cols, *SCD2_COLS)
        .unionByName(from_target)
        .unionByName(inserts)
        .unionByName(kept_nullkey)
        .unionByName(inserted_nullkey)
    )
