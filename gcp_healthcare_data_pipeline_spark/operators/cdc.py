"""Change-data-capture primitives: snapshot diff and feed apply.

Round-trip law (property-tested in tests/test_cdc_roundtrip.py):

    apply_feed(base, snapshot_diff(base, next)) == next

``snapshot_diff`` GENERATES an insert/update/delete feed from two
snapshots; ``apply_feed`` CONSUMES such a feed onto a snapshot (Type-1
MERGE with deletes). The Type-2 sibling — history-preserving MERGE — is
operators/scd2.py (reference silver.sql SCD2 load). Both primitives are
one co-partitioned full-outer join on the key: a single exchange at
scale, exchange-free when both sides are bucketed on the key.

The oracle-gated query surface (q_snapshot_diff, q_cdc_apply) is built
on these.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change_type values emitted by snapshot_diff / consumed by apply_feed
INSERT, UPDATE, DELETE = "insert", "update", "delete"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Diff two snapshots into a change feed.

    Returns ``key_cols + [change_type] + old_<v>/new_<v>`` for each value
    column, one row per inserted / updated / deleted key; unchanged keys
    are dropped. Value comparison is null-safe (NULL -> NULL is
    unchanged, NULL -> x is an update).
    """
    o = old.select(
        *key_cols,
        F.lit(True).alias("_old_present"),
        *[F.col(c).alias(f"old_{c}") for c in value_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("_new_present"),
        *[F.col(c).alias(f"new_{c}") for c in value_cols],
    )
    j = o.join(n, key_cols, "full_outer")
    changed = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in value_cols
        ],
    )
    change = (
        F.when(F.col("_old_present").isNull(), F.lit(INSERT))
        .when(F.col("_new_present").isNull(), F.lit(DELETE))
        .when(changed, F.lit(UPDATE))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type") != "unchanged")
        .select(
            *key_cols,
            "change_type",
            *[f"old_{c}" for c in value_cols],
            *[f"new_{c}" for c in value_cols],
        )
    )


def apply_feed(
    base: DataFrame,
    feed: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Apply a change feed (``key_cols + change_type + new_<v>``) onto a
    snapshot: deletes drop the key, inserts/updates take the feed's new
    values, untouched base rows survive. One full-outer join.
    """
    f = feed.select(
        *key_cols,
        F.col("change_type").alias("_op"),
        *[F.col(f"new_{c}").alias(f"_feed_{c}") for c in value_cols],
    )
    j = base.join(f, key_cols, "full_outer")
    return (
        j.filter(
            F.coalesce(F.col("_op") != F.lit(DELETE), F.lit(True))
        )
        .select(
            *key_cols,
            *[
                F.when(F.col("_op").isin(INSERT, UPDATE), F.col(f"_feed_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                for c in value_cols
            ],
        )
    )
