"""Partition-level incremental mart maintenance (dynamic partition
overwrite).

The reference rebuilds every gold mart with truncate-and-reload each run
(reference gold.sql:11,53,103,145 — full recompute daily). That is fine at
71k rows and catastrophic at 100 TB: a day's delta usually touches a tiny
set of date partitions, so the scale-correct refresh is

1. derive the AFFECTED partition keys from the delta (a tiny distinct),
2. recompute the mart ONLY over source rows in those partitions
   (partition pruning makes this read |affected| / |all| of the fact), and
3. overwrite JUST those partitions of the materialized mart via Spark's
   dynamic partition overwrite — untouched partitions keep their files.

This is sound for any mart whose groups are FUNCTIONALLY DETERMINED by
the partition key (each output row derives from exactly one partition) —
true for the date-grained marts the reference builds. Aggregates that mix
partitions need the partial-merge pattern instead
(queries/extended_queries.py:q_incremental_agg).

At 1000 executors: the delta-key distinct is map-side combined and tiny;
the recompute scan prunes to affected partitions at the source (verified
by tests/test_incremental_mart.py asserting pushed partition filters);
the overwrite commits only the recomputed directories.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def affected_partitions(delta: DataFrame, part_cols: list[str]) -> DataFrame:
    """Distinct partition keys present in the delta — the refresh scope.

    One map-side-combined aggregation over the delta only; the base/full
    fact is never touched here.
    """
    return delta.select(*part_cols).distinct()


def pruned_recompute(
    source: DataFrame,
    keys: DataFrame,
    part_cols: list[str],
    mart_fn: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Recompute the mart over only the affected partitions.

    ``left_semi`` against the broadcast key set keeps the filter on the
    scan side, so a source partitioned by ``part_cols`` prunes at the
    file listing — the read cost is proportional to the delta's partition
    footprint, not the table size.
    """
    scoped = source.join(F.broadcast(keys), part_cols, "left_semi")
    return mart_fn(scoped)


def incremental_mart(
    base_mart: DataFrame,
    source: DataFrame,
    delta: DataFrame,
    part_cols: list[str],
    mart_fn: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Pure-DataFrame composition of a partition-level refresh:
    ``(base_mart minus affected partitions) ∪ recompute(affected)``.

    Equals ``mart_fn(source)`` whenever the mart's rows are functionally
    determined by ``part_cols`` — the oracle-gated contract
    (queries/extended_queries.py:q_mart_refresh).
    """
    keys = affected_partitions(delta, part_cols)
    kept = base_mart.join(F.broadcast(keys), part_cols, "left_anti")
    return kept.unionByName(
        pruned_recompute(source, keys, part_cols, mart_fn)
    )


def refresh_mart_path(
    spark: SparkSession,
    mart_path: str,
    source: DataFrame,
    delta: DataFrame,
    part_cols: list[str],
    mart_fn: Callable[[DataFrame], DataFrame],
) -> None:
    """Materialized refresh: dynamic-partition-overwrite ONLY the affected
    partitions of the parquet mart at ``mart_path``.

    ``partitionOverwriteMode=dynamic`` replaces exactly the partitions the
    recompute emits; every other partition's files are untouched (no
    truncate, no full rewrite) — the property
    tests/test_incremental_mart.py pins by file inventory.
    """
    keys = affected_partitions(delta, part_cols)
    recomputed = pruned_recompute(source, keys, part_cols, mart_fn)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            recomputed.write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(mart_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
