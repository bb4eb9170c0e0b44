"""Zone writers + landing archive (SURVEY §2.1 S5-S9).

The reference's landing writer collapses to the driver via ``toPandas``
(hospitalA_mysqlToLanding.py:177-185) — an anti-pattern this rebuild
must not copy (SURVEY §4): ``df.write.json`` keeps the write distributed,
one file per partition, no driver memory cliff at 100 TB.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime

from pyspark.sql import DataFrame


def write_landing_json(df: DataFrame, path: str) -> None:
    """Distributed line-delimited JSON landing write (S5, fixed)."""
    df.write.mode("overwrite").json(path)


def write_zone_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    codec: str | None = None,
) -> None:
    """Columnar zone write; partitioned layout enables Catalyst partition
    pruning on downstream reads (SURVEY §4 landing-layout mapping).

    ``codec`` overrides the session's parquet compression (e.g. "zstd"
    for cold zones — ~30% smaller than snappy at a modest CPU cost, the
    right trade for 100 TB archive/silver tables read rarely; keep
    snappy/default for hot gold marts scanned every run).
    """
    w = df.write.mode(mode)
    if codec:
        w = w.option("compression", codec)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_zone_orc(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """ORC zone write — the second columnar interchange format (some
    warehouse estates standardize on ORC rather than parquet); same
    partitioned-pruning layout contract as ``write_zone_parquet``."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 16,
) -> None:
    """Bucketed + sorted managed table write — the co-located-join path.

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle (Catalyst reuses the bucketing as the required
    hash distribution). At 100 TB this is how the silver zone keeps the
    SCD2 full-outer merge and the gold fact joins exchange-free:
    bucket silver on its business keys once at write time.
    Requires the session catalog (``spark.sql.warehouse.dir``).
    """
    spark = df.sparkSession
    # a crashed/forgotten session can leave the managed location on disk
    # with no catalog entry; Spark then refuses to create the table —
    # drop both the entry and any stale directory first
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), name.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(name)
    )


def archive_landing_files(landing_dir: str, archive_root: str, when: datetime) -> int:
    """Move existing landing files to a dated archive path before a new
    load (hospitalA_mysqlToLanding.py:96-118 semantics, local/object FS).

    Layout: ``{archive_root}/{yyyy}/{mm}/{dd}/{filename}``.
    Returns the number of files moved.
    """
    if not os.path.isdir(landing_dir):
        return 0
    dated = os.path.join(
        archive_root, f"{when.year:04d}", f"{when.month:02d}", f"{when.day:02d}"
    )
    os.makedirs(dated, exist_ok=True)
    moved = 0
    for name in os.listdir(landing_dir):
        src = os.path.join(landing_dir, name)
        if os.path.isfile(src):
            shutil.move(src, os.path.join(dated, name))
            moved += 1
    return moved
