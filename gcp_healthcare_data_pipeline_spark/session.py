"""SparkSession factory with scale-aware defaults.

Semantics pinned here (documented deviations from Spark 4 defaults):

- ``spark.sql.ansi.enabled=false`` — the reference relies on BigQuery
  ``SAFE_CAST`` / ``SAFE_OFFSET`` NULL-on-failure semantics
  (reference silver.sql:55,250,530-536; gold.sql:22). With ANSI off,
  ``cast`` and ``getItem`` return NULL instead of raising, which is the
  exact behavior to replicate. ``try_cast``/``try_divide`` are still used
  in expressions for self-documentation.
- ``spark.sql.session.timeZone=UTC`` — BigQuery ``CAST(x AS TIMESTAMP)``
  treats date-only strings as midnight UTC; pinning UTC keeps Spark, the
  DuckDB oracle, and parquet timestamps in agreement.
- AQE on (coalesce partitions + skew-join) — at 100 TB the static shuffle
  partition count is always wrong for some stage; AQE re-plans at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "gcp-healthcare-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's pinned semantics.

    On a real cluster, ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        # -- semantics ----------------------------------------------------
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # -- driver/JVM sizing (guide §5): in local mode the driver heap
        #    IS the executor heap — 32 task threads plus cached
        #    checkpoint blocks inside the 1g default heap spend a large
        #    fraction of wall-clock in GC (measured: allocation-heavy
        #    queries regress 1.3-1.6x deep into a bench sweep).
        #    Parameterised via env; on a real cluster spark-submit owns
        #    driver sizing and this builder conf is inert (the JVM is
        #    already up). Only honored when THIS process creates the
        #    JVM — see tools/check.py's post-getOrCreate assert.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "8g"),
        )
        # -- adaptive execution -------------------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- shuffle sizing: 32 locally; a 1000-executor cluster overrides
        #    via spark-submit --conf (AQE coalesces the excess anyway).
        .config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions or cpus)
        )
        # -- scan sizing: default 128m is right for the 100 TB target;
        #    pushdown + pruning stay on (Spark defaults, pinned for clarity)
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        # -- Arrow for any pandas_udf / toPandas hop ----------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # -- events.parquet MAY carry TIMESTAMP(NANOS), which the
        #    vectorized reader rejects; this conf reads those as raw
        #    nanos-since-epoch BIGINT. For micros-encoded writers (Spark's
        #    own default) the conf is inert and ts resolves as TIMESTAMP.
        #    event_ts_us() dispatches on the resolved dtype either way.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # quiet progress bars in test output
        .config("spark.ui.showConsoleProgress", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def event_ts_us(df: DataFrame, col: str = "ts") -> Column:
    """Event time as integer epoch **microseconds**, independent of the
    parquet writer's physical encoding of ``col``.

    Writers differ: pyarrow may emit TIMESTAMP(NANOS) (which, under the
    ``nanosAsLong`` conf pinned in :func:`get_spark`, Spark surfaces as a
    raw nanos-since-epoch BIGINT), while Spark itself and most other
    writers emit TIMESTAMP(MICROS) (surfaced as TIMESTAMP /
    TIMESTAMP_NTZ). Dispatching on the resolved dtype makes every
    event-time operator work on both:

    - BIGINT (raw nanos)        -> ``col DIV 1000``  (truncating)
    - TIMESTAMP / TIMESTAMP_NTZ -> ``unix_micros(cast(col as timestamp))``

    Under the pinned UTC session timezone both branches produce integers
    identical to DuckDB's ``epoch_us(col)``, so oracle comparisons stay
    exact. Works on batch and streaming DataFrames (schema-only dispatch,
    resolved once at plan time — no per-row type checks).
    """
    # only 'long' can be nanosAsLong output — int32 cannot hold nanos, so
    # an integer-typed ts is a schema error that must surface, not be
    # silently misread as nanos
    dtype = df.schema[col].dataType.typeName()
    if dtype == "long":
        return F.expr(f"{col} DIV 1000")  # raw nanos -> micros, truncating
    return F.unix_micros(F.col(col).cast("timestamp"))


def event_time_col(df: DataFrame, col: str = "ts") -> Column:
    """Event time as a proper TIMESTAMP column (for Structured Streaming
    watermarks / window functions), same encoding dispatch as
    :func:`event_ts_us`."""
    dtype = df.schema[col].dataType.typeName()
    if dtype == "long":  # nanosAsLong only ever surfaces as BIGINT
        return F.timestamp_micros(F.expr(f"{col} DIV 1000"))
    return F.col(col).cast("timestamp")


# Under the pinned ``nanosAsLong`` conf (needed for TIMESTAMP(NANOS)
# events data), ANY nanos-encoded timestamp column surfaces as BIGINT —
# round 4 proved a testdata re-generation can flip the writer's encoding
# either way. These date/timestamp columns have consumers that assume
# TIMESTAMP, so load_tables normalizes them; ``events.ts`` stays raw
# because every consumer already dispatches via event_ts_us /
# event_time_col (and the streaming reader builds on the raw schema).
_NANOS_TS_COLUMNS = ("o_orderdate", "l_shipdate")


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Read one or more parquet tables from a scale-factor directory.

    Returns a single DataFrame for one name, else a dict. Columnar scan +
    Catalyst column pruning / predicate pushdown apply automatically.
    Known timestamp columns are normalized to TIMESTAMP when the writer's
    physical encoding (nanos) surfaces them as raw BIGINT, so query logic
    sees one logical schema regardless of the parquet writer.
    """

    def _read(name: str) -> DataFrame:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        for c in _NANOS_TS_COLUMNS:
            # nanosAsLong is the only path that surfaces these as raw
            # integers and it always produces BIGINT; an int32 here could
            # never hold nanos, so it must fail visibly downstream rather
            # than be converted into garbage timestamps
            if c in df.columns and df.schema[c].dataType.typeName() == "long":
                df = df.withColumn(
                    c, F.timestamp_micros(F.expr(f"{c} DIV 1000"))
                )
        return df

    dfs = {n: _read(n) for n in names}
    if len(names) == 1:
        return dfs[names[0]]
    return dfs


def parquet_num_rows(path: str) -> int | None:
    """Exact row count from parquet FOOTER metadata only — the local-FS
    analog of a catalog statistic (``spark.read`` + ``COUNT(*)`` would
    run a real job; planning-time parameter derivation must not).
    Handles both single-file tables and Spark-written directories.
    Returns None when the footer isn't readable so callers can fall
    back to a Spark count."""
    try:
        import pyarrow.parquet as pq  # noqa: PLC0415

        if os.path.isdir(path):
            total, found = 0, False
            for f in sorted(os.listdir(path)):
                if f.endswith(".parquet"):
                    total += pq.read_metadata(os.path.join(path, f)).num_rows
                    found = True
            return total if found else None
        return pq.read_metadata(path).num_rows
    except (OSError, ValueError, KeyError, ImportError):
        return None
