"""Source readers (SURVEY §2.1 S1-S4).

- CSV with declared all-string schema (S2/S3, incl. glob multi-file) and
  drift tolerance: if the file header doesn't match the declared schema
  (the hospital-b ``Updated_Date`` case, FIXTURES.md §2), columns are
  aligned by header name and missing ones are NULL — the pipeline
  diagnoses drift instead of silently mis-assigning positional columns.
- JSON landing reader (S4): schema-on-read like the reference's bronze
  external tables.
- JDBC pushdown-subquery reader (S1): builds the same
  ``(SELECT ... WHERE wm > x) AS t`` dbtable option the reference uses
  (hospitalA_mysqlToLanding.py:148-163); predicate pushdown into the
  source database is free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    tolerate_drift: bool = True,
) -> DataFrame:
    """Header CSV scan with declared schema and header-drift tolerance."""
    df, _ = read_csv_reporting(
        spark, path, schema, tolerate_drift=tolerate_drift
    )
    return df


def read_csv_reporting(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    tolerate_drift: bool = True,
) -> tuple[DataFrame, dict[str, list[str]]]:
    """``read_csv`` plus a schema-drift report (SURVEY §1.3
    tolerate/diagnose): ``{"missing": [declared cols absent from the
    header], "unexpected": [header cols not declared]}`` — both empty
    when the header matches. The caller decides where to record it
    (the runner logs non-empty reports to ``pipeline_logs``)."""
    raw = spark.read.csv(path, header=True)  # names from file header
    expected = schema.fieldNames()
    actual = set(raw.columns)
    report = {
        "missing": [c for c in expected if c not in actual],
        "unexpected": sorted(actual - set(expected)),
    }
    if not tolerate_drift:
        return spark.read.csv(path, header=True, schema=schema), report
    cols = [
        F.col(c).cast("string").alias(c)
        if c in actual
        else F.lit(None).cast("string").alias(c)
        for c in expected
    ]
    return raw.select(*cols), report


def read_landing_json(spark: SparkSession, path: str) -> DataFrame:
    """Schema-on-read JSON scan over a landing path (bronze.sql:3-7)."""
    return spark.read.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan; filters and column pruning push into the ORC reader the
    same way they do for parquet (verified in tests/test_sources.py)."""
    return spark.read.orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan (row-major interchange format, common for Kafka-landed
    data). The spark-avro module is not bundled with the pip pyspark
    distribution; raises a clear error when absent so callers can gate.
    """
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:  # pragma: no cover - depends on jar presence
        raise NotImplementedError(
            "spark-avro jar not available in this deployment; add "
            "org.apache.spark:spark-avro to spark.jars.packages"
        ) from exc


def jdbc_subquery_reader(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    watermark_col: str | None = None,
    last_watermark: str | None = None,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
):
    """JDBC scan with the incremental predicate pushed into the source.

    Returns the configured DataFrameReader (call ``.load()`` when a JDBC
    endpoint exists; tests only assert the generated subquery).

    The reference reads its tables in one JDBC stream
    (hospitalA_mysqlToLanding.py:155-163) — fine for hospital-sized
    tables, a bottleneck at warehouse-scale ingest. Passing
    ``partition_column`` (a numeric/date/timestamp column, typically the
    PK or the watermark column) plus bounds and ``num_partitions`` makes
    Spark open N parallel connections, each scanning one
    ``WHERE partition_column BETWEEN ...`` stride of the pushdown
    subquery — N-way parallel ingest with the incremental predicate
    still evaluated inside the source database. Bounds only steer the
    stride layout; rows outside them are still read (Spark makes the
    first/last stride unbounded), so a stale bound estimate skews but
    never drops data.
    """
    subquery = build_pushdown_subquery(table, watermark_col, last_watermark)
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", subquery)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or not num_partitions:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and "
                "num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def build_pushdown_subquery(
    table: str, watermark_col: str | None, last_watermark: str | None
) -> str:
    """Full load: ``(SELECT * FROM t) AS q``; incremental adds the
    high-watermark predicate (hospitalA_mysqlToLanding.py:148-153)."""
    if watermark_col and last_watermark is not None:
        return (
            f"(SELECT * FROM {table} "
            f"WHERE {watermark_col} > '{last_watermark}') AS q"
        )
    return f"(SELECT * FROM {table}) AS q"
