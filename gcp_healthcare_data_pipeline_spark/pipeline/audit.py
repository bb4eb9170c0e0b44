"""Audit ledger + structured pipeline logs (SURVEY §2.11 C2-C4).

Parquet-backed equivalents of the reference's BigQuery control tables
(configs/audit_table_ddl.sql, init_bq_tables.py:54-62): one audit row per
table load drives the incremental high-watermark; pipeline_logs captures
structured events. Appends are tiny single-row DataFrames — the ledger
stays small, reads are driver-side scalar lookups like the reference's
``SELECT MAX(load_timestamp)`` (hospitalA_mysqlToLanding.py:124-137).
"""

from __future__ import annotations

import os
import traceback
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.schemas import AUDIT_LOG, PIPELINE_LOGS


class AuditLedger:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.path = os.path.join(root, "audit_log")

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def read(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], AUDIT_LOG)
        return self.spark.read.schema(AUDIT_LOG).parquet(self.path)

    def record(
        self,
        data_source: str,
        tablename: str,
        load_type: str,
        record_count: int,
        status: str,
        when: datetime | None = None,
    ) -> None:
        when = when or datetime.now(timezone.utc).replace(tzinfo=None)
        row = [(data_source, tablename, load_type, record_count, when, status)]
        self.spark.createDataFrame(row, AUDIT_LOG).write.mode("append").parquet(
            self.path
        )

    def last_watermark(self, data_source: str, tablename: str):
        """MAX(load_timestamp) of successful loads for (source, table)."""
        if not self._exists():
            return None
        return (
            self.read()
            .filter(
                (F.col("data_source") == data_source)
                & (F.col("tablename") == tablename)
                & (F.col("status") == "success")
            )
            .agg(F.max("load_timestamp"))
            .first()[0]
        )


class PipelineLogger:
    """Structured logs to console + parquet (C3)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.path = os.path.join(root, "pipeline_logs")

    def log(
        self,
        event_type: str,
        message: str,
        step: str = "",
        tablename: str = "",
        error: BaseException | None = None,
    ) -> None:
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        trace = "".join(traceback.format_exception(error)) if error else None
        print(f"[{now:%H:%M:%S}] {event_type} {step}/{tablename}: {message}")
        row = [(now, event_type, message, step, tablename, trace)]
        self.spark.createDataFrame(row, PIPELINE_LOGS).write.mode(
            "append"
        ).parquet(self.path)
