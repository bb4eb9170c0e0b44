"""Event-stream analytics over ``events`` in batch form.

The reference has no streaming (SURVEY §2.9) — these are the net-new
time-series operators: tumbling-window aggregation, gap-based
sessionization (the batch twin of streaming session windows — the
streaming variants live in streaming/windows.py over the same table),
and conditional error-rate rollups.

Event-time arithmetic is integer **microseconds**: Spark reads the
table's TIMESTAMP(NANOS) as raw nanos BIGINT (session.py conf) and
``ts DIV 1000`` truncates exactly like DuckDB's micros-based
TIMESTAMP_NS read (``epoch_us``), so both engines see identical
integers — no float time, no timestamp rendering in the compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries.registry import QuerySpec
from gcp_healthcare_data_pipeline_spark.session import load_tables

_BUCKET_US = 300 * 1_000_000  # 5-minute tumbling window
_GAP_US = 1800 * 1_000_000  # 30-minute session gap
_DAY_US = 86400 * 1_000_000

def _ts_us():
    return F.expr("ts DIV 1000")  # nanos -> micros, truncating


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window aggregation by event type."""
    ev = load_tables(spark, sf_dir, "events")
    bucket_start = (F.floor(_ts_us() / _BUCKET_US) * 300).cast("bigint")
    return (
        ev.groupBy(bucket_start.alias("bucket_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_ORACLE_EVENTS_TUMBLING = f"""
SELECT
  CAST(FLOOR(epoch_us(ts) / {_BUCKET_US}) * 300 AS BIGINT) AS bucket_start,
  event_type,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap) per user.

    lag + cumulative-sum session indexing — the standard distributed
    sessionization: one shuffle on user_id, then window functions within
    partitions. (Streaming equivalent: F.session_window, streaming/windows.py.)
    """
    ev = load_tables(spark, sf_dir, "events")
    ev = ev.select(
        "user_id", "event_id", _ts_us().alias("ts_us"), "value"
    )
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev = ev.withColumn("prev_ts", F.lag("ts_us").over(order)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts_us") - F.col("prev_ts") > _GAP_US),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    ev = ev.withColumn("session_idx", F.sum("new_session").over(order))
    return ev.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


_ORACLE_EVENTS_SESSIONIZE = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events
), lagged AS (
  SELECT *,
    LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_ts
  FROM e
), flagged AS (
  SELECT *,
    CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > {_GAP_US} THEN 1 ELSE 0 END
      AS new_session
  FROM lagged
), sess AS (
  SELECT *,
    CAST(SUM(new_session)
         OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT)
      AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
  COUNT(*) AS n_events,
  MIN(ts_us) AS session_start_us,
  MAX(ts_us) - MIN(ts_us) AS duration_us,
  ROUND(SUM(value), 2) AS total_value
FROM sess
GROUP BY 1, 2
"""


def q_events_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily conditional rollup: error share per day (A3/A4-style
    conditional aggregation on the events table)."""
    ev = load_tables(spark, sf_dir, "events")
    day = (F.floor(_ts_us() / _DAY_US) * 86400).cast("bigint")
    n_err = F.count(F.when(F.col("event_type") == "error", F.lit(1)))
    n_all = F.count(F.lit(1))
    return ev.groupBy(day.alias("day_start")).agg(
        n_all.alias("n_events"),
        n_err.alias("n_errors"),
        F.round(n_err * F.lit(100.0) / n_all, 4).alias("error_pct"),
    )


_ORACLE_EVENTS_ERROR_RATE = f"""
SELECT
  CAST(FLOOR(epoch_us(ts) / {_DAY_US}) * 86400 AS BIGINT) AS day_start,
  COUNT(*) AS n_events,
  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
  ROUND(COUNT(CASE WHEN event_type = 'error' THEN 1 END) * 100.0 / COUNT(*), 4)
    AS error_pct
FROM events
GROUP BY 1
"""


QUERIES = [
    QuerySpec(
        "q_events_tumbling", q_events_tumbling, _ORACLE_EVENTS_TUMBLING,
        "ext:streaming-batch A1 A2",
    ),
    QuerySpec(
        "q_events_sessionize", q_events_sessionize, _ORACLE_EVENTS_SESSIONIZE,
        "ext:streaming-batch ext:window",
    ),
    QuerySpec(
        "q_events_error_rate", q_events_error_rate, _ORACLE_EVENTS_ERROR_RATE,
        "ext:streaming-batch A3 A4",
    ),
]
