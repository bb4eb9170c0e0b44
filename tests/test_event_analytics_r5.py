"""Semantic tests for the round-5 event analytics: conversion latency
(first view -> first subsequent purchase) and 7-day rolling distinct
active users. Tiny hand-built event logs with hand-computed expectations;
the DuckDB oracle gate covers engine parity on the real events table."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries.event_queries import (
    q_conversion_latency,
    q_rolling_active_users,
)

_DAY_US = 86_400 * 1_000_000


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_us, user_id, event_type, value)"""
    d = str(tmp_path / "sfx")
    spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string,"
        " value double"
    ).select(
        "event_id",
        F.timestamp_micros("ts_us").alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    ).write.parquet(d + "/events.parquet")
    return d


def test_conversion_latency_first_view_to_first_purchase(spark, tmp_path):
    s = 1_000_000  # one second in us
    rows = [
        # user 1: view@10s, purchase@70s -> 60s latency; later purchase ignored
        (0, 10 * s, 1, "view", 0.0),
        (1, 70 * s, 1, "purchase", 0.0),
        (2, 500 * s, 1, "purchase", 0.0),
        # user 2: purchase BEFORE first view -> not a conversion of the view;
        # second purchase after view@100s at 180s -> 80s latency
        (3, 5 * s, 2, "purchase", 0.0),
        (4, 100 * s, 2, "view", 0.0),
        (5, 180 * s, 2, "purchase", 0.0),
        # user 3: view only -> never converts
        (6, 50 * s, 3, "view", 0.0),
        # user 4: purchase only, no view -> excluded
        (7, 60 * s, 4, "purchase", 0.0),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    row = q_conversion_latency(spark, sf_dir).collect()[0]
    assert row.n_converted == 2
    # latencies {60, 80}: p50 = 70 (interpolated), p90 = 78
    assert row.p50_sec == 70.0
    assert row.p90_sec == 78.0


def test_rolling_active_users_seven_day_window(spark, tmp_path):
    rows = [
        # user 1 active day 0; user 2 active day 0 and day 8
        (0, 0 * _DAY_US + 5, 1, "view", 0.0),
        (1, 0 * _DAY_US + 9, 2, "view", 0.0),
        (2, 0 * _DAY_US + 11, 2, "click", 0.0),  # same user-day, no double count
        (3, 8 * _DAY_US + 3, 2, "view", 0.0),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        r.window_day: r.active_users_7d
        for r in q_rolling_active_users(spark, sf_dir).collect()
    }
    # days 0-6 cover day-0 activity (2 users); day 7 covers nothing from
    # day 0 (window [1,7] has no activity... day 7's window is days 1-7:
    # empty -> no row); day 8 covers day-8 activity (1 user)
    assert got == {d: 2 for d in range(7)} | {8: 1}
