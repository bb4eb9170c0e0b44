"""Streaming window tests: drain the events stream with availableNow and
cross-check the tumbling aggregation against the oracle-backed batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries.event_queries import (
    q_events_tumbling,
)
from gcp_healthcare_data_pipeline_spark.streaming.windows import (
    read_events_stream,
    run_to_completion,
    session_aggregates,
    sliding_rates,
    tumbling_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_tumbling_matches_batch(spark):
    stream = read_events_stream(spark, SF_DIR)
    out = run_to_completion(tumbling_counts(stream), "t_tumbling")
    got = {
        (int(r.window_start.timestamp()), r.event_type): (r.n_events, r.total_value)
        for r in out.collect()
    }
    batch = {
        (r.bucket_start, r.event_type): (r.n_events, r.total_value)
        for r in q_events_tumbling(spark, SF_DIR).collect()
    }
    assert got == batch


def test_streaming_sliding_windows_overlap(spark):
    stream = read_events_stream(spark, SF_DIR)
    out = run_to_completion(sliding_rates(stream), "t_sliding")
    rows = out.collect()
    assert len(rows) > 0
    starts = sorted(int(r.window_start.timestamp()) for r in rows)
    # 10-min windows sliding every 5 min: adjacent starts differ by 300s
    assert any(b - a == 300 for a, b in zip(starts, starts[1:]))
    total_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    # each event lands in exactly 2 overlapping windows
    assert sum(r.n_events for r in rows) == 2 * total_events


def test_streaming_session_windows(spark):
    stream = read_events_stream(spark, SF_DIR)
    out = run_to_completion(session_aggregates(stream), "t_sessions")
    rows = out.collect()
    assert len(rows) > 0
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert sum(r.n_events for r in rows) == ev.count()
    # sessions per user are non-overlapping and respect the 30-min gap
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (r.session_start.timestamp(), r.session_end.timestamp())
        )
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 >= e1  # ordered, non-overlapping
            assert s2 - e1 >= 0  # separated by at least the closed gap
