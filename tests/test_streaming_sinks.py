"""foreachBatch idempotent upsert sink: exactly-once on replayed batches.

Covers the three failure-model cases a transactional sink must survive:
batch replay (same batch_id delivered twice), within-batch key conflicts
(latest order_col wins), and cross-batch upsert (existing key replaced,
new key inserted).
"""

from __future__ import annotations

import os
import shutil

from gcp_healthcare_data_pipeline_spark.streaming.sinks import (
    last_committed_batch,
    read_upsert_target,
    recover_target,
    stream_upsert_to_parquet,
    upsert_batch,
)
from gcp_healthcare_data_pipeline_spark.streaming.windows import (
    read_events_stream,
)

SCHEMA = "user_id long, ts long, value double"


def test_upsert_batch_merge_and_replay(spark, tmp_path):
    target = str(tmp_path / "target")
    b0 = spark.createDataFrame(
        [(1, 100, 1.0), (1, 200, 2.0), (2, 100, 5.0)], SCHEMA
    )
    assert upsert_batch(b0, 0, target, ["user_id"], "ts") is True
    got = {r.user_id: r for r in read_upsert_target(spark, target).collect()}
    # within-batch conflict: latest ts wins
    assert got[1].value == 2.0 and got[2].value == 5.0

    # cross-batch upsert: replace user 1, insert user 3
    b1 = spark.createDataFrame([(1, 300, 9.0), (3, 50, 7.0)], SCHEMA)
    assert upsert_batch(b1, 1, target, ["user_id"], "ts") is True
    got = {r.user_id: r for r in read_upsert_target(spark, target).collect()}
    assert got[1].value == 9.0 and got[3].value == 7.0 and len(got) == 3

    # replay of batch 1 (at-least-once delivery): must be a no-op
    replay = spark.createDataFrame([(1, 999, -1.0)], SCHEMA)
    assert upsert_batch(replay, 1, target, ["user_id"], "ts") is False
    got = {r.user_id: r for r in read_upsert_target(spark, target).collect()}
    assert got[1].value == 9.0 and len(got) == 3
    assert last_committed_batch(target) == 1


def test_upsert_crash_between_renames_recovers(spark, tmp_path):
    """Simulate a crash BETWEEN the two commit renames (data moved aside,
    new state not yet live): the committed state must be restored and the
    interrupted batch must replay in full — no silent 'merged = latest'
    state loss."""
    target = str(tmp_path / "target")
    b0 = spark.createDataFrame([(1, 100, 1.0), (2, 100, 5.0)], SCHEMA)
    assert upsert_batch(b0, 0, target, ["user_id"], "ts") is True

    # crash point: data -> _data_old done, _tmp_upsert -> data NOT done
    data_dir = os.path.join(target, "data")
    os.rename(data_dir, os.path.join(target, "_data_old"))

    # any reader recovers the committed state first
    got = {r.user_id: r for r in read_upsert_target(spark, target).collect()}
    assert got[1].value == 1.0 and len(got) == 2
    assert last_committed_batch(target) == 0

    # the interrupted batch replays (ledger never advanced) and must MERGE
    # with the restored state, not replace it
    b1 = spark.createDataFrame([(3, 50, 7.0)], SCHEMA)
    assert upsert_batch(b1, 1, target, ["user_id"], "ts") is True
    got = {r.user_id: r for r in read_upsert_target(spark, target).collect()}
    assert len(got) == 3 and got[1].value == 1.0 and got[3].value == 7.0


def test_upsert_crash_after_swap_cleans_leftover(spark, tmp_path):
    """Crash AFTER the new state went live but before _data_old cleanup:
    the new state wins and the leftover directory is dropped."""
    target = str(tmp_path / "target")
    b0 = spark.createDataFrame([(1, 100, 1.0)], SCHEMA)
    assert upsert_batch(b0, 0, target, ["user_id"], "ts") is True
    b1 = spark.createDataFrame([(1, 200, 2.0)], SCHEMA)
    assert upsert_batch(b1, 1, target, ["user_id"], "ts") is True

    # crash point: both data (new) and _data_old (stale copy) exist
    old_dir = os.path.join(target, "_data_old")
    shutil.copytree(os.path.join(target, "data"), old_dir)

    recover_target(target)
    assert not os.path.exists(old_dir)
    got = {r.user_id: r for r in read_upsert_target(spark, target).collect()}
    assert got[1].value == 2.0 and len(got) == 1


def test_stream_upsert_end_to_end(spark, tmp_path):
    """Drain the events file-stream into the keyed sink: exactly one row
    per user survives — the one with the latest event_time."""
    sf_dir = "/root/testdata/sf0.001"
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, sf_dir).select(
        "user_id", "event_time", "event_type", "value"
    )
    stream_upsert_to_parquet(
        stream, target, ["user_id"], "event_time", ckpt
    )
    out = read_upsert_target(spark, target)
    n_users = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id"
    ).distinct().count()
    assert out.count() == n_users
    # spot-check one user: sink row == latest event by time (ties: any of
    # the max-time rows — assert on the time, not the payload)
    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    uid = ev.select("user_id").first().user_id
    expect_ts = (
        ev.filter(F.col("user_id") == uid)
        .agg(F.max(F.col("ts").cast("timestamp")))
        .first()[0]
    )
    got = out.filter(F.col("user_id") == uid).first()
    assert got.event_time == expect_ts


def _scd2_batch(spark, rows):
    return spark.createDataFrame(rows, "k long, attr string, val double")


def _apply(spark, rows, bid, target):
    from datetime import datetime, timedelta

    from gcp_healthcare_data_pipeline_spark.streaming.sinks import (
        apply_scd2_batch,
    )

    return apply_scd2_batch(
        _scd2_batch(spark, rows), bid, target, ["k"], ["attr", "val"],
        lambda b: datetime(2025, 1, 1) + timedelta(days=b),
    )


def test_scd2_batch_stream_matches_batch_merge(spark, tmp_path):
    """Drained sink state == batch scd2_initial + scd2_merge over the
    same change feed (strict reference semantics: change -> expire)."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from gcp_healthcare_data_pipeline_spark.operators.scd2 import (
        scd2_initial,
        scd2_merge,
    )

    target = str(tmp_path / "scd2")
    b0 = [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]
    b1 = [(2, "b2", 2.5), (3, "c", 3.0), (4, "d", 4.0)]  # chg, no-op, new
    assert _apply(spark, b0, 0, target) is True
    assert _apply(spark, b1, 1, target) is True

    got = sorted(
        map(tuple, read_upsert_target(spark, target).collect()), key=str
    )
    batch_t0 = scd2_initial(
        _scd2_batch(spark, b0), F.lit(datetime(2025, 1, 1)).cast("timestamp")
    )
    batch_t1 = scd2_merge(
        batch_t0, _scd2_batch(spark, b1), ["k"], ["attr", "val"],
        F.lit(datetime(2025, 1, 2)).cast("timestamp"),
    )
    want = sorted(
        map(tuple, batch_t1.select(*read_upsert_target(
            spark, target).columns).collect()), key=str
    )
    assert got == want
    by_k = {(r[0], r[5]) for r in got}  # (k, is_current)
    assert (2, False) in by_k, "changed key expired"
    assert (4, True) in by_k, "new key inserted current"


def test_scd2_batch_replay_is_noop(spark, tmp_path):
    """Replaying an already-committed batch_id (at-least-once delivery)
    must not double-expire or re-timestamp anything."""
    target = str(tmp_path / "scd2r")
    _apply(spark, [(1, "a", 1.0), (2, "b", 2.0)], 0, target)
    _apply(spark, [(1, "a9", 9.0)], 1, target)
    before = sorted(
        map(tuple, read_upsert_target(spark, target).collect()), key=str
    )
    # replay both batches out of order — all must be no-ops
    assert _apply(spark, [(1, "a9", 9.0)], 1, target) is False
    assert _apply(spark, [(1, "a", 1.0), (2, "b", 2.0)], 0, target) is False
    after = sorted(
        map(tuple, read_upsert_target(spark, target).collect()), key=str
    )
    assert after == before
    assert last_committed_batch(target) == 1


def test_scd2_batch_crash_recovery(spark, tmp_path):
    """Crash between the sink's two renames: recover_target restores the
    last committed state and the interrupted batch replays in full."""
    target = str(tmp_path / "scd2c")
    _apply(spark, [(1, "a", 1.0)], 0, target)
    data = os.path.join(target, "data")
    # simulate: died after data -> _data_old, before tmp -> data
    os.rename(data, os.path.join(target, "_data_old"))
    recover_target(target)
    rows = read_upsert_target(spark, target).collect()
    assert len(rows) == 1 and rows[0].k == 1
    # the interrupted batch now applies cleanly
    assert _apply(spark, [(1, "a2", 2.0)], 1, target) is True
    assert read_upsert_target(spark, target).count() == 1  # strict: expire
