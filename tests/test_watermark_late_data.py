"""Event-time watermark semantics: late rows arriving after the watermark
has passed their window must be dropped from the streaming aggregation.

Construction: file a_early.parquet holds events at minutes 0-5 plus one
event at minute 60 (advancing the watermark to 50 with a 10-min delay);
file b_late.parquet holds events back at minute 0 — far behind the
watermark when batch 2 runs. With maxFilesPerTrigger=1 the files process
as separate micro-batches in name order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.streaming.windows import tumbling_counts

BASE_S = 1_700_000_100  # fixed epoch base, multiple of 300 (window-aligned)
BASE_US = BASE_S * 1_000_000


def _event_rows(minutes, start_id):
    return [
        (start_id + i, BASE_US * 1000 + m * 60 * 1_000_000_000, 1, "click", 1.0, "{}")
        for i, m in enumerate(minutes)
    ]


def _write_flat(df, staging: str, dest: str) -> None:
    """One parquet FILE at dest (file streams don't recurse into the
    directory layout df.write produces)."""
    import glob
    import shutil

    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(staging + "/part-*.parquet")[0]
    shutil.copy(part, dest)


def test_late_rows_beyond_watermark_are_dropped(spark, tmp_path):
    src = str(tmp_path / "late_stream")
    import os
    import time

    os.makedirs(src)
    schema = "event_id long, ts long, user_id long, event_type string, value double, props string"
    # batch 1: on-time events at minutes 0,1,2
    early = spark.createDataFrame(_event_rows([0, 1, 2], 0), schema)
    _write_flat(early, str(tmp_path / "stg_a"), src + "/a_early.parquet")
    time.sleep(1.2)  # distinct mod times keep file->batch order deterministic
    # batch 2: minute-60 event advances the watermark to minute 50
    _write_flat(
        spark.createDataFrame(_event_rows([60], 50), schema),
        str(tmp_path / "stg_b"),
        src + "/b_advance.parquet",
    )
    time.sleep(1.2)
    # batch 3: second advance — the batch-2 watermark (minute 50) becomes
    # ACTIVE for filtering in this and later batches (watermark computed
    # at the end of batch N applies from batch N+1 on)
    _write_flat(
        spark.createDataFrame(_event_rows([61], 60), schema),
        str(tmp_path / "stg_c"),
        src + "/c_advance.parquet",
    )
    time.sleep(1.2)
    # batch 4: late arrival back at minute 0 (behind the active watermark
    # -> dropped) and minute 58 (within the 10-min delay -> kept in state)
    _write_flat(
        spark.createDataFrame(_event_rows([0, 58], 100), schema),
        str(tmp_path / "stg_d"),
        src + "/d_late.parquet",
    )

    stream = (
        spark.readStream.schema(early.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    ).withColumn("event_time", F.timestamp_micros(F.expr("ts DIV 1000")))

    agg = tumbling_counts(stream, window="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")  # append emits only finalized windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM t_late").collect()
    finalized = {
        (int(r.window_start.timestamp()) - BASE_S) // 60: r.n_events for r in out
    }
    # the 0-5 minute window finalized with ONLY the 3 on-time events —
    # the late minute-0 arrival was dropped by the watermark
    assert finalized.get(0) == 3
    # and the drop is visible in the stream metrics of the last batch
    last = q.recentProgress[-1]
    assert last["stateOperators"][0]["numRowsDroppedByWatermark"] >= 1
