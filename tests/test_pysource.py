"""Python DataSource API connector (sources/pysource.py): schema,
parallel partitioned read, determinism, and composition with normal
DataFrame planning. Plus mapInArrow coverage — the lowest-overhead
Arrow batch path, pinned equivalent to its JVM twin."""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.sources.pysource import register


def test_custom_source_reads_with_declared_schema(spark):
    register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 2000)
        .option("users", 25)
        .option("partitions", 8)
        .load()
    )
    assert [f.name for f in df.schema.fields] == [
        "event_id", "user_id", "event_type", "value",
    ]
    assert df.count() == 2000
    assert df.rdd.getNumPartitions() == 8  # parallel read path
    assert df.select("user_id").distinct().count() == 25


def test_custom_source_is_deterministic_and_composes(spark):
    register(spark)

    def load():
        return (
            spark.read.format("synthetic_events")
            .option("rows", 500)
            .load()
        )

    a = load().groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s")
    )
    b = load().groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # composes with joins/filters like any relation
    top = (
        load()
        .filter(F.col("event_type") == "purchase")
        .join(load().select(F.col("event_id").alias("eid")),
              F.col("event_id") == F.col("eid"))
        .count()
    )
    assert top > 0


def test_map_in_arrow_matches_jvm_twin(spark):
    df = spark.range(1000).select(
        "id", (F.col("id") % 7).alias("k")
    )

    def double_ids(batches):
        for batch in batches:
            t = pa.table(
                {
                    "id": pa.compute.multiply(batch.column("id"), 2),
                    "k": batch.column("k"),
                }
            )
            yield from t.to_batches()

    arrow = df.mapInArrow(double_ids, "id long, k long")
    jvm = df.select((F.col("id") * 2).alias("id"), "k")
    assert sorted(map(tuple, arrow.collect())) == sorted(
        map(tuple, jvm.collect())
    )


def test_custom_stream_source_resumes_from_checkpointed_offset(
    spark, tmp_path
):
    """The streaming reader's offsets are engine-checkpointed: each
    bounded availableNow run drains one micro-batch and a rerun resumes
    where the last commit stopped — five runs reconstruct exactly the
    batch read, no duplicates, no gaps (the Kafka-offset contract on a
    custom Python source)."""
    register(spark)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    for _ in range(5):
        s = (
            spark.readStream.format("synthetic_events")
            .option("rows", 500)
            .option("rows_per_batch", 100)
            .load()
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = sorted(map(tuple, spark.read.parquet(sink).collect()))
    want = sorted(
        map(
            tuple,
            spark.read.format("synthetic_events")
            .option("rows", 500)
            .load()
            .collect(),
        )
    )
    assert got == want


def test_custom_jsonl_sink_commit_protocol(spark, tmp_path):
    """The Python DataSource writer's two-phase commit: committed tasks'
    files are renamed into place (no _tmp remnants), content round-trips
    through Spark's own JSON reader, and row counts survive."""
    import json
    import os

    register(spark)
    out = str(tmp_path / "jsonl")
    df = spark.range(500).select(
        "id", (F.col("id") % 9).alias("k")
    ).repartition(3)
    df.write.format("jsonl_sink").mode("append").option("path", out).save()

    files = sorted(os.listdir(out))
    assert all(f.startswith("part-") and f.endswith(".jsonl") for f in files)
    assert len(files) == 3  # one committed file per task
    rows = []
    for f in files:
        with open(os.path.join(out, f)) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["id"] for r in rows) == list(range(500))
    # readable by the engine's normal JSON reader
    back = spark.read.json(out)
    assert back.count() == 500
    assert {f.name for f in back.schema.fields} == {"id", "k"}


def test_jsonl_sink_overwrite_replaces_append_accumulates(spark, tmp_path):
    """Second writes must not clobber or interleave with the first job's
    parts: append accumulates under job-unique filenames; overwrite
    clears every previous part at commit time (including stale
    higher-numbered parts from an earlier larger write)."""
    import os

    register(spark)
    out = str(tmp_path / "jsonl2")
    big = spark.range(300).select("id").repartition(4)
    small = spark.range(1000, 1010).select("id").repartition(1)

    big.write.format("jsonl_sink").mode("append").option("path", out).save()
    small.write.format("jsonl_sink").mode("append").option("path", out).save()
    # append: both jobs' rows survive (no filename collisions)
    assert spark.read.json(out).count() == 310

    # overwrite with a SMALLER write: every stale part must vanish
    small.write.format("jsonl_sink").mode("overwrite").option(
        "path", out
    ).save()
    ids = sorted(r.id for r in spark.read.json(out).collect())
    assert ids == list(range(1000, 1010))
    files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert len(files) == 1
