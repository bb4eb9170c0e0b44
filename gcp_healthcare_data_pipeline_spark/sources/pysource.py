"""Custom connector via the Python DataSource API (Spark 4).

The reference's sources are JDBC/CSV/JSON (SURVEY §2.1); real estates
also need connectors Spark doesn't ship — internal REST feeds, binary
logs, proprietary stores. Spark 4's Python DataSource API is the
engine-native way to add one without a JVM build: implement
``DataSource`` / ``DataSourceReader``, register, and the source
participates in normal planning (schema, partitions for parallel read,
column pruning downstream).

``SyntheticEventsDataSource`` is the engine's reference implementation:
a deterministic partitioned event generator (seeded arithmetic, no I/O)
used for connector-contract tests and load-generation — each input
partition produces its own rows executor-side, proving the
parallel-read path, and identical options always produce identical
data, proving reader determinism.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")

SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
    ]
)


class _Partition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_users = int(options.get("users", 50))
        self.n_partitions = int(options.get("partitions", 4))

    def partitions(self):
        step = max(1, self.n_rows // self.n_partitions)
        bounds = list(range(0, self.n_rows, step)) + [self.n_rows]
        return [
            _Partition(bounds[i], bounds[i + 1])
            for i in range(len(bounds) - 1)
        ]

    def read(self, partition: _Partition):
        # deterministic arithmetic per event_id: same options -> same data
        for i in range(partition.start, partition.end):
            yield _row(i, self.n_users)


def _row(i: int, n_users: int) -> tuple:
    """One deterministic event; shared by the batch and stream readers
    so a drained stream equals the batch read over the same id range."""
    return (
        i,
        (i * 2654435761) % n_users,
        _EVENT_TYPES[(i * 40503) % len(_EVENT_TYPES)],
        round(((i * 69069 + 1) % 10_000) / 100.0, 2),
    )


class _StreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked micro-batch generator: each batch advances the
    offset by ``rows_per_batch`` until ``rows`` is exhausted. The engine
    checkpoints the offset, so restarts resume exactly where the last
    commit left off — the same contract a Kafka reader fulfills with
    topic offsets."""

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_users = int(options.get("users", 50))
        self.per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = start["pos"]
        end = min(pos + self.per_batch, self.n_rows)
        rows = [_row(i, self.n_users) for i in range(pos, end)]
        return iter(rows), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter(
            [_row(i, self.n_users) for i in range(start["pos"], end["pos"])]
        )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)`` —
    also a streaming source via ``spark.readStream`` (same deterministic
    rows, delivered in offset-tracked micro-batches)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _Reader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _StreamReader(self.options)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_file: str, n_rows: int):
        self.tmp_file, self.n_rows = tmp_file, n_rows


class _JsonlWriter(DataSourceWriter):
    """Task-temp + driver-commit sink protocol: every task writes to a
    uniquely-named temp file and reports it in its commit message; the
    driver renames ONLY the files of committed tasks into place and
    ``abort`` removes stragglers — so a failed/speculated task never
    leaves partial output visible. The same two-phase protocol every
    production sink (incl. Spark's own FileCommitProtocol) uses."""

    def __init__(self, options, overwrite: bool = False):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires option 'path'")
        self.overwrite = overwrite
        # job-unique commit id: committed filenames never collide with a
        # previous job's parts, so append-mode writes can't clobber them
        # and a smaller overwrite can't leave stale higher-numbered parts
        self.commit_id = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _JsonlCommit:
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(tmp, n)

    def commit(self, messages) -> None:
        import glob
        import os

        if self.overwrite:
            # data is already safe in the task temps — clearing the old
            # parts here (commit time, all tasks succeeded) keeps the
            # all-or-nothing contract: a failed job never touched them
            for old in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                os.remove(old)
        for i, m in enumerate(messages):
            os.replace(
                m.tmp_file,
                os.path.join(
                    self.path, f"part-{self.commit_id}-{i:05d}.jsonl"
                ),
            )

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_file):
                os.remove(m.tmp_file)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", dir).save()`` —
    line-delimited JSON with the task-temp/driver-commit protocol."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _JsonlWriter(self.options, overwrite)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(JsonlSinkDataSource)
