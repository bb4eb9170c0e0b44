"""standing_semdedup_tables — the session-standing committed index
store q_stream_semdedup loads instead of rebuilding centroids+survivors
per invocation (r15 verdict item 1).

Contract pinned here:
 1. the store is built+committed ONCE per (session, sf_dir) and
    subsequent calls only LOAD (no second build — the nightly cost
    model: per-invocation cost ∝ |delta|);
 2. the loaded screen is row-identical to the in-session rebuild path
    (q_semdedup_incremental) — streaming delivery + parquet round-trip
    change nothing about the result;
 3. clear_standing_store() reclaims every store dir (test isolation /
    forcing the build back into a measured path).
"""

from __future__ import annotations

import os

from gcp_healthcare_data_pipeline_spark.queries.streaming_queries import (
    q_stream_semdedup,
)
from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
    _SEMDEDUP_STORES,
    clear_standing_store,
    q_semdedup_incremental,
    standing_semdedup_tables,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_store_builds_once_then_loads(spark):
    clear_standing_store()
    assert SF_DIR not in _SEMDEDUP_STORES
    loaded = standing_semdedup_tables(spark, SF_DIR)
    assert set(loaded) == {"centroids", "m", "survivors"}
    root = _SEMDEDUP_STORES[SF_DIR]
    # a second call must NOT re-build: same committed root, and the
    # version dirs are untouched (exactly one committed version per
    # table)
    again = standing_semdedup_tables(spark, SF_DIR)
    assert _SEMDEDUP_STORES[SF_DIR] == root
    for table in ("centroids", "m", "survivors"):
        vdirs = [
            d
            for d in os.listdir(os.path.join(root, table))
            if d.startswith("v=")
        ]
        assert len(vdirs) == 1, (table, vdirs)
    assert set(again) == {"centroids", "m", "survivors"}


def test_stream_screen_equals_rebuild_path(spark):
    """The union of q_stream_semdedup's micro-batch outputs, screened
    from the LOADED store, is row-identical to the in-session rebuild
    path — the same equality q_index_roundtrip gates, composed through
    the stream."""
    assert _rows(q_stream_semdedup(spark, SF_DIR)) == _rows(
        q_semdedup_incremental(spark, SF_DIR)
    )


def test_clear_reclaims_store_dirs(spark):
    standing_semdedup_tables(spark, SF_DIR)
    root = _SEMDEDUP_STORES[SF_DIR]
    assert os.path.isdir(root)
    clear_standing_store()
    assert not _SEMDEDUP_STORES
    assert not os.path.isdir(root)
