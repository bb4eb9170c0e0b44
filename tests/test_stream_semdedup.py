"""q_stream_semdedup contract: streaming delivery of the incremental
semantic screen must change NOTHING about the result — the union of
foreachBatch micro-batch outputs equals the batch q_semdedup_incremental
frame row-for-row, because each delta row is screened independently
against the frozen standing state.
"""

from __future__ import annotations

from gcp_healthcare_data_pipeline_spark.queries.streaming_queries import (
    q_stream_semdedup,
)
from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
    q_semdedup_incremental,
)

SF001 = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.vec_id, r.centroid_id, r.duplicate_of, r.cos_sim, r.is_dup)
        for r in df.collect()
    )


def test_stream_equals_batch_screen(spark):
    batch = _rows(q_semdedup_incremental(spark, SF001))
    streamed = _rows(q_stream_semdedup(spark, SF001))
    assert len(batch) > 0
    assert streamed == batch


def test_stream_covers_every_delta_vector(spark):
    """Both id-hash halves of the delta (the two landed files / two
    micro-batches) appear in the output: dropping a micro-batch would
    lose exactly one half."""
    out = {r.vec_id for r in q_stream_semdedup(spark, SF001).collect()}
    evens = {v for v in out if v % 20 == 0}
    odds = {v for v in out if v % 20 != 0}
    assert evens and odds  # each landed file contributed rows
