"""q_stream_text_dedup contract: streaming delivery of the incremental
text screen must change NOTHING about the result — the union of
foreachBatch micro-batch outputs equals the batch q_dedup_incremental
frame row-for-row, because each delta doc is screened independently
(dedup_queries._screen_frame) against the frozen standing segment store
under the pinned corpus LSH epoch shape.
"""

from __future__ import annotations

from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (
    q_dedup_incremental,
)
from gcp_healthcare_data_pipeline_spark.queries.streaming_queries import (
    q_stream_text_dedup,
)

SF001 = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.doc_id, r.n_exact, r.best_jaccard, r.is_dup)
        for r in df.collect()
    )


def test_stream_equals_batch_screen(spark):
    batch = _rows(q_dedup_incremental(spark, SF001))
    streamed = _rows(q_stream_text_dedup(spark, SF001))
    assert len(batch) > 0
    assert streamed == batch


def test_stream_covers_every_delta_doc(spark):
    """Both id-hash halves of the delta (the two landed files / two
    micro-batches) appear in the output: dropping a micro-batch would
    lose exactly one half."""
    out = {r.doc_id for r in q_stream_text_dedup(spark, SF001).collect()}
    evens = {d for d in out if d % 20 == 0}
    odds = {d for d in out if d % 20 != 0}
    assert evens and odds  # each landed file contributed rows
