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


def test_stream_equals_batch_above_the_k_floor(spark, tmp_path):
    """The regime the review found latent: wide vectors (2048 dims ->
    8-row blocks) push the derived k/m ABOVE the K_MIN floor, where
    deriving the route's super-count m from each micro-batch's own row
    count (the pre-fix behavior) would differ between the half-delta
    micro-batches (m=3) and the full delta (m=4) and route vectors to
    different supers. With m pinned to the STANDING corpus
    (_route_batch), streamed == batch must hold here too."""
    import numpy as np

    dims, n_corpus, n_delta = 2048, 512, 128
    rng = np.random.RandomState(7)
    rows = []
    vid = 1
    for _ in range(n_corpus):
        rows.append((vid, rng.randn(dims).astype("float32").tolist()))
        vid += 1
        if vid % 10 == 0:
            vid += 1
    for i in range(n_delta):
        rows.append((10 * (i + 1), rng.randn(dims).astype("float32").tolist()))
    d = str(tmp_path / "sfw")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.parquet(d + "/embeddings.parquet")

    from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
        _derived_m,
        load_tables,
    )
    from gcp_healthcare_data_pipeline_spark.functions.vectors import as_double
    from pyspark.sql import functions as F

    emb = load_tables(spark, d, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    half = delta.filter(F.col("vec_id") % 20 == 0)
    m_full = _derived_m(delta).collect()[0]["_m"]
    m_half = _derived_m(half).collect()[0]["_m"]
    assert m_full != m_half, (
        f"corpus no longer exercises the divergent regime "
        f"(m_full={m_full}, m_half={m_half}) — resize it"
    )

    batch = _rows(q_semdedup_incremental(spark, d))
    streamed = _rows(q_stream_semdedup(spark, d))
    assert len(batch) == n_delta
    assert streamed == batch
