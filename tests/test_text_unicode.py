"""Unicode robustness of the text-function layer: the synthetic corpus
is ASCII, but a real crawl isn't — pin that tokenization, counting,
fingerprinting, and the quality formula neither crash nor miscount on
multi-byte text (accents, CJK, emoji, RTL)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.functions.text import (
    fingerprint,
    punct_count,
    token_count,
    tokens,
)

SAMPLES = [
    (0, "héllo wörld café"),                  # latin accents
    (1, "数据 处理 引擎"),                      # CJK with spaces
    (2, "مرحبا بالعالم"),                      # RTL arabic
    (3, "emoji 🎉 party 🎊 time"),             # astral-plane emoji
    (4, "mixed English و عربي and 中文 too"),  # mixed scripts
]


def test_token_count_is_codepoint_safe(spark):
    df = spark.createDataFrame(SAMPLES, "id long, text string")
    out = df.select(
        "id",
        token_count(tokens("text")).alias("n"),
        F.length("text").alias("chars"),
    ).collect()
    by_id = {r.id: r for r in out}
    # whitespace tokenization counts tokens, independent of script
    assert by_id[0].n == 3
    assert by_id[1].n == 3
    assert by_id[2].n == 2
    assert by_id[3].n == 5
    assert by_id[4].n == 7
    # length() counts CODEPOINTS, not bytes (é is 1, 🎉 is 1)
    assert by_id[0].chars == len("héllo wörld café")
    assert by_id[3].chars == len("emoji 🎉 party 🎊 time")


def test_fingerprint_and_punct_stable_on_unicode(spark):
    df = spark.createDataFrame(SAMPLES, "id long, text string")
    rows = df.select(
        "id",
        fingerprint(tokens("text")).alias("fp"),
        punct_count(F.col("text")).alias("punct"),
    ).collect()
    # deterministic across runs
    rows2 = df.select(
        "id",
        fingerprint(tokens("text")).alias("fp"),
        punct_count(F.col("text")).alias("punct"),
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
    assert all(r.fp is not None for r in rows)
