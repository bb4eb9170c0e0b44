"""Extended operator coverage: chained SCD2 runs, rollup, semi/anti joins,
as-of lookups, pivot, and oracle-backed multimodal feature extraction.

These widen the engine surface beyond the reference (which has none of
rollup/semi/anti/as-of/pivot — SURVEY §2.3/§2.8) while staying fully
DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
    decode_audio_stats,
    decode_image_stats,
    decode_video_stats,
    encode_avi_rgb24,
    encode_bmp24,
    encode_wav_pcm16,
    extract_features,
)
from gcp_healthcare_data_pipeline_spark.functions.windows import (
    tiny_frame_window,
)
from gcp_healthcare_data_pipeline_spark.operators.scd2 import scd2_merge
from gcp_healthcare_data_pipeline_spark.queries.registry import QuerySpec
from gcp_healthcare_data_pipeline_spark.queries.silver_analogs import (
    _scd2_snapshots,
    _TS2,
)
from gcp_healthcare_data_pipeline_spark.session import (
    event_time_col,
    event_ts_us,
    load_tables,
)

_TS3 = "2024-12-01"


def q_scd2_two_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained SCD2 merges: history accumulates across runs.

    Run 1 = q_scd2_customer's merge; run 2 applies a second deterministic
    mutation set (acctbal+20 where key%5=0, name suffix where key%11=0)
    at a later timestamp. Exercises expire-then-reprocess across runs
    under strict reference semantics.
    """
    target, source1 = _scd2_snapshots(spark, sf_dir)
    run1 = scd2_merge(
        target, source1, ["entity_key"], ["name", "acctbal", "segment"],
        F.lit(_TS2).cast("timestamp"),
    )
    cus = load_tables(spark, sf_dir, "customer")
    source2 = cus.filter(F.col("c_custkey") % 10 >= 2).select(
        F.col("c_custkey").alias("entity_key"),
        F.when(
            F.col("c_custkey") % 11 == 0, F.concat(F.col("c_name"), F.lit("-v2"))
        )
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.when(
            F.col("c_custkey") % 5 == 0, F.round(F.col("c_acctbal") + 20.0, 2)
        )
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    return scd2_merge(
        run1, source2, ["entity_key"], ["name", "acctbal", "segment"],
        F.lit(_TS3).cast("timestamp"),
    )


_ORACLE_SCD2_TWO_RUNS = f"""
WITH target0 AS (
  SELECT c_custkey AS entity_key, c_name AS name, c_acctbal AS acctbal,
         c_mktsegment AS segment,
         TIMESTAMP '2024-01-01' AS inserted_date,
         TIMESTAMP '2024-01-01' AS modified_date, TRUE AS is_current
  FROM customer WHERE c_custkey % 10 < 8
), source1 AS (
  SELECT c_custkey AS entity_key, c_name AS name,
         CASE WHEN c_custkey % 3 = 0 THEN ROUND(c_acctbal + 10.0, 2)
              ELSE c_acctbal END AS acctbal,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS segment
  FROM customer WHERE c_custkey % 10 >= 2
), j1 AS (
  SELECT t.*, s.entity_key AS s_key, s.name AS s_name,
         s.acctbal AS s_acctbal, s.segment AS s_segment,
         (t.name <> s.name OR t.acctbal <> s.acctbal
          OR t.segment <> s.segment) AS changed
  FROM target0 t FULL OUTER JOIN source1 s ON t.entity_key = s.entity_key
), merged1 AS (
  SELECT entity_key, name, acctbal, segment, inserted_date,
    CASE WHEN s_key IS NOT NULL AND changed THEN TIMESTAMP '{_TS2}'
         ELSE modified_date END AS modified_date,
    CASE WHEN s_key IS NOT NULL AND changed THEN FALSE ELSE TRUE END
      AS is_current
  FROM j1 WHERE entity_key IS NOT NULL
  UNION ALL
  SELECT s_key, s_name, s_acctbal, s_segment,
         TIMESTAMP '{_TS2}', TIMESTAMP '{_TS2}', TRUE
  FROM j1 WHERE entity_key IS NULL
), source2 AS (
  SELECT c_custkey AS entity_key,
         CASE WHEN c_custkey % 11 = 0 THEN c_name || '-v2' ELSE c_name END
           AS name,
         CASE WHEN c_custkey % 5 = 0 THEN ROUND(c_acctbal + 20.0, 2)
              ELSE c_acctbal END AS acctbal,
         c_mktsegment AS segment
  FROM customer WHERE c_custkey % 10 >= 2
), current1 AS (SELECT * FROM merged1 WHERE is_current),
history1 AS (SELECT * FROM merged1 WHERE NOT is_current),
j2 AS (
  SELECT t.*, s.entity_key AS s_key, s.name AS s_name,
         s.acctbal AS s_acctbal, s.segment AS s_segment,
         (t.name <> s.name OR t.acctbal <> s.acctbal
          OR t.segment <> s.segment) AS changed
  FROM current1 t FULL OUTER JOIN source2 s ON t.entity_key = s.entity_key
)
SELECT * FROM history1
UNION ALL
SELECT entity_key, name, acctbal, segment, inserted_date,
  CASE WHEN s_key IS NOT NULL AND changed THEN TIMESTAMP '{_TS3}'
       ELSE modified_date END AS modified_date,
  CASE WHEN s_key IS NOT NULL AND changed THEN FALSE ELSE TRUE END
    AS is_current
FROM j2 WHERE entity_key IS NOT NULL
UNION ALL
SELECT s_key, s_name, s_acctbal, s_segment,
       TIMESTAMP '{_TS3}', TIMESTAMP '{_TS3}', TRUE
FROM j2 WHERE entity_key IS NULL
"""


def q_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(nation, segment) hierarchy totals (subtotals + grand total)."""
    t = load_tables(spark, sf_dir, "nation", "customer")
    joined = t["customer"].join(
        F.broadcast(t["nation"]),
        t["customer"].c_nationkey == t["nation"].n_nationkey,
    )
    return joined.rollup(
        F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
    )


_ORACLE_ROLLUP_SALES = """
SELECT n.n_name AS nation, c.c_mktsegment AS segment,
       COUNT(*) AS n_customers,
       ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP(n.n_name, c.c_mktsegment)
"""


def q_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no orders since 1998 (the filter pushes
    into the right side before the anti join)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    return (
        t["customer"]
        .join(recent, t["customer"].c_custkey == recent.o_custkey, "left_anti")
        .select(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_name").alias("cust_name"),
            F.col("c_acctbal").alias("acctbal"),
        )
    )


_ORACLE_CUSTOMERS_NO_ORDERS = """
SELECT c_custkey AS cust_key, c_name AS cust_name, c_acctbal AS acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '1998-01-01'
)
"""


def q_parts_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: parts that appear in at least one lineitem."""
    t = load_tables(spark, sf_dir, "part", "lineitem")
    return (
        t["part"]
        .join(
            t["lineitem"],
            t["part"].p_partkey == t["lineitem"].l_partkey,
            "left_semi",
        )
        .select(
            F.col("p_partkey").alias("part_key"),
            F.col("p_name").alias("part_name"),
            F.col("p_retailprice").alias("retail_price"),
        )
    )


_ORACLE_PARTS_ORDERED = """
SELECT p_partkey AS part_key, p_name AS part_name,
       p_retailprice AS retail_price
FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
"""


def q_events_asof_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of lookup: for every event, the user's most recent error event
    at-or-before it (last_value IGNORE NULLS over event time) and the gap.

    The within-table as-of pattern — one shuffle on user_id, then a
    running window; the general two-table as-of joins via the same shape
    after a tagged union of both inputs.
    """
    ev = load_tables(spark, sf_dir, "events")
    ts_us = event_ts_us(ev)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    df = ev.select(
        "event_id", "user_id", "event_type", ts_us.alias("ts_us")
    ).withColumn(
        "last_error_ts_us",
        F.last(
            F.when(F.col("event_type") == "error", F.col("ts_us")),
            ignorenulls=True,
        ).over(w),
    )
    return df.select(
        "event_id",
        "user_id",
        "ts_us",
        "last_error_ts_us",
        (F.col("ts_us") - F.col("last_error_ts_us")).alias("gap_us"),
    )


_ORACLE_EVENTS_ASOF_ERROR = """
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
), marked AS (
  SELECT event_id, user_id, ts_us,
    last_value(CASE WHEN event_type = 'error' THEN ts_us END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS last_error_ts_us
  FROM e
)
SELECT event_id, user_id, ts_us, last_error_ts_us,
       ts_us - last_error_ts_us AS gap_us
FROM marked
"""


def q_pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts by priority x status as columns."""
    orders = load_tables(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("order_priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.lit(1)))
        .withColumnRenamed("F", "n_finished")
        .withColumnRenamed("O", "n_open")
        .withColumnRenamed("P", "n_pending")
    )


_ORACLE_PIVOT_ORDER_STATUS = """
SELECT o_orderpriority AS order_priority,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_finished,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_open,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_pending
FROM orders
GROUP BY 1
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction via Arrow-batched mapInPandas.

    Documents stand in for media: payload = utf-8 bytes of text; the stub
    decoder emits sha256-derived features. The oracle reproduces digest
    and features in SQL, so the whole mapInPandas plumbing (schema, batch
    iteration, byte handling) is value-checked — the only Python-side
    operator in the engine.
    """
    docs = load_tables(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
    )
    feats = extract_features(media, dim=4)
    return feats.select(
        "media_id",
        "n_bytes",
        "content_digest",
        F.round(F.element_at("features", 1), 9).alias("f0"),
        F.round(F.element_at("features", 2), 9).alias("f1"),
        F.round(F.element_at("features", 3), 9).alias("f2"),
        F.round(F.element_at("features", 4), 9).alias("f3"),
    )


_ORACLE_MULTIMODAL_FEATURES = """
WITH d AS (
  SELECT doc_id AS media_id, strlen(text) AS n_bytes,
         sha256(text) AS h
  FROM documents
)
SELECT media_id, n_bytes, h AS content_digest,
  ROUND(((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)) / 255.0, 9) AS f0,
  ROUND(((strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) / 255.0, 9) AS f1,
  ROUND(((strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1)) / 255.0, 9) AS f2,
  ROUND(((strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1)) / 255.0, 9) AS f3
FROM d
"""


_BMP_W, _BMP_H = 5, 4  # width 5 -> 15-byte rows, padded to 16 (exercises
# the BMP 4-byte row-padding rule in every single image)


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, value-pinned cross-engine: synthesize one
    24-bit BMP per document from a deterministic pixel formula
    (mapInPandas encode), parse it back with the pure-Python BMP decoder
    (operators/multimodal.py:decode_bmp24 inside decode_image_stats),
    and emit per-image pixel statistics. The DuckDB oracle computes the
    same statistics straight from the pixel formula — so a decoder that
    mishandles BGR order (channel means split it), bottom-up row storage
    or row padding (the position-weighted checksum splits those) cannot
    hash-match. This closes the 'stub codec' gap: the mapInPandas stage
    does actual byte-format decoding, batch-wise, partition-parallel.
    """
    import pandas as pd  # noqa: PLC0415

    docs = load_tables(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    w, h = _BMP_W, _BMP_H

    def make_bmp(it):
        for pdf in it:
            payloads = []
            for mid in pdf["media_id"]:
                m = int(mid)
                rgb = bytearray()
                for y in range(h):
                    for x in range(w):
                        rgb += bytes((
                            (m * 7 + x * 13 + y * 29) % 256,
                            (m * 11 + x * 3 + y * 17) % 256,
                            (m * 5 + x * 19 + y * 7) % 256,
                        ))
                payloads.append(encode_bmp24(w, h, bytes(rgb)))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    media = docs.mapInPandas(make_bmp, "media_id long, payload binary")
    return decode_image_stats(media).select(
        "media_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
        "pix_checksum",
    )


_ORACLE_MULTIMODAL_DECODE = f"""
WITH px AS (
  SELECT d.doc_id AS media_id, xs.x, ys.y,
    (d.doc_id * 7 + xs.x * 13 + ys.y * 29) % 256 AS r,
    (d.doc_id * 11 + xs.x * 3 + ys.y * 17) % 256 AS g,
    (d.doc_id * 5 + xs.x * 19 + ys.y * 7) % 256 AS b
  FROM documents d, range(0, {_BMP_W}) xs(x), range(0, {_BMP_H}) ys(y)
)
SELECT media_id,
  CAST({_BMP_W} AS BIGINT) AS width,
  CAST({_BMP_H} AS BIGINT) AS height,
  ROUND(AVG(r), 6) AS mean_r,
  ROUND(AVG(g), 6) AS mean_g,
  ROUND(AVG(b), 6) AS mean_b,
  CAST(SUM((y * {_BMP_W} + x + 1) * (r * 65536 + g * 256 + b)) AS BIGINT)
    AS pix_checksum
FROM px GROUP BY 1
"""




_WAV_RATE = 8000
_WAV_BASE_N = 64  # clip length 64..95 samples, varies by media_id


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, value-pinned cross-engine: synthesize one
    16-bit mono PCM WAV per document from a deterministic sample formula
    (mapInPandas encode through the RIFF writer), parse it back with the
    pure-Python chunk-walking WAV decoder (operators/multimodal.py:
    decode_wav_pcm16 inside decode_audio_stats), and emit per-clip
    signal statistics. The DuckDB oracle computes the same statistics
    straight from the sample formula — duration and peak are exact
    integers, the RMS is an exact integer sum-of-squares with one
    division and one sqrt (bit-identical both engines), and the
    sign-change count catches any sample-order or endianness bug in the
    codec. Clip lengths vary per id so the data-chunk size math is
    exercised across the corpus.
    """
    import pandas as pd  # noqa: PLC0415

    docs = load_tables(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def make_wav(it):
        for pdf in it:
            payloads = []
            for mid in pdf["media_id"]:
                m = int(mid)
                n = _WAV_BASE_N + m % 32
                samples = [
                    ((m * 31 + i * i * 7 + i * 3) % 4001) - 2000
                    for i in range(n)
                ]
                payloads.append(encode_wav_pcm16(_WAV_RATE, samples))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    media = docs.mapInPandas(make_wav, "media_id long, payload binary")
    return decode_audio_stats(media).select(
        "media_id",
        "sample_rate",
        "n_samples",
        "duration_ms",
        F.round("rms", 9).alias("rms"),
        "zero_crossings",
        "peak",
    )


_ORACLE_MULTIMODAL_AUDIO = f"""
WITH s AS (
  SELECT d.doc_id AS media_id, i.i,
         ((d.doc_id * 31 + i.i * i.i * 7 + i.i * 3) % 4001) - 2000 AS v
  FROM documents d, range(0, {_WAV_BASE_N + 31}) i(i)
  WHERE i.i < {_WAV_BASE_N} + d.doc_id % 32
), sc AS (
  SELECT media_id, i, v,
         CASE WHEN (v >= 0) <> (LAG(v) OVER
                (PARTITION BY media_id ORDER BY i) >= 0)
              THEN 1 ELSE 0 END AS zc
  FROM s
)
SELECT media_id,
       CAST({_WAV_RATE} AS BIGINT) AS sample_rate,
       COUNT(*) AS n_samples,
       COUNT(*) * 1000 // {_WAV_RATE} AS duration_ms,
       ROUND(SQRT(CAST(SUM(v * v) AS BIGINT)
                  / CAST(COUNT(*) AS DOUBLE)) / 32768.0, 9) AS rms,
       CAST(SUM(zc) AS BIGINT) AS zero_crossings,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak
FROM sc GROUP BY 1
"""




_AVI_W, _AVI_H, _AVI_FPS = 4, 3, 10


def q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode, value-pinned cross-engine: synthesize one
    uncompressed AVI per document (3-6 frames of deterministic formula
    pixels through the RIFF/LIST writer), parse it back with the
    pure-Python container walker (operators/multimodal.py:
    decode_avi_rgb24 inside decode_video_stats — a fan-out stage, one
    row per frame), and emit per-frame channel means plus the exact
    frame-to-frame motion sum. The DuckDB oracle computes the same
    statistics straight from the pixel formula (motion via a self-join
    on frame t-1), so a decoder that misorders frames, rows, or
    channels — or mis-sizes a LIST chunk — cannot hash-match.
    """
    import pandas as pd  # noqa: PLC0415

    docs = load_tables(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    w, h = _AVI_W, _AVI_H

    def make_avi(it):
        for pdf in it:
            payloads = []
            for mid in pdf["media_id"]:
                m = int(mid)
                frames = []
                for t in range(3 + m % 4):
                    rgb = bytearray()
                    for y in range(h):
                        for x in range(w):
                            rgb += bytes((
                                (m * 7 + x * 13 + y * 29 + t * 41) % 256,
                                (m * 11 + x * 3 + y * 17 + t * 23) % 256,
                                (m * 5 + x * 19 + y * 7 + t * 31) % 256,
                            ))
                    frames.append(bytes(rgb))
                payloads.append(
                    encode_avi_rgb24(w, h, _AVI_FPS, frames)
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    media = docs.mapInPandas(make_avi, "media_id long, payload binary")
    return decode_video_stats(media).select(
        "media_id",
        "frame_idx",
        "frame_ts_ms",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
        "motion",
    )


_ORACLE_MULTIMODAL_VIDEO = f"""
WITH px AS (
  SELECT d.doc_id AS media_id, ts.t, xs.x, ys.y,
    (d.doc_id * 7 + xs.x * 13 + ys.y * 29 + ts.t * 41) % 256 AS r,
    (d.doc_id * 11 + xs.x * 3 + ys.y * 17 + ts.t * 23) % 256 AS g,
    (d.doc_id * 5 + xs.x * 19 + ys.y * 7 + ts.t * 31) % 256 AS b
  FROM documents d, range(0, 7) ts(t),
       range(0, {_AVI_W}) xs(x), range(0, {_AVI_H}) ys(y)
  WHERE ts.t < 3 + d.doc_id % 4
), motion AS (
  SELECT c.media_id, c.t,
         SUM(ABS(c.r - p.r) + ABS(c.g - p.g) + ABS(c.b - p.b)) AS mv
  FROM px c JOIN px p
    ON c.media_id = p.media_id AND p.t = c.t - 1
   AND c.x = p.x AND c.y = p.y
  GROUP BY 1, 2
)
SELECT px.media_id,
       px.t AS frame_idx,
       px.t * (1000000 // {_AVI_FPS}) // 1000 AS frame_ts_ms,
       ROUND(AVG(px.r), 6) AS mean_r,
       ROUND(AVG(px.g), 6) AS mean_g,
       ROUND(AVG(px.b), 6) AS mean_b,
       CAST(COALESCE(ANY_VALUE(motion.mv), 0) AS BIGINT) AS motion
FROM px LEFT JOIN motion
  ON px.media_id = motion.media_id AND px.t = motion.t
GROUP BY 1, 2
"""


def q_range_join_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range) join: per order, how many of its lineitems shipped
    within 30 days of the order date vs late.

    The equi key (orderkey) carries the shuffle; the range predicate
    refines inside the join — the standard scalable band-join shape.
    (For range joins with NO equi key, bin both sides to coarse time
    buckets and join on the bin — same refinement afterwards.)
    """
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    o, li = t["orders"], t["lineitem"]
    j = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.expr("o_orderdate + INTERVAL 30 DAYS")),
        "left",
    )
    return j.groupBy(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderdate").alias("order_date"),
    ).agg(
        F.count("l_linenumber").alias("lines_shipped_30d"),
        F.round(
            F.sum(F.coalesce(F.col("l_extendedprice"), F.lit(0.0))), 2
        ).alias("amount_shipped_30d"),
    )


_ORACLE_RANGE_JOIN_SHIPPING = """
SELECT o.o_orderkey AS order_key,
       o.o_orderdate AS order_date,
       COUNT(l.l_linenumber) AS lines_shipped_30d,
       ROUND(SUM(COALESCE(l.l_extendedprice, 0.0)), 2) AS amount_shipped_30d
FROM orders o
LEFT JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
GROUP BY 1, 2
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operators (absent from the reference —
    SURVEY §2.7 — and free in Spark): customers who ordered in 1997
    but not in 1998, via except; tagged against the intersect set."""
    t = load_tables(spark, sf_dir, "orders")
    y97 = t.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("cust_key"))
    y98 = t.filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("cust_key"))
    # subtract = EXCEPT (set semantics); exceptAll would keep a customer
    # whose y97 multiplicity exceeds their y98 matches
    churned = y97.subtract(y98).withColumn("cohort", F.lit("churned"))
    retained = y97.intersect(y98).withColumn("cohort", F.lit("retained"))
    return churned.unionByName(retained)


_ORACLE_SET_OPS = """
WITH y97 AS (
  SELECT o_custkey AS cust_key FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
), y98 AS (
  SELECT o_custkey AS cust_key FROM orders
  WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    AND o_orderdate < TIMESTAMP '1999-01-01'
)
SELECT cust_key, 'churned' AS cohort FROM (
  SELECT DISTINCT cust_key FROM y97
  EXCEPT
  SELECT DISTINCT cust_key FROM y98
)
UNION ALL
SELECT cust_key, 'retained' AS cohort FROM (
  SELECT cust_key FROM y97
  INTERSECT
  SELECT cust_key FROM y98
)
"""


def q_cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all grouping combinations including
    the cross-margins rollup misses."""
    orders = load_tables(spark, sf_dir, "orders")
    return orders.cube(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


_ORACLE_CUBE_SALES = """
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form under cube/rollup: only
    the requested margins are computed ((status, priority), (status), ()),
    with grouping_id disambiguating a real NULL key from a rolled-up one.
    One shuffle; Spark expands the sets map-side like cube does."""
    orders = load_tables(spark, sf_dir, "orders")
    status = F.col("o_orderstatus")
    priority = F.col("o_orderpriority")
    return (
        orders.groupingSets(
            [[status, priority], [status], []], status, priority
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "gid",
            "n_orders",
            "total_price",
        )
    )


_ORACLE_GROUPING_SETS = """
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), ())
"""


_GAP_FILL_USER_MOD = 25  # deterministic user subset keeps output bounded
_US_PER_HOUR = 3_600_000_000


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: per-user hourly grid (sequence + explode over
    each user's observed span) left-joined to the hourly aggregate, with
    forward-fill of the last observed hourly average (last IGNORE NULLS).

    The standard regularize-then-impute step before windowed feature
    extraction. Scale shape: the grid explode is bounded by span-hours
    per user (no cross join against a global calendar), and both the
    join and the fill window partition on user_id — one co-partitioned
    exchange end to end. Event-time math in integer micros
    (encoding-dispatched event_ts_us, session.py) so both engines bucket
    identically.
    """
    ev = load_tables(spark, sf_dir, "events").filter(
        F.col("user_id") % _GAP_FILL_USER_MOD == 0
    )
    hourly = (
        ev.select(
            "user_id",
            F.floor(event_ts_us(ev) / _US_PER_HOUR).cast("bigint").alias("hour"),
            "value",
        )
        .groupBy("user_id", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )
    span = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("hour")
    )
    joined = grid.join(hourly, ["user_id", "hour"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour",
        F.coalesce(F.col("n_events"), F.lit(0).cast("bigint")).alias(
            "n_events"
        ),
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(w).alias("filled_value"),
        F.when(F.col("n_events").isNull(), 1).otherwise(0).cast("int").alias(
            "is_gap"
        ),
    )


_ORACLE_GAP_FILL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_HOUR} AS hour, value
  FROM events WHERE user_id % {_GAP_FILL_USER_MOD} = 0
), hourly AS (
  SELECT user_id, hour, CAST(COUNT(*) AS BIGINT) AS n_events,
         ROUND(AVG(value), 4) AS avg_value
  FROM e GROUP BY 1, 2
), span AS (
  SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1
), grid AS (
  SELECT user_id, UNNEST(range(h0, h1 + 1)) AS hour FROM span
)
SELECT g.user_id, g.hour,
  COALESCE(h.n_events, 0) AS n_events,
  h.avg_value,
  last_value(h.avg_value IGNORE NULLS) OVER (
    PARTITION BY g.user_id ORDER BY g.hour
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
  CAST(CASE WHEN h.n_events IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
FROM grid g LEFT JOIN hourly h USING (user_id, hour)
"""


def q_unpivot_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (stack): wide per-part price columns to long
    (metric, value) rows — the wide->long reshape twin of q_pivot."""
    part = load_tables(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("part_key"),
        F.expr(
            "stack(2, 'retail', p_retailprice, "
            "'size_x10', cast(p_size as double) * 10.0) AS (metric, value)"
        ),
    )


_ORACLE_UNPIVOT = """
SELECT p_partkey AS part_key, 'retail' AS metric, p_retailprice AS value
FROM part
UNION ALL
SELECT p_partkey AS part_key, 'size_x10' AS metric,
       CAST(p_size AS DOUBLE) * 10.0 AS value
FROM part
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct counts — the cardinality path at
    100 TB where exact COUNT(DISTINCT) would shuffle every key.

    The raw sketch estimates are engine-specific, so the hashed output is
    the self-certifying contract instead: exact distinct counts (checkable
    cross-engine) plus a per-group boolean asserting the HLL estimate
    landed within 3x the configured rsd of the exact count
    (|approx - exact| / exact <= 0.06 at rsd=0.02). The oracle recomputes
    the exact counts in DuckDB and expects every boolean TRUE, so an HLL
    regression flips a hashed value and fails the driver gate —
    tests/test_approx.py additionally bounds the raw estimates."""
    li = load_tables(spark, sf_dir, "lineitem")
    agg = li.groupBy(F.col("l_returnflag").alias("return_flag")).agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("_ao"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("_ap"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    )

    def _within(approx: str, exact: str) -> F.Column:
        return (
            F.abs(F.col(approx) - F.col(exact)) / F.col(exact) <= 0.06
        )

    return agg.select(
        "return_flag",
        "exact_orders",
        "exact_parts",
        _within("_ao", "exact_orders").alias("orders_within_3rsd"),
        _within("_ap", "exact_parts").alias("parts_within_3rsd"),
    )


_ORACLE_APPROX_DISTINCT = """
SELECT l_returnflag AS return_flag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS orders_within_3rsd,
       TRUE AS parts_within_3rsd
FROM lineitem
GROUP BY 1
"""


def q_hll_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch incremental distinct counting: build one Datasketches
    HLL sketch of ``user_id`` PER DAY (``hll_sketch_agg``), then union the
    daily sketches (``hll_union_agg``) into the all-time estimate.

    This is the 100 TB architecture for "distinct users to date": persist
    tiny per-partition sketches and fold the new day in — no rescan of
    history, no global key shuffle (each sketch is a few KB regardless of
    cardinality). The sketch binary/estimate is engine-specific, so the
    hashed output is the self-certifying contract: the exact distinct
    count and sketch count (both oracle-checkable) plus a boolean pinning
    the merged-HLL estimate within 3x rsd of exact (rsd at lgK=12 is
    ~1.04/sqrt(4096) ~= 1.6%, so the bound is 5%). The oracle expects
    TRUE, so a union/merge regression fails the hash compare;
    tests/test_approx.py additionally bounds the raw estimate.
    """
    ev = load_tables(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.to_date(event_time_col(ev)))
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch"))
    )
    unioned = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "approx_users"
        ),
        F.count(F.lit(1)).alias("n_daily_sketches"),
    )
    exact = ev.agg(F.count_distinct("user_id").alias("exact_users"))
    return (
        unioned.crossJoin(F.broadcast(exact))
        .select(
            "exact_users",
            "n_daily_sketches",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05
            ).alias("within_3rsd"),
        )
    )


_ORACLE_HLL_INCREMENTAL = """
SELECT COUNT(DISTINCT user_id) AS exact_users,
       COUNT(DISTINCT epoch_us(ts) // 86400000000) AS n_daily_sketches,
       TRUE AS within_3rsd
FROM events
"""


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate quantiles (``approx_percentile``) —
    the percentile path at 100 TB, where the sketch merges map-side and
    only k summary tuples per partition cross the shuffle (exact
    percentiles would sort every value).

    Sketch internals are engine-specific, so the hashed output is the
    self-certifying contract: per-group row counts (oracle-checkable)
    plus one boolean per quantile asserting the GK estimate lies inside
    the exact-percentile bracket [q - d, q + d] with d = 5x the
    configured rank error (1/accuracy = 1e-4) — GK guarantees rank error
    <= n/accuracy, so a correct sketch always lands inside. The oracle
    recomputes the counts and expects every boolean TRUE;
    tests/test_approx.py additionally bounds the raw estimates."""
    li = load_tables(spark, sf_dir, "lineitem")
    pcts = F.expr(
        "approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)"
    )
    aggs = [pcts.alias("_pcts"), F.count(F.lit(1)).alias("n_rows")]
    delta = 5.0 / 10000
    pcs = (50, 95, 99)
    for pc in pcs:
        lo, hi = max(pc / 100 - delta, 0.0), min(pc / 100 + delta, 1.0)
        aggs.append(
            F.expr(f"percentile(l_extendedprice, {lo})").alias(f"_lo{pc}")
        )
        aggs.append(
            F.expr(f"percentile(l_extendedprice, {hi})").alias(f"_hi{pc}")
        )
    agg = li.groupBy(F.col("l_returnflag").alias("return_flag")).agg(*aggs)
    checks = [
        (
            (F.col("_pcts")[i] >= F.col(f"_lo{pc}"))
            & (F.col("_pcts")[i] <= F.col(f"_hi{pc}"))
        ).alias(f"p{pc}_in_bracket")
        for i, pc in enumerate(pcs)
    ]
    return agg.select("return_flag", "n_rows", *checks)


_ORACLE_APPROX_QUANTILES = """
SELECT l_returnflag AS return_flag,
       COUNT(*) AS n_rows,
       TRUE AS p50_in_bracket,
       TRUE AS p95_in_bracket,
       TRUE AS p99_in_bracket
FROM lineitem
GROUP BY 1
"""


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation: events has only 5 event types (hot keys);
    the salted two-phase aggregation spreads each over 16 reducers and
    reproduces the plain GROUP BY exactly (the oracle)."""
    from gcp_healthcare_data_pipeline_spark.operators.skew import (  # noqa: PLC0415
        salted_agg,
    )

    ev = load_tables(spark, sf_dir, "events")
    return salted_agg(ev, ["event_type"], "value", "event_id", salts=16)


_ORACLE_SALTED_AGG = """
SELECT event_type,
       COUNT(*) AS n_rows,
       ROUND(SUM(value), 2) AS total,
       ROUND(SUM(value) / COUNT(*), 4) AS avg
FROM events
GROUP BY 1
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC change-feed generation: diff two table snapshots into
    insert/update/delete rows — the inverse of the SCD2 MERGE (which
    *consumes* such a feed).

    Old snapshot = customers with c_custkey % 11 != 0; new snapshot =
    customers with c_custkey % 13 != 0, balance bumped where
    c_custkey % 7 == 0 — both derived deterministically from the same
    table so the expected diff is oracle-computable and all three change
    types occur. One full-outer join on the key, classification
    by null-side and value inequality, unchanged rows dropped. At scale
    this is a single co-partitioned exchange; with bucketed snapshots it
    is exchange-free.
    """
    from gcp_healthcare_data_pipeline_spark.operators.cdc import snapshot_diff

    cust = load_tables(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    old = cust.filter(F.col("c_custkey") % 11 != 0).select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("bal")
    )
    new = cust.filter(F.col("c_custkey") % 13 != 0).select(
        F.col("c_custkey").alias("key"),
        F.when(
            F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + F.lit(10.0)
        )
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    return snapshot_diff(old, new, ["key"], ["bal"]).select(
        "key",
        "change_type",
        F.round("old_bal", 2).alias("old_bal"),
        F.round("new_bal", 2).alias("new_bal"),
    )


_ORACLE_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT c_custkey AS key, c_acctbal AS old_bal
  FROM customer WHERE c_custkey % 11 != 0
), new AS (
  SELECT c_custkey AS key,
         CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10.0
              ELSE c_acctbal END AS new_bal
  FROM customer WHERE c_custkey % 13 != 0
), j AS (
  SELECT COALESCE(o.key, n.key) AS key, o.old_bal, n.new_bal,
    CASE WHEN o.key IS NULL THEN 'insert'
         WHEN n.key IS NULL THEN 'delete'
         WHEN o.old_bal != n.new_bal THEN 'update'
         ELSE 'unchanged' END AS change_type
  FROM old o FULL OUTER JOIN new n ON o.key = n.key
)
SELECT key, change_type,
       ROUND(old_bal, 2) AS old_bal, ROUND(new_bal, 2) AS new_bal
FROM j WHERE change_type != 'unchanged'
"""


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a distributive aggregate: a
    precomputed base partial (9/10 of events) merged with a delta partial
    (the remaining 1/10) by re-aggregating the PARTIALS, never rescanning
    the base rows.

    The pattern behind incremental gold-mart refreshes: COUNT/SUM are
    distributive, so new data folds in at cost O(|delta| + |groups|).
    The oracle is the from-scratch aggregate over everything — the merge
    must be indistinguishable. (AVG and variance derive from merged
    SUM/COUNT; MIN/MAX merge the same way; only holistic aggregates like
    exact median force a rescan.)
    """
    ev = load_tables(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("_n"), F.sum("value").alias("_s")
        )

    base = partial(ev.filter(F.col("event_id") % 10 != 0))
    delta = partial(ev.filter(F.col("event_id") % 10 == 0))
    return (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("_n").alias("n_rows"),
            F.round(F.sum("_s"), 2).alias("total"),
        )
    )


_ORACLE_INCREMENTAL_AGG = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(SUM(value), 2) AS total
FROM events
GROUP BY 1
"""


_EWMA_SPAN = 8  # frame rows; alpha = 0.5


def q_ewma_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of each user's event values
    (alpha=0.5 over the last 8 events) — the time-series smoothing
    primitive plain SUM/AVG window frames can't express, because every
    row in the frame carries a DIFFERENT weight based on its lag.

    Expressed as collect_list over the bounded ordered frame + a HOF
    fold: weight pow(.5, lag) is an exact power of two and the fold adds
    in frame order, so both engines run the identical IEEE operation
    sequence — no rounding slack needed beyond the output ROUND. One
    shuffle on user_id; the frame is 8 rows regardless of history, so
    state per row is O(span) at any scale (the true infinite-history
    EWMA is inherently sequential — the bounded-span form is what
    distributed engines and pandas ewm(span) actually compute).
    """
    ev = load_tables(spark, sf_dir, "events")
    sel = ev.select(
        "user_id", "event_id", event_ts_us(ev).alias("ts_us"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-(_EWMA_SPAN - 1), Window.currentRow)
    )
    vals = F.collect_list("value").over(w)
    num = (
        "aggregate(zip_with(_vals, sequence(size(_vals) - 1, 0, -1),"
        " (v, k) -> v * pow(0.5D, k)), 0.0D, (acc, x) -> acc + x)"
    )
    den = "(2.0D * (1.0D - pow(0.5D, size(_vals))))"
    return (
        sel.withColumn("_vals", vals)
        .select(
            "user_id",
            "event_id",
            "ts_us",
            F.size("_vals").alias("n_frame"),
            F.round(F.expr(f"{num} / {den}"), 6).alias("ewma"),
        )
    )


_ORACLE_EWMA_VALUES = f"""
WITH framed AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
    list(value) OVER (PARTITION BY user_id
      ORDER BY epoch_us(ts), event_id
      ROWS BETWEEN {_EWMA_SPAN - 1} PRECEDING AND CURRENT ROW) AS vals
  FROM events
)
SELECT user_id, event_id, ts_us,
  CAST(len(vals) AS INT) AS n_frame,
  ROUND(
    list_sum(list_transform(range(1, len(vals) + 1),
      i -> vals[i] * pow(0.5, len(vals) - i)))
    / (2.0 * (1.0 - pow(0.5, len(vals)))), 6) AS ewma
FROM framed
"""


def q_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer 30-day rolling revenue via a RANGE window frame
    (value-based, not row-based: the frame is 'orders within the last 30
    DAYS', so same-day peers aggregate together regardless of row order).

    One shuffle on o_custkey; the frame bound is computed on an integer
    epoch-day column so both engines agree exactly.
    """
    orders = load_tables(spark, sf_dir, "orders")
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    sel = orders.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        day.alias("day"),
        "o_totalprice",
    )
    w = (
        Window.partitionBy("cust_key")
        .orderBy("day")
        .rangeBetween(-29, Window.currentRow)
    )
    return sel.select(
        "order_key",
        "cust_key",
        "day",
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("rolling_30d"),
    )


_ORACLE_ROLLING_REVENUE = """
SELECT o_orderkey AS order_key, o_custkey AS cust_key, day,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_30d,
       ROUND(SUM(o_totalprice) OVER w, 2) AS rolling_30d
FROM (
  SELECT o_orderkey, o_custkey,
         datediff('day', DATE '1970-01-01', o_orderdate::DATE) AS day,
         o_totalprice
  FROM orders
)
WINDOW w AS (PARTITION BY o_custkey ORDER BY day
             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe join: lineitem salted on a unique column, part replicated
    once per salt, so a hot part key spreads over 8 reducers — the manual
    form of AQE's skew-join split for skew known ahead of runtime. The
    oracle is the PLAIN join + aggregate: salting must be invisible in
    the result."""
    from gcp_healthcare_data_pipeline_spark.operators.skew import (  # noqa: PLC0415
        salted_join,
    )

    li = load_tables(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_linenumber", "l_quantity"
    )
    part = load_tables(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = li.withColumn(
        "_uid",
        F.col("l_orderkey") * F.lit(8) + F.col("l_linenumber"),
    )
    joined = salted_join(
        li, part, "l_partkey", "p_partkey", "_uid", salts=8
    )
    return joined.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )


_ORACLE_SALTED_JOIN = """
SELECT p.p_brand AS brand,
       COUNT(*) AS n_items,
       ROUND(SUM(l.l_quantity), 2) AS total_qty
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
"""


def q_mart_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level incremental mart refresh: late-arriving orders
    (everything from 1997-07-01 on) land as a delta; the yearly revenue
    mart is refreshed by recomputing ONLY the delta's order-years and
    keeping every other year's rows untouched — the scale-correct
    replacement for the reference's truncate-and-reload gold loads
    (reference gold.sql:11,53,103,145).

    The composition (operators/incremental_mart.py) must be
    indistinguishable from a from-scratch rebuild — the oracle IS the
    full recompute. Note 1997 is a PARTIAL-overlap year: its recompute
    has to re-read the whole partition from the full source (base H1 +
    delta H2), not just the delta rows — the bug this query would catch.
    Pre-1997 years flow through from the base mart without touching the
    fact table; tests/test_incremental_mart.py pins the materialized
    dynamic-partition-overwrite variant file-by-file.
    """
    from gcp_healthcare_data_pipeline_spark.operators.incremental_mart import (
        incremental_mart,
    )

    orders = load_tables(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    src = orders.withColumn("order_year", F.year("o_orderdate"))
    cutoff = F.lit("1997-07-01").cast("timestamp")

    def mart_fn(df: DataFrame) -> DataFrame:
        return df.groupBy("order_year").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )

    base_mart = mart_fn(src.filter(F.col("o_orderdate") < cutoff))
    delta = src.filter(F.col("o_orderdate") >= cutoff)
    return incremental_mart(
        base_mart, src, delta, ["order_year"], mart_fn
    )


_ORACLE_MART_REFRESH = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
GROUP BY 1
"""


def q_active_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap aggregation on a time grid: for every calendar
    month, how many order lines were OPEN (ordered but not yet shipped:
    order month ≤ month ≤ ship month), how many opened, and how many
    shipped — the concurrent-intervals statistic (active sessions / open
    tickets / in-transit inventory) that naive SQL writes as an
    interval×grid overlap JOIN.

    Scale shape: instead of joining every interval against every grid
    cell (a blown-up theta join), the count uses ENDPOINT DIFFERENCING:
    each interval contributes +1 at its start month and -1 after its end
    month (a fixed 4-row fan-out per interval, regardless of length),
    those deltas aggregate to one row per month, and a prefix sum over
    the tiny month grid reconstructs the concurrent count. Cost is
    O(rows) map work + an ~80-row cumsum — interval LENGTH never enters
    (the naive month-explode pays mean-span × rows; this data's
    uncorrelated dates make that span ~28 months, which is exactly the
    regime where differencing wins). The oracle is the naive
    interval-overlap join — same answer, different algorithm.
    """
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    li = (
        t["lineitem"]
        .select("l_orderkey", "l_shipdate")
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    # the synthetic data has some ship dates before the order date —
    # treat [least, greatest] as the open interval (oracle mirrors)
    iv = li.select(
        F.date_trunc("month", "o_orderdate").alias("m0"),
        F.date_trunc("month", "l_shipdate").alias("m1"),
    ).select(
        "m0",
        "m1",
        F.least("m0", "m1").alias("s"),
        F.greatest("m0", "m1").alias("e"),
    )
    # fixed 4-struct fan-out: interval open/close deltas + the
    # opened-this-month / shipped-this-month endpoint markers
    deltas = (
        iv.select(
            F.explode(
                F.array(
                    F.struct(F.col("s").alias("month"),
                             F.lit(1).alias("d"),
                             F.lit(0).alias("o"), F.lit(0).alias("sh")),
                    F.struct(F.add_months("e", 1).cast("timestamp").alias("month"),
                             F.lit(-1).alias("d"),
                             F.lit(0).alias("o"), F.lit(0).alias("sh")),
                    F.struct(F.col("m0").alias("month"),
                             F.lit(0).alias("d"),
                             F.lit(1).alias("o"), F.lit(0).alias("sh")),
                    F.struct(F.col("m1").alias("month"),
                             F.lit(0).alias("d"),
                             F.lit(0).alias("o"), F.lit(1).alias("sh")),
                )
            ).alias("x")
        )
        .groupBy(F.col("x.month").alias("month"))
        .agg(
            F.sum("x.d").alias("delta"),
            F.sum("x.o").cast("bigint").alias("n_opened"),
            F.sum("x.sh").cast("bigint").alias("n_shipped"),
        )
    )
    # complete month grid (gap months can still have open intervals);
    # one-row bounds aggregate -> ~80-row explode, broadcast-scale
    grid = (
        iv.agg(F.min("s").alias("lo"), F.max("e").alias("hi"))
        .select(
            F.explode(
                F.expr("sequence(lo, hi, interval 1 month)")
            ).alias("month")
        )
    )
    w = tiny_frame_window("month", "month")  # frame = month grid (~tens of rows)
    return (
        grid.join(deltas, "month", "left")
        .withColumn(
            "n_open", F.sum(F.coalesce("delta", F.lit(0))).over(w)
        )
        .filter(F.col("n_open") > 0)
        .select(
            "month",
            "n_open",
            F.coalesce("n_opened", F.lit(0).cast("bigint")).alias(
                "n_opened"
            ),
            F.coalesce("n_shipped", F.lit(0).cast("bigint")).alias(
                "n_shipped"
            ),
        )
    )


_ORACLE_ACTIVE_SHIPMENTS = """
WITH iv AS (
  SELECT date_trunc('month', o_orderdate) AS m0,
         date_trunc('month', l_shipdate) AS m1,
         least(date_trunc('month', o_orderdate),
               date_trunc('month', l_shipdate)) AS s,
         greatest(date_trunc('month', o_orderdate),
                  date_trunc('month', l_shipdate)) AS e
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), bounds AS (
  SELECT MIN(s) AS lo, MAX(e) AS hi FROM iv
), months AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month
  FROM bounds
)
SELECT m.month,
       CAST(COUNT(*) AS BIGINT) AS n_open,
       CAST(SUM(CASE WHEN m.month = iv.m0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_opened,
       CAST(SUM(CASE WHEN m.month = iv.m1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shipped
FROM months m
JOIN iv ON m.month BETWEEN iv.s AND iv.e
GROUP BY 1
"""


_IMG_DST = 4  # fixed output dims of the resize stage (4 x 4)
_IMG_CORESET_M = 3  # representatives kept per image cluster


def q_image_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END multimodal -> embedding -> curation chain: synthesize
    one 24-bit BMP per document with VARYING source dimensions (width
    6..8, height 5..6 — every image exercises a different resample
    ratio and the BMP row-padding rule), resize every payload to a
    fixed 4x4 through the REAL decode -> nearest-neighbor -> re-encode
    round trip (operators/multimodal.py:resize_images, Arrow-batched
    mapInPandas), decode the RESIZED bytes back to per-channel means
    (decode_image_stats — a resizer that mispads or misorders rows
    cannot hash-match), embed each image as the 3-dim mean-RGB vector,
    and run the same hierarchical-k-means coreset selection as
    q_coreset_select to keep the 3 most central images per visual
    cluster. This is the image-dedup/curation pipeline shape (CLIP-style
    embed -> cluster -> prototype selection) with the codec and
    clustering both value-pinned: the DuckDB oracle recomputes the NN
    resample arithmetic (src px = min(src_dim-1, dst*src_dim//4)) and
    the identical two-level assignment from the pixel formula alone.
    """
    docs = load_tables(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    return _image_coreset_chain(docs)


def _image_coreset_chain(docs: DataFrame) -> DataFrame:
    """The q_image_coreset body over any (media_id) frame — factored so
    the degenerate-corpus contract tests (empty / < K_MIN corpora,
    tests/test_multimodal_chain_degenerate.py) can drive the REAL
    synth -> resize -> decode -> embed -> coreset chain without parquet
    fixtures."""
    import pandas as pd  # noqa: PLC0415

    from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
        resize_images,
    )
    from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
        _kmeans_assign,
        _seed_centroids,
    )

    def make_bmp(it):
        for pdf in it:
            payloads = []
            for mid in pdf["media_id"]:
                m = int(mid)
                w, h = 6 + m % 3, 5 + m % 2
                rgb = bytearray()
                for y in range(h):
                    for x in range(w):
                        rgb += bytes((
                            (m * 7 + x * 13 + y * 29) % 256,
                            (m * 11 + x * 3 + y * 17) % 256,
                            (m * 5 + x * 19 + y * 7) % 256,
                        ))
                payloads.append(encode_bmp24(w, h, bytes(rgb)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": ["image"] * len(payloads),
                    "payload": payloads,
                }
            )

    media = docs.mapInPandas(
        make_bmp, "media_id long, kind string, payload binary"
    )
    resized = resize_images(media, _IMG_DST, _IMG_DST)
    stats = decode_image_stats(resized.select("media_id", "payload"))
    emb = stats.select(
        F.col("media_id").alias("vec_id"),
        F.array(
            F.round("mean_r", 6), F.round("mean_g", 6), F.round("mean_b", 6)
        ).cast("array<double>").alias("v"),
    ).localCheckpoint(eager=False)
    assigned = _kmeans_assign(emb, _seed_centroids(emb))
    w = Window.partitionBy("centroid_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    return (
        assigned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _IMG_CORESET_M)
        .select("centroid_id", "rank", "vec_id", "dist")
    )


def _image_coreset_oracle_sql() -> str:
    """DuckDB twin of q_image_coreset: NN-resample arithmetic from the
    pixel formula (no bytes needed — the formula IS the image), mean-RGB
    embedding, then the shared hierarchical-assignment CTE chain."""
    from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
        _C0_SQL,
        _hier_assign_sql,
    )

    d = _IMG_DST
    return f"""
WITH src AS (
  SELECT doc_id AS media_id,
         6 + doc_id % 3 AS w, 5 + doc_id % 2 AS h
  FROM documents
), px AS (
  -- dst pixel (x, y) samples src pixel (min(w-1, x*w//{d}),
  -- min(h-1, y*h//{d})) — the resize_images NN kernel
  SELECT s.media_id,
    (s.media_id * 7 + LEAST(s.w - 1, xs.x * s.w // {d}) * 13
       + LEAST(s.h - 1, ys.y * s.h // {d}) * 29) % 256 AS r,
    (s.media_id * 11 + LEAST(s.w - 1, xs.x * s.w // {d}) * 3
       + LEAST(s.h - 1, ys.y * s.h // {d}) * 17) % 256 AS g,
    (s.media_id * 5 + LEAST(s.w - 1, xs.x * s.w // {d}) * 19
       + LEAST(s.h - 1, ys.y * s.h // {d}) * 7) % 256 AS b
  FROM src s, range(0, {d}) xs(x), range(0, {d}) ys(y)
), e AS (
  SELECT media_id AS vec_id,
    [ROUND(AVG(r), 6), ROUND(AVG(g), 6), ROUND(AVG(b), 6)]::DOUBLE[] AS v
  FROM px GROUP BY 1
), {_C0_SQL}, {_hier_assign_sql("c0", "a1", "h1")}
SELECT centroid_id, rank, vec_id, dist FROM (
  SELECT centroid_id, vec_id, dist,
    CAST(ROW_NUMBER() OVER (PARTITION BY centroid_id
      ORDER BY dist ASC, vec_id ASC) AS INT) AS rank
  FROM a1) _r
WHERE rank <= {_IMG_CORESET_M}
"""


_ORACLE_IMAGE_CORESET = _image_coreset_oracle_sql()


_VID_EVERY_MS = 500  # frame-sampling stride target
_VID_FPS = 4  # 250 ms/frame -> sample_frames keeps every 2nd frame
_VID_CORESET_M = 3  # representatives kept per visual cluster


def q_video_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END video -> frames -> embedding -> curation chain (the
    frame-sampled sibling of q_image_coreset, r12 verdict item 5):
    synthesize one uncompressed AVI per document with VARYING geometry
    (width 4..6, height 3..4, 4..6 frames at 4 fps — every payload
    exercises the DIB row-padding rule and a different frame count),
    sample frames through the REAL container parse
    (operators/multimodal.py:sample_frames -> decode_avi_rgb24, stride
    = every_ms over the stream's own 250 ms frame period, i.e. every
    2nd frame), embed each SAMPLED frame as its mean-RGB vector
    computed from the decoded bytes, and keep the
    ``_VID_CORESET_M`` most central frames per visual cluster with the
    shared hierarchical-k-means machinery. The DuckDB oracle recomputes
    frame selection (range(0, n_frames, 2)) AND the per-frame channel
    means from the pixel formula alone — an encoder/parser that strips
    padding wrong, drops a frame, or mis-strides the sampler cannot
    hash-match.
    """
    docs = load_tables(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    return _video_coreset_chain(docs)


def _video_coreset_chain(docs: DataFrame) -> DataFrame:
    """The q_video_coreset body over any (media_id) frame — factored for
    the degenerate-corpus contract tests, like _image_coreset_chain."""
    import pandas as pd  # noqa: PLC0415

    from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
        encode_avi_rgb24,
        sample_frames,
    )
    from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
        _kmeans_assign,
        _seed_centroids,
    )

    def make_avi(it):
        for pdf in it:
            payloads = []
            for mid in pdf["media_id"]:
                m = int(mid)
                w, h, n = 4 + m % 3, 3 + m % 2, 4 + m % 3
                frames = []
                for f in range(n):
                    rgb = bytearray()
                    for y in range(h):
                        for x in range(w):
                            rgb += bytes((
                                (m * 7 + x * 13 + y * 29 + f * 31) % 256,
                                (m * 11 + x * 3 + y * 17 + f * 23) % 256,
                                (m * 5 + x * 19 + y * 7 + f * 37) % 256,
                            ))
                    frames.append(bytes(rgb))
                payloads.append(encode_avi_rgb24(w, h, _VID_FPS, frames))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": ["video"] * len(payloads),
                    "payload": payloads,
                    "duration_ms": pd.Series(
                        [None] * len(payloads), dtype="Int64"
                    ),
                }
            )

    media = docs.mapInPandas(
        make_avi,
        "media_id long, kind string, payload binary, duration_ms long",
    )
    frames = sample_frames(media, every_ms=_VID_EVERY_MS)

    def embed(it):
        for pdf in it:
            ids, rs, gs, bs = [], [], [], []
            for mid, fi, payload in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["frame_payload"]
            ):
                raw = bytes(payload)
                n = len(raw) // 3
                # frame_idx < 8 always (<= 6 frames/clip), so the packed
                # id is bijective; exact-integer sums, ONE IEEE division
                ids.append(int(mid) * 8 + int(fi))
                rs.append(sum(raw[0::3]) / n)
                gs.append(sum(raw[1::3]) / n)
                bs.append(sum(raw[2::3]) / n)
            yield pd.DataFrame(
                {
                    "vec_id": pd.Series(ids, dtype="int64"),
                    "mean_r": rs,
                    "mean_g": gs,
                    "mean_b": bs,
                }
            )

    stats = frames.mapInPandas(
        embed, "vec_id long, mean_r double, mean_g double, mean_b double"
    )
    emb = stats.select(
        "vec_id",
        F.array(
            F.round("mean_r", 6), F.round("mean_g", 6), F.round("mean_b", 6)
        ).cast("array<double>").alias("v"),
    ).localCheckpoint(eager=False)
    assigned = _kmeans_assign(emb, _seed_centroids(emb))
    w = Window.partitionBy("centroid_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    return (
        assigned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _VID_CORESET_M)
        .select(
            "centroid_id",
            "rank",
            F.expr("CAST(vec_id div 8 AS BIGINT)").alias("media_id"),
            F.pmod("vec_id", F.lit(8)).cast("bigint").alias("frame_idx"),
            "dist",
        )
    )


def _video_coreset_oracle_sql() -> str:
    """DuckDB twin of q_video_coreset: frame sampling + per-frame mean
    RGB from the pixel formula (the formula IS the video), then the
    shared hierarchical-assignment CTE chain."""
    from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
        _C0_SQL,
        _hier_assign_sql,
    )

    return f"""
WITH src AS (
  SELECT doc_id AS m, 4 + doc_id % 3 AS w, 3 + doc_id % 2 AS h,
         4 + doc_id % 3 AS nf
  FROM documents
), fr AS (
  -- sample_frames stride: every_ms={_VID_EVERY_MS} over the 250 ms
  -- frame period of the {_VID_FPS} fps stream -> every 2nd frame
  SELECT m, w, h, fs.f FROM src, UNNEST(range(0, nf, 2)) AS fs(f)
), px AS (
  SELECT m, f,
    (m * 7 + xs.x * 13 + ys.y * 29 + f * 31) % 256 AS r,
    (m * 11 + xs.x * 3 + ys.y * 17 + f * 23) % 256 AS g,
    (m * 5 + xs.x * 19 + ys.y * 7 + f * 37) % 256 AS b
  FROM fr, UNNEST(range(0, w)) AS xs(x), UNNEST(range(0, h)) AS ys(y)
), e AS (
  SELECT m * 8 + f AS vec_id,
    [ROUND(AVG(r), 6), ROUND(AVG(g), 6), ROUND(AVG(b), 6)]::DOUBLE[] AS v
  FROM px GROUP BY 1
), {_C0_SQL}, {_hier_assign_sql("c0", "a1", "h1")}
SELECT centroid_id, rank, vec_id // 8 AS media_id, vec_id % 8 AS frame_idx,
       dist
FROM (
  SELECT centroid_id, vec_id, dist,
    CAST(ROW_NUMBER() OVER (PARTITION BY centroid_id
      ORDER BY dist ASC, vec_id ASC) AS INT) AS rank
  FROM a1) _r
WHERE rank <= {_VID_CORESET_M}
"""


_ORACLE_VIDEO_CORESET = _video_coreset_oracle_sql()


_AUD_RATE = 8000  # Hz, synthetic mono PCM16
_AUD_WIN = 20  # samples per fixed-width feature window
_AUD_CORESET_M = 3  # representatives kept per acoustic cluster


def q_audio_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END audio -> windows -> embedding -> curation chain — the
    THIRD multimodal sibling (image r12, video r13, audio r14; r13
    verdict item 4): synthesize one RIFF/WAVE PCM16 clip per document
    with VARYING length (40/60/80 samples at 8 kHz — every clip
    exercises a different window count), decode through the REAL
    header-walking parse (operators/multimodal.py:probe_wav_pcm16 —
    the same chunk walker the audio-stats operator uses — plus the
    numpy sample unpack), cut the DECODED samples into fixed
    ``_AUD_WIN``-sample windows, embed each window as
    [mean, mean-abs, rms] (exact integer sums, ONE IEEE division each,
    sqrt last), and keep the ``_AUD_CORESET_M`` most central windows
    per acoustic cluster with the shared hierarchical-k-means
    machinery. The DuckDB oracle recomputes windows and features from
    the sample formula alone — an encoder that mis-sizes the data
    chunk, a parser that mis-walks RIFF chunks, or a windower that
    strides samples wrong cannot hash-match."""
    docs = load_tables(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    return _audio_coreset_chain(docs)


def _audio_coreset_chain(docs: DataFrame) -> DataFrame:
    """The q_audio_coreset body over any (media_id) frame — factored for
    the degenerate-corpus contract tests, like _video_coreset_chain."""
    import math  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
        encode_wav_pcm16,
        probe_wav_pcm16,
    )
    from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
        _kmeans_assign,
        _seed_centroids,
    )

    def make_wav(it):
        for pdf in it:
            payloads = []
            for mid in pdf["media_id"]:
                m = int(mid)
                n = 40 + (m % 3) * 20
                samples = [
                    ((m * 37 + t * t * 13 + t * 71) % 4001) - 2000
                    for t in range(n)
                ]
                payloads.append(encode_wav_pcm16(_AUD_RATE, samples))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": ["audio"] * len(payloads),
                    "payload": payloads,
                }
            )

    media = docs.mapInPandas(
        make_wav, "media_id long, kind string, payload binary"
    )

    def embed(it):
        import numpy as np  # noqa: PLC0415

        for pdf in it:
            ids, means, mabss, rmss = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                rate, off, n = probe_wav_pcm16(buf)
                s = np.frombuffer(
                    buf, dtype="<i2", count=n, offset=off
                ).astype(np.int64)
                # clip lengths are multiples of the window width, so
                # n // W full windows cover every sample (the oracle
                # windows by t // W over ALL samples — identical only
                # under that invariant, asserted by the formula above);
                # window count <= 4 < 8, packed id bijective (the video
                # chain's discipline)
                for wdx in range(n // _AUD_WIN):
                    wsl = s[wdx * _AUD_WIN:(wdx + 1) * _AUD_WIN]
                    ids.append(int(mid) * 8 + wdx)
                    means.append(int(wsl.sum()) / _AUD_WIN)
                    mabss.append(int(np.abs(wsl).sum()) / _AUD_WIN)
                    rmss.append(
                        math.sqrt(int(np.dot(wsl, wsl)) / _AUD_WIN)
                    )
            yield pd.DataFrame(
                {
                    "vec_id": pd.Series(ids, dtype="int64"),
                    "mean_s": means,
                    "mean_abs": mabss,
                    "rms": rmss,
                }
            )

    stats = media.mapInPandas(
        embed, "vec_id long, mean_s double, mean_abs double, rms double"
    )
    emb = stats.select(
        "vec_id",
        F.array(
            F.round("mean_s", 6), F.round("mean_abs", 6), F.round("rms", 6)
        ).cast("array<double>").alias("v"),
    ).localCheckpoint(eager=False)
    assigned = _kmeans_assign(emb, _seed_centroids(emb))
    w = Window.partitionBy("centroid_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    return (
        assigned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _AUD_CORESET_M)
        .select(
            "centroid_id",
            "rank",
            F.expr("CAST(vec_id div 8 AS BIGINT)").alias("media_id"),
            F.pmod("vec_id", F.lit(8)).cast("bigint").alias("window_idx"),
            "dist",
        )
    )


def _audio_coreset_oracle_sql() -> str:
    """DuckDB twin of q_audio_coreset: sample generation + fixed-width
    windowing + [mean, mean-abs, rms] features from the sample formula
    (the formula IS the clip), then the shared hierarchical-assignment
    CTE chain."""
    from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
        _C0_SQL,
        _hier_assign_sql,
    )

    w = _AUD_WIN
    return f"""
WITH src AS (
  SELECT doc_id AS m, 40 + (doc_id % 3) * 20 AS n FROM documents
), smp AS (
  -- the synth formula; n is always a multiple of {w}, so t // {w}
  -- windows are exactly the full windows the decoder cuts
  SELECT m, ts.t // {w} AS win,
    ((m * 37 + ts.t * ts.t * 13 + ts.t * 71) % 4001) - 2000 AS s
  FROM src, UNNEST(range(0, n)) AS ts(t)
), e AS (
  SELECT m * 8 + win AS vec_id,
    [ROUND(SUM(s) / {w}.0, 6),
     ROUND(SUM(ABS(s)) / {w}.0, 6),
     ROUND(SQRT(SUM(s * s) / {w}.0), 6)]::DOUBLE[] AS v
  FROM smp GROUP BY 1
), {_C0_SQL}, {_hier_assign_sql("c0", "a1", "h1")}
SELECT centroid_id, rank, vec_id // 8 AS media_id, vec_id % 8 AS window_idx,
       dist
FROM (
  SELECT centroid_id, vec_id, dist,
    CAST(ROW_NUMBER() OVER (PARTITION BY centroid_id
      ORDER BY dist ASC, vec_id ASC) AS INT) AS rank
  FROM a1) _r
WHERE rank <= {_AUD_CORESET_M}
"""


_ORACLE_AUDIO_CORESET = _audio_coreset_oracle_sql()


QUERIES = [
    QuerySpec(
        "q_audio_coreset", q_audio_coreset, _ORACLE_AUDIO_CORESET,
        "ext:multimodal ext:similarity (WAV decode -> window features -> "
        "coreset chain)",
    ),
    QuerySpec(
        "q_video_coreset", q_video_coreset, _ORACLE_VIDEO_CORESET,
        "ext:multimodal ext:similarity (video frame-sample -> embed -> "
        "coreset chain)",
    ),
    QuerySpec(
        "q_image_coreset", q_image_coreset, _ORACLE_IMAGE_CORESET,
        "ext:multimodal ext:similarity (resize -> embed -> coreset chain)",
    ),
    QuerySpec("q_scd2_two_runs", q_scd2_two_runs, _ORACLE_SCD2_TWO_RUNS, "J6 §2.6"),
    QuerySpec(
        "q_active_shipments", q_active_shipments, _ORACLE_ACTIVE_SHIPMENTS,
        "ext:timeseries (interval-overlap aggregation via grid explode)",
    ),
    QuerySpec(
        "q_mart_refresh", q_mart_refresh, _ORACLE_MART_REFRESH,
        "ext:incremental (partition-pruned dynamic-overwrite mart refresh)",
    ),
    QuerySpec("q_salted_agg", q_salted_agg, _ORACLE_SALTED_AGG, "ext:skew A1 A2"),
    QuerySpec(
        "q_salted_join", q_salted_join, _ORACLE_SALTED_JOIN,
        "ext:skew (salted fact + replicated dim equi-join)",
    ),
    QuerySpec(
        "q_incremental_agg", q_incremental_agg, _ORACLE_INCREMENTAL_AGG,
        "ext:incremental (partial-merge view maintenance)",
    ),
    QuerySpec(
        "q_snapshot_diff", q_snapshot_diff, _ORACLE_SNAPSHOT_DIFF,
        "ext:cdc (snapshot diff -> insert/update/delete feed)",
    ),
    QuerySpec(
        "q_rolling_revenue", q_rolling_revenue, _ORACLE_ROLLING_REVENUE,
        "ext:window (RANGE frame 30-day rolling aggregate)",
    ),
    QuerySpec(
        "q_ewma_values", q_ewma_values, _ORACLE_EWMA_VALUES,
        "ext:timeseries (bounded-span EWMA via frame HOF fold)",
    ),
    QuerySpec("q_set_ops", q_set_ops, _ORACLE_SET_OPS, "ext:set-ops §2.7"),
    QuerySpec("q_cube_sales", q_cube_sales, _ORACLE_CUBE_SALES, "ext:cube"),
    QuerySpec(
        "q_grouping_sets", q_grouping_sets, _ORACLE_GROUPING_SETS,
        "ext:grouping-sets (explicit margin list + grouping_id)",
    ),
    QuerySpec(
        "q_gap_fill", q_gap_fill, _ORACLE_GAP_FILL,
        "ext:timeseries (hourly grid + forward-fill imputation)",
    ),
    QuerySpec("q_unpivot_balances", q_unpivot_balances, _ORACLE_UNPIVOT, "ext:unpivot"),
    QuerySpec(
        "q_approx_distinct", q_approx_distinct, _ORACLE_APPROX_DISTINCT,
        "ext:approx HLL (exact counts + 3-rsd bound booleans)",
    ),
    QuerySpec(
        "q_hll_incremental", q_hll_incremental, _ORACLE_HLL_INCREMENTAL,
        "ext:approx (mergeable daily HLL sketches, bound-boolean oracle)",
    ),
    QuerySpec(
        "q_approx_quantiles", q_approx_quantiles, _ORACLE_APPROX_QUANTILES,
        "ext:approx quantile sketch (rank-bracket bound booleans)",
    ),
    QuerySpec(
        "q_range_join_shipping", q_range_join_shipping,
        _ORACLE_RANGE_JOIN_SHIPPING, "ext:range-join",
    ),
    QuerySpec("q_rollup_sales", q_rollup_sales, _ORACLE_ROLLUP_SALES, "ext:rollup"),
    QuerySpec(
        "q_customers_no_orders", q_customers_no_orders,
        _ORACLE_CUSTOMERS_NO_ORDERS, "ext:anti-join",
    ),
    QuerySpec(
        "q_parts_ordered", q_parts_ordered, _ORACLE_PARTS_ORDERED,
        "ext:semi-join",
    ),
    QuerySpec(
        "q_events_asof_error", q_events_asof_error, _ORACLE_EVENTS_ASOF_ERROR,
        "ext:asof",
    ),
    QuerySpec(
        "q_pivot_order_status", q_pivot_order_status,
        _ORACLE_PIVOT_ORDER_STATUS, "ext:pivot",
    ),
    QuerySpec(
        "q_multimodal_features", q_multimodal_features,
        _ORACLE_MULTIMODAL_FEATURES, "ext:multimodal",
    ),
    QuerySpec(
        "q_multimodal_decode", q_multimodal_decode,
        _ORACLE_MULTIMODAL_DECODE,
        "ext:multimodal (real BMP byte-format decode, pixel-stat oracle)",
    ),
    QuerySpec(
        "q_multimodal_audio", q_multimodal_audio,
        _ORACLE_MULTIMODAL_AUDIO,
        "ext:multimodal (real RIFF/WAV PCM decode, signal-stat oracle)",
    ),
    QuerySpec(
        "q_multimodal_video", q_multimodal_video,
        _ORACLE_MULTIMODAL_VIDEO,
        "ext:multimodal (real AVI container decode, frame fan-out + motion oracle)",
    ),
]
