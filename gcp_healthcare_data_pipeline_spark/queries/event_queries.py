"""Event-stream analytics over ``events`` in batch form.

The reference has no streaming (SURVEY §2.9) — these are the net-new
time-series operators: tumbling-window aggregation, gap-based
sessionization (the batch twin of streaming session windows — the
streaming variants live in streaming/windows.py over the same table),
and conditional error-rate rollups.

Event-time arithmetic is integer **microseconds** via
``session.event_ts_us`` (encoding-dispatched: raw-nanos BIGINT or
TIMESTAMP/TIMESTAMP_NTZ parquet both resolve to the same epoch-micros
integers DuckDB's ``epoch_us`` produces), so both engines see identical
integers — no float time, no timestamp rendering in the compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.functions.windows import (
    tiny_frame_window,
)
from gcp_healthcare_data_pipeline_spark.queries.registry import QuerySpec
from gcp_healthcare_data_pipeline_spark.session import event_ts_us, load_tables

_BUCKET_US = 300 * 1_000_000  # 5-minute tumbling window
_GAP_US = 1800 * 1_000_000  # 30-minute session gap
_DAY_US = 86400 * 1_000_000



def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window aggregation by event type."""
    ev = load_tables(spark, sf_dir, "events")
    bucket_start = (F.floor(event_ts_us(ev) / _BUCKET_US) * 300).cast("bigint")
    return (
        ev.groupBy(bucket_start.alias("bucket_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_ORACLE_EVENTS_TUMBLING = f"""
SELECT
  CAST(FLOOR(epoch_us(ts) / {_BUCKET_US}) * 300 AS BIGINT) AS bucket_start,
  event_type,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap) per user.

    lag + cumulative-sum session indexing — the standard distributed
    sessionization: one shuffle on user_id, then window functions within
    partitions. (Streaming equivalent: F.session_window, streaming/windows.py.)
    """
    ev = load_tables(spark, sf_dir, "events")
    ev = ev.select(
        "user_id", "event_id", event_ts_us(ev).alias("ts_us"), "value"
    )
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev = ev.withColumn("prev_ts", F.lag("ts_us").over(order)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts_us") - F.col("prev_ts") > _GAP_US),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    ev = ev.withColumn("session_idx", F.sum("new_session").over(order))
    return ev.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


_ORACLE_EVENTS_SESSIONIZE = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events
), lagged AS (
  SELECT *,
    LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_ts
  FROM e
), flagged AS (
  SELECT *,
    CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > {_GAP_US} THEN 1 ELSE 0 END
      AS new_session
  FROM lagged
), sess AS (
  SELECT *,
    CAST(SUM(new_session)
         OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT)
      AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
  COUNT(*) AS n_events,
  MIN(ts_us) AS session_start_us,
  MAX(ts_us) - MIN(ts_us) AS duration_us,
  ROUND(SUM(value), 2) AS total_value
FROM sess
GROUP BY 1, 2
"""


def q_events_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily conditional rollup: error share per day (A3/A4-style
    conditional aggregation on the events table)."""
    ev = load_tables(spark, sf_dir, "events")
    day = (F.floor(event_ts_us(ev) / _DAY_US) * 86400).cast("bigint")
    n_err = F.count(F.when(F.col("event_type") == "error", F.lit(1)))
    n_all = F.count(F.lit(1))
    return ev.groupBy(day.alias("day_start")).agg(
        n_all.alias("n_events"),
        n_err.alias("n_errors"),
        F.round(n_err * F.lit(100.0) / n_all, 4).alias("error_pct"),
    )


_ORACLE_EVENTS_ERROR_RATE = f"""
SELECT
  CAST(FLOOR(epoch_us(ts) / {_DAY_US}) * 86400 AS BIGINT) AS day_start,
  COUNT(*) AS n_events,
  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
  ROUND(COUNT(CASE WHEN event_type = 'error' THEN 1 END) * 100.0 / COUNT(*), 4)
    AS error_pct
FROM events
GROUP BY 1
"""


# epoch micros of 2024-01-01 UTC — fixed cohort origin, so week indexes
# are small ints instead of timestamps (no timestamp rendering in compare)
_WEEK_ORIGIN_US = 1_704_067_200 * 1_000_000
_WEEK_US = 7 * _DAY_US


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase.

    Each stage's entry time must FOLLOW the previous stage's (a later
    click on an earlier view doesn't count backwards). Three per-user
    min-aggregates with an inequality join back to the events — each
    stage shuffles on user_id only, and the stage frames shrink
    monotonically, so at 100 TB every join is a per-user co-partitioned
    merge, never event-by-event state.
    """
    ev = load_tables(spark, sf_dir, "events")
    ev = ev.select("user_id", "event_type", event_ts_us(ev).alias("us"))
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("v_us"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") > F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    rows = [
        v.select(F.lit("1_view").alias("stage"), "user_id"),
        c.select(F.lit("2_click").alias("stage"), "user_id"),
        p.select(F.lit("3_purchase").alias("stage"), "user_id"),
    ]
    stages = rows[0].unionByName(rows[1]).unionByName(rows[2])
    return stages.groupBy("stage").agg(
        F.countDistinct("user_id").alias("n_users")
    )


_ORACLE_EVENTS_FUNNEL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), v AS (
  SELECT user_id, MIN(us) AS v_us FROM e
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.us) AS c_us FROM e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.us > v.v_us GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(e.us) AS p_us FROM e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.us > c.c_us GROUP BY 1
), stages AS (
  SELECT '1_view' AS stage, user_id FROM v
  UNION ALL SELECT '2_click', user_id FROM c
  UNION ALL SELECT '3_purchase', user_id FROM p
)
SELECT stage, COUNT(DISTINCT user_id) AS n_users
FROM stages GROUP BY 1
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted as retained in each later week they were active. One
    per-user min-aggregate (the cohort dim, broadcast back), then a
    distinct count per (cohort_week, week_offset) cell — the retention
    matrix is O(weeks²) rows regardless of corpus size."""
    ev = load_tables(spark, sf_dir, "events")
    ev = ev.select("user_id", event_ts_us(ev).alias("us"))
    week = ((F.col("us") - F.lit(_WEEK_ORIGIN_US)) / F.lit(_WEEK_US)).cast(
        "bigint"
    )
    first = (
        ev.groupBy("user_id")
        .agg(F.min("us").alias("first_us"))
        .select(
            "user_id",
            (
                (F.col("first_us") - F.lit(_WEEK_ORIGIN_US)) / F.lit(_WEEK_US)
            ).cast("bigint").alias("cohort_week"),
        )
    )
    return (
        ev.withColumn("event_week", week)
        .join(F.broadcast(first), "user_id")
        .groupBy(
            "cohort_week",
            (F.col("event_week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


_ORACLE_EVENTS_RETENTION = f"""
WITH e AS (
  SELECT user_id,
    (epoch_us(ts) - {_WEEK_ORIGIN_US}) // {_WEEK_US} AS event_week
  FROM events
), first AS (
  SELECT user_id, MIN(event_week) AS cohort_week FROM e GROUP BY 1
)
SELECT f.cohort_week, e.event_week - f.cohort_week AS week_offset,
  COUNT(DISTINCT e.user_id) AS n_users
FROM e JOIN first f USING (user_id)
GROUP BY 1, 2
"""


def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View-to-purchase conversion latency distribution: per user, the gap
    between the FIRST view and the first purchase AFTER it, rolled up to
    exact p50/p90 seconds over converting users.

    One shuffle on user_id (conditional min-aggregates — no self-join of
    the events table), then a single tiny percentile pass over one row
    per converted user. Latency stays in integer microseconds until the
    final division, so both engines rank identical integers.

    Rounding is done entirely in the integer domain: an interpolated
    percentile of integer microseconds at q=0.5/0.9 is an exact multiple
    of 0.1 us, so ROUND(p*10) snaps the engine's double to the exact
    tenth-of-us integer, and (that + 50000) DIV 100000 rounds to
    centiseconds with pure integer arithmetic — no double ROUND(x, 2)
    tie (x.xx5) can ever diverge between Spark and DuckDB.
    """
    ev = load_tables(spark, sf_dir, "events")
    us = event_ts_us(ev)
    per_user = (
        ev.select("user_id", "event_type", us.alias("us"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias(
                "first_view"
            )
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("p_us")
    )
    conv = (
        per_user.filter(F.col("first_view").isNotNull())
        .join(purchases, "user_id")
        .filter(F.col("p_us") >= F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(F.min("p_us").alias("first_purchase"))
        .select(
            (F.col("first_purchase") - F.col("first_view")).alias("lat_us")
        )
    )
    def _p_sec(q: float) -> F.Column:
        # exact-integer rounding path: us -> tenth-of-us int -> centi-sec
        cs = F.expr(
            f"(CAST(ROUND(percentile(lat_us, {q}) * 10) AS BIGINT)"
            " + 50000) DIV 100000"
        )
        return (cs / F.lit(100.0)).alias(f"p{int(q * 100)}_sec")

    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"), _p_sec(0.5), _p_sec(0.9)
    )


_ORACLE_CONVERSION_LATENCY = """
WITH fv AS (
  SELECT user_id, MIN(epoch_us(ts)) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY 1
), conv AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) - ANY_VALUE(f.first_view) AS lat_us
  FROM events e JOIN fv f USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= f.first_view
  GROUP BY e.user_id, f.first_view
)
SELECT COUNT(*) AS n_converted,
  ((CAST(ROUND(quantile_cont(lat_us, 0.5) * 10) AS BIGINT) + 50000)
     // 100000) / 100.0 AS p50_sec,
  ((CAST(ROUND(quantile_cont(lat_us, 0.9) * 10) AS BIGINT) + 50000)
     // 100000) / 100.0 AS p90_sec
FROM conv
"""


def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling DISTINCT active users per day — the metric a naive
    ``COUNT(DISTINCT) OVER (RANGE 7 days)`` cannot express in Spark.

    Scale pattern: dedup to (user, day) pairs first, then each pair
    contributes itself to the 7 window-days it covers (a bounded 7x
    fan-out via ``explode(sequence(...))``), and one count-distinct per
    window-day finishes it. Every step is a key-local shuffle; nothing
    resembles a per-day self-join over raw events. Days are integer
    epoch-days end-to-end.
    """
    ev = load_tables(spark, sf_dir, "events")
    day = F.floor(event_ts_us(ev) / F.lit(_DAY_US)).cast("bigint")
    active = ev.select("user_id", day.alias("day")).distinct()
    bounds = active.agg(F.max("day").alias("max_day"))
    contrib = active.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + F.lit(6))
        ).alias("window_day"),
    )
    return (
        contrib.join(
            F.broadcast(bounds),
            F.col("window_day") <= F.col("max_day"),
        )
        .groupBy("window_day")
        .agg(F.count_distinct("user_id").alias("active_users_7d"))
    )


_ORACLE_ROLLING_ACTIVE_USERS = f"""
WITH active AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch_us(ts) / {_DAY_US}) AS BIGINT) AS day
  FROM events
), contrib AS (
  SELECT user_id, day + g.offs AS window_day
  FROM active, (SELECT unnest(range(0, 7)) AS offs) g
)
SELECT window_day, COUNT(DISTINCT user_id) AS active_users_7d
FROM contrib
WHERE window_day <= (SELECT MAX(day) FROM active)
GROUP BY 1
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition statistics over each user's event
    sequence: for every (previous event type → event type) pair, the
    transition count and probability — the behavioral model behind
    next-action prediction, anomaly scoring, and funnel discovery
    (funnels are just high-probability transition chains).

    One lag window per user (shuffle on user_id, frames ordered by
    event time), then a tiny |types|² aggregate with the per-source
    total supplied in place by a window over the transition table — no
    second pass over the events.
    """
    ev = load_tables(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy(
        event_ts_us(ev), F.col("event_id")
    )
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(order))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    per_src = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        F.col("event_type").alias("next_type"),
        "n_transitions",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(per_src),
            6,
        ).alias("p_transition"),
    )


_ORACLE_EVENT_TRANSITIONS = """
WITH ordered AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id
      ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n_transitions,
  ROUND(CAST(n_transitions AS DOUBLE)
        / SUM(n_transitions) OVER (PARTITION BY prev_type), 6)
    AS p_transition
FROM pairs
"""


_SPIKE_MIN_BASE = 12  # trailing hours required before scoring
_SPIKE_Z = 3.0


def q_rate_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational anomaly monitor: per event type and hour, the event
    rate's z-score against the TRAILING 24 observed hours (RANGE frame
    on the integer epoch-hour, excluding the current hour) — the alert
    every on-call dashboard computes, kept cross-engine-exact by
    deriving mean and stddev EXPLICITLY from integer window sums
    (Σx, Σx², n are exact BIGINTs, so both engines run the identical
    IEEE arithmetic; builtin stddev_samp's accumulation order would not
    be portable). Hours with fewer than 12 trailing observations score
    NULL instead of a noisy baseline.
    """
    ev = load_tables(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            (event_ts_us(ev) / 3_600_000_000).cast("bigint").alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rangeBetween(-24, -1)
    )
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum("n_events").over(w)
    s2 = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    mean = s1.cast("double") / n
    var = (s2.cast("double") - s1.cast("double") * s1 / n) / (n - 1)
    z = (F.col("n_events") - mean) / F.sqrt(var)
    scored = hourly.select(
        "event_type",
        "hour",
        "n_events",
        n.alias("n_base"),
        F.when(n >= _SPIKE_MIN_BASE, F.round(z, 4)).alias("z"),
        F.when(n >= _SPIKE_MIN_BASE, z > _SPIKE_Z).alias("is_spike"),
    )
    return scored


_ORACLE_RATE_SPIKES = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), framed AS (
  SELECT event_type, hour, n_events,
    COUNT(*) OVER w AS n_base,
    SUM(n_events) OVER w AS s1,
    SUM(n_events * n_events) OVER w AS s2
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour, n_events, n_base,
  CASE WHEN n_base >= {_SPIKE_MIN_BASE} THEN
    ROUND((n_events - CAST(s1 AS DOUBLE) / n_base)
          / SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_base)
                 / (n_base - 1)), 4)
  END AS z,
  CASE WHEN n_base >= {_SPIKE_MIN_BASE} THEN
    (n_events - CAST(s1 AS DOUBLE) / n_base)
    / SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_base)
           / (n_base - 1)) > {_SPIKE_Z}
  END AS is_spike
FROM framed
"""


def q_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern match (MATCH_RECOGNIZE-style):
    per user, does a ``view → … → purchase`` journey complete WITHOUT an
    intervening ``error``, and how many disjoint such journeys occur —
    evaluated by encoding each user's ordered event sequence as a
    one-letter-per-event string and running a regex (``v[^e]*p``) over
    it: the sequence-as-string trick that turns sequential pattern logic
    into vectorized string ops.

    One shuffle groups each user's ordered letters (collect_list over
    the sort-ordered window, then one row per user); the regex is
    map-side. The journey string is also pinned by md5, so the oracle
    verifies the exact encoded sequence, not just the match counts.
    Greedy leftmost non-overlapping semantics agree between engines.
    """
    ev = load_tables(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy(
        event_ts_us(ev), F.col("event_id")
    )
    per_user = (
        ev.withColumn(
            "_letters",
            F.collect_list(F.substring("event_type", 1, 1)).over(
                order.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .groupBy("user_id")
        .agg(F.first(F.concat_ws("", "_letters")).alias("journey"))
    )
    return per_user.select(
        "user_id",
        F.length("journey").alias("n_events"),
        F.md5("journey").alias("journey_md5"),
        F.regexp_count(F.col("journey"), F.lit("v[^e]*p")).alias(
            "n_clean_conversions"
        ),
        F.col("journey").rlike("v[^e]*p").alias("has_clean_conversion"),
    )


_ORACLE_SEQUENCE_PATTERN = """
WITH per_user AS (
  SELECT user_id,
    string_agg(substr(event_type, 1, 1), ''
               ORDER BY epoch_us(ts), event_id) AS journey
  FROM events GROUP BY user_id
)
SELECT user_id,
  CAST(LENGTH(journey) AS INT) AS n_events,
  md5(journey) AS journey_md5,
  CAST(len(regexp_extract_all(journey, 'v[^e]*p')) AS INT)
    AS n_clean_conversions,
  regexp_matches(journey, 'v[^e]*p') AS has_clean_conversion
FROM per_user
"""


def q_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly totals, the previous
    month's total via lag, and the percent change — the BI
    period-over-period primitive (distinct from the RANGE-frame rolling
    aggregate: the comparison is to the PRIOR bucket, not a trailing
    window). Revenue accumulates in exact integer cents so the sum is
    order-independent across engines.
    """
    orders = load_tables(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    monthly = (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").alias("month")
        )
        .agg(F.sum(cents).alias("_cents"), F.count(F.lit(1)).alias("n_orders"))
    )
    w = tiny_frame_window("month", "month")  # |months| rows: tiny frame
    prev = F.lag("_cents").over(w)
    return monthly.select(
        "month",
        "n_orders",
        F.round(F.col("_cents") / 100.0, 2).alias("revenue"),
        F.round(prev / 100.0, 2).alias("prev_revenue"),
        F.round(
            (F.col("_cents") - prev) * 100.0 / prev, 4
        ).alias("growth_pct"),
    )


_ORACLE_MOM_GROWTH = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         COUNT(*) AS n_orders,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
)
SELECT month, n_orders,
  ROUND(cents / 100.0, 2) AS revenue,
  ROUND(LAG(cents) OVER (ORDER BY month) / 100.0, 2) AS prev_revenue,
  ROUND((cents - LAG(cents) OVER (ORDER BY month)) * 100.0
        / LAG(cents) OVER (ORDER BY month), 4) AS growth_pct
FROM monthly
"""


QUERIES = [
    QuerySpec(
        "q_events_tumbling", q_events_tumbling, _ORACLE_EVENTS_TUMBLING,
        "ext:streaming-batch A1 A2",
    ),
    QuerySpec(
        "q_event_transitions", q_event_transitions,
        _ORACLE_EVENT_TRANSITIONS,
        "ext:sequence (first-order Markov transition matrix)",
    ),
    QuerySpec(
        "q_mom_growth", q_mom_growth, _ORACLE_MOM_GROWTH,
        "ext:window (period-over-period growth, exact integer cents)",
    ),
    QuerySpec(
        "q_sequence_pattern", q_sequence_pattern, _ORACLE_SEQUENCE_PATTERN,
        "ext:sequence (CEP regex pattern over encoded event journeys)",
    ),
    QuerySpec(
        "q_rate_spikes", q_rate_spikes, _ORACLE_RATE_SPIKES,
        "ext:monitoring (trailing-window rate z-score, integer-exact)",
    ),
    QuerySpec(
        "q_conversion_latency", q_conversion_latency,
        _ORACLE_CONVERSION_LATENCY,
        "ext:analytics (view->purchase latency percentiles)",
    ),
    QuerySpec(
        "q_rolling_active_users", q_rolling_active_users,
        _ORACLE_ROLLING_ACTIVE_USERS,
        "ext:analytics (rolling distinct via bounded fan-out)",
    ),
    QuerySpec(
        "q_events_sessionize", q_events_sessionize, _ORACLE_EVENTS_SESSIONIZE,
        "ext:streaming-batch ext:window",
    ),
    QuerySpec(
        "q_events_error_rate", q_events_error_rate, _ORACLE_EVENTS_ERROR_RATE,
        "ext:streaming-batch A3 A4",
    ),
    QuerySpec(
        "q_events_funnel", q_events_funnel, _ORACLE_EVENTS_FUNNEL,
        "ext:analytics (ordered conversion funnel)",
    ),
    QuerySpec(
        "q_retention_cohorts", q_retention_cohorts, _ORACLE_EVENTS_RETENTION,
        "ext:analytics (weekly cohort retention)",
    ),
]
