"""Statistical aggregates + fuzzy record linkage.

- q_percentiles: exact linear-interpolation percentiles (Spark
  ``percentile`` == DuckDB ``quantile_cont`` on DOUBLE inputs).
- q_stats_by_flag: correlation / sample stddev / variance per group —
  distribution-profiling surface for data-quality monitoring.
- q_fuzzy_name_match: levenshtein-based near-match pairs — the healthcare
  record-linkage primitive (same-patient detection across hospitals).
  Blocked by FastSS deletion neighborhoods (Bocek et al. 2007, public
  algorithm): every string emits itself plus each delete-one-char
  variant; any pair within edit distance 1 shares at least one variant
  key, so the block join is LOSSLESS while candidate blocks stay tiny
  (a variant key collides only for genuinely near-identical names).
  This replaces round-1 length-equality blocking, which was degenerate
  on fixed-width names (one block -> O(n^2) pairs on a single key).
  The oracle is the naive all-pairs SQL — the hash match proves the
  blocked plan recovers the full ground-truth pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.functions.windows import tiny_frame_window
from gcp_healthcare_data_pipeline_spark.queries.registry import QuerySpec
from gcp_healthcare_data_pipeline_spark.session import load_tables


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median / p95 order value per priority (exact percentiles)."""
    orders = load_tables(spark, sf_dir, "orders")
    return orders.groupBy(
        F.col("o_orderpriority").alias("order_priority")
    ).agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


_ORACLE_PERCENTILES = """
SELECT o_orderpriority AS order_priority,
  ROUND(quantile_cont(o_totalprice::DOUBLE, 0.5), 4) AS p50,
  ROUND(quantile_cont(o_totalprice::DOUBLE, 0.95), 4) AS p95,
  ROUND(MIN(o_totalprice), 2) AS min_price,
  ROUND(MAX(o_totalprice), 2) AS max_price
FROM orders
GROUP BY 1
"""


def q_stats_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag distribution profile: corr, stddev, variance."""
    li = load_tables(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("return_flag")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_samp("l_discount"), 6).alias("discount_var"),
    )


_ORACLE_STATS_BY_FLAG = """
SELECT l_returnflag AS return_flag,
  COUNT(*) AS n_rows,
  ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
  ROUND(stddev_samp(l_quantity), 6) AS qty_stddev,
  ROUND(var_samp(l_discount), 6) AS discount_var
FROM lineitem
GROUP BY 1
"""


def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage: supplier-name pairs within edit distance 1.

    FastSS blocking via the shared ``operators.dedup.
    fastss_candidate_pairs`` (one definition with q_golden_record and
    the scaling-audit pairs gate): each name emits its deletion
    neighborhood, and joining on the variant key is a lossless
    candidate generator for levenshtein <= 1 — the expensive edit
    distance runs only on candidates.
    """
    from gcp_healthcare_data_pipeline_spark.operators.dedup import (
        fastss_candidate_pairs,
    )

    sup = load_tables(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    candidates = fastss_candidate_pairs(sup, "s_suppkey", "s_name")
    return (
        candidates.select(
            "id_a",
            "id_b",
            F.levenshtein("name_a", "name_b").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= 1)
    )


_ORACLE_FUZZY_NAME_MATCH = """
SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
       levenshtein(a.s_name, b.s_name) AS edit_distance
FROM supplier a
JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
"""


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width document-length histogram per language, with each
    bin's share of its language.

    Binning is pure integer arithmetic (``n_chars div 50 * 50``) so both
    engines bucket identically; the share denominator is a partition-wide
    window sum (no second shuffle — reuses the groupBy partitioning).
    """
    from pyspark.sql import Window

    docs = load_tables(spark, sf_dir, "documents")
    binned = docs.select(
        "lang", F.expr("(n_chars div 50) * 50").alias("bin_start")
    )
    hist = binned.groupBy("lang", "bin_start").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = F.sum("n_docs").over(Window.partitionBy("lang"))
    return hist.select(
        "lang",
        F.col("bin_start").cast("bigint").alias("bin_start"),
        "n_docs",
        F.round(F.col("n_docs").cast("double") / total, 6).alias("lang_share"),
    )


_ORACLE_LENGTH_HISTOGRAM = """
WITH hist AS (
  SELECT lang, CAST((n_chars // 50) * 50 AS BIGINT) AS bin_start,
    CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1, 2
)
SELECT lang, bin_start, n_docs,
  ROUND(CAST(n_docs AS DOUBLE)
        / CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE), 6)
    AS lang_share
FROM hist
"""


_PROFILE_NUM = ("o_orderkey", "o_custkey", "o_totalprice")
_PROFILE_STR = ("o_orderstatus", "o_orderpriority")


def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling operator: per-column null count, exact distinct
    count, and typed min/max for ``orders``, in ONE scan.

    Two scan passes, each one .agg(): the six COUNT-DISTINCTs together
    (one Expand pass), and the nulls + typed min/max together — measured
    3.6x faster than a single combined .agg(), whose plan multi-phases
    the distincts against the plain aggregates (3.6s -> ~1.0s at sf0.1).
    The two 1-row results cross-join (trivial) and a stack reshapes the
    metric vector to one row per column. Numeric min/max land in
    (min_num, max_num); string columns report (min_str, max_str); the
    timestamp column is profiled in tz-free epoch days.
    """
    orders = load_tables(spark, sf_dir, "orders")
    cols = list(_PROFILE_NUM) + list(_PROFILE_STR) + ["o_orderdate"]
    nd_aggs = [F.countDistinct(c).alias(f"{c}__nd") for c in cols]
    aggs = []
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls")
        )
    for c in _PROFILE_NUM:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"{c}__min"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"{c}__max"))
    for c in _PROFILE_STR:
        aggs.append(F.min(c).alias(f"{c}__min"))
        aggs.append(F.max(c).alias(f"{c}__max"))
    # timestamp profiled in tz-free epoch DAYS (date cast of an NTZ
    # timestamp never consults the session timezone; epoch-micros would)
    od_day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("double")
    aggs.append(F.min(od_day).alias("o_orderdate__min"))
    aggs.append(F.max(od_day).alias("o_orderdate__max"))
    one = orders.agg(*aggs).crossJoin(orders.agg(*nd_aggs))
    branches = []
    for c in cols:
        if c in _PROFILE_STR:
            mn, mx = "cast(null as double)", "cast(null as double)"
            smn, smx = f"`{c}__min`", f"`{c}__max`"
        else:
            mn, mx = f"`{c}__min`", f"`{c}__max`"
            smn, smx = "cast(null as string)", "cast(null as string)"
        branches.append(
            f"'{c}', `{c}__nulls`, `{c}__nd`, {mn}, {mx}, {smn}, {smx}"
        )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(branches)}) AS "
            "(col_name, n_nulls, n_distinct, min_num, max_num, "
            "min_str, max_str)"
        )
    )


def _profile_branch(col: str, kind: str) -> str:
    if kind == "num":
        mn = f"CAST(MIN({col}) AS DOUBLE)"
        mx = f"CAST(MAX({col}) AS DOUBLE)"
        smn = smx = "CAST(NULL AS VARCHAR)"
    elif kind == "str":
        mn = mx = "CAST(NULL AS DOUBLE)"
        smn, smx = f"MIN({col})", f"MAX({col})"
    else:  # timestamp profiled in tz-free epoch days
        mn = (
            f"CAST(MIN(datediff('day', DATE '1970-01-01', {col}::DATE))"
            " AS DOUBLE)"
        )
        mx = (
            f"CAST(MAX(datediff('day', DATE '1970-01-01', {col}::DATE))"
            " AS DOUBLE)"
        )
        smn = smx = "CAST(NULL AS VARCHAR)"
    return f"""
SELECT '{col}' AS col_name,
  CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
  {mn} AS min_num, {mx} AS max_num, {smn} AS min_str, {smx} AS max_str
FROM orders"""


_ORACLE_PROFILE_TABLE = " UNION ALL ".join(
    [_profile_branch(c, "num") for c in _PROFILE_NUM]
    + [_profile_branch(c, "str") for c in _PROFILE_STR]
    + [_profile_branch("o_orderdate", "ts")]
)


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the pre-1997 reference window
    and everything after: PSI = Σ (pᵢ − qᵢ)·ln(pᵢ/qᵢ) over the order-
    priority distribution — the drift metric ML monitoring standardizes
    on (PSI < 0.1 stable, > 0.25 action). Emits each bucket's counts,
    shares, and contribution plus the total on every row.

    One conditional-count aggregation pass over the facts collapses to
    a |buckets|-row table; shares and contributions are window
    arithmetic over that tiny frame (audit-allowlisted). Exact integer
    counts → identical doubles in both engines.
    """
    orders = load_tables(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    cell = orders.groupBy(
        F.col("o_orderpriority").alias("bucket")
    ).agg(
        F.sum((F.col("o_orderdate") < cutoff).cast("bigint")).alias("n_ref"),
        F.sum((F.col("o_orderdate") >= cutoff).cast("bigint")).alias(
            "n_cur"
        ),
    )
    allw = tiny_frame_window("bucket")  # |priority buckets| rows: tiny frame
    p = F.col("n_ref").cast("double") / F.sum("n_ref").over(allw)
    q = F.col("n_cur").cast("double") / F.sum("n_cur").over(allw)
    contrib = (p - q) * F.log(p / q)
    return cell.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round(p, 6).alias("p_ref"),
        F.round(q, 6).alias("p_cur"),
        F.round(contrib, 6).alias("contribution"),
        F.round(F.sum(contrib).over(allw), 6).alias("psi"),
    )


_ORACLE_PSI_DRIFT = """
WITH cell AS (
  SELECT o_orderpriority AS bucket,
    CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
             THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
    CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
             THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM orders GROUP BY 1
), ext AS (
  SELECT *,
    CAST(n_ref AS DOUBLE) / SUM(n_ref) OVER () AS p,
    CAST(n_cur AS DOUBLE) / SUM(n_cur) OVER () AS q
  FROM cell
)
SELECT bucket, n_ref, n_cur,
  ROUND(p, 6) AS p_ref,
  ROUND(q, 6) AS p_cur,
  ROUND((p - q) * ln(p / q), 6) AS contribution,
  ROUND(SUM((p - q) * ln(p / q)) OVER (), 6) AS psi
FROM ext
"""


def q_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS regression of line price on quantity: slope =
    cov(x,y)/var(x), intercept = ȳ − slope·x̄, fit = r² — the
    regression-by-group profile (price curves, elasticity screens,
    trend slopes per segment) computed entirely from distributive
    aggregates: ONE map-side-combined pass, no iterative solver, no
    driver math. Both engines evaluate the identical closed form.
    """
    li = load_tables(spark, sf_dir, "lineitem")
    slope = F.covar_samp("l_quantity", "l_extendedprice") / F.var_samp(
        "l_quantity"
    )
    return li.groupBy(F.col("l_returnflag").alias("return_flag")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(slope, 6).alias("slope"),
        F.round(
            F.avg("l_extendedprice") - slope * F.avg("l_quantity"), 4
        ).alias("intercept"),
        F.round(
            F.corr("l_quantity", "l_extendedprice") ** 2, 6
        ).alias("r2"),
    )


_ORACLE_GROUP_REGRESSION = """
SELECT l_returnflag AS return_flag,
  COUNT(*) AS n_rows,
  ROUND(covar_samp(l_quantity, l_extendedprice)
        / var_samp(l_quantity), 6) AS slope,
  ROUND(AVG(l_extendedprice)
        - covar_samp(l_quantity, l_extendedprice) / var_samp(l_quantity)
          * AVG(l_quantity), 4) AS intercept,
  ROUND(POW(corr(l_quantity, l_extendedprice), 2), 6) AS r2
FROM lineitem
GROUP BY 1
"""


def q_ab_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation guardrail: split users into A/B arms by id hash
    (the assignment every experiment platform uses) and compute the
    chi-square homogeneity statistic of the event-type distribution
    between arms — the sample-ratio-mismatch / behavior-drift check run
    before trusting any A/B readout. Emits each cell's contribution and
    the total statistic (df = |types| − 1) on every row.

    One pass: per (arm, type) counts collapse to a |types|-row
    contingency table; expected counts and contributions are arithmetic
    over that tiny frame (window-sums over ≤ 5 rows); the only
    full-data work is the count aggregation. Deterministic md5
    assignment → the oracle rebuilds the identical arms.
    """
    ev = load_tables(spark, sf_dir, "events").select(
        "user_id", "event_type"
    )
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 6), 16, 10
        ).cast("bigint")
        % 2
    )
    cell = (
        ev.withColumn("_arm", arm)
        .groupBy("event_type")
        .agg(
            F.sum((F.col("_arm") == 0).cast("bigint")).alias("n_a"),
            F.sum((F.col("_arm") == 1).cast("bigint")).alias("n_b"),
        )
    )
    allw = tiny_frame_window("event_type")  # |event types| rows: tiny frame
    tot_a = F.sum("n_a").over(allw).cast("double")
    tot_b = F.sum("n_b").over(allw).cast("double")
    row_tot = (F.col("n_a") + F.col("n_b")).cast("double")
    grand = tot_a + tot_b
    exp_a = row_tot * tot_a / grand
    exp_b = row_tot * tot_b / grand
    contrib = (F.col("n_a") - exp_a) ** 2 / exp_a + (
        F.col("n_b") - exp_b
    ) ** 2 / exp_b
    return (
        cell.withColumn("expected_a", F.round(exp_a, 4))
        .withColumn("contribution", F.round(contrib, 6))
        .withColumn(
            "chi_square", F.round(F.sum(contrib).over(allw), 6)
        )
        .select(
            "event_type", "n_a", "n_b", "expected_a", "contribution",
            "chi_square",
        )
    )


_ORACLE_AB_CHI_SQUARE = """
WITH cell AS (
  SELECT event_type,
    CAST(SUM(CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
         1, 6))::BIGINT % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
         1, 6))::BIGINT % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM events GROUP BY 1
), ext AS (
  SELECT *,
    CAST(SUM(n_a) OVER () AS DOUBLE) AS tot_a,
    CAST(SUM(n_b) OVER () AS DOUBLE) AS tot_b,
    CAST(n_a + n_b AS DOUBLE) AS row_tot
  FROM cell
), calc AS (
  SELECT event_type, n_a, n_b,
    row_tot * tot_a / (tot_a + tot_b) AS exp_a,
    POW(n_a - row_tot * tot_a / (tot_a + tot_b), 2)
      / (row_tot * tot_a / (tot_a + tot_b))
    + POW(n_b - row_tot * tot_b / (tot_a + tot_b), 2)
      / (row_tot * tot_b / (tot_a + tot_b)) AS contrib
  FROM ext
)
SELECT event_type, n_a, n_b,
  ROUND(exp_a, 4) AS expected_a,
  ROUND(contrib, 6) AS contribution,
  ROUND(SUM(contrib) OVER (), 6) AS chi_square
FROM calc
"""


_MAD_K = 0.6745  # standard-normal consistency constant
_MAD_CUTOFF = 3.5  # Iglewicz-Hoaglin modified z-score threshold


def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier profile per event type: median, median absolute
    deviation, and the count/extreme of modified z-scores
    (0.6745·(x−med)/MAD, flag |z| > 3.5 — Iglewicz-Hoaglin). The
    mean/stddev z-score (q_user_zscore) breaks down exactly when
    outliers exist (they inflate the stddev that defines them); the
    median/MAD version is the production anomaly gate.

    Exact medians via interpolated ``percentile`` (== DuckDB
    quantile_cont on DOUBLE, the q_percentiles precedent). Plan: two
    per-type aggregates (median, then MAD of residuals) with
    broadcast-joins back — three tiny shuffles over |event_type| groups,
    the fact scanned twice (medians are holistic; a single-pass variant
    would substitute the approx quantile sketch, q_approx_quantiles).
    """
    ev = load_tables(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    with_med = ev.join(F.broadcast(med), "event_type")
    mad = (
        with_med.withColumn("_absdev", F.abs(F.col("value") - F.col("med")))
        .groupBy("event_type")
        .agg(F.expr("percentile(_absdev, 0.5)").alias("mad"))
    )
    z = F.lit(_MAD_K) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.first("med"), 6).alias("median"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum((F.abs(z) > _MAD_CUTOFF).cast("bigint")).alias(
                "n_outliers"
            ),
            F.round(F.max(F.abs(z)), 6).alias("max_abs_z"),
        )
    )


_ORACLE_ROBUST_OUTLIERS = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
), mad AS (
  SELECT e.event_type, quantile_cont(ABS(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY 1
)
SELECT e.event_type,
  COUNT(*) AS n_rows,
  ROUND(ANY_VALUE(m.med), 6) AS median,
  ROUND(ANY_VALUE(d.mad), 6) AS mad,
  CAST(SUM(CASE WHEN ABS({_MAD_K} * (e.value - m.med) / d.mad)
                     > {_MAD_CUTOFF} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_outliers,
  ROUND(MAX(ABS({_MAD_K} * (e.value - m.med) / d.mad)), 6) AS max_abs_z
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
GROUP BY 1
"""


def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end (the MDM 'golden record' operator):
    fuzzy-match supplier names (FastSS deletion-neighborhood blocking +
    levenshtein ≤ 1 — q_fuzzy_name_match's lossless candidate
    generator), close the match graph transitively (min-label-propagation
    connected components, operators/dedup.py), and elect one canonical
    id per entity cluster. Every supplier maps to its golden record;
    singletons are their own canonical.

    Scale shape: blocking keeps candidate generation a near-unique-key
    shuffle (never O(n²)); components converge in O(cluster diameter)
    rounds over duplicate-sized clusters; the canonical election is one
    aggregation joined back hint-free (AQE sizes it — cluster-size
    cardinality grows with the entity count, so no broadcast hint). The
    transitive step is what pairwise linkage alone can't do: A~B and
    B~C unify A,B,C under one id even though A and C never matched
    directly — pinned by the recursive-CTE oracle.
    """
    from gcp_healthcare_data_pipeline_spark.operators.dedup import (
        connected_components,
        fastss_candidate_pairs,
    )

    sup = load_tables(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    pairs = (
        fastss_candidate_pairs(sup, "s_suppkey", "s_name")
        .filter(F.levenshtein("name_a", "name_b") <= 1)
        .select("id_a", "id_b")
    )
    comp = connected_components(pairs)
    resolved = (
        sup.join(comp, sup.s_suppkey == comp.id, "left")
        .select(
            F.col("s_suppkey").alias("entity_id"),
            F.col("s_name").alias("name"),
            F.coalesce("component", "s_suppkey").alias("canonical_id"),
        )
    )
    sizes = resolved.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    # hint-free join: cluster-size cardinality is O(n_entities) —
    # unbounded at scale, so let AQE choose (both sides are already
    # partitioned on canonical_id by the groupBy/join chain)
    return resolved.join(sizes, "canonical_id").select(
        "entity_id",
        "name",
        "canonical_id",
        "cluster_size",
        (F.col("entity_id") == F.col("canonical_id")).alias("is_canonical"),
    )


_ORACLE_GOLDEN_RECORD = """
WITH RECURSIVE pairs AS (
  SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b
  FROM supplier a JOIN supplier b
    ON a.s_suppkey < b.s_suppkey
   AND levenshtein(a.s_name, b.s_name) <= 1
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach(id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst
), comp AS (
  SELECT id, MIN(lbl) AS component FROM reach GROUP BY id
), resolved AS (
  SELECT s.s_suppkey AS entity_id, s.s_name AS name,
         COALESCE(comp.component, s.s_suppkey) AS canonical_id
  FROM supplier s LEFT JOIN comp ON comp.id = s.s_suppkey
), sizes AS (
  SELECT canonical_id, COUNT(*) AS cluster_size FROM resolved GROUP BY 1
)
SELECT entity_id, name, canonical_id, cluster_size,
       entity_id = canonical_id AS is_canonical
FROM resolved JOIN sizes USING (canonical_id)
"""


_CMS_DEPTH = 4
_CMS_WIDTH = 256
_CMS_TOPK = 5


def _cms_bucket_col(i: int, key: F.Column) -> F.Column:
    """Row-``i`` bucket for ``key``: the repo's engine-portable
    ``conv(substr(md5))`` hash (DuckDB twin: ``('0x'||substr(md5))``)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{i}:"), key)), 1, 6
            ),
            16,
            10,
        ).cast("bigint")
        % _CMS_WIDTH
    )


def q_countmin_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation over event user activity:
    build a depth-4 × width-256 CMS of per-user event counts, then
    report each top-5 user's exact count, its CMS estimate (min over the
    4 hashed cells), and the collision overestimate — the sketch every
    streaming heavy-hitter monitor keeps when per-key state is too big.

    Scale shape: each input row map-expands into its 4 (row, bucket)
    cells and aggregates immediately — the shuffle carries at most
    depth×width = 1024 partial cells PER MAP TASK regardless of input
    size or key cardinality (this is the point of the sketch: fixed
    memory). The exact top-k side is a TakeOrdered; estimate lookup
    joins k×depth probe rows against the 1024-cell table, both
    broadcast-sized. Every hash is md5-derived, so the ORACLE REBUILDS
    THE IDENTICAL SKETCH in DuckDB and the estimates hash-match exactly
    — sketch correctness checked cross-engine, not bounded.
    """
    ev = load_tables(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    hashes = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cms_bucket_col(i, F.col("k")).alias("bucket"),
            )
            for i in range(_CMS_DEPTH)
        ]
    )
    cells = (
        ev.select(F.explode(hashes).alias("h"))
        .groupBy("h.row", "h.bucket")
        .agg(F.count(F.lit(1)).alias("cell_n"))
    )
    top = (
        ev.groupBy("k")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("k").asc())
        .limit(_CMS_TOPK)
    )
    probes = top.select("k", "exact_n", F.explode(hashes).alias("h")).select(
        "k", "exact_n", "h.row", "h.bucket"
    )
    return (
        probes.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy("k", "exact_n")
        .agg(F.min("cell_n").alias("cms_estimate"))
        .select(
            F.col("k").cast("bigint").alias("user_id"),
            "exact_n",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_n")).alias("overestimate"),
        )
    )


def _cms_oracle() -> str:
    def bucket(i: int, key: str) -> str:
        return (
            f"('0x' || substr(md5('{i}:' || {key}), 1, 6))::BIGINT"
            f" % {_CMS_WIDTH}"
        )

    hash_rows = " UNION ALL ".join(
        f"SELECT k, {i} AS row, {bucket(i, 'k')} AS bucket FROM keys"
        for i in range(_CMS_DEPTH)
    )
    return f"""
WITH keys AS (
  SELECT CAST(user_id AS VARCHAR) AS k FROM events
), hashed AS ({hash_rows}),
cells AS (
  SELECT row, bucket, COUNT(*) AS cell_n FROM hashed GROUP BY 1, 2
), top AS (
  SELECT k, COUNT(*) AS exact_n FROM keys GROUP BY 1
  ORDER BY exact_n DESC, k ASC LIMIT {_CMS_TOPK}
), probes AS (
  {hash_rows.replace("FROM keys", "FROM (SELECT DISTINCT k FROM top) keys")}
)
SELECT CAST(p.k AS BIGINT) AS user_id,
       t.exact_n,
       MIN(c.cell_n) AS cms_estimate,
       MIN(c.cell_n) - t.exact_n AS overestimate
FROM probes p
JOIN top t ON t.k = p.k
JOIN cells c ON c.row = p.row AND c.bucket = p.bucket
GROUP BY 1, 2
"""


QUERIES = [
    QuerySpec("q_percentiles", q_percentiles, _ORACLE_PERCENTILES, "ext:stats"),
    QuerySpec(
        "q_countmin_heavy", q_countmin_heavy, _cms_oracle(),
        "ext:stats (count-min sketch, cross-engine identical cells)",
    ),
    QuerySpec(
        "q_length_histogram", q_length_histogram, _ORACLE_LENGTH_HISTOGRAM,
        "ext:stats (fixed-width histogram + partition share)",
    ),
    QuerySpec(
        "q_stats_by_flag", q_stats_by_flag, _ORACLE_STATS_BY_FLAG, "ext:stats",
    ),
    QuerySpec(
        "q_fuzzy_name_match", q_fuzzy_name_match, _ORACLE_FUZZY_NAME_MATCH,
        "ext:record-linkage",
    ),
    QuerySpec(
        "q_golden_record", q_golden_record, _ORACLE_GOLDEN_RECORD,
        "ext:record-linkage (transitive entity resolution, golden record)",
    ),
    QuerySpec(
        "q_robust_outliers", q_robust_outliers, _ORACLE_ROBUST_OUTLIERS,
        "ext:stats (median/MAD modified z-score anomaly gate)",
    ),
    QuerySpec(
        "q_ab_chi_square", q_ab_chi_square, _ORACLE_AB_CHI_SQUARE,
        "ext:stats (A/B chi-square homogeneity over hash arms)",
    ),
    QuerySpec(
        "q_group_regression", q_group_regression, _ORACLE_GROUP_REGRESSION,
        "ext:stats (per-group OLS from distributive aggregates)",
    ),
    QuerySpec(
        "q_psi_drift", q_psi_drift, _ORACLE_PSI_DRIFT,
        "ext:monitoring (population stability index between windows)",
    ),
    QuerySpec(
        "q_profile_table", q_profile_table, _ORACLE_PROFILE_TABLE,
        "ext:stats (single-scan per-column table profile)",
    ),
]
