"""Measured scaling audit: does each query's runtime grow ~linearly
with data volume?

Every batch query runs at two scale factors (default sf0.01 -> sf0.1, a
10x data step) in one session, after an untimed sf0.001 warmup pass so
codegen/JIT is not billed to either measurement. The big/small runtime
ratio then classifies the query:

- ratio <= ~12 (10x data + margin): at-most-linear — fixed per-query
  overhead usually pulls it far BELOW 10x at these sizes, which is fine
  (sublinear here = overhead-dominated, the 100 TB story is the plan
  shape, audited separately by explain_audit.py).
- ratio > threshold (default 18): superlinear WARNING — something in
  the plan (a fan-out join, a candidate-pair explosion, a driver-side
  loop) grew faster than the data. These are the queries whose 100 TB
  run dies, and the whole point of this audit is that they cannot hide
  behind a green correctness row.

Streaming queries are excluded (fixed drain machinery, see
STREAM_OVERHEAD.md); fixture-pinned q_pipeline_* gates are excluded
(constant work by design) except the sf-scaling q_pipeline_sf.

Two deeper probes for the highest-ratio families (candidate-pair
generators can LOOK linear in runtime while their pair space bends up):

- ``--pairs``: counts the actual CANDIDATE-PAIR space of every blocked
  dedup/linkage family at both scale factors and flags any family whose
  pairs-per-input-row ratio grows superlinearly (normalized growth
  > --pairs-threshold). This is the direct measurement of the one curve
  that could go superlinear on skewed real corpora.
- ``--second-step``: re-times the dedup/ANN families on a synthetic 10x
  blow-up of sf0.1 (documents' tokens are re-written per copy so dup
  DENSITY is preserved — copies are unrelated documents, not 10-way
  near-dup clusters; embeddings get a per-copy SIGN-FLIP pattern that
  preserves within-copy euclidean AND cosine geometry exactly while
  decorrelating copies — see build_blowup). A sf0.01->sf0.1 audit
  alone can mask late-onset superlinearity; this records the second
  decade.

Usage: python tools/scaling_audit.py [--threshold 18] [query ...]
Writes SCALING_r.md next to the repo root when --out is passed.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

WARMUP_SF = "/root/testdata/sf0.001"
SMALL_SF = "/root/testdata/sf0.01"
BIG_SF = "/root/testdata/sf0.1"


def _candidate_probes():
    """family name -> (pair_counter(spark, sf_dir) -> int,
    denominator(spark, sf_dir) -> int, queries covered)."""
    from pyspark.sql import functions as F

    from gcp_healthcare_data_pipeline_spark.operators.dedup import (
        fastss_candidate_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        pair_intersections,
    )
    from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (
        _DF_CAP,
        _corpus_lsh_params,
        _incremental_band_candidates,
        _shared_shingles,
    )
    from gcp_healthcare_data_pipeline_spark.queries.text_queries import (
        _pmi_doc_arrays,
    )
    from gcp_healthcare_data_pipeline_spark.session import load_tables

    def n_docs(spark, sf_dir):
        return load_tables(spark, sf_dir, "documents").count()

    def n_sup(spark, sf_dir):
        return load_tables(spark, sf_dir, "supplier").count()

    def lsh_pairs(spark, sf_dir):
        r, nb, k = _corpus_lsh_params(spark, sf_dir)
        sig = minhash_signatures(
            _shared_shingles(spark, sf_dir), "doc_id", "shingles", k=k
        )
        return lsh_candidate_pairs(
            sig, "doc_id", "sig", bands=nb, rows_per_band=r
        ).count()

    def posting_pairs(spark, sf_dir):
        return pair_intersections(
            _shared_shingles(spark, sf_dir), min_df=2, max_df=_DF_CAP
        ).count()

    # incremental/fastss/pmi probes COUNT the exact production candidate
    # spaces by calling the same helpers the queries build their plans
    # from — a probe that re-implemented the blocking inline could keep
    # measuring a stale pair space after a query's blocking changed
    def incremental_pairs(spark, sf_dir):
        return _incremental_band_candidates(spark, sf_dir).count()

    def fastss_pairs(spark, sf_dir):
        sup = load_tables(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_name"
        )
        return fastss_candidate_pairs(sup, "s_suppkey", "s_name").count()

    def pmi_pairs(spark, sf_dir):
        arrs = _pmi_doc_arrays(spark, sf_dir)
        return (
            arrs.select(
                (F.size("arr") * (F.size("arr") - 1) / 2).alias("n")
            )
            .agg(F.sum("n"))
            .collect()[0][0]
            or 0
        )

    def semdedup_delta_pairs(spark, sf_dir):
        # the incremental semantic screen's candidate space: batch
        # vector x its routed cluster's SURVIVORS — counted through the
        # same helper the query builds its plan from
        from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
            _semdedup_incremental_parts,
        )

        batch_assigned, survivors = _semdedup_incremental_parts(
            spark, sf_dir
        )
        return batch_assigned.join(
            survivors.select("centroid_id"), "centroid_id"
        ).count()

    def graph_append_pairs(spark, sf_dir):
        # the incremental graph append's candidate space: batch vector
        # x its routed cluster's standing MEMBERS (the superset of the
        # semantic screen's survivor space) — counted through the same
        # helper q_knn_graph_incremental plans from
        from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (
            _incremental_standing_assigned,
        )

        batch_assigned, assigned, _c, _m = _incremental_standing_assigned(
            spark, sf_dir
        )
        return batch_assigned.join(
            assigned.select("centroid_id"), "centroid_id"
        ).count()

    def n_emb(spark, sf_dir):
        return load_tables(spark, sf_dir, "embeddings").count()

    def basket_pairs(spark, sf_dir):
        # the PRE-filter basket self-join space (sum over baskets of
        # C(items, 2)) — q_basket_affinity's one curve that could bend
        # up if basket sizes grew with the corpus
        li = (
            load_tables(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        per = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
        return int(
            per.agg(
                F.sum(F.col("n") * (F.col("n") - 1) / 2)
            ).collect()[0][0]
            or 0
        )

    def n_orders(spark, sf_dir):
        return (
            load_tables(spark, sf_dir, "lineitem")
            .select("l_orderkey")
            .distinct()
            .count()
        )

    return {
        "lsh_band_join": (
            lsh_pairs, n_docs, "q_dedup_minhash_lsh q_corpus_curation "
            "q_dedup_clusters",
        ),
        "posting_list": (
            posting_pairs, n_docs,
            "q_dedup_containment q_dedup_ngram_jaccard",
        ),
        "asymmetric_band_join": (
            incremental_pairs, n_docs, "q_dedup_incremental",
        ),
        "fastss_blocking": (
            fastss_pairs, n_sup, "q_golden_record q_fuzzy_name_match",
        ),
        "pmi_doc_pair_fanout": (
            pmi_pairs, n_docs, "q_pmi_collocations",
        ),
        "basket_pair_fanout": (
            basket_pairs, n_orders, "q_basket_affinity",
        ),
        "semdedup_delta_screen": (
            semdedup_delta_pairs, n_emb, "q_semdedup_incremental",
        ),
        "graph_append_screen": (
            graph_append_pairs, n_emb, "q_knn_graph_incremental",
        ),
    }


def classify_pair_growth(
    p_small: int, d_small: int, p_big: int, d_big: int,
    watch_threshold: float, fail_threshold: float,
) -> "tuple[float, float, float, bool, bool, bool]":
    """Pure gate arithmetic for one family (unit-tested in
    tests/test_tools.py): returns (per_small, per_big, norm, fail,
    watch, sparse_baseline). See ``run_pairs_audit`` for the tier
    semantics."""
    per_small = p_small / max(d_small, 1)
    per_big = p_big / max(d_big, 1)
    floor = 0.5 / max(d_small, 1)
    norm = per_big / max(per_small, floor)
    sparse = p_small < 10
    data_step = d_big / max(d_small, 1)
    growth_floor = 10.0 * data_step * fail_threshold
    fail = (norm > fail_threshold) if not sparse else (p_big > growth_floor)
    # a sparse baseline has no meaningful growth denominator (the
    # docstring's 3 -> 40-pairs-on-noise case), so the norm-based watch
    # tier is suppressed there too — sparse families are judged on the
    # absolute big side only
    watch = not fail and not sparse and norm > watch_threshold
    return per_small, per_big, norm, fail, watch, sparse


def run_pairs_audit(spark, watch_threshold: float, fail_threshold: float):
    """Count candidate pairs per family at SMALL_SF and BIG_SF.

    Two tiers (pairs growing ~linearly with the corpus is the
    scale-safe shape; quadratic growth means the blocking broke):

    - ``watch`` (> watch_threshold, default 1.5): pairs-per-row grew on
      the decade — an analyst cue, printed and recorded, exit 0. The
      shipped tree legitimately has several of these with a-priori
      bounds (SCALING_r10.md §2 analyzes each).
    - ``PAIR BLOWUP`` (> fail_threshold, default 12 = 10x step +
      margin, same logic as the timing threshold): pairs-per-row itself
      grew superlinearly, i.e. total pairs grew ~quadratically — the
      gate exits 1.

    A family with a sparse SMALL_SF baseline (< 10 pairs — zero
    included, via a half-pair floor) has no statistically meaningful
    growth DENOMINATOR, so its norm can explode on noise alone (1 -> 40
    pairs is a 4x-per-row "growth" built on one pair). Such families
    are judged on the ABSOLUTE big side instead: fail when p_big
    exceeds what threshold-times-linear growth from a noise-adjusted
    baseline of 10 pairs would give (10 * data_step * fail_threshold).
    That still catches an early-stage quadratic (5 -> 5,000 pairs on a
    10x step fails at 5,000 > 1,200) while 3 -> 40 on a 10x step — pure
    sparse-corpus noise — passes.
    """
    rows, flagged = [], []
    for fam, (counter, denom, covers) in _candidate_probes().items():
        p_small, d_small = counter(spark, SMALL_SF), denom(spark, SMALL_SF)
        p_big, d_big = counter(spark, BIG_SF), denom(spark, BIG_SF)
        per_small, per_big, norm, fail, watch, no_baseline = (
            classify_pair_growth(
                p_small, d_small, p_big, d_big,
                watch_threshold, fail_threshold,
            )
        )
        rows.append(
            (fam, covers, p_small, d_small, p_big, d_big,
             per_small, per_big, norm, fail, watch)
        )
        mark = ("  <-- PAIR BLOWUP" if fail
                else "  (watch)" if watch else "")
        note = "  [sparse small-sf baseline (<10 pairs): fail gated on absolute big-side growth floor]" \
            if no_baseline else ""
        print(
            f"{fam:22s} pairs {p_small:>9,} -> {p_big:>10,}  "
            f"pairs/row {per_small:7.2f} -> {per_big:7.2f}  "
            f"norm x{norm:5.2f}{mark}{note}"
        )
        if fail:
            flagged.append(fam)
    return rows, flagged


_SECOND_STEP_QUERIES = [
    # the highest-ratio candidate-pair / ANN families from SCALING_r09
    "q_dedup_minhash_lsh",
    "q_dedup_containment",
    "q_dedup_ngram_jaccard",
    "q_dedup_incremental",
    "q_pmi_collocations",
    "q_golden_record",
    "q_semdedup",
    "q_ann_ivf",
    "q_embedding_neardup",
    # round-11 additions (r10 verdict): the slowest batch query (7.24x
    # first decade, explode + window-count — blow-up preserves its
    # per-source shingle-frequency density by construction) and the
    # basket pair-generation shape (2.65x first decade — blow-up gives
    # each copy disjoint order/part key spaces so pair supports hold
    # sf0.1 density instead of 10x-ing past the MIN_PAIR filter)
    "q_boilerplate",
    "q_basket_affinity",
    # round-11 addition: same explode + window-count shape as
    # boilerplate over winnowing fingerprints (blow-up's per-copy
    # token prefixes keep gram hashes disjoint across copies,
    # preserving per-fingerprint document-frequency density)
    "q_dedup_substring",
]


def build_blowup(spark, src_sf: str, copies: int = 10) -> str:
    """Materialize a ``copies``x blow-up of src_sf into a temp dir for
    the second scaling step. Dup DENSITY is preserved — each copy is
    rewritten so it shares no shingles/neighborhoods/regions with the
    others (a naive 10x duplication would create 10-way near-dup
    clusters and measure a data-property explosion, not plan scaling):

    - documents: every token gets a copy-specific 2-char PREFIX (a
      bijective per-copy vocabulary rename), so every token — hence
      every shingle — differs across copies and cross-copy collisions
      are impossible; within-copy dup structure is intact (the same
      rewrite is applied to both members of a dup pair). Token and
      shingle COUNTS are exactly preserved (an earlier marker-INSERTION
      rewrite doubled tokens per doc, making the '10x' step carry ~20x
      shingle volume and miscalibrating the superlinear threshold).
    - supplier: names get a two-character copy suffix (edit distance 2
      between copies — outside the levenshtein<=1 linkage radius).
    - embeddings: a per-copy deterministic sign-flip pattern (diag +-1)
      — preserves every within-copy euclidean distance AND cosine
      exactly ((Sv).(Sw) = v.w), while cross-copy dots decorrelate, so
      copies collide in neither metric. (The previous additive shift
      preserved only euclidean structure; its extent-derived level-2
      shifts made all vectors point along one direction and
      cosine-based plans measured manufactured degeneracy instead of
      plan scaling.)

    Other tables are symlinked from src_sf unchanged.
    """
    import atexit
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    # single-digit copy ids keep the k{i} prefixes prefix-free; at
    # copies > 10, "k1" + "1abc" would collide with "k11" + "abc"
    assert copies <= 10, "prefix scheme is only unambiguous for <= 10 copies"
    out = tempfile.mkdtemp(prefix="sf_blowup_")
    atexit.register(shutil.rmtree, out, True)
    docs = spark.read.parquet(os.path.join(src_sf, "documents.parquet"))
    doc_span = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    # n_chars is recomputed from the rewritten text so the blow-up keeps
    # the corpus invariant n_chars == length(text) for any consumer
    doc_parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * doc_span)).alias("doc_id"),
            F.regexp_replace("text", "(^|(?<= ))(?=[^ ])", f"k{i}").alias(
                "text"
            ),
            "lang", "source",
        ).withColumn("n_chars", F.length("text"))
        for i in range(copies)
    ]
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionByName(p)
    d.write.parquet(os.path.join(out, "documents.parquet"))

    sup = spark.read.parquet(os.path.join(src_sf, "supplier.parquet"))
    sup_span = sup.agg(F.max("s_suppkey")).collect()[0][0] + 1
    sup_parts = [
        sup.select(
            (F.col("s_suppkey") + F.lit(i * sup_span)).alias("s_suppkey"),
            F.concat("s_name", F.lit(f"#{i}{i}")).alias("s_name"),
            "s_nationkey", "s_acctbal",
        )
        for i in range(copies)
    ]
    s = sup_parts[0]
    for p in sup_parts[1:]:
        s = s.unionByName(p)
    s.write.parquet(os.path.join(out, "supplier.parquet"))

    # lineitem: per-copy offsets on BOTH basket key and item key, so each
    # copy is a disjoint market — baskets keep their sf0.1 size and every
    # part pair keeps its sf0.1 support (shared partkeys would 10x every
    # pair's support, pushing formerly sub-threshold pairs past the
    # _BASKET_MIN_PAIR filter and measuring threshold semantics, not
    # plan scaling)
    li = spark.read.parquet(os.path.join(src_sf, "lineitem.parquet"))
    ok_span = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    pk_span = li.agg(F.max("l_partkey")).collect()[0][0] + 1
    li_parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * ok_span))
        .withColumn("l_partkey", F.col("l_partkey") + F.lit(i * pk_span))
        for i in range(copies)
    ]
    lo = li_parts[0]
    for p in li_parts[1:]:
        lo = lo.unionByName(p)
    lo.write.parquet(os.path.join(out, "lineitem.parquet"))

    emb = spark.read.parquet(os.path.join(src_sf, "embeddings.parquet"))
    vec_span = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    # per-copy rewrite: deterministic SIGN FLIPS (diag +-1 per copy).
    # An additive per-copy shift (the r9-r11 design) preserves EUCLIDEAN
    # structure but DESTROYS cosine geometry: extent-derived level-2
    # shifts dwarf the vectors themselves, so every vector in a shifted
    # copy points along the all-ones direction and cosine-based plans
    # (q_ann_ivf) see one degenerate mega-cluster — measured r12 as one
    # super-centroid capturing 94% of the 100x corpus, turning the probe
    # into an instrument artifact (it measured manufactured data
    # degeneracy, not plan scaling). Sign flips fix both metrics at
    # once: (S v).(S w) = v.w exactly (signs square away), so every
    # within-copy cosine AND euclidean distance is preserved
    # bit-for-bit, while cross-copy dots decorrelate (Rademacher-
    # weighted sums ~ 0 +- |v||w|/sqrt(dims)) — copies collide in
    # neither metric. Patterns are seeded by (vec_span, copy, dim) so
    # level-2 patterns differ from level-1 and blow-ups compose.
    import hashlib

    emb_dims = len(emb.select("embedding").head()[0])

    def _signs(i: int) -> list[float]:
        return [
            1.0
            if int(
                hashlib.md5(f"{vec_span}:{i}:{d}".encode()).hexdigest()[0], 16
            ) % 2 == 0
            else -1.0
            for d in range(emb_dims)
        ]

    emb_parts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * vec_span)).alias("vec_id"),
            F.zip_with(
                "embedding",
                F.array(*[F.lit(s) for s in _signs(i)]),
                lambda x, s: (x * s).cast("float"),
            ).alias("embedding"),
            "label",
        )
        for i in range(copies)
    ]
    e = emb_parts[0]
    for p in emb_parts[1:]:
        e = e.unionByName(p)
    e.write.parquet(os.path.join(out, "embeddings.parquet"))

    for f in os.listdir(src_sf):
        dst = os.path.join(out, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join(src_sf, f), dst)
    return out


def run_second_step(spark, threshold: float, copies: int = 10):
    """Time the high-ratio families on sf0.1 and on its ``copies``x
    blow-up; flag ratios above threshold (10x data + margin)."""
    from gcp_healthcare_data_pipeline_spark.queries import all_queries

    specs = all_queries()
    print(f"building {copies}x blow-up of sf0.1 ...")
    blow = build_blowup(spark, BIG_SF, copies)
    rows, flagged = [], []
    errors = 0
    for name in _SECOND_STEP_QUERIES:
        spec = specs[name]
        try:
            spec.fn(spark, SMALL_SF).count()  # codegen warmup
            t0 = time.perf_counter()
            spec.fn(spark, BIG_SF).count()
            t_big = time.perf_counter() - t0
            t0 = time.perf_counter()
            spec.fn(spark, blow).count()
            t_blow = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001
            # an errored query is a FAILED audit, not a skipped row — a
            # dead JVM must not read as "0 families flagged, exit 0"
            errors += 1
            print(f"{name:28s} ERROR {type(exc).__name__}: {exc}"[:120])
            continue
        ratio = t_blow / max(t_big, 1e-9)
        flag = ratio > threshold and t_big >= 0.15
        rows.append((name, t_big, t_blow, ratio, flag))
        mark = "  <-- SUPERLINEAR (2nd step)" if flag else ""
        print(f"{name:28s} {t_big:7.3f}s -> {t_blow:8.3f}s  "
              f"x{ratio:6.2f}{mark}")
        if flag:
            flagged.append(name)
    return rows, flagged, errors


_THIRD_STEP_QUERIES = [
    # the adaptive-banding, winnowing and clustered-embedding families —
    # the plans whose 100 TB behavior the whole design argues for
    "q_dedup_minhash_lsh",
    "q_dedup_substring",
    "q_semdedup",
    "q_ann_ivf",
    # r12: the non-vector watch families the r11 verdict asked to carry
    # into the third decade — posting-list dedup (9.8x pair growth on
    # the second decade), FastSS blocking, and the PMI pair fan-out
    "q_dedup_containment",
    "q_dedup_ngram_jaccard",
    "q_golden_record",
    "q_fuzzy_name_match",
    "q_pmi_collocations",
]


def run_third_step(spark, threshold: float):
    """Time the headline families across THREE decades: sf0.1 -> 10x ->
    100x (5M docs / 200k embeddings), the 100x built as a blow-up OF the
    blow-up — the per-copy token-prefix rewrite composes (level-2 tokens
    are k{j}k{i}token, still bijective and cross-copy disjoint), so dup
    density is preserved at both levels. Flags any family whose second
    10x step (10x -> 100x) exceeds ``threshold``."""
    from gcp_healthcare_data_pipeline_spark.queries import all_queries

    specs = all_queries()
    print("building 10x and 100x blow-ups of sf0.1 ...")
    blow1 = build_blowup(spark, BIG_SF, 10)
    blow2 = build_blowup(spark, blow1, 10)
    rows, flagged, errors = [], [], 0
    for name in _THIRD_STEP_QUERIES:
        spec = specs[name]
        try:
            spec.fn(spark, SMALL_SF).count()  # codegen warmup
            t0 = time.perf_counter()
            spec.fn(spark, BIG_SF).count()
            t_base = time.perf_counter() - t0
            t0 = time.perf_counter()
            spec.fn(spark, blow1).count()
            t_b1 = time.perf_counter() - t0
            # the 10x cell is BOTH the numerator of r1 and the
            # DENOMINATOR of the judged r2, and it is cheap — always
            # take best-of-2 so a cold read inflating it cannot mask a
            # real superlinear 100x (nor fake one by deflating r2's
            # sibling run)
            t0 = time.perf_counter()
            spec.fn(spark, blow1).count()
            t_b1 = min(t_b1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            spec.fn(spark, blow2).count()
            t_b2 = time.perf_counter() - t0
            # retry-on-flag: a single cell can carry one-time cost the
            # ratio test must not grade (first read of the ~GB 100x
            # parquet from disk after page-cache eviction mid-probe —
            # measured 63.9s cold vs 17.7s steady on the same query).
            # Re-time each cell once and keep the min (background load
            # and cold I/O only ever ADD time) before judging. The
            # retry is ONE-SIDED — it can only unflag — so when it DOES
            # clear a flag, both readings are recorded in the artifact
            # (r12 ADVICE): a reviewer can see how close the retried
            # minimum remains to the threshold instead of taking the
            # pass on faith.
            retry_cleared = None
            if t_b2 / max(t_b1, 1e-9) > threshold:
                first = (t_base, t_b1, t_b2)
                t0 = time.perf_counter()
                spec.fn(spark, BIG_SF).count()
                t_base = min(t_base, time.perf_counter() - t0)
                t0 = time.perf_counter()
                spec.fn(spark, blow1).count()
                t_b1 = min(t_b1, time.perf_counter() - t0)
                t0 = time.perf_counter()
                spec.fn(spark, blow2).count()
                t_b2 = min(t_b2, time.perf_counter() - t0)
                if t_b2 / max(t_b1, 1e-9) <= threshold:
                    retry_cleared = first
        except Exception as exc:  # noqa: BLE001
            errors += 1
            print(f"{name:28s} ERROR {type(exc).__name__}: {exc}"[:160])
            continue
        r1 = t_b1 / max(t_base, 1e-9)
        r2 = t_b2 / max(t_b1, 1e-9)
        # judge the ratio when the 10x-decade timing is above noise; a
        # family that is sub-150ms at 10x but LARGE in absolute terms at
        # 100x (> threshold x the floor) is still superlinear — don't
        # let the floor silently unflag it
        flag = r2 > threshold and (t_b1 >= 0.15 or t_b2 >= 0.15 * threshold)
        below_floor = t_b1 < 0.15 and not flag
        rows.append((name, t_base, t_b1, t_b2, r1, r2, flag, retry_cleared))
        mark = "  <-- SUPERLINEAR (3rd decade)" if flag else (
            "  (below timing floor, ratio unjudged)" if below_floor else ""
        )
        if retry_cleared is not None:
            fb, f1, f2 = retry_cleared
            mark += (
                f"  [flag CLEARED by retry: first read "
                f"{fb:.2f}/{f1:.2f}/{f2:.2f}s = x{f2 / max(f1, 1e-9):.2f}]"
            )
        print(f"{name:28s} {t_base:7.3f}s -> {t_b1:8.3f}s -> {t_b2:9.3f}s"
              f"  x{r1:5.2f} x{r2:5.2f}{mark}")
        if flag:
            flagged.append(name)
    return rows, flagged, errors


_TEXT_CELL_QUERIES = [
    # the window/posting-list text-dedup families whose blow-up behavior
    # was asserted in prose but (unlike the vector family) had no
    # measured large-N instrument before r16 (r15 verdict item 5)
    "q_dedup_passages",
    "q_dedup_substring",
    "q_boilerplate",
]

# tokens injected as a shared boilerplate block for the df-cap recall
# probe: 10 tokens -> 8 trigram shingles, each landing in every injected
# doc, so their document frequency == the injection count
_BOILER_BLOCK = (
    "terms of service apply all rights reserved contact support here"
)


def _build_dfcap_corpus(spark, src_sf: str, n_inject: int) -> str:
    """sf0.1 documents plus a shared boilerplate block appended to
    ``n_inject`` docs (df > _DF_CAP for the block's shingles — the
    regime where the cap BINDS; the base corpus's max shingle df is 25,
    so the cap is invisible without the injection), plus one mangled
    near-dup twin that ALSO carries the block — a genuine dup pair whose
    shared-shingle count straddles the cap, pinning that capping common
    shingles does not lose it."""
    import atexit
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="sf_dfcap_")
    atexit.register(shutil.rmtree, out, True)
    docs = spark.read.parquet(os.path.join(src_sf, "documents.parquet"))
    n_docs = docs.count()
    stride = max(1, n_docs // n_inject)
    injected = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % stride == 0,
            F.concat("text", F.lit(" " + _BOILER_BLOCK)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
        "source",
    ).withColumn("n_chars", F.length("text"))
    # the near-dup twin of the lowest injected doc: its ORIGINAL text
    # minus the last two tokens, then the FULL block appended (jaccard
    # >> threshold). Truncating the original — not the post-injection
    # text — keeps every block token (and so every block shingle) in
    # the twin, which is the "block included" property the df-cap
    # recall claim rests on (r16 ADVICE: the old order clipped
    # 'support here' off the block).
    base = docs.filter(F.col("doc_id") % stride == 0).orderBy(
        "doc_id"
    ).limit(1)
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    twin = base.select(
        F.lit(max_id + 1).alias("doc_id"),
        F.concat(
            F.array_join(
                F.slice(
                    F.split("text", " "), 1, F.size(F.split("text", " ")) - 2
                ),
                " ",
            ),
            F.lit(" " + _BOILER_BLOCK),
        ).alias("text"),
        "lang",
        "source",
    ).withColumn("n_chars", F.length("text"))
    injected.unionByName(twin).coalesce(4).write.parquet(
        os.path.join(out, "documents.parquet")
    )
    for f in os.listdir(src_sf):
        dst = os.path.join(out, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join(src_sf, f), dst)
    return out


def run_text_cell(spark, threshold: float):
    """The r15-verdict item-5 cell, two halves:

    1. WALL-CLOCK CURVATURE for the window/posting text-dedup families
       at 500 -> 5k -> 50k docs (sf0.01 -> sf0.1 -> 10x blow-up; the
       blow-up's per-copy token rewrite keeps dup density constant, so
       the step measures plan scaling, not data-property drift). Flags
       any family whose second 10x step exceeds ``threshold``.
    2. DF-CAP RECALL COST for the posting-list families' shared
       ``max_df=_DF_CAP`` bound: on a corpus where the cap BINDS
       (injected boilerplate block at df ~3x the cap), compare the
       capped q_dedup_ngram_jaccard pipeline against the uncapped
       ground truth — candidate-pair volume saved vs final dup pairs
       lost. The cap's design claim is that beyond-cap shingles add
       candidates without adding information; this cell measures it.
    """
    from pyspark.sql import functions as F

    from gcp_healthcare_data_pipeline_spark.operators.dedup import (
        jaccard_from_counts,
        pair_intersections,
        shingle_sizes,
    )
    from gcp_healthcare_data_pipeline_spark.queries import all_queries
    from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (
        _DF_CAP,
        _JACCARD_THRESHOLD,
        _MIN_SHARED_SHINGLES,
        _shared_shingles,
    )

    specs = all_queries()
    rc = 0

    # -- half 1: curvature across 500 -> 5k -> 50k docs ----------------
    print("building 10x blow-up of sf0.1 (50k docs) ...")
    blow1 = build_blowup(spark, BIG_SF, 10)
    print(f"{'query':28s} {'5k docs':>9s} {'50k docs':>10s}  x(2nd step)")
    for name in _TEXT_CELL_QUERIES:
        spec = specs[name]
        try:
            spec.fn(spark, SMALL_SF).count()  # codegen warmup
            t0 = time.perf_counter()
            spec.fn(spark, BIG_SF).count()
            t_base = time.perf_counter() - t0
            # best-of-2 on both judged cells: cold reads only add time
            t0 = time.perf_counter()
            spec.fn(spark, BIG_SF).count()
            t_base = min(t_base, time.perf_counter() - t0)
            t0 = time.perf_counter()
            spec.fn(spark, blow1).count()
            t_blow = time.perf_counter() - t0
            t0 = time.perf_counter()
            spec.fn(spark, blow1).count()
            t_blow = min(t_blow, time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001
            rc = 1
            print(f"{name:28s} ERROR {type(exc).__name__}: {exc}"[:140])
            continue
        ratio = t_blow / max(t_base, 1e-9)
        flag = ratio > threshold and (
            t_base >= 0.15 or t_blow >= 0.15 * threshold
        )
        mark = "  <-- SUPERLINEAR" if flag else ""
        if flag:
            rc = 1
        print(f"{name:28s} {t_base:8.3f}s {t_blow:9.3f}s  x{ratio:6.2f}{mark}")

    # -- half 2: df-cap recall cost on cap-binding corpora -------------
    # two injection densities: df ~3x the cap (a repeated footer) and
    # df ~10x (crawl-wide chrome) — the second makes the cap's df²
    # fan-out benefit a measured number, not an asserted one
    for n_inject in (3 * _DF_CAP, 10 * _DF_CAP):
        print(f"\nbuilding df-cap probe corpus (block df ~{n_inject}, "
              f"cap {_DF_CAP}) ...")
        cell = _build_dfcap_corpus(spark, BIG_SF, n_inject)

        def _pipeline(max_df, cell=cell):
            sh = _shared_shingles(spark, cell)
            cand = pair_intersections(sh, min_df=2, max_df=max_df)
            n_cand = cand.count()
            sizes = shingle_sizes(sh)
            na = sizes.select(
                F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a")
            )
            nb = sizes.select(
                F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b")
            )
            final = (
                cand.filter(F.col("n_shared") >= _MIN_SHARED_SHINGLES)
                .join(na, "id_a")
                .join(nb, "id_b")
                .filter(
                    jaccard_from_counts(
                        F.col("n_shared"), F.col("n_a"), F.col("n_b")
                    )
                    >= _JACCARD_THRESHOLD
                )
                .select("id_a", "id_b")
            )
            return n_cand, {(r.id_a, r.id_b) for r in final.collect()}

        n_cand_capped, dup_capped = _pipeline(_DF_CAP)
        n_cand_full, dup_full = _pipeline(None)
        lost = dup_full - dup_capped
        recall = (
            len(dup_full & dup_capped) / len(dup_full) if dup_full else 1.0
        )
        saved_pct = (
            (n_cand_full - n_cand_capped) * 100.0 / n_cand_full
            if n_cand_full
            else 0.0
        )
        print(f"candidate pairs: capped {n_cand_capped:,} vs uncapped "
              f"{n_cand_full:,}  ({saved_pct:.1f}% fan-out saved by the "
              "cap)")
        print(f"final dup pairs: capped {len(dup_capped)} vs uncapped "
              f"{len(dup_full)}  recall {recall:.4f}"
              + (f"  LOST: {sorted(lost)[:10]}" if lost else ""))
        if recall < 0.99:
            rc = 1
            print("<-- df-cap recall below 0.99 on the cap-binding corpus")
        # the probe must actually bind: uncapped candidates must exceed
        # capped (otherwise the corpus failed to exercise the cap and
        # the recall number is vacuous)
        if n_cand_full <= n_cand_capped:
            rc = 1
            print("<-- probe corpus did not bind the cap (vacuous cell)")
    return rc


def run_shard_cell(spark):
    """The r12-verdict item-1 'done' cell: on ONE corpus that spans
    several shards, show (a) every per-shard centroid table bounded by
    the shard budget while the unsharded plan's is not, and (b) the
    sharded path's final survivor set EQUAL to the unsharded plan's.

    The corpus is the exact-copies shape (groups of identical vectors,
    cross-group cosine 0) at 40k vectors / 10k groups — the regime where
    sharded-dedup ground truth is well-defined (identical vectors
    co-assign in any deterministic clustering), scaled 55x past the
    contract test so the shard split is 5-way and each shard still
    carries thousands of vectors."""
    import math
    import time

    from pyspark.sql import functions as F

    from gcp_healthcare_data_pipeline_spark.operators.similarity import (
        shard_vectors,
    )
    from gcp_healthcare_data_pipeline_spark.queries import (
        vector_queries as vq,
    )

    # 32 one-hot groups (cross-group cosine EXACTLY 0 < threshold) of
    # 1250 identical copies each: identical vectors co-assign in any
    # deterministic clustering, so the true survivor set is exactly
    # {min id per group} for BOTH plans — and the 79 hash-stratified
    # seeds over 32 distinct locations make many seeds identical,
    # stressing the r12 childless-super tie-break at scale.
    n_groups, copies, dims, budget = 32, 1250, 32, 8192
    n = n_groups * copies
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dims - 1}), i -> CASE WHEN "
            f"i = CAST(id / {copies} AS INT) THEN 1.0 ELSE 0.0 END)"
        ).alias("v"),
    ).localCheckpoint(eager=True)

    t0 = time.perf_counter()
    uns_drops = {
        r["id_drop"] for r in vq._semdedup_drops(emb).collect()
    }
    t_uns = time.perf_counter() - t0
    k_uns = vq._derived_k(emb).collect()[0]["_k"]

    t0 = time.perf_counter()
    sharded = shard_vectors(emb, max_rows_per_shard=budget).localCheckpoint(
        eager=True
    )
    top = int(sharded.agg(F.max("shard_id")).first()[0])
    from concurrent.futures import ThreadPoolExecutor

    def one(s):
        return (
            vq._semdedup_drops(
                sharded.filter(F.col("shard_id") == s).select("vec_id", "v")
            )
            .drop("centroid_id")
            .localCheckpoint(eager=True)
        )

    with ThreadPoolExecutor(max_workers=8) as ex:
        ds = list(ex.map(one, range(top + 1)))
    d1 = ds[0]
    for d in ds[1:]:
        d1 = d1.unionByName(d)
    survivors = sharded.join(
        d1.select(F.col("id_drop").alias("vec_id")), "vec_id", "left_anti"
    ).localCheckpoint(eager=False)
    cross = vq._semdedup_cross_shard_drops(survivors)
    sh_drops = {r["id_drop"] for r in d1.collect()} | {
        r["id_drop"] for r in cross.collect()
    }
    t_sh = time.perf_counter() - t0

    block = vq._TARGET_BLOCK_FLOATS // dims
    k_bound = max(vq._KMEANS_K_MIN, math.ceil(budget / block))
    shard_rows = {
        r["shard_id"]: r["c"]
        for r in sharded.groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    per_shard_k = {}
    for s in shard_rows:
        per_shard_k[s] = vq._derived_k(
            sharded.filter(F.col("shard_id") == s).select("vec_id", "v")
        ).collect()[0]["_k"]

    expect = {g * copies for g in range(n_groups)}  # min id per group
    uns_surv = set(range(n)) - uns_drops
    sh_surv = set(range(n)) - sh_drops
    match = uns_surv == sh_surv == expect
    print(f"corpus: {n} vectors ({n_groups} groups x {copies}), "
          f"dims={dims}, budget={budget} rows/shard")
    print(f"shards: {top + 1}; rows/shard={sorted(shard_rows.values())}")
    print(f"unsharded: k={k_uns} centroids, {t_uns:.1f}s")
    print(f"sharded:   per-shard k={sorted(per_shard_k.values())} "
          f"(bound ceil(budget/block)={k_bound}), {t_sh:.1f}s")
    print(f"per-shard centroid bound holds: "
          f"{all(v <= k_bound for v in per_shard_k.values())}")
    print("survivor sets EQUAL (sharded == unsharded == one-per-group): "
          f"{match}")
    return 0 if (match and all(
        v <= k_bound for v in per_shard_k.values()
    )) else 1


def run_ivf_shard_cell(spark):
    """The r13-verdict item-1 'done' cell for the IVF shard driver
    (q_ann_ivf_sharded): on ONE corpus spanning several shards, show
    (a) every per-shard centroid table bounded near ceil(budget/mod)
    while the UNSHARDED index's centroid table is ~n/mod — the linearly
    growing broadcast state the shard driver exists to kill, (b)
    scatter-gather recall@k vs exact brute force NOT BELOW the unsharded
    index's (searching s bounded per-shard indexes can only widen the
    candidate set for the same probe budget), (c) wall-clock for both
    paths, reported either way.

    Corpus: 40k vectors in 32 dims = 32 well-separated direction
    clusters (strength-4 one-hot component) plus deterministic
    unit-scale jitter — enough structure that recall measures the index,
    not noise. budget 8192 rows/shard -> 5 shards; mod = 16384/32 = 512
    -> unsharded ~78 seed centroids vs a per-shard bound of 16."""
    import math
    import time

    from pyspark.sql import functions as F

    from gcp_healthcare_data_pipeline_spark.operators.similarity import (
        IVF_TARGET_CLUSTER_FLOATS,
        brute_force_topk,
        ivf_topk,
        shard_vectors,
    )
    from gcp_healthcare_data_pipeline_spark.queries import (
        vector_queries as vq,
    )

    n, dims, budget, k = 40_000, 32, 8_192, 5
    n_shards = math.ceil(n / budget)
    mod = IVF_TARGET_CLUSTER_FLOATS // dims
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dims - 1}), i -> "
            "CASE WHEN i = CAST(id % 32 AS INT) THEN 4.0 ELSE 0.0 END"
            " + sin(cast(id * (i + 3) as double)))"
        ).alias("embedding"),
    ).localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") % 1000 == 0).localCheckpoint(
        eager=True
    )

    def topk_sets(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    truth = topk_sets(brute_force_topk(emb, queries, k=k).collect())

    t0 = time.perf_counter()
    uns = topk_sets(
        ivf_topk(
            emb, queries, k=k, centroid_mod=None, probes=4, lloyd_iters=1
        ).collect()
    )
    t_uns = time.perf_counter() - t0

    t0 = time.perf_counter()
    sh = topk_sets(
        vq._ann_ivf_sharded_result(emb, queries, n_shards).collect()
    )
    t_sh = time.perf_counter() - t0

    def recall(got):
        return sum(
            len(got.get(q, set()) & tset) / len(tset)
            for q, tset in truth.items()
        ) / len(truth)

    r_uns, r_sh = recall(uns), recall(sh)

    # centroid-table sizes = the id-space seed counts (the broadcast
    # state the bound is about; Lloyd keeps ids, can only shrink them)
    uns_cents = emb.filter(F.col("vec_id") % mod == 0).count()
    sharded = shard_vectors(emb, n_shards=n_shards, vec_col="embedding")
    per_shard = {
        r["shard_id"]: r["c"]
        for r in sharded.filter(F.col("vec_id") % mod == 0)
        .groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    bound = math.ceil(budget / mod)
    # hash-split concentration: binomial spread around uns_cents/n_shards,
    # pinned at 2x the aligned bound (same margin as the semdedup cell's
    # rows < 2 * budget)
    bound_ok = all(v <= 2 * bound for v in per_shard.values())
    max_shard = max(per_shard.values())

    print(f"corpus: {n} vectors, dims={dims}, budget={budget} rows/shard "
          f"-> {n_shards} shards; mod={mod}, k={k}, "
          f"{len(truth)} queries")
    print(f"unsharded: {uns_cents} seed centroids (ONE broadcast table "
          f"growing ~n/{mod}), recall@{k}={r_uns:.3f}, {t_uns:.1f}s")
    print(f"sharded:   per-shard seeds={sorted(per_shard.values())} "
          f"(aligned bound ceil(budget/mod)={bound}, concentration pin "
          f"<= {2 * bound}), recall@{k}={r_sh:.3f}, {t_sh:.1f}s")
    print(f"per-shard centroid bound holds: {bound_ok} "
          f"(max {max_shard} vs unsharded {uns_cents})")
    print(f"recall parity (sharded >= unsharded - 0.02): "
          f"{r_sh >= r_uns - 0.02}")
    ok = (
        bound_ok
        and max_shard < uns_cents
        and r_sh >= r_uns - 0.02
    )
    return 0 if ok else 1


def run_knn_shard_cell(spark):
    """The design-justification cell for q_knn_graph_sharded's SEMANTIC
    shard key: on one structured corpus, measure the kNN-graph EDGE
    RETENTION of (a) the semantic coarse-routed split and (b) a
    hash-split control, both against the unsharded cluster-blocked
    graph — sharding cost = edges lost to shard boundaries. A hash
    split scatters every neighborhood across shards (expected retention
    ~1/n_shards); the semantic route co-locates neighborhoods by
    construction. Also reports semantic shard-size skew (the trade the
    docstring declares) and wall-clock."""
    import time

    from pyspark.sql import functions as F

    from gcp_healthcare_data_pipeline_spark.operators.similarity import (
        shard_vectors,
    )
    from gcp_healthcare_data_pipeline_spark.queries import (
        vector_queries as vq,
    )

    n, dims = 40_000, 32
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dims - 1}), i -> "
            "CASE WHEN i = CAST(id % 32 AS INT) THEN 4.0 ELSE 0.0 END"
            " + sin(cast(id * (i + 3) as double)))"
        ).alias("v"),
    ).localCheckpoint(eager=True)

    def edges(rows):
        return {(r["vec_id"], r["neighbor_id"]) for r in rows}

    t0 = time.perf_counter()
    base = edges(vq._knn_graph_block(emb).collect())
    t_base = time.perf_counter() - t0

    t0 = time.perf_counter()
    sem = edges(vq._knn_graph_sharded_result(spark, emb).collect())
    t_sem = time.perf_counter() - t0

    # hash-split control: same per-shard machinery, md5 shard key
    t0 = time.perf_counter()
    hsharded = shard_vectors(
        emb, n_shards=vq._SHARD_TEST_SHARDS
    ).localCheckpoint(eager=True)
    hparts = []
    for s in range(vq._SHARD_TEST_SHARDS):
        hparts.append(
            edges(
                vq._knn_graph_block(
                    hsharded.filter(F.col("shard_id") == s).select(
                        "vec_id", "v"
                    )
                ).collect()
            )
        )
    hsh = set().union(*hparts)
    t_hash = time.perf_counter() - t0

    r_sem = len(sem & base) / len(base)
    r_hash = len(hsh & base) / len(base)

    # measured 2026-08-15: semantic 0.912, hash 0.316 (~1/3 as
    # predicted). Semantic losses are coarse-boundary edges plus
    # blocking differences (per-shard k re-derives from shard size) —
    # pin at 0.85 with the 0.30 separation, both comfortably inside
    # the measured margins
    ok = r_sem >= 0.85 and r_hash <= r_sem - 0.30
    print(f"corpus: {n} vectors, dims={dims}, "
          f"{vq._SHARD_TEST_SHARDS} shards; unsharded edges={len(base)}")
    print(f"unsharded blocked graph: {t_base:.1f}s")
    print(f"semantic split: edge retention {r_sem:.3f} "
          f"({len(sem & base)}/{len(base)}), {t_sem:.1f}s")
    print(f"hash split:     edge retention {r_hash:.3f} "
          f"({len(hsh & base)}/{len(base)}), {t_hash:.1f}s "
          f"(serial control loop; expected retention "
          f"~1/{vq._SHARD_TEST_SHARDS})")
    print(f"pins hold (semantic >= 0.85, hash <= semantic - 0.30): {ok}")
    return 0 if ok else 1


def run_pq_cell(spark):
    """The memory-compression cell for q_ann_pq: on the structured 40k
    corpus, measure (a) the bytes a query must scan — PQ codes + the
    constant codebook vs the raw float corpus (the 100 TB story: the
    search structure fits in memory), (b) ADC top-k recall vs exact
    brute force, and (c) the SHORTLIST recall that matters in
    production — PQ is the filter stage of a filter-then-rerank
    pipeline, so 'true top-5 inside the ADC top-100 shortlist' is the
    quality bar (rerank on 100 floats/query is free); the top-5-vs-
    top-5 number is reported for honesty but quantization at 4x16
    codes cannot and need not win it."""
    import time

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gcp_healthcare_data_pipeline_spark.queries import (
        vector_queries as vq,
    )

    n, dims, k, shortlist = 40_000, 32, 5, 100
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dims - 1}), i -> "
            "CASE WHEN i = CAST(id % 32 AS INT) THEN 4.0 ELSE 0.0 END"
            " + sin(cast(id * (i + 3) as double)))"
        ).alias("v"),
    ).localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") % 1000 == 0).localCheckpoint(
        eager=True
    )

    def topk_sets(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    # ground truth = exact EUCLIDEAN brute force — the ADC path ranks by
    # L2, so a cosine baseline (brute_force_topk) would conflate metric
    # disagreement with quantization loss on non-norm-equalized vectors
    # (review finding)
    t0 = time.perf_counter()
    qf = queries.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_d").asc(), F.col("vec_id").asc()
    )
    truth = topk_sets(
        emb.crossJoin(F.broadcast(qf))
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("_d", vq._dist_between(F.col("qv"), F.col("v")))
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .collect()
    )
    t_brute = time.perf_counter() - t0

    t0 = time.perf_counter()
    cb1, codes = vq._pq_codebook_and_codes(spark, emb)
    qsub = vq._pq_subvectors(queries).select(
        F.col("vec_id").alias("query_id"), "sub", F.col("sv").alias("qsv")
    )
    short_df = vq._pq_adc_topk(cb1, codes, qsub, shortlist).localCheckpoint(
        eager=True
    )
    short_rows = short_df.collect()
    t_pq = time.perf_counter() - t0
    short = topk_sets(short_rows)
    top5 = topk_sets([r for r in short_rows if r["rank"] <= k])

    # stage 2: the q_ann_rerank composition — exact EUCLIDEAN rerank of
    # shortlist members only (same metric as truth), i.e. |Q| x
    # shortlist float reads instead of |Q| x n
    t0 = time.perf_counter()
    wr = Window.partitionBy("query_id").orderBy(
        F.col("_d").asc(), F.col("neighbor_id").asc()
    )
    rr_rows = (
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("_cv"))
        .join(F.broadcast(short_df.select("query_id", "neighbor_id")), "neighbor_id")
        .join(F.broadcast(qf), "query_id")
        .withColumn("_d", vq._dist_between(F.col("qv"), F.col("_cv")))
        .withColumn("_rn", F.row_number().over(wr))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id")
        .collect()
    )
    t_rr = time.perf_counter() - t0
    rerank5 = topk_sets(rr_rows)

    def recall(got):
        return sum(
            len(got.get(q, set()) & tset) / len(tset)
            for q, tset in truth.items()
        ) / len(truth)

    r5, rshort, rrr = recall(top5), recall(short), recall(rerank5)

    raw_bytes = n * dims * 8
    # 1 byte/code at <=256 codewords; the codebook is constant-size
    cb_rows = cb1.count()
    pq_bytes = n * vq._PQ_SUBS + cb_rows * (dims // vq._PQ_SUBS) * 8
    ratio = raw_bytes / pq_bytes

    print(f"corpus: {n} vectors, dims={dims}; {len(truth)} queries; "
          f"{vq._PQ_SUBS} subspaces x {vq._PQ_CODES} codes")
    print(f"scan bytes: raw {raw_bytes:,} -> pq {pq_bytes:,} "
          f"(codes {n * vq._PQ_SUBS:,} + codebook "
          f"{cb_rows * (dims // vq._PQ_SUBS) * 8:,}) = {ratio:.0f}x "
          f"compression")
    print(f"brute force: {t_brute:.1f}s; pq build+adc: {t_pq:.1f}s")
    print(f"adc top-{k} recall@{k}={r5:.3f} (reported; quantized "
          f"filter, not the product)")
    print(f"shortlist@{shortlist} recall of true top-{k}={rshort:.3f} "
          f"(the filter-then-rerank bar)")
    print(f"reranked top-{k} recall@{k}={rrr:.3f} (the q_ann_rerank "
          f"two-stage product: {shortlist} float reads/query, {t_rr:.1f}s)")
    # reranked == shortlist recall is exact by construction (the rerank
    # uses the truth metric, so every true-top-k member that survives
    # the shortlist wins its rerank slot) — pinning it catches a metric
    # or join drift between the two stages
    ok = rshort >= 0.85 and ratio >= 32 and rrr >= rshort - 1e-9
    print(f"pins hold (shortlist >= 0.85, compression >= 32x, "
          f"rerank == shortlist recall): {ok}")
    return 0 if ok else 1


_ANALYTICS_CELL_QUERIES = [
    # the ~12 most expensive join/agg analytics queries (r16 verdict
    # item 4): the TPC-H-shape set + the two sf-scaling composite gates
    "q_pricing_summary",
    "q_returned_item_loss",
    "q_top_supplier",
    "q_min_cost_supplier",
    "q_waiting_suppliers",
    "q_dominant_suppliers",
    "q_regional_supplier_volume",
    "q_market_share",
    "q_shipping_priority",
    "q_basket_affinity",
    "q_pipeline_sf",
    "q_scd2_sf",
]


def _build_analytics_blowup(spark, src_sf: str, copies: int = 10) -> str:
    """Consistent ``copies``x STAR blow-up (sf0.1 -> sf≈1): every fact
    AND dimension key is offset per copy — lineitem/orders keep their
    join fan-in (each order copy finds exactly its lineitem copy),
    customer/part/supplier grow with the facts (the TPC-H scaling
    model), and per-key group sizes / per-pair supports are preserved
    (a fact-only blow-up would 10x every dimension key's fan-out and
    measure data-property drift, not plan scaling). region/nation stay
    fixed (25 nations at any SF — the permanently-broadcastable dims).
    Non-star tables are symlinked unchanged."""
    import atexit
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="sf_star_")
    atexit.register(shutil.rmtree, out, True)

    def span(df, key):
        return df.agg(F.max(key)).collect()[0][0] + 1

    li = spark.read.parquet(os.path.join(src_sf, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(src_sf, "orders.parquet"))
    cu = spark.read.parquet(os.path.join(src_sf, "customer.parquet"))
    pa = spark.read.parquet(os.path.join(src_sf, "part.parquet"))
    su = spark.read.parquet(os.path.join(src_sf, "supplier.parquet"))
    ok, pk, sk, ck = (
        span(od, "o_orderkey"), span(pa, "p_partkey"),
        span(su, "s_suppkey"), span(cu, "c_custkey"),
    )

    def blow(df, offsets):
        parts = [
            df.select(
                *[
                    (F.col(c) + F.lit(i * offsets[c])).alias(c)
                    if c in offsets
                    else F.col(c)
                    for c in df.columns
                ]
            )
            for i in range(copies)
        ]
        o = parts[0]
        for p in parts[1:]:
            o = o.unionByName(p)
        return o

    blow(li, {"l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk}).write.parquet(
        os.path.join(out, "lineitem.parquet")
    )
    blow(od, {"o_orderkey": ok, "o_custkey": ck}).write.parquet(
        os.path.join(out, "orders.parquet")
    )
    blow(cu, {"c_custkey": ck}).write.parquet(
        os.path.join(out, "customer.parquet")
    )
    blow(pa, {"p_partkey": pk}).write.parquet(
        os.path.join(out, "part.parquet")
    )
    blow(su, {"s_suppkey": sk}).write.parquet(
        os.path.join(out, "supplier.parquet")
    )
    for f in os.listdir(src_sf):
        dst = os.path.join(out, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join(src_sf, f), dst)
    return out


def _plan_profile(df) -> dict:
    """Join-strategy + pushdown counts from the EXECUTED plan (AQE
    final), the artifact that shows a size-triggered strategy flip."""
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    return {
        "bcast": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "pushed": sum(
            plan.count(f"PushedFilters: [{p}")
            for p in ("Is", "And", "Gr", "EqualTo", "Not", "Or", "LessThan")
        ),
        "cartesian": plan.count("CartesianProduct"),
    }


def run_analytics_cell(spark, threshold: float, copies: int = 10):
    """The r16-verdict item-4 cell: second-decade wall-clock curvature
    for the join-heavy analytics set. Blows lineitem/orders (and their
    dimensions, consistently) up ``copies``x from sf0.1 (sf≈1), times
    the ~12 most expensive join/agg queries at both cells (best-of-2,
    codegen warmed at sf0.01), and records each cell's EXECUTED plan
    profile — broadcast/sort-merge/shuffled-hash join counts and
    pushed-filter scans — so an AQE strategy flip at the bigger cell is
    a printed observation, not a guess. Flags any query whose 10x step
    exceeds ``threshold`` (superlinear with margin)."""
    from gcp_healthcare_data_pipeline_spark.queries import all_queries

    specs = all_queries()
    print(f"building {copies}x star blow-up of sf0.1 (sf≈1) ...")
    cell = _build_analytics_blowup(spark, BIG_SF, copies)
    rc = 0
    print(
        f"{'query':28s} {'sf0.1':>8s} {'sf≈1':>9s} {'x':>6s}  "
        "plan sf0.1 -> sf≈1 (bcast/smj/shj, pushed)"
    )
    for name in _ANALYTICS_CELL_QUERIES:
        spec = specs[name]
        try:
            spec.fn(spark, SMALL_SF).count()  # codegen warmup
            t_base, prof_base = None, None
            for _ in range(2):
                df = spec.fn(spark, BIG_SF)
                t0 = time.perf_counter()
                df.count()
                dt = time.perf_counter() - t0
                if t_base is None or dt < t_base:
                    t_base, prof_base = dt, _plan_profile(df)
            t_blow, prof_blow = None, None
            for _ in range(2):
                df = spec.fn(spark, cell)
                t0 = time.perf_counter()
                df.count()
                dt = time.perf_counter() - t0
                if t_blow is None or dt < t_blow:
                    t_blow, prof_blow = dt, _plan_profile(df)
        except Exception as exc:  # noqa: BLE001
            rc = 1
            print(f"{name:28s} ERROR {type(exc).__name__}: {exc}"[:160])
            continue
        ratio = t_blow / max(t_base, 1e-9)
        flag = ratio > threshold and (
            t_base >= 0.15 or t_blow >= 0.15 * threshold
        )
        cart = prof_blow["cartesian"] > 0
        if flag or cart:
            rc = 1
        marks = []
        if flag:
            marks.append("SUPERLINEAR")
        if cart:
            marks.append("CARTESIAN")
        flip = (
            ""
            if (prof_base["bcast"], prof_base["smj"], prof_base["shj"])
            == (prof_blow["bcast"], prof_blow["smj"], prof_blow["shj"])
            else "  <-- JOIN-STRATEGY FLIP"
        )
        mark = ("  !! " + ",".join(marks)) if marks else ""
        print(
            f"{name:28s} {t_base:7.3f}s {t_blow:8.3f}s x{ratio:5.2f}  "
            f"{prof_base['bcast']}/{prof_base['smj']}/{prof_base['shj']},"
            f"p{prof_base['pushed']} -> "
            f"{prof_blow['bcast']}/{prof_blow['smj']}/{prof_blow['shj']},"
            f"p{prof_blow['pushed']}{flip}{mark}"
        )
    return rc


def _build_curation_blowup(spark, src_sf: str, copies: int = 10) -> str:
    """documents + embeddings blown up with a COMMON per-copy id span,
    so the curation pipeline's ``emb.vec_id = doc_id`` join pairs
    copy-i docs with copy-i vectors (``build_blowup`` offsets each
    table by its OWN span — 5000 vs 2000 at sf0.1 — which scrambles the
    correspondence and would hand stage 5 arbitrary vectors). Text gets
    the same per-copy vocabulary-prefix rewrite and vectors the same
    per-copy sign-flip rewrite as build_blowup (density preserved, no
    cross-copy collisions in either token space or cosine space); the
    per-copy vector coverage ratio (2000 of 5000 docs embedded) is
    preserved exactly. Other tables are symlinked unchanged."""
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    assert copies <= 10, "prefix scheme is only unambiguous for <= 10 copies"
    out = tempfile.mkdtemp(prefix="sf_curation_")
    atexit.register(shutil.rmtree, out, True)
    docs = spark.read.parquet(os.path.join(src_sf, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(src_sf, "embeddings.parquet"))
    span = (
        max(
            docs.agg(F.max("doc_id")).collect()[0][0],
            emb.agg(F.max("vec_id")).collect()[0][0],
        )
        + 1
    )
    doc_parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * span)).alias("doc_id"),
            F.regexp_replace("text", "(^|(?<= ))(?=[^ ])", f"k{i}").alias(
                "text"
            ),
            "lang", "source",
        ).withColumn("n_chars", F.length("text"))
        for i in range(copies)
    ]
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionByName(p)
    d.write.parquet(os.path.join(out, "documents.parquet"))

    emb_dims = len(emb.select("embedding").head()[0])

    def _signs(i: int) -> "list[float]":
        return [
            1.0
            if int(
                hashlib.md5(f"{span}:{i}:{dd}".encode()).hexdigest()[0], 16
            ) % 2 == 0
            else -1.0
            for dd in range(emb_dims)
        ]

    emb_parts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * span)).alias("vec_id"),
            F.zip_with(
                "embedding",
                F.array(*[F.lit(sgn) for sgn in _signs(i)]),
                lambda x, sgn: (x * sgn).cast("float"),
            ).alias("embedding"),
            "label",
        )
        for i in range(copies)
    ]
    e = emb_parts[0]
    for p in emb_parts[1:]:
        e = e.unionByName(p)
    e.write.parquet(os.path.join(out, "embeddings.parquet"))

    for f in os.listdir(src_sf):
        dst = os.path.join(out, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join(src_sf, f), dst)
    return out


def run_curation_cell(spark, threshold: float, copies: int = 10):
    """Second-decade cell for the composed curation pipeline: run the
    13-stage chain at sf0.1 and at a consistent ``copies``x blow-up
    (50k docs / 20k vectors), reporting the END-TO-END wall (best-of-2,
    codegen warmed at sf0.01) plus a per-stage attribution: the
    count-time marginal of each lazily-checkpointed stage frame AND a
    named ``frames_build`` row for the eager stage-construction work
    (k-means seeding collects, LM vocab builds, epoch derivation) that
    executes while the frames are BUILT, before any count runs — the
    first cut of this cell summed only the count-time marginals (~1 s)
    and silently missed the ~17-50 s of eager work the end-to-end wall
    carries. Flags a superlinear total step over ``threshold``."""
    import time as _t

    from gcp_healthcare_data_pipeline_spark.queries.curation_queries import (
        _curation_stage_frames,
    )

    print(f"building consistent {copies}x curation blow-up of sf0.1 ...")
    cell = _build_curation_blowup(spark, BIG_SF, copies)
    # codegen warm-up at sf0.01 so neither timed cell pays first-plan
    # compilation
    for _, df in _curation_stage_frames(spark, SMALL_SF):
        df.count()

    def _profile(sf_dir):
        best = None
        for _ in range(2):
            t0 = _t.perf_counter()
            frames = _curation_stage_frames(spark, sf_dir)
            t_build = _t.perf_counter() - t0
            rows = []
            for name, df in frames:
                t1 = _t.perf_counter()
                n = df.count()
                rows.append((name, n, _t.perf_counter() - t1))
            wall = _t.perf_counter() - t0
            if best is None or wall < best[0]:
                best = (wall, t_build, rows)
        return best

    w_base, b_base, base = _profile(BIG_SF)
    w_blow, b_blow, blown = _profile(cell)
    rc = 0
    print(
        f"{'stage':20s} {'rows@0.1':>9s} {'s@0.1':>7s} "
        f"{'rows@10x':>9s} {'s@10x':>8s} {'x':>6s}"
    )
    print(
        f"{'frames_build':20s} {'':9s} {b_base:7.3f} {'':9s} "
        f"{b_blow:8.3f} x{b_blow / max(b_base, 1e-9):5.2f}"
    )
    for (name, n0, s0), (_, n1, s1) in zip(base, blown):
        ratio = s1 / max(s0, 1e-9)
        mark = "  !! SUPERLINEAR" if ratio > threshold and s0 >= 0.15 else ""
        print(
            f"{name:20s} {n0:9d} {s0:7.3f} {n1:9d} {s1:8.3f} "
            f"x{ratio:5.2f}{mark}"
        )
    tot_ratio = w_blow / max(w_base, 1e-9)
    if tot_ratio > threshold:
        rc = 1
        mark = "  !! SUPERLINEAR"
    else:
        mark = ""
    print(
        f"{'TOTAL end-to-end':20s} {'':9s} {w_base:7.3f} {'':9s} "
        f"{w_blow:8.3f} x{tot_ratio:5.2f}{mark}"
    )
    return rc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--threshold", type=float, default=18.0)
    ap.add_argument("--min-small-sec", type=float, default=0.15,
                    help="ratios over sub-noise small-sf times are not "
                         "meaningful; such queries report ratio but "
                         "never flag")
    ap.add_argument("--out", default=None)
    ap.add_argument("--pairs", action="store_true",
                    help="audit candidate-pair counts for the blocked "
                         "dedup/linkage families instead of timings")
    ap.add_argument("--pairs-threshold", type=float, default=1.5,
                    help="WATCH label when a family's pairs-per-row "
                         "grows more than this factor across the 10x "
                         "step (informational, exit 0)")
    ap.add_argument("--pairs-fail-threshold", type=float, default=12.0,
                    help="exit 1 when pairs-per-row growth exceeds "
                         "this factor (pairs-per-row growing >10x on a "
                         "10x data step means total pairs grew "
                         "~quadratically — the blocking broke)")
    ap.add_argument("--second-step", action="store_true",
                    help="re-time the dedup/ANN families on a 10x "
                         "blow-up of sf0.1 (the second decade)")
    ap.add_argument("--third-step", action="store_true",
                    help="time the headline families at sf0.1 -> 10x "
                         "-> 100x (5M docs; blow-up of the blow-up)")
    ap.add_argument("--shard-cell", action="store_true",
                    help="the r12-verdict item-1 cell: per-shard "
                         "centroid bound + sharded-vs-unsharded "
                         "survivor equality on a multi-shard corpus")
    ap.add_argument("--shard-cell-ivf", action="store_true",
                    help="the r13-verdict item-1 cell: per-shard IVF "
                         "centroid bound + scatter-gather recall parity "
                         "vs the unsharded index on a multi-shard corpus")
    ap.add_argument("--shard-cell-knn", action="store_true",
                    help="semantic-vs-hash shard-key edge-retention "
                         "cell for q_knn_graph_sharded")
    ap.add_argument("--pq-cell", action="store_true",
                    help="compression + shortlist-recall cell for "
                         "q_ann_pq (filter-then-rerank quality bar)")
    ap.add_argument("--text-cell", action="store_true",
                    help="r15-verdict item-5 cell: wall-clock curvature "
                         "for the window/posting text-dedup families at "
                         "50k docs + the df-cap's measured recall cost "
                         "on a cap-binding corpus")
    ap.add_argument("--analytics-cell", action="store_true",
                    help="r16-verdict item-4 cell: 10x star blow-up of "
                         "sf0.1 (sf≈1), wall-clock curvature + executed-"
                         "plan join-strategy/pushdown profile for the "
                         "join-heavy analytics set")
    ap.add_argument("--curation-cell", action="store_true",
                    help="r17 cell: the 13-stage composed curation "
                         "pipeline at sf0.1 vs a consistent 10x "
                         "doc+vector blow-up, per-stage marginal cost "
                         "side by side")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    from gcp_healthcare_data_pipeline_spark.queries import all_queries
    from gcp_healthcare_data_pipeline_spark.session import get_spark

    # the blow-up probes run 500k-doc posting-list joins in ONE local JVM;
    # PySpark's 1g driver default OOMs there (observed at the r11 blow-up
    # set). Honored only if this is the first session in the process —
    # which it is for this CLI tool. The third-step 5M-doc corpus
    # shuffles ~600M exploded gram hashes in one JVM — give it more.
    spark = get_spark(
        "scaling-audit",
        extra_conf={
            "spark.driver.memory": "32g" if args.third_step else "16g"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.shard_cell:
        return run_shard_cell(spark)

    if args.shard_cell_ivf:
        return run_ivf_shard_cell(spark)

    if args.shard_cell_knn:
        return run_knn_shard_cell(spark)

    if args.pq_cell:
        return run_pq_cell(spark)

    if args.text_cell:
        return run_text_cell(spark, args.threshold)

    if args.analytics_cell:
        return run_analytics_cell(spark, args.threshold, args.copies)

    if args.curation_cell:
        return run_curation_cell(spark, args.threshold, args.copies)

    if args.third_step:
        rows, flagged, errors = run_third_step(spark, args.threshold)
        if args.out:
            with open(args.out, "w") as fh:
                fh.write(
                    "# Third scaling step (sf0.1 -> 10x -> 100x, dup "
                    "density preserved at both levels)\n\n"
                    f"{len(flagged)} of {len(rows)} families flagged "
                    f"superlinear on the 10x->100x step (ratio > "
                    f"{args.threshold:.0f}).\n\n"
                    "| query | sf0.1 (s) | 10x (s) | 100x (s) | "
                    "ratio 1->10x | ratio 10->100x | flag |\n"
                    "|---|---|---|---|---|---|---|\n"
                )
                for name, tb, t1, t2, r1, r2, fl, rc in rows:
                    note = "SUPERLINEAR" if fl else ""
                    if rc is not None:
                        # one-sided retry cleared the flag: publish the
                        # first reading so the pass is reviewable
                        note += (
                            f"retry-cleared (first read {rc[0]:.2f}/"
                            f"{rc[1]:.2f}/{rc[2]:.2f}s = "
                            f"x{rc[2] / max(rc[1], 1e-9):.2f})"
                        )
                    fh.write(
                        f"| {name} | {tb:.3f} | {t1:.3f} | {t2:.3f} | "
                        f"{r1:.2f} | {r2:.2f} | {note} |\n"
                    )
                if errors:
                    fh.write(f"\n{errors} queries ERRORED (audit failed).\n")
        return 1 if (flagged or errors) else 0

    if args.pairs:
        rows, flagged = run_pairs_audit(
            spark, args.pairs_threshold, args.pairs_fail_threshold
        )
        if args.out:
            with open(args.out, "w") as fh:
                fh.write(
                    "# Candidate-pair audit (sf0.01 -> sf0.1, 10x data)"
                    f"\n\n{len(flagged)} of {len(rows)} families FAILED"
                    f" (pairs-per-row growth > "
                    f"{args.pairs_fail_threshold:.0f}x = ~quadratic "
                    "total pairs); 'watch' = growth > "
                    f"{args.pairs_threshold:.2f}x, informational.\n\n"
                    "| family | queries | pairs sf0.01 | rows sf0.01 | "
                    "pairs sf0.1 | rows sf0.1 | pairs/row sf0.01 | "
                    "pairs/row sf0.1 | normalized growth | flag |\n"
                    "|---|---|---|---|---|---|---|---|---|---|\n"
                )
                for (fam, cov, ps, ds, pb, db, rs, rb, nm, fl,
                     wt) in rows:
                    fh.write(
                        f"| {fam} | {cov} | {ps} | {ds} | {pb} | {db} | "
                        f"{rs:.2f} | {rb:.2f} | {nm:.2f} | "
                        f"{'PAIR BLOWUP' if fl else 'watch' if wt else ''}"
                        " |\n"
                    )
        return 1 if flagged else 0

    if args.second_step:
        rows, flagged, errors = run_second_step(
            spark, args.threshold, args.copies
        )
        if args.out:
            with open(args.out, "w") as fh:
                fh.write(
                    f"# Second scaling step (sf0.1 -> {args.copies}x "
                    "blow-up, dup density preserved)\n\n"
                    f"{len(flagged)} of {len(rows)} families flagged "
                    f"superlinear (ratio > {args.threshold:.0f}).\n\n"
                    "| query | sf0.1 (s) | blow-up (s) | ratio | flag |\n"
                    "|---|---|---|---|---|\n"
                )
                for name, tb, tw, r, fl in rows:
                    fh.write(
                        f"| {name} | {tb:.3f} | {tw:.3f} | {r:.2f} | "
                        f"{'SUPERLINEAR' if fl else ''} |\n"
                    )
                if errors:
                    fh.write(f"\n{errors} queries ERRORED (audit failed).\n")
        return 1 if (flagged or errors) else 0

    specs = {
        n: s for n, s in all_queries().items()
        if not n.startswith("q_stream_")
        and (not n.startswith("q_pipeline_") or n == "q_pipeline_sf")
    }
    if args.names:
        unknown = [n for n in args.names if n not in specs]
        if unknown:
            print(
                f"unknown or excluded query names: {unknown} "
                "(streaming and fixture-pinned q_pipeline_* queries are "
                "excluded from the scaling audit)",
                file=sys.stderr,
            )
            return 2
        specs = {n: specs[n] for n in args.names}

    rows = []
    flagged = []
    for name, spec in specs.items():
        try:
            spec.fn(spark, WARMUP_SF).count()  # untimed codegen warmup
            t0 = time.perf_counter()
            spec.fn(spark, SMALL_SF).count()
            t_small = time.perf_counter() - t0
            t0 = time.perf_counter()
            spec.fn(spark, BIG_SF).count()
            t_big = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001
            print(f"{name:34s} ERROR {type(exc).__name__}: {exc}"[:120])
            continue
        ratio = t_big / max(t_small, 1e-9)
        flag = ratio > args.threshold and t_small >= args.min_small_sec
        rows.append((name, t_small, t_big, ratio, flag))
        mark = "  <-- SUPERLINEAR" if flag else ""
        print(f"{name:34s} {t_small:7.3f}s -> {t_big:7.3f}s  "
              f"x{ratio:6.2f}{mark}")
        if flag:
            flagged.append(name)

    print(f"\n{len(flagged)} of {len(rows)} queries flagged superlinear "
          f"(threshold x{args.threshold:.0f} on a 10x data step)")
    for n in flagged:
        print(f"  {n}")

    if args.out:
        with open(args.out, "w") as fh:
            fh.write(
                "# Scaling audit (sf0.01 -> sf0.1, 10x data)\n\n"
                f"{len(flagged)} of {len(rows)} queries flagged "
                f"superlinear (ratio > {args.threshold:.0f}; "
                "sub-noise small-sf times never flag).\n\n"
                "| query | sf0.01 (s) | sf0.1 (s) | ratio | flag |\n"
                "|---|---|---|---|---|\n"
            )
            for name, ts, tb, r, fl in sorted(
                rows, key=lambda x: -x[3]
            ):
                fh.write(
                    f"| {name} | {ts:.3f} | {tb:.3f} | {r:.2f} | "
                    f"{'SUPERLINEAR' if fl else ''} |\n"
                )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
