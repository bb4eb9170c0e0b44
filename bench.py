"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Round-16 artifact semantics (r15 verdict items 3+4): the sweep runs
``--runs`` times (default 3) and every per-query number in the artifact
is the MEDIAN across runs, with the min/max spread recorded alongside —
this session-internal replication is the defense against the documented
same-day host-contention swings (up to ~1.9x) that the single-thread
anchor cannot correct. Each query is still timed as a full cold
plan -> execute -> count pass within a run (no result caching between
queries; inputs stay OS-page-cached, which is the steady-state at a
warehouse). Before the sweep, an UNTIMED throwaway vector mini-query
(tiny k-means assign + versioned parquet write/read) warms JVM, codegen,
window/array expression paths and the lifecycle write machinery, so the
first vector query measures its own work, not session spin-up
(q_index_roundtrip read 13.0 s in r15 vs ~2 s marginal solo-warm).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gcp_healthcare_data_pipeline_spark.queries import all_queries  # noqa: E402
from gcp_healthcare_data_pipeline_spark.session import get_spark  # noqa: E402

# Machine-speed anchor reference, pinned on this container during an idle
# round-11 session (best-of-5 of the calibration kernel below). Every bench
# run re-times the same kernel; baseline_comparable_normalized rescales the
# wall-clock total by (ANCHOR_REF_SEC / anchor_now) so cross-session CPU
# contention (the r8->r9->r10 "regression" that took manual forensics each
# round) becomes arithmetic: normalized numbers from two sessions are
# directly comparable regardless of how loaded the machine was.
ANCHOR_REF_SEC = 0.391  # idle best-of-5 minimum, pinned 2026-08-15 (round 11)


def _anchor_kernel_once() -> float:
    """One pass of the pinned CPU-bound calibration kernel (no I/O, no
    Spark): seeded synthetic data -> sort -> hash-reduce. numpy keeps it
    deterministic in size and instruction mix across runs."""
    import numpy as np  # noqa: PLC0415

    rng = np.random.default_rng(20260815)
    a = rng.integers(0, 2**62, size=16_000_000, dtype=np.int64)
    t0 = time.perf_counter()
    s = np.sort(a)
    # cheap mixing pass so the kernel isn't purely sort-bound
    mix = np.int64(np.uint64(0x9E3779B97F4A7C15).astype(np.int64))
    with np.errstate(over="ignore"):
        h = (s * mix) ^ (s >> np.int64(17))
    sink = int(h.sum() & 0xFFFFFFFF)
    dt = time.perf_counter() - t0
    assert sink >= 0
    return dt


def measure_anchor(repeats: int = 5) -> float:
    """Best-of-N anchor timing. min() is the contention-robust estimator:
    background load can only make a run slower, never faster."""
    return round(min(_anchor_kernel_once() for _ in range(repeats)), 4)


def _vector_warmup(spark, sf_dir: str) -> None:
    """Untimed throwaway vector mini-query (r15 verdict item 3): a
    10-row k-means assign plus a versioned parquet write/read exercises
    the array-expression codegen (zip_with/aggregate), window functions,
    the crossJoin-broadcast assign shape, and the lifecycle write path —
    the one-time session costs that r15 billed to whichever vector query
    the rotation put first. Runs ~1-2 s; NEVER timed."""
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from gcp_healthcare_data_pipeline_spark.functions.vectors import (  # noqa: PLC0415
        as_double,
    )
    from gcp_healthcare_data_pipeline_spark.operators.versioning import (  # noqa: PLC0415
        read_version,
        write_version,
    )
    from gcp_healthcare_data_pipeline_spark.queries.vector_queries import (  # noqa: PLC0415
        _kmeans_assign,
        _seed_centroids,
        standing_ivfpq_tables,
        standing_semdedup_tables,
    )

    tiny = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .limit(10)
        .select("vec_id", as_double("embedding").alias("v"))
    )
    assigned = _kmeans_assign(tiny, _seed_centroids(tiny))
    root = tempfile.mkdtemp(prefix="bench_warmup_")
    try:
        v = write_version(assigned.select("vec_id", "centroid_id"), root)
        read_version(spark, root, v).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    # pre-build the session-standing stores (one-time nightly-index
    # builds) so EVERY timed sample of their consumers measures the
    # production load+screen plan — without this, run 0's
    # q_stream_semdedup sample paid the ~18 s store build and --runs < 3
    # silently reported build+load as the load number (r16 ADVICE)
    standing_semdedup_tables(spark, sf_dir)
    standing_ivfpq_tables(spark, sf_dir)
    from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (  # noqa: PLC0415
        standing_dedup_tables,
    )

    standing_dedup_tables(spark, sf_dir)


def run_sweep(
    spark, specs, sf_dir: str, run_idx: int
) -> "tuple[dict[str, float], dict[str, str]]":
    """One full pass over the registry: {name: sec} + {name: error}."""
    from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (  # noqa: PLC0415
        clear_shared_state,
    )

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, spec in specs.items():
        # per-query attribution is ORDER-INDEPENDENT: the dedup family's
        # session caches would otherwise bill the shared LSH build to
        # whichever member the registry rotation happens to order first
        # (the r14 q_dedup_clusters "3x regression" that was really a
        # reorder). Every entry now pays its own cold build, matching
        # the cold-plan philosophy in the module docstring. The
        # semdedup STANDING STORE (vector_queries.standing_semdedup_tables)
        # is deliberately NOT cleared: it is the persisted nightly index
        # artifact — its build cost is q_index_roundtrip's row; consumers
        # (q_stream_semdedup) measure the production load+screen path.
        clear_shared_state()
        # per-query failure isolation: one broken query costs one error
        # row, never the whole artifact (round 4 lost its entire bench to
        # a single analysis-time failure aborting the loop)
        t0 = time.perf_counter()
        try:
            n = spec.fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(
                f"# run {run_idx} {name}: ERROR {errors[name]}",
                file=sys.stderr,
            )
            continue
        sec = round(time.perf_counter() - t0, 3)
        times[name] = sec
        print(f"# run {run_idx} {name}: {sec:.3f}s ({n} rows)", file=sys.stderr)
    return times, errors


def aggregate_runs(
    samples: "dict[str, list[float]]",
    errors_by_run: "list[dict[str, str]]",
) -> "tuple[dict[str, float], dict[str, float], dict[str, list[float]], dict[str, str], dict[str, int]]":
    """Pure aggregation of N sweep runs into the artifact maps
    (unit-tested in tests/test_bench_aggregate.py): per-query MEDIANS
    split into (timings, exempt) by the q_stream_ prefix, min/max
    spread, hard errors (zero successful samples) and flaky counts
    (errored in some runs, succeeded in others)."""
    errors: dict[str, str] = {}
    flaky: dict[str, int] = {}
    for errs in errors_by_run:
        for name, msg in errs.items():
            if name in samples:
                flaky[name] = flaky.get(name, 0) + 1
            else:
                errors[name] = msg
    timings: dict[str, float] = {}
    exempt: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name, xs in samples.items():
        med = round(statistics.median(xs), 3)
        spread[name] = [min(xs), max(xs)]
        # q_stream_* each pay a FIXED Structured-Streaming drain cost
        # (stream start, state store, availableNow commit log) that does
        # not scale with sf — measured and reported, but kept out of the
        # headline sf-scaling total so the metric tracks query
        # throughput, not per-stream session setup
        (exempt if name.startswith("q_stream_") else timings)[name] = med
    return timings, exempt, spread, errors, flaky


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--runs",
        type=int,
        default=3,
        help="full sweeps to run; artifact numbers are per-query MEDIANS "
        "across runs with min/max spread recorded (contention defense)",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    # machine-speed anchor BEFORE Spark spins up, so the kernel sees the
    # same background load the queries will but no JVM warm-up artifacts.
    # A second sample runs AFTER the sweep (see below): contention that
    # starts or stops mid-sweep moves the two samples apart, which the
    # artifact exposes instead of silently over/under-correcting.
    anchor_pre_sec = measure_anchor()
    print(
        f"# anchor(pre): {anchor_pre_sec:.4f}s (ref {ANCHOR_REF_SEC}s)",
        file=sys.stderr,
    )

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM, codegen, shuffle machinery, parquet footers — so the
    # first measured query isn't billed for one-time session startup
    n = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    r = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    n.join(r, n.n_regionkey == r.r_regionkey).groupBy("r_name").count().collect()
    _vector_warmup(spark, sf_dir)

    specs = {
        # fixture-sized q_pipeline_* gates run the healthcare pipeline at
        # constant work regardless of sf — correctness-gate only, excluded
        # so the bench metric stays a pure sf-scaling measurement.
        # q_pipeline_sf is the exception BY DESIGN: its silver->gold chain
        # derives from the TPC-H tables, so it scales with sf and is
        # measured like any other query
        name: spec
        for name, spec in all_queries().items()
        if not name.startswith("q_pipeline_") or name == "q_pipeline_sf"
    }

    samples: dict[str, list[float]] = {}
    errors_by_run: list[dict[str, str]] = []
    for run_idx in range(max(1, args.runs)):
        times, errs = run_sweep(spark, specs, sf_dir, run_idx)
        errors_by_run.append(errs)
        for name, sec in times.items():
            samples.setdefault(name, []).append(sec)

    # a query is an ERROR row only if it produced no successful sample at
    # all; partial failures keep their successful samples and are flagged
    timings, exempt, spread, errors, flaky = aggregate_runs(
        samples, errors_by_run
    )

    total = round(sum(timings.values()), 3)

    # second anchor sample AFTER the sweep: the normalization ratio uses
    # the MEAN of the two samples (contention confined to one end of the
    # run is half-captured instead of fully missed); both raw samples go
    # in the artifact so a large pre/post spread is visible evidence of
    # mid-run load. Contention that starts AND stops strictly inside the
    # sweep window still escapes both samples — the per-query medians
    # across --runs sweeps are the first-line defense; the normalized
    # number is a better prior than raw wall-clock, not a proof
    # (BASELINE.md). Spark is stopped FIRST and repeats matches the pre
    # sample: a live 32-thread JVM and a best-of-3 (vs 5) minimum would
    # both bias the post sample high on an idle machine, silently
    # flattering *_normalized relative to the r11 pre-only methodology.
    spark.stop()
    anchor_post_sec = measure_anchor()
    anchor_sec = round((anchor_pre_sec + anchor_post_sec) / 2.0, 4)
    anchor_ratio = round(ANCHOR_REF_SEC / anchor_sec, 4)
    print(
        f"# anchor(post): {anchor_post_sec:.4f}s; mean {anchor_sec:.4f}s "
        f"(ref {ANCHOR_REF_SEC}s, ratio {anchor_ratio})",
        file=sys.stderr,
    )

    # like-for-like continuity number: the registry grows every round, so
    # the all-queries total is not comparable across rounds. Sum the exact
    # query set of the round-1 baseline run (BENCH_r01.json) so the
    # "vs BASELINE.md 58.05s" comparison stays apples-to-apples.
    baseline_comparable = None
    r1_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r01.json")
    try:
        with open(r1_path) as fh:
            r1_names = set(json.load(fh)["parsed"]["queries"])
        common = {k: v for k, v in timings.items() if k in r1_names}
        common.update({k: v for k, v in exempt.items() if k in r1_names})
        baseline_comparable = {
            "queries_in_common": len(common),
            "of_baseline": len(r1_names),
            "total": round(sum(common.values()), 3),
            "note": "sum over the round-1 baseline query set only "
            "(incl. its 2 streaming queries, as r1 counted them); "
            "per-query values are medians across runs",
        }
    except (OSError, KeyError, ValueError):
        pass

    if baseline_comparable is not None:
        baseline_comparable["total_normalized"] = round(
            baseline_comparable["total"] * anchor_ratio, 3
        )

    # headline fields (value, baseline_comparable) go LAST: the driver's
    # artifact keeps only the tail of this line, and round 5's artifact
    # lost the head — ordering the dict so the continuity numbers print
    # after the bulky per-query map keeps them in the truncated tail
    result = {
        "queries": timings,
        "spread": spread,
        "runs": max(1, args.runs),
        "errors": errors,
        "flaky_runs": flaky,
        "exempt_fixed_overhead": {
            "queries": exempt,
            "total": round(sum(exempt.values()), 3),
            "reason": "Structured-Streaming availableNow drain "
            "machinery is fixed per-stream cost, not sf-scaling "
            "query work (see BASELINE.md)",
        },
        "sf": sf,
        "metric": "total_query_wall_clock",
        "unit": "sec",
        "anchor": {
            "sec": anchor_sec,
            "pre_sec": anchor_pre_sec,
            "post_sec": anchor_post_sec,
            "ref_sec": ANCHOR_REF_SEC,
            "ratio": anchor_ratio,
            "note": "pinned CPU calibration kernel, sampled before AND "
            "after the sweep (sec = mean); *_normalized = wall_clock * "
            "ratio — corrects steady background load, but contention "
            "confined strictly inside the sweep window is uncorrected "
            "(a large pre/post spread is the tell)",
        },
        "value": total,
        "value_normalized": round(total * anchor_ratio, 3),
        "baseline_comparable": baseline_comparable,
    }
    # full artifact to disk: the driver keeps only a stdout tail, which
    # cost round 10 per-query cross-round comparability — persist the
    # whole per-query map so each round can commit BENCH_LOCAL_r{N}.json
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL_latest.json"),
    )
    try:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:
        print(f"# bench: could not write {out_path}: {exc}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
