"""Per-query profiler for the optimization rounds: times one (or more)
registry queries the same way bench.py does (cold shared-state, full
construct -> count), but additionally reports

- construct_s: DataFrame-construction time (eager driver-side actions
  — seed counts, epoch derivation, standing-store builds — execute
  here, BEFORE the timed count in a plan-shape sense);
- count_s:     the action time;
- jobs:        Spark jobs executed by this query (statusTracker delta)
  — the fixed per-job scheduling overhead is the dominant cost for
  sub-second data at sf0.1, so job count is the first thing to shrink;
- an optional .explain("formatted") dump to plans/<round>/<name>_{tag}.txt.

Usage:
  python tools/profile_query.py q_semdedup q_kmeans --explain before
  python tools/profile_query.py --top 12          # 12 most expensive per BENCH_LOCAL_r17.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcp_healthcare_data_pipeline_spark.queries import all_queries  # noqa: E402
from gcp_healthcare_data_pipeline_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=0,
                    help="profile the N most expensive queries per the latest local bench artifact")
    ap.add_argument("--bench-artifact", default=os.path.join(REPO, "BENCH_LOCAL_r17.json"))
    ap.add_argument("--explain", default=None, metavar="TAG",
                    help="dump .explain('formatted') to plans/r17/<name>_<TAG>.txt")
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = all_queries()
    names = list(args.names)
    if args.top:
        with open(args.bench_artifact) as fh:
            q = json.load(fh)["queries"]
        names += [k for k, _ in sorted(q.items(), key=lambda kv: -kv[1])[: args.top]
                  if k not in names]
    if not names:
        ap.error("no queries given")

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # same warm-up as bench.py so first-query numbers are comparable
    from bench import _vector_warmup  # noqa: PLC0415
    nat = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    reg = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    nat.join(reg, nat.n_regionkey == reg.r_regionkey).groupBy("r_name").count().collect()
    _vector_warmup(spark, sf_dir)

    from gcp_healthcare_data_pipeline_spark.queries.dedup_queries import (  # noqa: PLC0415
        clear_shared_state,
    )

    print(f"{'query':34s} {'construct_s':>11s} {'count_s':>8s} {'total_s':>8s} {'jobs':>5s} rows")
    for name in names:
        spec = specs[name]
        for r in range(args.runs):
            clear_shared_state()
            jobs0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t1 = time.perf_counter()
            n = df.count()
            t2 = time.perf_counter()
            jobs1 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            sc.setJobDescription(None)
            print(f"{name:34s} {t1 - t0:11.3f} {t2 - t1:8.3f} {t2 - t0:8.3f} "
                  f"{jobs1 - jobs0:5d} {n}")
            if args.explain and r == 0:
                out_dir = os.path.join(
                    REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r18")
                )
                os.makedirs(out_dir, exist_ok=True)
                clear_shared_state()
                df2 = spec.fn(spark, sf_dir)
                plan = df2._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                    df2._jdf.queryExecution(), "formatted"
                )
                path = os.path.join(out_dir, f"{name}_{args.explain}.txt")
                with open(path, "w") as fh:
                    fh.write(plan)
                ex = plan.count("Exchange")
                print(f"  -> {path} (Exchange x{ex})")
    spark.stop()


if __name__ == "__main__":
    main()
