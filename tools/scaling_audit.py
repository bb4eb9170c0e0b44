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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--threshold", type=float, default=18.0)
    ap.add_argument("--min-small-sec", type=float, default=0.15,
                    help="ratios over sub-noise small-sf times are not "
                         "meaningful; such queries report ratio but "
                         "never flag")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from gcp_healthcare_data_pipeline_spark.queries import all_queries
    from gcp_healthcare_data_pipeline_spark.session import get_spark

    spark = get_spark("scaling-audit")
    spark.sparkContext.setLogLevel("ERROR")

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
