"""Per-stage marginal cost of q_curation_pipeline (SCALING_r17 §:
which stage dominates).

Counts each stage frame IN ORDER; because every stage frame is lazily
checkpointed, stage k's count executes only the work ABOVE the previous
checkpoint — the marginal cost of that stage (plus its count shuffle).
The sum approximates the full-pipeline wall; the per-stage split is the
optimization ledger.

Usage: python tools/curation_profile.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from gcp_healthcare_data_pipeline_spark.queries.curation_queries import (
        _curation_stage_frames,
    )
    from gcp_healthcare_data_pipeline_spark.session import get_spark

    spark = get_spark("curation-profile", extra_conf={
        "spark.driver.memory": "8g"
    })
    spark.sparkContext.setLogLevel("ERROR")

    frames = _curation_stage_frames(spark, args.sf)
    total = 0.0
    print(f"{'stage':20s} {'rows':>8s} {'marginal_s':>10s}")
    for name, df in frames:
        t0 = time.perf_counter()
        n = df.count()
        dt = time.perf_counter() - t0
        total += dt
        print(f"{name:20s} {n:8d} {dt:10.3f}")
    print(f"{'TOTAL':20s} {'':8s} {total:10.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
