"""Measure LSH ANN recall vs brute force across configs at a given SF.

Usage: python tools/lsh_recall.py [--sf /root/testdata/sf0.1]
Prints recall + wall time per (tables, bits, probe_depth) config.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from gcp_healthcare_data_pipeline_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    lsh_bucket_topk,
)
from gcp_healthcare_data_pipeline_spark.session import get_spark, load_tables  # noqa: E402

K = 5


def pairs(df) -> set:
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = get_spark("lsh-recall")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_tables(spark, args.sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)

    t0 = time.time()
    truth = pairs(brute_force_topk(emb, queries, k=K))
    print(f"brute force: {len(truth)} pairs ({time.time() - t0:.1f}s)")

    for tables, bits, depth in [
        (3, 4, 1), (4, 4, 1), (3, 4, 2), (4, 4, 2), (3, 8, 2), (2, 4, 2),
    ]:
        t0 = time.time()
        got = pairs(
            lsh_bucket_topk(
                emb, queries, k=K, bits=bits, dims=64, tables=tables,
                probe_depth=depth,
            )
        )
        dt = time.time() - t0
        rec = len(got & truth) / len(truth)
        print(
            f"tables={tables} bits={bits} depth={depth}: "
            f"recall={rec:.3f} ({len(got & truth)}/{len(truth)})  {dt:.1f}s"
        )


if __name__ == "__main__":
    main()
