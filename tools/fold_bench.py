"""Microbenchmark: variants of the vector dot/dist folds (guide §1 —
measure before changing the shared expression machinery).

The engine's dot/dist folds are `aggregate(zip_with(...))` higher-order
functions, and in Spark 4.1.2 ZipWith/ArrayAggregate/ArrayTransform are
`CodegenFallback` (verified via javap): every pair evaluation runs on
the interpreted expression evaluator with per-element boxing. This
script times, on a synthetic pair scan shaped like the semdedup/knn
block scans (N pairs of 64-dim double arrays):

  hof        : current aggregate(zip_with(a,b,x*y)) fold
  idx        : aggregate(sequence(...)) index fold (element_at per step)
  unroll     : dim-specialized UNROLLED left-assoc sum
               a[0]*b[0] + a[1]*b[1] + ... (pure codegen-able
               expressions, bit-identical summation order)
  unroll_case: the unrolled sum guarded by CASE WHEN size(a)=D AND
               size(b)=D with the hof fold as fallback (the shape the
               engine would actually ship)

and the argmin-fold variants used by _kmeans_assign/_pack_nearest_struct
(array_min-over-transform vs single-pass aggregate+least).

It also VERIFIES bit-identity: every variant must produce exactly the
same doubles as the hof baseline on every row (collect + compare bits).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gcp_healthcare_data_pipeline_spark.session import get_spark  # noqa: E402

DIM = 64


def hof_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def idx_dot(a, b):
    return F.aggregate(
        F.sequence(F.lit(0), F.size(a) - 1),
        F.lit(0.0),
        lambda acc, i: acc + a[i] * b[i],
    )


def unrolled_dot(a, b, dim=DIM):
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + a[i] * b[i]
    return acc


def guarded_dot(a, b, dim=DIM):
    return F.when(
        (F.size(a) == dim) & (F.size(b) == dim), unrolled_dot(a, b, dim)
    ).otherwise(hof_dot(a, b))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    spark = get_spark("fold_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic pair frame: N rows x two 64-dim arrays
    base = spark.range(n).select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: F.sin(F.col("id") * 1.0 + i * 0.37),
        ).alias("a"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: F.cos(F.col("id") * 0.5 + i * 0.11),
        ).alias("b"),
    ).localCheckpoint(eager=True)

    variants = {
        "hof": hof_dot,
        "idx": idx_dot,
        "unroll": unrolled_dot,
        "unroll_case": guarded_dot,
    }

    # bit-identity check on a slice
    ref = None
    small = base.limit(5000)
    for name, fn in variants.items():
        vals = [
            r[0] for r in small.select(fn(F.col("a"), F.col("b"))).collect()
        ]
        if ref is None:
            ref = vals
        else:
            import struct
            for i, (x, y) in enumerate(zip(ref, vals)):
                assert struct.pack("d", x) == struct.pack("d", y), (
                    name, i, x, y)
        print(f"# identity ok: {name}")

    for name, fn in variants.items():
        df = base.select(
            F.round(fn(F.col("a"), F.col("b")), 6).alias("d")
        )
        df.write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(f"dot/{name:12s} min={min(ts):.3f}s  all={[round(t,3) for t in ts]}")

    # ---- argmin fold variants over a packed 16-candidate array ----
    cand = spark.range(16).select(
        F.struct(
            F.col("id").alias("i"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda j: F.cos(F.col("id") * 0.9 + j * 0.21),
            ).alias("c"),
        ).alias("s")
    ).agg(F.array_sort(F.collect_list("s")).alias("_cands"))
    packed = base.crossJoin(F.broadcast(cand)).localCheckpoint(eager=True)

    def dist_hof(v, c):
        return F.round(
            F.sqrt(
                F.aggregate(
                    F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
            6,
        )

    def dist_unroll(v, c, dim=DIM):
        acc = F.lit(0.0)
        for i in range(dim):
            acc = acc + (v[i] - c[i]) * (v[i] - c[i])
        return F.round(F.sqrt(acc), 6)

    def dist_guard(v, c, dim=DIM):
        return F.when(
            (F.size(v) == dim) & (F.size(c) == dim), dist_unroll(v, c, dim)
        ).otherwise(dist_hof(v, c))

    def argmin_transform(dist):
        return F.array_min(
            F.transform(
                F.col("_cands"),
                lambda s: F.struct(
                    dist(F.col("a"), s["c"]).alias("d"), s["i"].alias("i")
                ),
            )
        )

    def argmin_aggregate(dist):
        init = F.lit(None).cast("struct<d:double,i:bigint>")
        return F.aggregate(
            F.col("_cands"),
            init,
            lambda best, s: F.least(
                best,
                F.struct(dist(F.col("a"), s["c"]).alias("d"),
                         s["i"].alias("i")),
            ),
        )

    am_variants = {
        "transform_hof": lambda: argmin_transform(dist_hof),
        "transform_unr": lambda: argmin_transform(dist_guard),
        "aggregate_hof": lambda: argmin_aggregate(dist_hof),
        "aggregate_unr": lambda: argmin_aggregate(dist_guard),
    }
    ref = None
    small = packed.limit(2000)
    for name, mk in am_variants.items():
        vals = small.select(mk().alias("m")).collect()
        key = [(r["m"]["d"], r["m"]["i"]) for r in vals]
        if ref is None:
            ref = key
        else:
            assert key == ref, name
        print(f"# argmin identity ok: {name}")
    for name, mk in am_variants.items():
        df = packed.select(mk().alias("m")).select("m.d", "m.i")
        df.write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(f"argmin/{name:14s} min={min(ts):.3f}s  all={[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
