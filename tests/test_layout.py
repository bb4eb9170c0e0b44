"""Z-order layout (operators/layout.py): the materialized clustered
write must give every file a narrow square of the key grid (the skipping
property), preserve rows exactly, and the Morton math must be exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.operators.layout import (
    morton_sql,
    write_zordered,
    zorder_assign,
)

_BITS = 4  # 16x16 grid
_FILES = 16


def _grid_table(spark, n=4096):
    # two independent uniform dimensions — worst case for 1-D sort layout
    return spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 37 + 11) % 64).alias("y"),
    )


def test_morton_code_is_exact():
    # spot-check the interleave against hand-computed Morton codes
    import duckdb

    expr = morton_sql("a", "b", 4)
    got = duckdb.sql(
        f"SELECT {expr} FROM (VALUES (0,0),(1,0),(0,1),(15,15),(5,9)) t(a,b)"
    ).fetchall()

    def ref(a, b):
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    assert [r[0] for r in got] == [
        ref(a, b) for a, b in [(0, 0), (1, 0), (0, 1), (15, 15), (5, 9)]
    ]


def test_every_file_covers_a_narrow_square(spark):
    df = _grid_table(spark)
    assigned = zorder_assign(df, "x", "y", bits=_BITS, n_files=_FILES)
    spans = (
        assigned.groupBy("_zfile")
        .agg(
            (
                (F.max("_za") - F.min("_za") + 1)
                * (F.max("_zb") - F.min("_zb") + 1)
            ).alias("area")
        )
        .collect()
    )
    cells = 1 << (2 * _BITS)  # 256
    # perfect Morton split of 256 cells into 16 files = 16-cell squares;
    # allow boundary slack but demand strong locality vs a 1-D stripe
    # layout, whose files span a full 16-wide row in the other dimension
    assert len(spans) == _FILES
    assert all(r.area <= 4 * (cells // _FILES) for r in spans)


def test_write_zordered_roundtrip_and_layout(spark, tmp_path):
    path = str(tmp_path / "z")
    df = _grid_table(spark, n=2048)
    write_zordered(df, path, "x", "y", bits=_BITS, n_files=_FILES)
    back = spark.read.parquet(path)
    assert sorted(map(tuple, back.select("x", "y").collect())) == sorted(
        map(tuple, df.collect())
    )
    # one directory per non-empty Morton range, each internally clustered:
    # every partition dir's x AND y ranges are narrow (<= half the domain)
    per_dir = (
        back.groupBy("_zfile")
        .agg(
            (F.max("x") - F.min("x")).alias("xspan"),
            (F.max("y") - F.min("y")).alias("yspan"),
        )
        .collect()
    )
    assert all(r.xspan <= 32 and r.yspan <= 32 for r in per_dir)


def test_morton_n_dims_is_exact_and_local():
    """3-D Morton codes: exact against a reference implementation, and
    contiguous code ranges cover small cubes (locality in every dim)."""
    import duckdb

    from gcp_healthcare_data_pipeline_spark.operators.layout import (
        morton_sql_n,
    )

    expr = morton_sql_n(["a", "b", "c"], 3)
    rows = [(a, b, c) for a in range(8) for b in range(8) for c in range(8)]
    values = ", ".join(f"({a},{b},{c})" for a, b, c in rows)
    got = duckdb.sql(
        f"SELECT a, b, c, {expr} AS z FROM (VALUES {values}) t(a,b,c)"
    ).fetchall()

    def ref(a, b, c):
        z = 0
        for i in range(3):
            z |= ((a >> i) & 1) << (i * 3 + 2)
            z |= ((b >> i) & 1) << (i * 3 + 1)
            z |= ((c >> i) & 1) << (i * 3 + 0)
        return z

    zmap = {}
    for a, b, c, z in got:
        assert z == ref(a, b, c)
        zmap[z] = (a, b, c)
    # codes are a permutation of 0..511 (bijective interleave)
    assert sorted(zmap) == list(range(512))
    # every aligned run of 64 consecutive codes is a 4x4x4 cube
    for start in range(0, 512, 64):
        pts = [zmap[z] for z in range(start, start + 64)]
        for d in range(3):
            lo = min(p[d] for p in pts)
            hi = max(p[d] for p in pts)
            assert hi - lo == 3
