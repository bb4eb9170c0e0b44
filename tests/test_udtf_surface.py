"""Python UDTF surface (Spark 4): a table-valued function producing
rows per input — pinned equivalent to the JVM explode/HOF twin, and
usable from SQL via registration (lateral join)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="ngram: string, pos: int")
class NGrams:
    """Yield (ngram, position) rows for a token string — the UDTF shape
    for generators whose logic outgrows HOF expressions."""

    def eval(self, text: str, n: int):
        toks = text.split(" ")
        for i in range(len(toks) - n + 1):
            yield (" ".join(toks[i : i + n]), i)


def test_udtf_matches_hof_twin(spark):
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "x y"), (2, "solo")],
        "id long, text string",
    )
    # UDTF applied per row via lateral join semantics in SQL
    spark.udtf.register("ngrams", NGrams)
    df.createOrReplaceTempView("docs_udtf")
    rows = spark.sql(
        "SELECT id, ngram, pos FROM docs_udtf, "
        "LATERAL ngrams(text, 2)"
    ).collect()
    got = sorted((r.id, r.ngram, r.pos) for r in rows)
    # JVM twin: transform over a sequence
    twin = df.select(
        "id",
        F.posexplode(
            F.expr(
                "CASE WHEN size(split(text, ' ')) >= 2 THEN"
                " transform(sequence(1, size(split(text, ' ')) - 1),"
                " i -> concat_ws(' ', slice(split(text, ' '), i, 2)))"
                " ELSE array() END"
            )
        ).alias("p", "ngram"),
    ).select("id", "ngram", F.col("p").alias("pos"))
    want = sorted((r.id, r.ngram, r.pos) for r in twin.collect())
    assert got == want
