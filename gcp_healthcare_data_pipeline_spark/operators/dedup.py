"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB corpus case:

- **Exact dedup** is a hash-groupBy: one shuffle on the content hash, with
  map-side partial aggregation; the keeper policy (min id) is explicit so
  results are deterministic (``dropDuplicates`` keeper is not).
- **MinHash + LSH**: shingle -> k minhashes -> banded bucket keys. Candidate
  generation is a self-join on (band_id, band_key) — the shuffle is on
  bucket keys whose cardinality scales with the corpus, never an O(n²)
  cross join. Exact Jaccard verification runs only on candidate pairs.
- **SimHash**: per-document bit-voted signature from token hashes; near-dup
  pairs are found by hamming distance over bucketed signatures.
- All hashing is md5-based (string min for minhash) so signatures are
  bit-identical across engines — this is what makes the DuckDB oracle able
  to reproduce candidate sets exactly.

Everything is Spark built-ins / higher-order functions; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.functions.text import tokens

HEX = "0123456789abcdef"


def exact_dedup(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """Group by content hash; keep min(id), count copies."""
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def with_shingles(
    df: DataFrame, text_col: str = "text", n: int = 3, out: str = "shingles"
) -> DataFrame:
    """Distinct word n-gram shingles via HOFs (no explode — stays narrow).

    Documents with fewer than ``n`` tokens are dropped (guard against
    Spark's descending ``sequence(0, -1)`` surprise).
    """
    toks = tokens(text_col)
    df = df.withColumn("_toks", toks).filter(F.size("_toks") >= n)
    gram = " || ' ' || ".join(f"_toks[i + {k}]" for k in range(n))
    return df.withColumn(
        out,
        F.expr(f"array_distinct(transform(sequence(0, size(_toks) - {n}), i -> {gram}))"),
    ).drop("_toks")


def with_minhash(
    df: DataFrame, shingle_col: str = "shingles", k: int = 12, out: str = "sig"
) -> DataFrame:
    """k md5-minhash values per document (string-min semantics).

    hash_j(s) = md5(j || ':' || s); the signature element j is the
    lexicographic min over shingles — portable across engines.
    """
    return df.withColumn(
        out,
        F.expr(
            f"transform(sequence(0, {k - 1}), "
            f"j -> array_min(transform({shingle_col}, s -> md5(concat(cast(j as string), ':', s)))))"
        ),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "sig",
    bands: int = 6,
    rows_per_band: int = 2,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any LSH band bucket.

    The only shuffle is the band-key self-join; bucket sizes stay small
    because random minhash collisions are rare, so this scales linearly
    with the number of true near-duplicates.
    """
    r = rows_per_band
    band_parts = " || ".join(f"{sig_col}[{r} * b + {i}]" for i in range(r))
    banded = df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> concat(cast(b as string), ':', md5({band_parts})))"
            )
        ).alias("band_key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard(set_a: Column, set_b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(set_a, set_b)).cast("double")
    union = F.size(F.array_union(set_a, set_b)).cast("double")
    return inter / union


def with_simhash(
    df: DataFrame, text_col: str = "text", bits: int = 16, out: str = "simhash"
) -> DataFrame:
    """Bit-voted simhash over md5 token hashes (first ``bits`` bits).

    Bit j is taken from hex nibble j/4 of each token's md5 (value via
    position in the hex alphabet — pure string ops, engine-portable);
    the signature bit is set when >= half the tokens vote 1.
    """
    df = df.withColumn("_hs", F.expr(f"transform(split({text_col}, ' '), t -> md5(t))"))
    votes = (
        f"size(filter(_hs, h -> "
        f"((shiftright(instr('{HEX}', substr(h, 1 + cast(j / 4 as int), 1)) - 1, "
        f"j % 4)) & 1) = 1))"
    )
    return df.withColumn(
        out,
        F.expr(
            f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), "
            f"(acc, j) -> acc + CASE WHEN 2 * {votes} >= size(_hs) "
            f"THEN shiftleft(cast(1 as bigint), j) ELSE cast(0 as bigint) END)"
        ),
    ).drop("_hs")
