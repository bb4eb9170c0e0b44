"""BigQuery-semantics shims as composable Column expressions.

The reference's query surface is BigQuery Standard SQL; these helpers give
each BigQuery idiom an exact Spark translation (all JVM-side built-ins,
whole-stage-codegen friendly — no Python UDFs):

- ``SAFE_CAST(x AS T)``      -> :func:`safe_cast`      (silver.sql:55,250,530-536)
- ``SAFE_DIVIDE(x, y)``      -> :func:`safe_divide`    (gold.sql:119)
- ``arr[SAFE_OFFSET(i)]``    -> :func:`safe_offset`    (gold.sql:22,158,160)
- ``CONCAT(a, '-', b)``      -> :func:`null_prop_concat` (silver.sql:19,92)
  BigQuery CONCAT is NULL-propagating; Spark's ``concat_ws`` is not, so the
  key expression must use ``F.concat`` with literal separators.
- ``LOWER(x) = 'null'``      -> :func:`string_null_sentinel` (silver.sql:106)
- quarantine CASE rule       -> :func:`quarantine_flag` (silver.sql:105-108)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def safe_cast(col: Column | str, dtype: str) -> Column:
    """NULL on failed cast, like BigQuery SAFE_CAST (Spark try_cast)."""
    return _col(col).try_cast(dtype)


def safe_divide(num: Column | str, den: Column | str) -> Column:
    """NULL on division by zero, like BigQuery SAFE_DIVIDE."""
    return F.try_divide(_col(num), _col(den))


def safe_offset(arr: Column, idx: int) -> Column:
    """NULL on out-of-range index, like arr[SAFE_OFFSET(i)].

    ``getItem`` returns NULL for out-of-range when ANSI is off (pinned in
    session.py).
    """
    return arr.getItem(idx)


def null_prop_concat(*parts: Column | str) -> Column:
    """NULL-propagating CONCAT (BigQuery semantics).

    Any NULL argument makes the whole result NULL — this is load-bearing
    for derived keys like ``CONCAT(id, '-', datasource)``: a NULL id must
    yield a NULL key (not ``'-datasource'`` as concat_ws would).
    String literals are wrapped with ``F.lit``.
    """
    cols = [F.lit(p) if isinstance(p, str) else p for p in parts]
    return F.concat(*cols)


def string_null_sentinel(col: Column | str) -> Column:
    """True where the value is the literal string 'null' (any case)."""
    return F.lower(_col(col)) == "null"


def quarantine_flag(*bad_conditions: Column) -> Column:
    """``CASE WHEN <any bad> THEN TRUE ELSE FALSE END`` data-quality flag.

    NULL conditions (e.g. a NULL-valued comparison) count as not-bad,
    matching BigQuery CASE semantics.
    """
    cond = None
    for c in bad_conditions:
        cond = c if cond is None else (cond | c)
    if cond is None:
        return F.lit(False)
    return F.when(cond, F.lit(True)).otherwise(F.lit(False))
