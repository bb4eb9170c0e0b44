"""BigQuery-semantics shim tests (SURVEY §2.5 F1-F10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.functions.bq_compat import (
    null_prop_concat,
    quarantine_flag,
    safe_cast,
    safe_divide,
    safe_offset,
    string_null_sentinel,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


def test_safe_cast_bad_input_is_null(spark):
    assert _one(spark, safe_cast(F.lit("12x"), "bigint")) is None
    assert _one(spark, safe_cast(F.lit("42"), "bigint")) == 42
    assert _one(spark, safe_cast(F.lit("3.5"), "double")) == 3.5


def test_safe_divide_by_zero_is_null(spark):
    assert _one(spark, safe_divide(F.lit(1.0), F.lit(0.0))) is None
    assert _one(spark, safe_divide(F.lit(6.0), F.lit(3.0))) == 2.0


def test_safe_offset_out_of_range_is_null(spark):
    arr = F.split(F.lit("a-b"), "-")
    assert _one(spark, safe_offset(arr, 1)) == "b"
    assert _one(spark, safe_offset(arr, 5)) is None


def test_null_prop_concat(spark):
    assert _one(spark, null_prop_concat(F.lit("1"), "-", F.lit("x"))) == "1-x"
    # BigQuery CONCAT: any NULL => NULL (concat_ws would return '-x')
    assert _one(spark, null_prop_concat(F.lit(None).cast("string"), "-", F.lit("x"))) is None


def test_string_null_sentinel(spark):
    assert _one(spark, string_null_sentinel(F.lit("NuLL")))
    assert not _one(spark, string_null_sentinel(F.lit("nul")))


def test_quarantine_flag_null_condition_counts_as_ok(spark):
    # a NULL comparison term must not quarantine the row (CASE semantics)
    flag = quarantine_flag(F.lit(None).cast("boolean"), F.lit(None).cast("int") > 5)
    assert _one(spark, flag) is False
    assert _one(spark, quarantine_flag(F.lit(True))) is True
    assert _one(spark, quarantine_flag()) is False
