"""Spark 4 SQL scripting (BEGIN/END, variables, control flow): the
reference's transform layer is literally a multi-statement SQL script
(reference silver.sql — staged CREATE + MERGE + DROP in one submitted
script), so the engine hosting script-style workloads natively matters
for migration parity. Pins variables, conditionals, loops, and a
staged-view flow equal to its DataFrame twin."""

from __future__ import annotations

from pyspark.sql import functions as F


def _enable(spark):
    spark.conf.set("spark.sql.scripting.enabled", "true")


def test_variables_and_control_flow(spark):
    _enable(spark)
    out = spark.sql(
        """
        BEGIN
          DECLARE n INT = 0;
          DECLARE acc BIGINT = 0;
          WHILE n < 5 DO
            SET acc = acc + n * n;
            SET n = n + 1;
          END WHILE;
          IF acc > 20 THEN
            SELECT acc AS sum_sq, 'big' AS label;
          ELSE
            SELECT acc AS sum_sq, 'small' AS label;
          END IF;
        END
        """
    ).collect()
    assert out[0].sum_sq == 30 and out[0].label == "big"


def test_staged_script_flow_matches_dataframe_twin(spark):
    _enable(spark)
    df = spark.range(100).select(
        "id",
        (F.col("id") % 4).alias("grp"),
        (F.col("id") * 2.5).alias("amount"),
    )
    df.createOrReplaceTempView("script_src")
    # silver.sql shape: stage a conformed view, aggregate, clean up
    got = spark.sql(
        """
        BEGIN
          DECLARE cutoff DOUBLE = 100.0;
          CREATE OR REPLACE TEMPORARY VIEW script_staged AS
            SELECT grp, amount FROM script_src WHERE amount > cutoff;
          SELECT grp,
                 COUNT(*) AS n,
                 ROUND(SUM(amount), 2) AS total
          FROM script_staged GROUP BY grp;
        END
        """
    ).collect()
    want = (
        df.filter(F.col("amount") > 100.0)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("amount"), 2).alias("total"),
        )
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
