"""Source reader tests: JDBC pushdown subquery construction (S1) and
CSV drift tolerance (S2, FIXTURES.md §2)."""

from __future__ import annotations

import os

from gcp_healthcare_data_pipeline_spark.schemas import PATIENTS_B
from gcp_healthcare_data_pipeline_spark.sources.readers import (
    build_pushdown_subquery,
    read_csv,
)


def test_jdbc_full_load_subquery():
    assert build_pushdown_subquery("patients", None, None) == (
        "(SELECT * FROM patients) AS q"
    )


def test_jdbc_incremental_subquery_pushes_watermark():
    q = build_pushdown_subquery("patients", "ModifiedDate", "2024-01-01 05:00:00")
    assert q == (
        "(SELECT * FROM patients "
        "WHERE ModifiedDate > '2024-01-01 05:00:00') AS q"
    )


def test_csv_drift_tolerance(spark, tmp_path):
    """A file whose header drops/renames declared columns still loads:
    matching columns align by name, missing ones are NULL."""
    p = os.path.join(tmp_path, "drift.csv")
    with open(p, "w") as f:
        # ModifiedDate instead of declared Updated_Date; M_Name missing
        f.write("ID,F_Name,L_Name,SSN,PhoneNumber,Gender,DOB,Address,ModifiedDate\n")
        f.write("P1,A,B,111,555,Male,1980-01-01,addr,2024-01-01\n")
    df = read_csv(spark, p, PATIENTS_B)
    row = df.first()
    assert df.columns == PATIENTS_B.fieldNames()
    assert row.ID == "P1" and row.F_Name == "A"
    assert row.M_Name is None and row.Updated_Date is None


def test_jdbc_pushdown_executes_against_embedded_derby(spark, tmp_path):
    """S1 LIVE execution (hospitalA_mysqlToLanding.py:148-163 analog).

    The sandbox has no MySQL, but Spark's distribution bundles the
    embedded Apache Derby JDBC driver — a real JDBC endpoint in-process.
    Round-trip: write a table over JDBC, then read it back through
    ``jdbc_subquery_reader`` with an incremental watermark and assert
    (a) the predicate executed inside the source (only post-watermark
    rows return) and (b) the physical plan's JDBC relation carries the
    pushdown subquery, not a post-scan Spark filter.
    """
    from gcp_healthcare_data_pipeline_spark.sources.readers import (
        jdbc_subquery_reader,
    )

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    rows = [
        ("P1", "Ada", "2024-05-30 01:00:00"),
        ("P2", "Bo", "2024-06-01 04:59:59"),
        ("P3", "Cy", "2024-06-02 09:00:00"),
        ("P4", "Di", "2024-07-01 12:00:00"),
    ]
    src = spark.createDataFrame(rows, "ID string, F_NAME string, MODIFIEDDATE string")
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "patients")
        .option("driver", props["driver"])
        # Derby maps StringType to CLOB, which it refuses to compare with
        # CHAR literals — force VARCHAR like the MySQL source would be
        .option(
            "createTableColumnTypes",
            "ID VARCHAR(10), F_NAME VARCHAR(20), MODIFIEDDATE VARCHAR(19)",
        )
        .mode("overwrite")
        .save()
    )

    reader = jdbc_subquery_reader(
        spark,
        url,
        "patients",
        watermark_col="MODIFIEDDATE",
        last_watermark="2024-06-01 05:00:00",
        properties=props,
    )
    df = reader.load()
    got = sorted(r.ID for r in df.collect())
    assert got == ["P3", "P4"]

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WHERE MODIFIEDDATE > '2024-06-01 05:00:00'" in plan
    # predicate ran source-side: no Spark-side Filter operator node
    # (ignore the scan's empty "PushedFilters: []" attribute text)
    assert "Filter" not in plan.replace("PushedFilters", "")

    # full-load path over the same live endpoint
    full = jdbc_subquery_reader(spark, url, "patients", properties=props).load()
    assert full.count() == 4


def test_jdbc_partition_parallel_read_against_embedded_derby(spark, tmp_path):
    """S1 at ingest scale: partitionColumn/bounds/numPartitions fan the
    JDBC scan out to N parallel stride connections. Live-assert against
    embedded Derby that (a) the DataFrame really has >1 input partition,
    (b) results equal the single-stream read, and (c) rows OUTSIDE the
    stated bounds are still read (bounds steer strides, never filter)."""
    from gcp_healthcare_data_pipeline_spark.sources.readers import (
        jdbc_subquery_reader,
    )

    url = f"jdbc:derby:{tmp_path}/derbydb2;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    rows = [(i, f"name{i}", f"2024-06-{(i % 28) + 1:02d} 00:00:00") for i in range(100)]
    src = spark.createDataFrame(rows, "PK int, F_NAME string, MODIFIEDDATE string")
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "patients")
        .option("driver", props["driver"])
        .option(
            "createTableColumnTypes",
            "PK INT, F_NAME VARCHAR(20), MODIFIEDDATE VARCHAR(19)",
        )
        .mode("overwrite")
        .save()
    )

    # bounds deliberately cover only [10, 90): strides split that range,
    # but Spark leaves the first/last stride unbounded, so all 100 rows
    # must still arrive
    df = jdbc_subquery_reader(
        spark,
        url,
        "patients",
        properties=props,
        partition_column="PK",
        lower_bound=10,
        upper_bound=90,
        num_partitions=4,
    ).load()
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    assert sorted(r.PK for r in df.collect()) == list(range(100))

    # misuse guard: partition column without the stride parameters
    import pytest

    with pytest.raises(ValueError, match="partition_column requires"):
        jdbc_subquery_reader(
            spark, url, "patients", properties=props, partition_column="PK"
        )


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC zone write/read round-trips exactly and pushes filters +
    column pruning into the ORC scan (same contract as parquet)."""
    from gcp_healthcare_data_pipeline_spark.sources.readers import read_orc
    from gcp_healthcare_data_pipeline_spark.sources.writers import (
        write_zone_orc,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "docs_orc")
    write_zone_orc(docs, path, partition_by=("lang",))

    back = read_orc(spark, path)
    assert back.count() == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)

    # filter + projection reach the ORC scan
    q = back.filter(back.lang == "en").select("doc_id", "n_chars")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<doc_id" in plan
    # partition pruning on the lang partition column
    assert "PartitionFilters: [isnotnull(lang" in plan
    en_expected = docs.filter(docs.lang == "en").count()
    assert q.count() == en_expected


def test_avro_reader_gated_when_jar_missing(spark, tmp_path):
    """Without the spark-avro jar the reader raises the documented
    NotImplementedError (rather than an opaque ClassNotFound at action
    time); with the jar present it must round-trip."""
    import pytest as _pytest

    from gcp_healthcare_data_pipeline_spark.sources.readers import read_avro

    try:
        df = read_avro(spark, str(tmp_path / "nothing.avro"))
    except NotImplementedError:
        return  # expected in this container (pip pyspark has no avro jar)
    except Exception:
        _pytest.fail("read_avro must raise NotImplementedError when gated")
    # jar present: an actual read of a missing path raises AnalysisException
    # at load; reaching here means format resolution worked
    assert df is not None


def test_zone_parquet_codec_override(spark, tmp_path):
    """The codec option reaches the files: zstd footers when requested,
    and zstd lands measurably smaller than uncompressed on this data."""
    import duckdb

    from gcp_healthcare_data_pipeline_spark.sources.writers import (
        write_zone_parquet,
    )
    from pyspark.sql import functions as F

    df = spark.range(20000).select(
        "id", F.concat(F.lit("payload-"), F.col("id") % 100).alias("s")
    )
    zpath = str(tmp_path / "zstd")
    upath = str(tmp_path / "uncompressed")
    write_zone_parquet(df, zpath, codec="zstd")
    write_zone_parquet(df, upath, codec="uncompressed")

    codecs = {
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT compression FROM parquet_metadata('{zpath}/*.parquet')"
        ).fetchall()
    }
    assert "ZSTD" in codecs
    z_bytes = sum(
        os.path.getsize(os.path.join(zpath, f))
        for f in os.listdir(zpath) if f.endswith(".parquet")
    )
    u_bytes = sum(
        os.path.getsize(os.path.join(upath, f))
        for f in os.listdir(upath) if f.endswith(".parquet")
    )
    assert z_bytes < u_bytes
    # roundtrip intact
    assert spark.read.parquet(zpath).count() == 20000
