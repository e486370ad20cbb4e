"""Source/sink parity tests (SURVEY §2.1): multiline-quoted CSV scan
(S1), parquet sink partitioning control (S3), append-mode audit sink
(S4), and the approx-distinct error bound (A6 scale variant)."""

from __future__ import annotations

import csv
import glob
import os

from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import queries, table
from parcel_analytics_etl_notebook_spark.sources.readers import read_csv_multiline
from parcel_analytics_etl_notebook_spark.sources.writers import (
    write_csv_audit,
    write_parquet,
)


def test_csv_multiline_roundtrip(spark, tmp_path):
    """The reference's input shape (etl/main.py:75-80): payload cells
    with embedded newlines and doubled quotes must survive the scan."""
    path = str(tmp_path / "events.csv")
    payload = '{"note": "line1\nline2 with \\"quotes\\""}'
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh, quoting=csv.QUOTE_ALL, doublequote=True)
        w.writerow(["id", "event"])
        w.writerow(["1", payload])
        w.writerow(["2", "plain"])
    df = read_csv_multiline(spark, path)
    rows = {r["id"]: r["event"] for r in df.collect()}
    assert rows["1"] == payload  # newline + quotes intact
    assert rows["2"] == "plain"
    assert df.count() == 2  # multiline payload did NOT split into rows


def test_parquet_sink_file_count_and_partitioning(spark, tmp_path):
    df = table(spark, "/root/testdata/sf0.001", "orders")
    out = str(tmp_path / "wh")
    write_parquet(
        df.withColumn("year", F.year("o_orderdate")),
        out,
        partition_by=["year"],
        target_files=2,
    )
    # partition dirs exist and reads prune by partition column
    years = {os.path.basename(p) for p in glob.glob(f"{out}/year=*")}
    assert len(years) >= 2
    back = spark.read.parquet(out)
    assert back.filter(F.col("year") == 1995).count() == df.filter(
        F.year("o_orderdate") == 1995
    ).count()


def test_csv_audit_sink_appends(spark, tmp_path):
    out = str(tmp_path / "audit")
    d1 = spark.createDataFrame([("cp1", "PASS")], "check string, status string")
    d2 = spark.createDataFrame([("cp2", "FAIL")], "check string, status string")
    write_csv_audit(d1, out)
    write_csv_audit(d2, out)  # append, not rewrite
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 2
    assert {r["check"] for r in back.collect()} == {"cp1", "cp2"}


def test_approx_distinct_error_bound(spark):
    """HLL++ at rsd=0.02 must land within a loose 10% of exact counts."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in queries()["approx_distinct_users"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    exact = {
        r["event_type"]: r["x"]
        for r in table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("x"))
        .collect()
    }
    for et, ex in exact.items():
        assert abs(approx[et] - ex) <= max(2, 0.1 * ex), (et, approx[et], ex)


def test_compact_parquet(spark, tmp_path):
    from parcel_analytics_etl_notebook_spark.sources.writers import compact_parquet

    path = str(tmp_path / "frag")
    df = table(spark, "/root/testdata/sf0.001", "orders")
    df.repartition(16).write.parquet(path)  # fragment into 16 files
    import glob as g

    assert len(g.glob(f"{path}/part-*.parquet")) == 16
    n = compact_parquet(spark, path, target_files=2)
    assert n == df.count()
    assert len(g.glob(f"{path}/part-*.parquet")) == 2
    assert spark.read.parquet(path).count() == n


def test_write_bucketed_table_helper(spark, tmp_path):
    from parcel_analytics_etl_notebook_spark.sources.writers import (
        write_bucketed_table,
    )

    spark.sql("DROP TABLE IF EXISTS helper_bucketed")
    df = table(spark, "/root/testdata/sf0.001", "customer")
    write_bucketed_table(
        df, "helper_bucketed", str(tmp_path / "bt"), ["c_custkey"], n_buckets=4,
        sort_cols=["c_custkey"],
    )
    back = spark.table("helper_bucketed")
    assert back.count() == df.count()
    spark.sql("DROP TABLE IF EXISTS helper_bucketed")
