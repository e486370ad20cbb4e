"""Bucketed-table co-located join: the no-shuffle layout, proven.

Writes orders and lineitem bucketed on the order key with the same
bucket count, then pins the two claims the layout makes: (1) the
bucketed equi-join plans with ZERO Exchange — the join runs
bucket-against-bucket; (2) it returns exactly the rows the ordinary
shuffled join returns. The contrast assertion (the plain parquet join
DOES shuffle both sides) keeps the test honest if a future Spark
version changes defaults."""

from __future__ import annotations

import pytest

from parcel_analytics_etl_notebook_spark.plans.catalog import table
from parcel_analytics_etl_notebook_spark.sources.bucketed import (
    drop_table,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_exchange_and_result_parity(spark, tmp_path):
    o = table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")

    write_bucketed(
        o, "b_orders", str(tmp_path / "b_orders"),
        ["o_orderkey"], N_BUCKETS,
    )
    write_bucketed(
        li, "b_lineitem", str(tmp_path / "b_lineitem"),
        ["l_orderkey"], N_BUCKETS,
    )
    try:
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        # AQE would replace the SMJ with a broadcast join at this tiny SF,
        # hiding the property under test; disable it for the plan probe.
        # Capture the session's CURRENT values and restore those — a
        # hard-coded restore would silently rewrite the shared fixture's
        # config for every later test (ADVICE r08).
        saved_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        saved_abjt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", "-1"
        )
        try:
            joined = bo.join(
                bl, bo.o_orderkey == bl.l_orderkey
            )
            plan = _plan(joined)
            assert "Exchange" not in plan, (
                "bucketed join still shuffles:\n" + plan
            )
            # contrast: the same join over plain parquet shuffles both sides
            plain = o.join(li, o.o_orderkey == li.l_orderkey)
            assert "Exchange" in _plan(plain)
            n_bucketed = joined.count()
            n_plain = plain.count()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", saved_abjt
            )
        assert n_bucketed == n_plain > 0
    finally:
        drop_table(spark, "b_orders")
        drop_table(spark, "b_lineitem")


def test_bucketed_write_ignored_without_table(spark, tmp_path):
    """Guard the documented footgun: plain .parquet(path) cannot carry
    a bucket spec — Spark raises rather than silently dropping it."""
    o = table(spark, SF, "orders").select("o_orderkey")
    with pytest.raises(Exception):
        (
            o.write.mode("overwrite")
            .bucketBy(N_BUCKETS, "o_orderkey")
            .parquet(str(tmp_path / "nope"))
        )
