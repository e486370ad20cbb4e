"""Physical-plan regression tests: the scale properties the engine
promises (pushdown, broadcast dims, top-k without global sort) must be
visible in `.explain("formatted")` — not just hoped for."""

from __future__ import annotations

import contextlib
import io

import pytest

from parcel_analytics_etl_notebook_spark.plans.catalog import queries

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = queries()[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    p = plan_of(spark, "pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in p  # in PushedFilters of the scan
    p2 = plan_of(spark, "lifecycle_kpis")
    assert "In(event_type" in p2


def test_star_joins_broadcast_not_sortmerge(spark):
    p = plan_of(spark, "star_fact_orders")
    assert p.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in p


def test_topk_compiles_to_take_ordered(spark):
    p = plan_of(spark, "ann_cosine_topk")
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p  # no global sort materialization


def test_column_pruning_in_scan(spark):
    p = plan_of(spark, "dq_orders")
    # only the 3 DQ'd columns should be read, not all 6 order columns
    assert "ReadSchema" in p
    assert "o_totalprice" not in p and "o_orderdate" not in p


def test_semi_anti_join_shapes(spark):
    assert "LeftSemi" in plan_of(spark, "nations_with_customers")
    assert "LeftAnti" in plan_of(spark, "customers_without_orders")
