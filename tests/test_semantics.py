"""Intent-level semantics on handcrafted fixtures for the changelog /
behavioral operators. The oracle harness proves Spark and DuckDB AGREE;
these tests pin what the answer is SUPPOSED to be — step ordering in the
funnel, tombstone handling in CDC, absence-doesn't-erase in the golden
record, and regime drift in the point-in-time join."""

from __future__ import annotations

import datetime as dt

from parcel_analytics_etl_notebook_spark.plans.catalog import queries


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute, 0)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [
            (i, ts, uid, etype, float(val), "{}")
            for i, (ts, uid, etype, val) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_funnel_requires_step_order(spark, tmp_path):
    """A view BEFORE the signup must not qualify the session: user 1
    (view, signup, purchase) has no in-order view; user 2 (signup,
    view, purchase) completes the funnel."""
    _write_events(
        spark,
        tmp_path,
        [
            (_t(0), 1, "view", 1),
            (_t(1), 1, "signup", 1),
            (_t(2), 1, "purchase", 1),
            (_t(0), 2, "signup", 1),
            (_t(1), 2, "view", 1),
            (_t(2), 2, "purchase", 1),
        ],
    )
    row = queries()["session_conversion_funnel"](
        spark, str(tmp_path)
    ).collect()[0]
    assert row["n_sessions"] == 2
    assert row["n_signup"] == 2
    assert row["n_signup_view"] == 1  # user 1's early view doesn't count
    assert row["n_full_funnel"] == 1
    assert row["signup_to_purchase_rate"] == 0.5


def test_cdc_tombstone_is_not_resurrected(spark, tmp_path):
    """A key whose LATEST change is a tombstone disappears entirely —
    the prior value must not come back; a tombstone followed by a write
    is alive again."""
    _write_events(
        spark,
        tmp_path,
        [
            (_t(0), 1, "click", 10),
            (_t(1), 1, "error", 0),  # latest = tombstone → deleted
            (_t(0), 2, "error", 0),
            (_t(1), 2, "click", 5),  # write after tombstone → alive
        ],
    )
    rows = {
        r["user_id"]: r
        for r in queries()["cdc_latest_state"](spark, str(tmp_path)).collect()
    }
    assert 1 not in rows
    assert rows[2]["last_value"] == 5.0
    assert rows[2]["n_changes"] == 2


def test_golden_record_absence_does_not_erase(spark, tmp_path):
    """The merged row carries the latest non-null observation per
    attribute: a later click must not blank the earlier view value, and
    a never-seen attribute stays null."""
    _write_events(
        spark,
        tmp_path,
        [
            (_t(0), 1, "view", 2),
            (_t(1), 1, "click", 1),
            (_t(2), 1, "click", 3),
        ],
    )
    row = queries()["golden_record_merge"](spark, str(tmp_path)).collect()[0]
    assert row["last_click_value"] == 3.0
    assert row["last_view_value"] == 2.0  # survived the later clicks
    assert row["last_purchase_value"] is None
    assert row["last_ts"] == _t(2)
    assert row["n_events"] == 3


def test_pointintime_join_assigns_ship_time_regime(spark, tmp_path):
    """A line shipping AFTER the customer's priority changed belongs to
    the NEW regime (drifted); one shipping before the change stays in
    its order's own regime."""
    d = lambda day: dt.datetime(1995, 1, day)  # noqa: E731
    spark.createDataFrame(
        [
            (1, 7, "O", 10.0, d(1), "5-LOW"),
            (2, 7, "O", 10.0, d(10), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(1, d(5)), (1, d(12))],
        "l_orderkey long, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    rows = {
        r["regime"]: r
        for r in queries()["pointintime_priority_join"](
            spark, str(tmp_path)
        ).collect()
    }
    # line@d5: 5-LOW regime, own priority 5-LOW → not drifted
    assert rows["5-LOW"]["n_lines"] == 1
    assert rows["5-LOW"]["n_drifted"] == 0
    # line@d12: shipped under 1-URGENT regime but its order is 5-LOW
    assert rows["1-URGENT"]["n_lines"] == 1
    assert rows["1-URGENT"]["n_drifted"] == 1


def test_not_in_rewrite_general_null_semantics(spark, tmp_path):
    """parts_never_ordered_notin must equal SQL NOT IN on ARBITRARY
    inputs (ADVICE r04): a NULL inner value empties the result; a
    NULL-keyed OUTER row is excluded whenever the inner set is
    non-empty but kept when it is empty (NULL NOT IN {} is TRUE)."""
    import pyspark.sql.functions as F  # noqa: F401

    def write(parts, lines):
        spark.createDataFrame(
            parts, "p_partkey long, p_brand string"
        ).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
        spark.createDataFrame(
            lines, "l_partkey long, l_shipdate timestamp"
        ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")

    q = queries()["parts_never_ordered_notin"]
    ship = dt.datetime(1998, 6, 1)
    parts = [(1, "A"), (2, "A"), (None, "B")]

    # inner non-empty, no NULLs: part 2 survives, NULL-keyed part drops
    write(parts, [(1, ship)])
    got = {r["p_brand"]: r["never_ordered_parts"] for r in q(spark, str(tmp_path)).collect()}
    assert got == {"A": 1}

    # one NULL in the inner set: NOT IN is UNKNOWN for every row
    write(parts, [(1, ship), (None, ship)])
    assert q(spark, str(tmp_path)).count() == 0

    # inner empty (all shipments pre-1998): every part kept, NULL key too
    write(parts, [(1, dt.datetime(1997, 6, 1))])
    got = {r["p_brand"]: r["never_ordered_parts"] for r in q(spark, str(tmp_path)).collect()}
    assert got == {"A": 2, "B": 1}
