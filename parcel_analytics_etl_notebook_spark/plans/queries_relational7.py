"""Changelog / behavioral-analytics shapes over the event stream:
CDC apply-changes with tombstones, sessionized conversion funnels, and
survivorship (golden-record) merge.

These generalize the reference's event-log fact table
(``/root/reference/etl/main.py:248-264``) to the three stateful
read-patterns every warehouse needs on top of an append-only changelog:
"what is the current state" (CDC), "did the journey complete"
(funnel), and "what is the best-known value per entity"
(survivorship). Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table


@register(
    "cdc_latest_state",
    oracle="""
WITH ranked AS (
    SELECT user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
           event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n_changes
    FROM events
)
SELECT user_id, round(value, 4) AS last_value, ts AS last_ts,
       CAST(n_changes AS BIGINT) AS n_changes
FROM ranked WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
""",
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply-changes: collapse an append-only changelog to current
    state — last writer wins per key, and a key whose LATEST change is
    a tombstone ('error' plays the delete op) disappears from the
    snapshot entirely. The Debezium/MERGE-materialization read pattern.

    One shuffle on the key: the latest-row window and the change-count
    window share the same user_id partitioning and sort pass. (Without
    the n_changes audit column the top-1 pick would additionally
    WindowGroupLimit-prune map-side; the full-history count is what
    forces every change to travel, so drop it when rebuilding snapshots
    at 100 TB and traffic becomes O(keys).)
    The tombstone filter must apply AFTER picking the latest row
    (filtering 'error' rows first would wrongly resurrect the previous
    value), which is why it sits outside the window."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("user_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_changes", F.count(F.lit(1)).over(wc))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.round("value", 4).alias("last_value"),
            F.col("ts").alias("last_ts"),
            F.col("n_changes").cast("bigint").alias("n_changes"),
        )
        .orderBy("user_id")
    )


@register(
    "session_conversion_funnel",
    oracle="""
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
           FROM events),
m AS (
    SELECT user_id, ts, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR date_diff('second', lag(ts) OVER w, ts) > 1800
                THEN 1 ELSE 0 END AS is_new
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
    SELECT user_id, ts, event_type,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS session_idx
    FROM m
),
s1 AS (
    SELECT user_id, session_idx, ts, event_type,
           min(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id, session_idx) AS t_signup
    FROM s
),
s2 AS (
    SELECT user_id, session_idx, ts, event_type, t_signup,
           min(CASE WHEN event_type = 'view' AND ts >= t_signup
                    THEN ts END)
               OVER (PARTITION BY user_id, session_idx) AS t_view
    FROM s1
),
sess AS (
    SELECT user_id, session_idx,
           max(t_signup IS NOT NULL) AS has_signup,
           max(t_view IS NOT NULL) AS has_view,
           max(CASE WHEN event_type = 'purchase' AND ts >= t_view
                    THEN TRUE ELSE FALSE END) AS has_purchase
    FROM s2 GROUP BY user_id, session_idx
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN has_signup THEN 1 ELSE 0 END) AS BIGINT)
           AS n_signup,
       CAST(sum(CASE WHEN has_signup AND has_view THEN 1 ELSE 0 END)
            AS BIGINT) AS n_signup_view,
       CAST(sum(CASE WHEN has_signup AND has_view AND has_purchase
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel,
       round(sum(CASE WHEN has_signup AND has_view AND has_purchase
                      THEN 1 ELSE 0 END) * 1.0
             / nullif(sum(CASE WHEN has_signup THEN 1 ELSE 0 END), 0), 4)
           AS signup_to_purchase_rate
FROM sess
""",
)
def session_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered in-session conversion funnel: within each 30-min-gap
    session, signup → view (at-or-after the first signup) → purchase
    (at-or-after that view), counted as progressively-qualified session
    totals plus the end-to-end rate. Step order is enforced by
    timestamp, not mere presence — the distinction that separates a
    funnel from a bag-of-events count.

    Plan shape: the gap sessionizer and BOTH step windows partition by
    user_id(+session_idx), so Spark reuses one hash-shuffle on user_id
    for the lag, the running sum, and the two step-time windows; the
    per-session reduce and final 1-row rollup are map-side combinable.
    At 100 TB this is one shuffle of the event log — step windows add
    sort passes, never extra exchanges."""
    from parcel_analytics_etl_notebook_spark.operators.sessionize import (
        sessionize,
    )

    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    s = sessionize(ev, key="user_id", ts_col="ts", gap_seconds=1800)
    ws = Window.partitionBy("user_id", "session_idx")
    s1 = s.withColumn(
        "t_signup",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(ws),
    )
    s2 = s1.withColumn(
        "t_view",
        F.min(
            F.when(
                (F.col("event_type") == "view")
                & (F.col("ts") >= F.col("t_signup")),
                F.col("ts"),
            )
        ).over(ws),
    )
    sess = s2.groupBy("user_id", "session_idx").agg(
        F.max(F.col("t_signup").isNotNull()).alias("has_signup"),
        F.max(F.col("t_view").isNotNull()).alias("has_view"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("t_view")),
                F.lit(True),
            ).otherwise(F.lit(False))
        ).alias("has_purchase"),
    )
    full = F.col("has_signup") & F.col("has_view") & F.col("has_purchase")
    return sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.col("has_signup").cast("int")).cast("bigint").alias(
            "n_signup"
        ),
        F.sum((F.col("has_signup") & F.col("has_view")).cast("int"))
        .cast("bigint")
        .alias("n_signup_view"),
        F.sum(full.cast("int")).cast("bigint").alias("n_full_funnel"),
        F.round(
            F.sum(full.cast("int"))
            / F.nullif(F.sum(F.col("has_signup").cast("int")), F.lit(0)),
            4,
        ).alias("signup_to_purchase_rate"),
    )


@register(
    "golden_record_merge",
    oracle="""
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                  event_type, value FROM events),
filled AS (
    SELECT user_id, ts, event_id,
           last_value(CASE WHEN event_type = 'click' THEN value END
                      IGNORE NULLS) OVER w AS last_click_value,
           last_value(CASE WHEN event_type = 'view' THEN value END
                      IGNORE NULLS) OVER w AS last_view_value,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS) OVER w AS last_purchase_value,
           count(*) OVER (PARTITION BY user_id) AS n_events,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING)
)
SELECT user_id,
       round(last_click_value, 4) AS last_click_value,
       round(last_view_value, 4) AS last_view_value,
       round(last_purchase_value, 4) AS last_purchase_value,
       ts AS last_ts,
       CAST(n_events AS BIGINT) AS n_events
FROM filled WHERE rn = 1
ORDER BY user_id
""",
)
def golden_record_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge (golden record): one row per entity carrying
    the most recent NON-NULL observation of each attribute — here the
    latest click/view/purchase value per user, null only if the user
    never produced that event type. The master-data-management merge
    rule ("latest known value wins, absence doesn't erase"), expressed
    as ignore-nulls last_value windows over the (ts, event_id)-ordered
    history.

    All three attribute windows and the top-1 row pick share the
    user_id partitioning — one shuffle total; the full-frame
    last_value is computed in the same sort pass as the row_number.
    This windowed form (rather than per-attribute max_by aggregates)
    keeps the whole merge in one operator family whose tie behavior
    (event_id tiebreak) is identical across engines."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wc = Window.partitionBy("user_id")
    wr = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def last_of(tp: str):
        return F.last(
            F.when(F.col("event_type") == tp, F.col("value")),
            ignorenulls=True,
        ).over(w)

    return (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            last_of("click").alias("__c"),
            last_of("view").alias("__v"),
            last_of("purchase").alias("__p"),
            F.count(F.lit(1)).over(wc).alias("n_events"),
            F.row_number().over(wr).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.round("__c", 4).alias("last_click_value"),
            F.round("__v", 4).alias("last_view_value"),
            F.round("__p", 4).alias("last_purchase_value"),
            F.col("ts").alias("last_ts"),
            F.col("n_events").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id")
    )
