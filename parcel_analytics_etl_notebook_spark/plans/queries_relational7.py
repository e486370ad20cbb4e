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


@register(
    "pointintime_priority_join",
    oracle="""
WITH ord AS (
    SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
           CASE WHEN lag(o_orderpriority) OVER w
                     IS DISTINCT FROM o_orderpriority
                THEN 1 ELSE 0 END AS chg
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
isl AS (
    SELECT *, sum(chg) OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey
                             ROWS UNBOUNDED PRECEDING) AS island
    FROM ord
),
iv AS (
    SELECT o_custkey, island, min(o_orderpriority) AS regime,
           min(o_orderdate) AS valid_from
    FROM isl GROUP BY o_custkey, island
),
iv2 AS (
    SELECT o_custkey, regime, valid_from,
           lead(valid_from) OVER (PARTITION BY o_custkey
                                  ORDER BY valid_from, island) AS valid_to
    FROM iv
),
lines AS (
    SELECT l.l_shipdate, o.o_custkey, o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT iv2.regime AS regime,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN lines.o_orderpriority <> iv2.regime
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_drifted
FROM lines JOIN iv2 ON lines.o_custkey = iv2.o_custkey
  AND lines.l_shipdate >= iv2.valid_from
  AND (iv2.valid_to IS NULL OR lines.l_shipdate < iv2.valid_to)
GROUP BY iv2.regime ORDER BY regime
""",
)
def pointintime_priority_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of-validity) dimension join — the feature-store
    correctness primitive: each lineitem is joined to the customer's
    order-priority REGIME that was valid at SHIP time, where regimes
    are SCD2 islands derived from the order history (change detection →
    island → [valid_from, valid_to) interval). Because shipping lags
    ordering, a line can ship under a LATER regime than its own order's
    — n_drifted counts exactly those, the leakage a naive "join current
    value" computes wrong.

    Scale shape: the interval build is one window pass over orders
    (key-partitioned); the PIT join is an EQUI-join on the customer key
    with the interval predicate as a residual filter — per-key interval
    counts are bounded by change counts, so no explosion; for
    non-keyed interval joins use operators/rangejoin instead. The
    half-open [from, to) intervals guarantee each line matches exactly
    one regime (ship date >= its order date >= the key's first
    valid_from)."""
    o = table(spark, sf_dir, "orders")
    wk = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ord_ = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_orderpriority",
        F.when(
            ~F.lag("o_orderpriority")
            .over(wk)
            .eqNullSafe(F.col("o_orderpriority")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    isl = ord_.withColumn(
        "island",
        F.sum("chg").over(
            wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    iv = isl.groupBy("o_custkey", "island").agg(
        F.min("o_orderpriority").alias("regime"),
        F.min("o_orderdate").alias("valid_from"),
    )
    wl = Window.partitionBy("o_custkey").orderBy("valid_from", "island")
    iv2 = iv.withColumn("valid_to", F.lead("valid_from").over(wl)).select(
        F.col("o_custkey").alias("__ck"), "regime", "valid_from", "valid_to"
    )
    lines = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .join(
            o.select("o_orderkey", "o_custkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    pit = lines.join(
        iv2,
        (F.col("o_custkey") == F.col("__ck"))
        & (F.col("l_shipdate") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("l_shipdate") < F.col("valid_to"))),
    )
    return (
        pit.groupBy("regime")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                (F.col("o_orderpriority") != F.col("regime")).cast("int")
            )
            .cast("bigint")
            .alias("n_drifted"),
        )
        .orderBy("regime")
    )


@register(
    "table_profile_orders",
    oracle="""
WITH a AS (
    SELECT count(*) AS n_rows,
           count(*) - count(o_orderkey) AS nn1,
           count(DISTINCT o_orderkey) AS nd1,
           CAST(min(o_orderkey) AS VARCHAR) AS mn1,
           CAST(max(o_orderkey) AS VARCHAR) AS mx1,
           count(*) - count(o_custkey) AS nn2,
           count(DISTINCT o_custkey) AS nd2,
           CAST(min(o_custkey) AS VARCHAR) AS mn2,
           CAST(max(o_custkey) AS VARCHAR) AS mx2,
           count(*) - count(o_orderstatus) AS nn3,
           count(DISTINCT o_orderstatus) AS nd3,
           min(o_orderstatus) AS mn3,
           max(o_orderstatus) AS mx3,
           count(*) - count(o_totalprice) AS nn4,
           count(DISTINCT o_totalprice) AS nd4,
           CAST(round(min(o_totalprice), 2) AS VARCHAR) AS mn4,
           CAST(round(max(o_totalprice), 2) AS VARCHAR) AS mx4,
           count(*) - count(o_orderdate) AS nn5,
           count(DISTINCT o_orderdate) AS nd5,
           CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) AS mn5,
           CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) AS mx5,
           count(*) - count(o_orderpriority) AS nn6,
           count(DISTINCT o_orderpriority) AS nd6,
           min(o_orderpriority) AS mn6,
           max(o_orderpriority) AS mx6
    FROM orders
)
SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_nulls AS BIGINT) AS n_nulls,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       min_value, max_value
FROM (
    SELECT 'o_orderkey' AS col_name, n_rows, nn1 AS n_nulls,
           nd1 AS n_distinct, mn1 AS min_value, mx1 AS max_value FROM a
    UNION ALL SELECT 'o_custkey', n_rows, nn2, nd2, mn2, mx2 FROM a
    UNION ALL SELECT 'o_orderstatus', n_rows, nn3, nd3, mn3, mx3 FROM a
    UNION ALL SELECT 'o_totalprice', n_rows, nn4, nd4, mn4, mx4 FROM a
    UNION ALL SELECT 'o_orderdate', n_rows, nn5, nd5, mn5, mx5 FROM a
    UNION ALL SELECT 'o_orderpriority', n_rows, nn6, nd6, mn6, mx6 FROM a
) u ORDER BY col_name
""",
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profiler: per-column null count, exact distinct
    count, and stringified min/max for every orders column, stacked
    long-format — the generalization of the reference's run_dq_checks
    (``/root/reference/etl/main.py:21-65``, which issued 1 + 3
    separate count() actions per checkpoint) into ONE aggregate whose
    24 metrics share a single scan; the 1-row-to-6-rows unpivot is
    driver-free. At 100 TB swap the exact count_distincts for
    approx_count_distinct and this stays a one-scan profile."""
    o = table(spark, sf_dir, "orders")
    # min/max aggregate in the column's NATIVE type (string-casting
    # before the aggregate would compare lexicographically: '999' >
    # '1499'); rendering to string happens after, per type
    renderers = {
        "o_orderkey": "CAST({0} AS STRING)",
        "o_custkey": "CAST({0} AS STRING)",
        "o_orderstatus": "{0}",
        "o_totalprice": "CAST(round({0}, 2) AS STRING)",
        "o_orderdate": "CAST(to_date({0}) AS STRING)",
        "o_orderpriority": "{0}",
    }
    cols = list(renderers)
    # Two split passes instead of one agg with 6 count_distincts: the
    # fused form plans an Expand (7× row multiplication — one replica
    # per distinct-aggregate grouping set) feeding THREE SortAggregate
    # phases. Split, each side stays hash-friendly: (a) the no-distinct
    # profile is one scan with partial aggregation; (b) distinct counts
    # unpivot to (col_name, raw-value string) — injective per type:
    # Spark renders doubles shortest-roundtrip — and run two hash
    # aggregates with map-side partials. Same single-scan-per-pass
    # shape at 100 TB, minus the 7× intermediate.
    a = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            x
            for cname in renderers
            for x in [
                F.sum(F.col(cname).isNull().cast("long")).alias(
                    f"__nn_{cname}"
                ),
                F.min(cname).alias(f"__mn_{cname}"),
                F.max(cname).alias(f"__mx_{cname}"),
            ]
        ],
    )
    # injective rendering per type: for float/double add 0.0 first so
    # -0.0 collapses onto 0.0 ('-0.0' vs '0.0' would otherwise count as
    # two where count_distinct normalizes them to one; NaN needs no
    # help — every NaN renders as the single string 'NaN', matching
    # count_distinct's all-NaNs-equal rule). Other types render
    # shortest-roundtrip, injective as-is.
    dtypes = dict(o.dtypes)
    unpivot_args = ", ".join(
        f"'{c}', CAST(({c} + 0.0) AS STRING)"
        if dtypes.get(c) in ("float", "double")
        else f"'{c}', CAST({c} AS STRING)"
        for c in cols
    )
    nd = (
        o.select(
            F.expr(
                f"stack({len(cols)}, {unpivot_args}) AS (col_name, val)"
            )
        )
        .filter(F.col("val").isNotNull())
        .groupBy("col_name", "val")
        .agg(F.lit(1))
        .groupBy("col_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_distinct"))
    )
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, "
        f"{r.format(f'__mn_{c}')}, {r.format(f'__mx_{c}')}"
        for c, r in renderers.items()
    )
    base = a.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nulls, min_value, max_value)"
        ),
        "n_rows",
    )
    return base.join(F.broadcast(nd), "col_name", "left").select(
        "col_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        # left join + 0: an all-NULL column has no distinct-count row
        F.coalesce("n_distinct", F.lit(0)).cast("bigint").alias(
            "n_distinct"
        ),
        "min_value",
        "max_value",
    ).orderBy("col_name")


@register(
    "referential_integrity_audit",
    oracle="""
WITH li AS (
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS orphans_orders,
           CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS orphans_part,
           CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS orphans_supplier
    FROM lineitem l
    LEFT JOIN orders o   ON l.l_orderkey = o.o_orderkey
    LEFT JOIN part p     ON l.l_partkey = p.p_partkey
    LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
),
oc AS (
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS orphans
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT rel, n_rows, n_orphans FROM (
    SELECT 'lineitem->orders' AS rel, n_rows, orphans_orders AS n_orphans
    FROM li
    UNION ALL SELECT 'lineitem->part', n_rows, orphans_part FROM li
    UNION ALL SELECT 'lineitem->supplier', n_rows, orphans_supplier FROM li
    UNION ALL SELECT 'orders->customer', n_rows, orphans FROM oc
) u ORDER BY rel
""",
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan-row counts for every FK edge
    of the star, computed as null-probe counts over LEFT joins — all
    three lineitem edges share ONE scan: the true dims (part, supplier)
    broadcast and pipeline for free, while the orders key probe is the
    one shuffle join (orders is fact-scale; broadcasting it would be
    the 100 TB OOM). Plus one orders→customer pass with customer
    broadcast. This is the warehouse-grade generalization
    of the reference's per-column null checks — it audits the JOINS
    the fact table claims, the thing that silently broke in the
    reference's uuid()-keyed warehouse (SURVEY §4.3). A zero result is
    the assertion; any nonzero count names the broken edge."""
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    li = (
        # orders is FACT-scale — its key probe must stay a shuffle join
        # (forcing a broadcast here is the 100 TB OOM); only the true
        # dims (part, supplier, customer) broadcast
        l.join(o.select("o_orderkey"),
               l.l_orderkey == F.col("o_orderkey"), "left")
        .join(F.broadcast(p.select("p_partkey")),
              l.l_partkey == F.col("p_partkey"), "left")
        .join(F.broadcast(s.select("s_suppkey")),
              l.l_suppkey == F.col("s_suppkey"), "left")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_orderkey").isNull().cast("long")).alias("__o"),
            F.sum(F.col("p_partkey").isNull().cast("long")).alias("__p"),
            F.sum(F.col("s_suppkey").isNull().cast("long")).alias("__s"),
        )
    )
    oc = (
        o.join(F.broadcast(c.select("c_custkey")),
               o.o_custkey == F.col("c_custkey"), "left")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("c_custkey").isNull().cast("long")).alias("__c"),
        )
    )
    li_rows = li.select(
        F.expr(
            "stack(3, 'lineitem->orders', __o, 'lineitem->part', __p, "
            "'lineitem->supplier', __s) AS (rel, n_orphans)"
        ),
        "n_rows",
    )
    oc_rows = oc.select(
        F.lit("orders->customer").alias("rel"),
        F.col("__c").alias("n_orphans"),
        "n_rows",
    )
    return (
        li_rows.unionByName(oc_rows)
        .select(
            "rel",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_orphans").cast("bigint").alias("n_orphans"),
        )
        .orderBy("rel")
    )


@register(
    "lateral_top_orders",
    oracle="""
SELECT c.c_custkey, t.o_orderkey,
       round(t.o_totalprice, 2) AS o_totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
WHERE c.c_mktsegment = 'BUILDING'
ORDER BY c.c_custkey, o_totalprice DESC, t.o_orderkey
""",
)
def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (Spark 4 SQL surface): each
    BUILDING-segment customer paired with their top-2 orders by value —
    the per-row-subquery formulation of grouped top-k, same answer as
    the row_number window (top_orders_per_customer) by construction.
    Catalyst decorrelates the LATERAL ORDER BY LIMIT into a join +
    per-key limit rather than re-running the subquery per customer;
    deterministic via the o_orderkey tiebreak inside the LIMIT."""
    table(spark, sf_dir, "customer").createOrReplaceTempView(
        "__lat_customer"
    )
    table(spark, sf_dir, "orders").createOrReplaceTempView("__lat_orders")
    return spark.sql(
        """
SELECT c.c_custkey, t.o_orderkey,
       round(t.o_totalprice, 2) AS o_totalprice
FROM __lat_customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM __lat_orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
WHERE c.c_mktsegment = 'BUILDING'
ORDER BY c.c_custkey, o_totalprice DESC, t.o_orderkey
"""
    )


@register(
    "status_flow_bag_diff",
    oracle="""
WITH early AS (SELECT o_custkey, o_orderstatus FROM orders
               WHERE o_orderdate < TIMESTAMP '1998-01-01'),
late AS (SELECT o_custkey, o_orderstatus FROM orders
         WHERE o_orderdate >= TIMESTAMP '1998-01-01')
SELECT
    CAST((SELECT count(*) FROM
          (SELECT * FROM early INTERSECT ALL SELECT * FROM late) x)
         AS BIGINT) AS retained_pairs,
    CAST((SELECT count(*) FROM
          (SELECT * FROM early EXCEPT ALL SELECT * FROM late) x)
         AS BIGINT) AS lost_pairs,
    CAST((SELECT count(*) FROM
          (SELECT * FROM late EXCEPT ALL SELECT * FROM early) x)
         AS BIGINT) AS gained_pairs
""",
)
def status_flow_bag_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL):
    multiset overlap and both one-sided differences of (customer,
    status) occurrences between the pre- and post-1998 order books.
    ALL-variants keep duplicate cardinality — retained+lost equals the
    early count exactly, an identity DISTINCT set ops break. Spark
    plans these as aggregate + generate (count-min replication), one
    shuffle each, no join explosion."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("__bag_orders")
    return spark.sql(
        """
WITH early AS (SELECT o_custkey, o_orderstatus FROM __bag_orders
               WHERE o_orderdate < TIMESTAMP '1998-01-01'),
late AS (SELECT o_custkey, o_orderstatus FROM __bag_orders
         WHERE o_orderdate >= TIMESTAMP '1998-01-01')
SELECT
    CAST((SELECT count(*) FROM
          (SELECT * FROM early INTERSECT ALL SELECT * FROM late) x)
         AS BIGINT) AS retained_pairs,
    CAST((SELECT count(*) FROM
          (SELECT * FROM early EXCEPT ALL SELECT * FROM late) x)
         AS BIGINT) AS lost_pairs,
    CAST((SELECT count(*) FROM
          (SELECT * FROM late EXCEPT ALL SELECT * FROM early) x)
         AS BIGINT) AS gained_pairs
"""
    )


@register(
    "winsorized_value_stats",
    oracle="""
WITH v AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
p AS (
    SELECT event_type,
           quantile_cont(value, 0.05) AS p05,
           quantile_cont(value, 0.95) AS p95
    FROM v GROUP BY event_type
)
SELECT v.event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(v.value), 4) AS mean_raw,
       round(avg(least(greatest(v.value, p.p05), p.p95)), 4)
           AS mean_winsorized,
       round(stddev_samp(v.value), 4) AS std_raw,
       round(stddev_samp(least(greatest(v.value, p.p05), p.p95)), 4)
           AS std_winsorized
FROM v JOIN p ON v.event_type = p.event_type
GROUP BY v.event_type ORDER BY v.event_type
""",
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clipping at per-group p05/p95) with
    before/after moments — the standard robust-preprocessing step for
    heavy-tailed metrics, shown as evidence of HOW MUCH the tails move
    the estimate. Exact interpolated percentiles (Spark percentile ≡
    quantile_cont); at 100 TB swap for approx_percentile and the shape
    is unchanged: one percentile aggregate per group, broadcast of the
    |groups|-row bounds back onto the stream, one moments aggregate."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    p = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        ev.join(F.broadcast(p), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("mean_raw"),
            F.round(F.avg(clipped), 4).alias("mean_winsorized"),
            F.round(F.stddev_samp("value"), 4).alias("std_raw"),
            F.round(F.stddev_samp(clipped), 4).alias("std_winsorized"),
        )
        .orderBy("event_type")
    )


@register(
    "orders_keyset_page",
    oracle="""
SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
           AS o_orderdate, o_orderstatus,
       round(o_totalprice, 2) AS o_totalprice
FROM orders
WHERE CAST(o_orderdate AS DATE) > DATE '1995-06-15'
   OR (CAST(o_orderdate AS DATE) = DATE '1995-06-15'
       AND o_orderkey > 3200)
ORDER BY CAST(o_orderdate AS DATE), o_orderkey
LIMIT 100
""",
)
def orders_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (cursor) pagination: the page AFTER cursor
    (1995-06-15, order 3200) under the total order
    (o_orderdate, o_orderkey). The export-at-scale pattern: the cursor
    predicate pushes into the parquet scan so each page reads
    O(page + boundary), where OFFSET pagination re-scans and re-sorts
    everything before the page — O(skip) per page, quadratic over a
    full export. The composite predicate's date leg is scan-prunable
    (min/max stats skip whole files once the table is date-sorted);
    TakeOrderedAndProject keeps the page sort per-partition."""
    o = table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    cursor_d, cursor_k = F.lit("1995-06-15").cast("date"), F.lit(3200)
    return (
        o.filter((d > cursor_d) | ((d == cursor_d) & (F.col("o_orderkey") > cursor_k)))
        .select(
            "o_orderkey",
            d.cast("string").alias("o_orderdate"),
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy(F.to_date("o_orderdate"), "o_orderkey")
        .limit(100)
    )


@register(
    "linear_attribution",
    oracle="""
WITH p AS (
    SELECT event_id AS purchase_id, user_id,
           CAST(ts AS TIMESTAMP) AS pts, value
    FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
),
t AS (
    SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS tts
    FROM events WHERE event_type IN ('click', 'view')
),
touched AS (
    SELECT p.purchase_id, p.value, t.event_type
    FROM p JOIN t ON p.user_id = t.user_id
      AND t.tts < p.pts
      AND t.tts >= p.pts - INTERVAL 7 DAY
),
counted AS (
    SELECT purchase_id, value, event_type,
           count(*) OVER (PARTITION BY purchase_id) AS n_touches
    FROM touched
),
attributed AS (
    SELECT event_type, sum(value / n_touches) AS credit,
           count(*) AS touches
    FROM counted GROUP BY event_type
),
unmatched AS (
    SELECT 'unattributed' AS event_type,
           sum(p.value) AS credit, 0 AS touches
    FROM p LEFT JOIN (SELECT DISTINCT purchase_id FROM touched) x
      ON p.purchase_id = x.purchase_id
    WHERE x.purchase_id IS NULL
)
SELECT event_type, round(credit, 4) AS credit,
       CAST(touches AS BIGINT) AS n_touches
FROM (SELECT * FROM attributed UNION ALL
      SELECT * FROM unmatched WHERE credit IS NOT NULL)
ORDER BY event_type
""",
)
def linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch LINEAR attribution: each purchase's value splits
    equally across the user's click/view touches in the preceding 7
    days; purchases with no in-window touch report as 'unattributed'
    (their mass is conserved, not dropped — the books must balance).
    Complements last-touch click_attribution: same touch data, the
    other standard credit model.

    Scale shape: the purchase↔touch join is EQUI on user_id with the
    7-day window as a residual — per-user touch counts bound the
    fan-out (the same containment every attribution system relies on);
    the per-purchase touch count shares the join's output partitioning
    via one purchase-keyed window; credit aggregation is
    map-side-combinable over |event types| groups."""
    ev = table(spark, sf_dir, "events")
    p = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("pts"),
        "value",
    )
    t = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("tuser"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("tts"),
    )
    touched = p.join(
        t,
        (F.col("user_id") == F.col("tuser"))
        & (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 7 DAY")),
    )
    counted = touched.withColumn(
        "n_touches",
        F.count(F.lit(1)).over(Window.partitionBy("purchase_id")),
    )
    attributed = counted.groupBy("touch_type").agg(
        F.sum(F.col("value") / F.col("n_touches")).alias("credit"),
        F.count(F.lit(1)).alias("touches"),
    )
    unmatched = (
        p.join(
            touched.select("purchase_id").distinct(),
            "purchase_id",
            "left_anti",
        )
        .agg(F.sum("value").alias("credit"))
        .select(
            F.lit("unattributed").alias("touch_type"),
            "credit",
            F.lit(0).alias("touches"),
        )
        .filter(F.col("credit").isNotNull())
    )
    return (
        attributed.unionByName(unmatched)
        .select(
            F.col("touch_type").alias("event_type"),
            F.round("credit", 4).alias("credit"),
            F.col("touches").cast("bigint").alias("n_touches"),
        )
        .orderBy("event_type")
    )


@register(
    "u_shaped_attribution",
    oracle="""
WITH p AS (
    SELECT event_id AS purchase_id, user_id,
           CAST(ts AS TIMESTAMP) AS pts, value
    FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
),
t AS (
    SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS tts
    FROM events WHERE event_type IN ('click', 'view')
),
touched AS (
    SELECT p.purchase_id, p.value, t.event_type, t.tts, t.event_id
    FROM p JOIN t ON p.user_id = t.user_id
      AND t.tts < p.pts AND t.tts >= p.pts - INTERVAL 7 DAY
),
ranked AS (
    SELECT purchase_id, value, event_type,
           row_number() OVER w AS pos,
           count(*) OVER (PARTITION BY purchase_id) AS n
    FROM touched
    WINDOW w AS (PARTITION BY purchase_id ORDER BY tts, event_id)
),
weighted AS (
    SELECT event_type, value,
           CASE WHEN n = 1 THEN 1.0
                WHEN n = 2 THEN 0.5
                WHEN pos = 1 THEN 0.4
                WHEN pos = n THEN 0.4
                ELSE 0.2 / (n - 2) END AS w
    FROM ranked
)
SELECT event_type, round(sum(value * w), 4) AS credit,
       CAST(count(*) AS BIGINT) AS n_touches
FROM weighted GROUP BY event_type ORDER BY event_type
""",
)
def u_shaped_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) attribution: 40% of each purchase's
    value to the FIRST in-window touch, 40% to the LAST, the remaining
    20% split across the middle touches (single touch takes 100%, a
    pair splits 50/50) — credit per purchase always sums to its value,
    the same conservation the linear model keeps. Touch order is the
    deterministic (ts, event_id) tiebreak.

    Scale shape identical to linear_attribution: one user-key equi-join
    with the window residual, then the position/count windows ride the
    purchase_id partitioning the join produced — no second shuffle of
    the touch stream."""
    ev = table(spark, sf_dir, "events")
    p = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
        "value",
    )
    t = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("tuser"),
        F.col("event_type").alias("touch_type"),
        F.col("event_id").alias("tid"),
        F.col("ts").alias("tts"),
    )
    touched = p.join(
        t,
        (F.col("user_id") == F.col("tuser"))
        & (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 7 DAY")),
    )
    wp = Window.partitionBy("purchase_id").orderBy("tts", "tid")
    wc = Window.partitionBy("purchase_id")
    ranked = touched.select(
        "touch_type",
        "value",
        F.row_number().over(wp).alias("pos"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    w = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when(F.col("pos") == 1, F.lit(0.4))
        .when(F.col("pos") == F.col("n"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    return (
        ranked.groupBy(F.col("touch_type").alias("event_type"))
        .agg(
            F.round(F.sum(F.col("value") * w), 4).alias("credit"),
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        )
        .orderBy("event_type")
    )


@register(
    "join_fanout_audit",
    oracle="""
WITH c AS (
    SELECT 'customer.c_custkey' AS edge, count(*) AS n
    FROM customer GROUP BY c_custkey
),
o AS (
    SELECT 'orders.o_orderkey' AS edge, count(*) AS n
    FROM orders GROUP BY o_orderkey
),
l AS (
    SELECT 'lineitem.l_orderkey' AS edge, count(*) AS n
    FROM lineitem GROUP BY l_orderkey
),
u AS (SELECT * FROM c UNION ALL SELECT * FROM o UNION ALL SELECT * FROM l)
SELECT edge,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(n) AS BIGINT) AS max_fanout,
       round(avg(n), 4) AS avg_fanout,
       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_duplicated_keys
FROM u GROUP BY edge ORDER BY edge
""",
)
def join_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality audit: per join-key column, the key count, max
    and mean rows per key, and how many keys are duplicated — the check
    that catches an accidental many-to-many BEFORE a fact join explodes
    (a 'unique' key with max_fanout 2 silently doubles every joined
    metric; at 100 TB that's discovered in the bill, not the review).
    Dimension keys (customer, orders) must show max_fanout 1; the
    lineitem→orders edge is legitimately 1-to-many and its fan-out
    distribution is exactly what sizes that join's shuffle.

    Shape: one count aggregate per audited column (map-side
    combinable), unioned into a 3-row report — each table is scanned
    once, key column only."""
    def edge(df, col, name):
        return (
            df.groupBy(F.col(col)).agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(name).alias("edge"), "n")
        )

    u = (
        edge(table(spark, sf_dir, "customer"), "c_custkey", "customer.c_custkey")
        .unionByName(edge(table(spark, sf_dir, "orders"), "o_orderkey", "orders.o_orderkey"))
        .unionByName(edge(table(spark, sf_dir, "lineitem"), "l_orderkey", "lineitem.l_orderkey"))
    )
    return (
        u.groupBy("edge")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.max("n").cast("bigint").alias("max_fanout"),
            F.round(F.avg("n"), 4).alias("avg_fanout"),
            F.sum((F.col("n") > 1).cast("int")).cast("bigint").alias(
                "n_duplicated_keys"
            ),
        )
        .orderBy("edge")
    )
