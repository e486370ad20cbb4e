"""Relational query catalog (SURVEY §2.2-2.8 operator coverage).

Each query generalizes a reference operator onto the driver's TPC-H-ish
tables; docstrings cite the reference use it mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.keys import (
    surrogate_key,
    surrogate_key_sql,
)
from parcel_analytics_etl_notebook_spark.operators.aggregates import (
    conditional_min_pivot,
    dq_summary,
)
from parcel_analytics_etl_notebook_spark.operators.dedup import dedup_first_row
from parcel_analytics_etl_notebook_spark.operators.topk import top_k_per_group
from parcel_analytics_etl_notebook_spark.plans.catalog import register, table


# --------------------------------------------------------------------------
# Flagship: event-lifecycle KPIs (reference report.ipynb cell 8 — filter →
# CASE label → conditional-min pivot → datediff → global avg+countDistinct)
# --------------------------------------------------------------------------
@register(
    "lifecycle_kpis",
    oracle="""
WITH labeled AS (
    SELECT user_id, ts,
           CASE WHEN event_type = 'signup'   THEN 'SIGNUP'
                WHEN event_type = 'view'     THEN 'VIEW'
                WHEN event_type = 'purchase' THEN 'PURCHASE' END AS stage
    FROM events
    WHERE event_type IN ('signup', 'view', 'purchase')
), pivoted AS (
    SELECT user_id,
           min(CASE WHEN stage = 'SIGNUP'   THEN ts END) AS signup_ts,
           min(CASE WHEN stage = 'VIEW'     THEN ts END) AS first_view_ts,
           min(CASE WHEN stage = 'PURCHASE' THEN ts END) AS first_purchase_ts
    FROM labeled
    GROUP BY user_id
), durations AS (
    SELECT user_id,
           datediff('day', CAST(signup_ts AS DATE), CAST(first_view_ts AS DATE))     AS days_to_view,
           datediff('day', CAST(signup_ts AS DATE), CAST(first_purchase_ts AS DATE)) AS days_to_purchase,
           datediff('day', CAST(first_view_ts AS DATE), CAST(first_purchase_ts AS DATE)) AS view_to_purchase
    FROM pivoted
)
SELECT round(avg(days_to_view), 4)     AS avg_days_to_view,
       round(avg(days_to_purchase), 4) AS avg_days_to_purchase,
       round(avg(view_to_purchase), 4) AS avg_view_to_purchase,
       count(DISTINCT user_id)         AS total_users
FROM durations
""",
)
def lifecycle_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query: avg days signup→first-view / signup→first-purchase /
    view→purchase + distinct users. Mirrors the reference KPI chain
    (``report.ipynb`` cell 8:2-31): P5 isin filter, P6 CASE label, A4
    conditional-min pivot, F5 datediff, A5/A6 global multi-agg.
    Scale shape: one shuffle (groupBy user_id), then a scalar agg."""
    events = table(spark, sf_dir, "events")
    labeled = events.filter(
        F.col("event_type").isin("signup", "view", "purchase")
    ).withColumn(
        "stage",
        F.when(F.col("event_type") == "signup", "SIGNUP")
        .when(F.col("event_type") == "view", "VIEW")
        .when(F.col("event_type") == "purchase", "PURCHASE"),
    )
    pivoted = conditional_min_pivot(
        labeled,
        group_key="user_id",
        label_col="stage",
        value_col="ts",
        labels={
            "SIGNUP": "signup_ts",
            "VIEW": "first_view_ts",
            "PURCHASE": "first_purchase_ts",
        },
    )
    durations = (
        pivoted.withColumn(
            "days_to_view",
            F.datediff(F.col("first_view_ts"), F.col("signup_ts")).cast("bigint"),
        )
        .withColumn(
            "days_to_purchase",
            F.datediff(F.col("first_purchase_ts"), F.col("signup_ts")).cast("bigint"),
        )
        .withColumn(
            "view_to_purchase",
            F.datediff(F.col("first_purchase_ts"), F.col("first_view_ts")).cast("bigint"),
        )
    )
    return durations.agg(
        F.round(F.avg("days_to_view"), 4).alias("avg_days_to_view"),
        F.round(F.avg("days_to_purchase"), 4).alias("avg_days_to_purchase"),
        F.round(F.avg("view_to_purchase"), 4).alias("avg_view_to_purchase"),
        F.count_distinct(F.col("user_id")).alias("total_users"),
    )


# --------------------------------------------------------------------------
# Hash aggregation with multiple measures (A5/A8 generalized; TPC-H Q1 shape)
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                    AS sum_qty,
       round(sum(l_extendedprice), 2)                               AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
       round(avg(l_quantity), 4)                                    AS avg_qty,
       round(avg(l_extendedprice), 4)                               AS avg_price,
       round(avg(l_discount), 4)                                    AS avg_disc,
       count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: pushed-down timestamp filter →
    hash agg with map-side partials (generalizes reference A5 multi-agg).
    The shipdate predicate reaches the parquet scan (PushedFilters)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Left join + aggregate (J5/J7 generalized)
# --------------------------------------------------------------------------
@register(
    "market_segment_stats",
    oracle="""
SELECT c_mktsegment AS segment,
       count(*)                        AS order_count,
       round(sum(o_totalprice), 2)     AS total_revenue,
       round(avg(o_totalprice), 4)     AS avg_order_value,
       count(DISTINCT o_custkey)       AS customer_count
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def market_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-preserving left join (reference J5/J7) then hash agg. At
    scale the dim side is the smaller relation; AQE picks broadcast-hash
    when it fits ``autoBroadcastJoinThreshold``, else sort-merge."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_order_value"),
            F.count_distinct(F.col("o_custkey")).alias("customer_count"),
        )
    )


# --------------------------------------------------------------------------
# Anti / semi joins (SURVEY §2.3 "not present in reference" completions)
# --------------------------------------------------------------------------
@register(
    "customers_without_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders. Anti join only needs
    the key column from the build side → minimal shuffle payload."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "nations_with_customers",
    oracle="""
SELECT n_nationkey, n_name
FROM nation
WHERE EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
""",
)
def nations_with_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: nations having at least one customer."""
    nation = table(spark, sf_dir, "nation")
    customer = table(spark, sf_dir, "customer").select("c_nationkey")
    return nation.join(
        customer, nation.n_nationkey == customer.c_nationkey, "left_semi"
    ).select("n_nationkey", "n_name")


# --------------------------------------------------------------------------
# Window top-k per group (SURVEY §2.5 gap — deterministic dedup/rank family)
# --------------------------------------------------------------------------
@register(
    "top_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
       CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rnk
    FROM orders
) WHERE rnk <= 3
""",
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number with a unique tiebreak
    (o_orderkey) — the deterministic form of the reference's
    first-row-wins dropDuplicates (A3, ``etl/main.py:245``)."""
    orders = table(spark, sf_dir, "orders")
    out = top_k_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        group_keys=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.col("rnk").cast("bigint").alias("rnk"),
    )


# --------------------------------------------------------------------------
# Keyed deterministic dedup (A3 rebuilt per SURVEY §4.3)
# --------------------------------------------------------------------------
@register(
    "first_lineitem_per_order",
    oracle="""
SELECT l_orderkey, l_partkey, l_suppkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       round(l_quantity, 2) AS l_quantity
FROM lineitem
QUALIFY row_number() OVER (PARTITION BY l_orderkey
                           ORDER BY l_linenumber, l_partkey, l_suppkey) = 1
""",
)
def first_lineitem_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keyed dedup: exactly one lineitem per order, lowest
    line number wins (replaces nondeterministic dropDuplicates([key])).
    The synthetic lineitem has duplicate (orderkey, linenumber) pairs, so
    the tiebreak extends through (partkey, suppkey) — verified unique."""
    li = table(spark, sf_dir, "lineitem")
    out = dedup_first_row(
        li,
        keys=["l_orderkey"],
        order_by=[F.col("l_linenumber"), F.col("l_partkey"), F.col("l_suppkey")],
    )
    return out.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        F.round("l_quantity", 2).alias("l_quantity"),
    )


# --------------------------------------------------------------------------
# Date dimension (DimDate parity — etl/main.py:201-211)
# --------------------------------------------------------------------------
@register(
    "date_dim",
    oracle=f"""
WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS date FROM orders)
SELECT CAST(date AS VARCHAR) AS date,
       CAST(year(date) AS BIGINT)      AS year,
       CAST(month(date) AS BIGINT)     AS month,
       CAST(day(date) AS BIGINT)       AS day,
       CAST(quarter(date) AS BIGINT)   AS quarter,
       CAST(dayofweek(date) + 1 AS BIGINT) AS weekday,
       {surrogate_key_sql('date')}     AS date_id
FROM d
""",
)
def date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DimDate parity (``etl/main.py:201-211``): distinct calendar dates
    with derived attributes and a DETERMINISTIC sha2 surrogate key in
    place of the reference's per-action-fresh uuid() (SURVEY §4.3).
    Spark dayofweek is 1=Sunday..7; DuckDB's is 0-based, hence +1 in the
    oracle."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select(F.to_date("o_orderdate").alias("date"))
        .dropDuplicates()
        .select(
            # calendar date serialized yyyy-MM-dd: DATE-typed cells round-trip
            # differently through pandas in Spark vs DuckDB (date objects vs
            # midnight datetimes) and would flip the driver's value hash.
            F.col("date").cast("string").alias("date"),
            F.year("date").cast("bigint").alias("year"),
            F.month("date").cast("bigint").alias("month"),
            F.dayofmonth("date").cast("bigint").alias("day"),
            F.quarter("date").cast("bigint").alias("quarter"),
            F.dayofweek("date").cast("bigint").alias("weekday"),
            surrogate_key("date").alias("date_id"),
        )
    )


# --------------------------------------------------------------------------
# Role-playing dimension via tagged union (DimLocation parity — :175-189)
# --------------------------------------------------------------------------
@register(
    "role_location_dim",
    oracle=f"""
WITH locs AS (
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey, 'customer' AS role FROM customer
    UNION
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey, 'supplier' AS role FROM supplier
)
SELECT nationkey, n_name AS nation_name, role,
       {surrogate_key_sql('nationkey', 'role')} AS location_id
FROM locs JOIN nation ON nationkey = n_nationkey
""",
)
def role_location_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-playing dim: tagged union of two role projections + distinct
    + deterministic surrogate key (DimLocation pattern,
    ``etl/main.py:175-189``: collection/delivery → customer/supplier)."""
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    locs = (
        customer.select(
            F.col("c_nationkey").cast("bigint").alias("nationkey"),
            F.lit("customer").alias("role"),
        )
        .union(
            supplier.select(
                F.col("s_nationkey").cast("bigint").alias("nationkey"),
                F.lit("supplier").alias("role"),
            )
        )
        .dropDuplicates()
    )
    return locs.join(nation, locs.nationkey == nation.n_nationkey).select(
        "nationkey",
        F.col("n_name").alias("nation_name"),
        "role",
        surrogate_key("nationkey", "role").alias("location_id"),
    )


# --------------------------------------------------------------------------
# Single-pass DQ summary (replaces run_dq_checks — etl/main.py:21-65)
# --------------------------------------------------------------------------
@register(
    "dq_orders",
    oracle="""
SELECT count(*) AS row_count,
       CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS nulls_o_orderkey,
       CAST(coalesce(sum(CASE WHEN o_custkey  IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS nulls_o_custkey,
       CAST(coalesce(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS nulls_o_orderstatus
FROM orders
""",
)
def dq_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass DQ checkpoint: row count + null counts of the first 3
    columns in ONE aggregate job (the reference runs 1+3 separate
    actions per checkpoint, re-executing lineage each time — §4.3)."""
    o = table(spark, sf_dir, "orders")
    return dq_summary(o, o.columns[:3])


# --------------------------------------------------------------------------
# JSON extraction (F1 from_json parity — etl/main.py:128)
# --------------------------------------------------------------------------
@register(
    "json_props_stats",
    oracle="""
SELECT event_type,
       round(avg(k), 4) AS avg_k,
       min(k)           AS min_k,
       max(k)           AS max_k,
       count(*)         AS n
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
""",
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload extraction (reference F1 ``from_json`` on the event
    column, ``etl/main.py:128``): parse ``props`` JSON, aggregate the
    extracted field per event type."""
    events = table(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Star-schema fact build (DimShipping/Fact parity — etl/main.py:214-264)
# --------------------------------------------------------------------------
@register(
    "star_fact_orders",
    oracle=f"""
SELECT o_orderkey,
       round(o_totalprice, 2) AS o_totalprice,
       CASE WHEN EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
            THEN {surrogate_key_sql('o_custkey')} END AS customer_id,
       {surrogate_key_sql("CAST(CAST(o_orderdate AS DATE) AS VARCHAR)")} AS date_id
FROM orders
""",
)
def star_fact_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full star-schema fact build (reference E1 steps 6-8): build a
    customer dim + date dim with deterministic sha2 keys, then resolve
    FKs onto the orders fact via broadcast left joins. Unlike the
    reference's uuid() warehouse (SURVEY §4.3), fact FKs here are
    reproducible — the oracle recomputes them independently."""
    from parcel_analytics_etl_notebook_spark.plans.star import (
        DimSpec,
        build_date_dim,
        build_dim,
        resolve_fk,
    )

    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    dim_customer = build_dim(
        customer, DimSpec("customer", ["c_custkey"], ["c_name", "c_mktsegment"])
    )
    dim_date = build_date_dim(orders, "o_orderdate")
    fact = orders.withColumn("o_orderdate_day", F.to_date("o_orderdate"))
    fact = resolve_fk(
        fact,
        dim_customer.withColumnRenamed("c_custkey", "o_custkey"),
        on=["o_custkey"],
        dim_key="customer_id",
    )
    fact = resolve_fk(
        fact,
        dim_date.withColumnRenamed("date", "o_orderdate_day"),
        on=["o_orderdate_day"],
        dim_key="date_id",
    )
    return fact.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "customer_id",
        "date_id",
    )


# --------------------------------------------------------------------------
# Join on computed expression key (J1 — etl/main.py:215-217)
# --------------------------------------------------------------------------
@register(
    "expression_key_join",
    oracle=f"""
WITH client_dim AS (
    SELECT DISTINCT concat_ws('_', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS client_key
    FROM customer
    WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL
), keyed AS (
    SELECT client_key, {surrogate_key_sql('client_key')} AS client_id FROM client_dim
)
SELECT c_custkey,
       concat_ws('_', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS client_key,
       client_id
FROM customer LEFT JOIN keyed
  ON concat_ws('_', c_mktsegment, CAST(c_nationkey AS VARCHAR)) = client_key
""",
)
def expression_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join on a COMPUTED key expression (reference J1: probe-side
    ``concat_ws("_", brand, sign) == dim.client_key``,
    ``etl/main.py:215-217``). Catalyst still plans an equi-join — the
    expression is evaluated pre-shuffle on the probe side."""
    customer = table(spark, sf_dir, "customer")
    key_expr = F.concat_ws(
        "_", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
    )
    client_dim = (
        customer.filter(F.col("c_mktsegment").isNotNull() & F.col("c_nationkey").isNotNull())
        .select(key_expr.alias("client_key"))
        .dropDuplicates()
        .withColumn("client_id", surrogate_key("client_key"))
    )
    return customer.join(
        F.broadcast(client_dim), key_expr == client_dim.client_key, "left"
    ).select("c_custkey", key_expr.alias("client_key"), "client_id")


# --------------------------------------------------------------------------
# Range (banded non-equi) join — join-family completion per SURVEY §2.3
# --------------------------------------------------------------------------
@register(
    "value_band_stats",
    oracle="""
WITH bands(band, lo, hi) AS (
    VALUES ('low', 0.0, 50.0), ('mid', 50.0, 100.0), ('high', 100.0, 1000000.0)
)
SELECT band,
       count(*)              AS n_events,
       round(sum(value), 2)  AS total_value,
       round(avg(value), 4)  AS avg_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band
""",
)
def value_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: band events by value against a tiny interval table.
    Spark plans broadcast-nested-loop — correct here because the build
    side is 3 rows; for large interval tables use bucketized equi-join
    (floor(value/width)) instead, never an unbounded theta join.

    The probe side is projected to the one needed column BEFORE the
    join: Catalyst does not push column pruning through a nested-loop
    join, so without it every event column rides through the BNLJ
    (measured 4.5x slower at sf0.1)."""
    events = table(spark, sf_dir, "events").select("value")
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 100.0), ("high", 100.0, 1000000.0)],
        "band string, lo double, hi double",
    )
    return (
        events.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


# --------------------------------------------------------------------------
# As-of join (custom operator; oracle = DuckDB native ASOF JOIN)
# --------------------------------------------------------------------------
@register(
    "purchase_asof_view",
    oracle="""
WITH purchases AS (
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase'
), views AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'view'
)
SELECT p.event_id, p.user_id, p.ts,
       v.ts AS ts_asof,
       date_diff('second', v.ts, p.ts) AS gap_seconds
FROM purchases p ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND v.ts <= p.ts
""",
)
def purchase_asof_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the most recent view at-or-before
    it by the same user. Spark lacks ASOF JOIN; the engine's
    union-and-window operator does it with one shuffle (operators/
    asof.py). Oracle uses DuckDB's native ASOF LEFT JOIN."""
    from parcel_analytics_etl_notebook_spark.operators.asof import asof_join_backward

    events = table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = asof_join_backward(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts",
        right_values=[], suffix="_asof",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_asof"),
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_asof")).alias("gap_seconds"),
    )


# --------------------------------------------------------------------------
# Analytic windows: running totals, lag, moving average (SURVEY §2.5 gap)
# --------------------------------------------------------------------------
@register(
    "running_revenue",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER w_cum, 2)            AS cum_revenue,
       round(lag(o_totalprice) OVER w_ord, 2)            AS prev_price,
       round(avg(o_totalprice) OVER w_mov, 4)            AS moving_avg3
FROM orders
WINDOW w_ord AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       w_cum AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       w_mov AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window suite per customer: cumulative revenue, previous
    order price (lag), 3-row moving average — all on one window sort
    (single shuffle on o_custkey; Spark reuses the sort across frames)."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    order_spec = [F.col("o_orderdate"), F.col("o_orderkey")]
    w_ord = Window.partitionBy("o_custkey").orderBy(*order_spec)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_mov = w_ord.rowsBetween(-2, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w_cum), 2).alias("cum_revenue"),
        F.round(F.lag("o_totalprice").over(w_ord), 2).alias("prev_price"),
        F.round(F.avg("o_totalprice").over(w_mov), 4).alias("moving_avg3"),
    )


# --------------------------------------------------------------------------
# ROLLUP hierarchical aggregation (beyond-reference completion, §2.4)
# --------------------------------------------------------------------------
@register(
    "sales_rollup",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       o_orderstatus,
       count(*)                    AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY ROLLUP (CAST(year(o_orderdate) AS BIGINT), o_orderstatus)
""",
)
def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (year → status → grand total) in one pass — Spark expands
    grouping sets map-side; same single shuffle as a flat groupBy."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate").cast("bigint"))
        .rollup("order_year", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT (SURVEY §2.7 completions)
# --------------------------------------------------------------------------
@register(
    "nations_customers_and_suppliers",
    oracle="""
SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
INTERSECT
SELECT CAST(s_nationkey AS BIGINT) FROM supplier
""",
)
def nations_customers_and_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations present on both sides (distinct semantics)."""
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    return customer.select(
        F.col("c_nationkey").cast("bigint").alias("nationkey")
    ).intersect(supplier.select(F.col("s_nationkey").cast("bigint")))


@register(
    "nations_customers_only",
    oracle="""
SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
EXCEPT
SELECT CAST(s_nationkey AS BIGINT) FROM supplier
""",
)
def nations_customers_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: nations with customers but no suppliers."""
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    # subtract == EXCEPT DISTINCT (exceptAll would keep per-occurrence
    # multiplicity — different semantics than the SQL oracle)
    return customer.select(
        F.col("c_nationkey").cast("bigint").alias("nationkey")
    ).subtract(supplier.select(F.col("s_nationkey").cast("bigint")))
