"""Relational catalog, part 3: multi-level grouping (GROUPING SETS),
unpivot/melt, ntile banding, statistical aggregates, time-series gap
filling, forward-fill imputation (LOCF), map-typed columns, and argmax
(max_by) — the remaining general-analytics surface beyond parts 1/2.

Scale notes per query are inline; the common theme is that every one
is a single shuffle on its natural key (or none at all), and the only
driver-side data is tiny dimension spines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table


@register(
    "grouping_sets_revenue",
    oracle="""
SELECT CAST(GROUPING(o_orderstatus, order_year) AS BIGINT) AS gid,
       o_orderstatus,
       order_year,
       CAST(count(*) AS BIGINT) AS orders,
       round(sum(o_totalprice), 2) AS revenue
FROM (SELECT o_orderstatus,
             CAST(year(o_orderdate) AS BIGINT) AS order_year,
             o_totalprice
      FROM orders)
GROUP BY GROUPING SETS ((o_orderstatus, order_year), (o_orderstatus),
                        (order_year), ())
""",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping_id: order counts and revenue at four
    aggregation levels in ONE pass over orders (Spark expands the sets
    inside a single Expand+HashAggregate — no re-scan per level, unlike
    running four separate GROUP BYs).

    Scale: one shuffle; Expand multiplies rows 4x pre-combine but
    partial aggregation collapses them map-side, so the shuffled volume
    is ~#distinct(status, year) * 4, trivial at any SF.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        "o_totalprice",
    )
    return (
        orders.groupingSets(
            [
                [F.col("o_orderstatus"), F.col("order_year")],
                [F.col("o_orderstatus")],
                [F.col("order_year")],
                [],
            ],
            "o_orderstatus",
            "order_year",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select("gid", "o_orderstatus", "order_year", "orders", "revenue")
    )


@register(
    "brand_price_unpivot",
    oracle="""
WITH wide AS (
  SELECT p_brand,
         round(min(p_retailprice), 2) AS min_price,
         round(avg(p_retailprice), 2) AS avg_price,
         round(max(p_retailprice), 2) AS max_price
  FROM part GROUP BY p_brand
)
SELECT p_brand, 'min_price' AS metric, min_price AS price FROM wide
UNION ALL
SELECT p_brand, 'avg_price' AS metric, avg_price AS price FROM wide
UNION ALL
SELECT p_brand, 'max_price' AS metric, max_price AS price FROM wide
""",
)
def brand_price_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt: wide per-brand price stats -> long (brand,
    metric, price) rows via DataFrame.unpivot — the inverse of pivot,
    needed to feed wide aggregate tables into long-format consumers.

    Scale: the unpivot itself is a narrow Expand (no shuffle); the only
    shuffle is the groupBy(brand) producing the wide input, and #brands
    is tiny so the long output is 3 * #brands rows.
    """
    wide = (
        table(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(
            F.round(F.min("p_retailprice"), 2).alias("min_price"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
            F.round(F.max("p_retailprice"), 2).alias("max_price"),
        )
    )
    return wide.unpivot(
        ids=["p_brand"],
        values=["min_price", "avg_price", "max_price"],
        variableColumnName="metric",
        valueColumnName="price",
    )


@register(
    "customer_balance_quartiles",
    oracle="""
WITH banded AS (
  SELECT c_mktsegment, c_acctbal,
         CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                             ORDER BY c_acctbal, c_custkey) AS BIGINT)
           AS quartile
  FROM customer
)
SELECT c_mktsegment, quartile,
       CAST(count(*) AS BIGINT) AS customers,
       round(min(c_acctbal), 2) AS lo,
       round(max(c_acctbal), 2) AS hi
FROM banded GROUP BY c_mktsegment, quartile
""",
)
def customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile banding: split each market segment's customers into 4
    equal-count balance quartiles, then summarize each band. Ordering
    includes the unique custkey so band assignment is deterministic.

    Scale: one shuffle on mktsegment for the window, one more for the
    groupBy. ntile requires a full sort per partition key; with few,
    large segments this skews — at 100TB you'd band via percentile
    bounds (approxQuantile) + range filter instead of a global sort.
    """
    banded = table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4)
        .over(
            Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
        )
        .cast("bigint")
        .alias("quartile"),
    )
    return banded.groupBy("c_mktsegment", "quartile").agg(
        F.count(F.lit(1)).alias("customers"),
        F.round(F.min("c_acctbal"), 2).alias("lo"),
        F.round(F.max("c_acctbal"), 2).alias("hi"),
    )


@register(
    "quantity_price_stats",
    oracle="""
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
       round(stddev_samp(l_quantity), 4) AS qty_stddev,
       round(var_samp(l_extendedprice), 2) AS price_var
FROM lineitem GROUP BY l_returnflag
""",
)
def quantity_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: correlation, sample covariance, stddev
    and variance of lineitem quantity/price per return flag — all
    single-pass streaming aggregates (Welford-style accumulators) that
    partial-aggregate map-side.

    Scale: one shuffle of #flags * constant-size accumulator rows;
    results rounded on both engines because the merge order of float
    accumulators differs across partitionings.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("price_var"),
    )


@register(
    "daily_orders_gap_filled",
    oracle="""
WITH bounds AS (
  SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
),
spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
           AS order_date
  FROM bounds
),
daily AS (
  SELECT o_orderdate AS order_date, CAST(count(*) AS BIGINT) AS orders,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1
)
SELECT s.order_date,
       coalesce(d.orders, 0) AS orders,
       coalesce(d.revenue, 0.0) AS revenue
FROM spine s LEFT JOIN daily d USING (order_date)
""",
)
def daily_orders_gap_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: build a continuous daily date spine
    with sequence() over the observed min/max, then left-join the daily
    rollup so missing days surface as explicit zero rows (hypertable-
    style dense output; reference only ever emits observed days).

    Scale: the spine is generated from a 1-row global aggregate and is
    tiny (#days). NOTE the hint placement: Spark cannot build-LEFT for
    a left-outer join, so hinting the preserved spine side is logged
    and IGNORED ("Hint (strategy=broadcast) is not supported") — the
    broadcast must go on the daily-aggregate (right) side, which is
    also small post-aggregation (#observed days). The real work is the
    one groupBy(date) shuffle over orders. No driver-side loop — the
    spine is sequence()+explode inside the plan.
    """
    orders = table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("order_date")
    )
    daily = orders.groupBy(
        F.col("o_orderdate").alias("order_date")
    ).agg(
        F.count(F.lit(1)).alias("orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
    return (
        spine
        .join(F.broadcast(daily), on="order_date", how="left")
        .select(
            "order_date",
            F.coalesce("orders", F.lit(0)).alias("orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        )
    )


@register(
    "event_value_locf",
    oracle="""
WITH sparse AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
  FROM events
)
SELECT event_id, user_id,
       round(last_value(purchase_value IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             4) AS filled_value
FROM sparse
""",
)
def event_value_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill imputation (LOCF — last observation carried
    forward): only purchase events carry a meaningful value; every
    other event inherits the user's most recent purchase value via
    last(ignorenulls=True) over an ordered running frame. The standard
    sensor/feature-table densification primitive.

    Scale: exactly one shuffle (partitionBy user_id) and a per-user
    sort; the running frame is computed in a single pass per partition.
    Deterministic: ordering tiebreaks on unique event_id.
    """
    sparse = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "purchase_value"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sparse.select(
        "event_id",
        "user_id",
        F.round(F.last("purchase_value", ignorenulls=True).over(w), 4).alias(
            "filled_value"
        ),
    )


@register(
    "event_props_map_stats",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS events,
       CAST(count(k_value) AS BIGINT) AS with_k,
       CAST(sum(CASE WHEN k_value >= 50 THEN 1 ELSE 0 END) AS BIGINT)
         AS high_k,
       round(avg(k_value), 4) AS avg_k
FROM (SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k_value
      FROM events)
GROUP BY event_type
""",
)
def event_props_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns: parse the freeform props JSON into a
    map<string,bigint> (schemaless — keys need not be known up front,
    unlike the typed-struct path in props_typed_extract), read entries
    with element_at, and aggregate. Demonstrates the map column surface
    (from_json to MapType + element_at) on the JVM fast path.

    Scale: JSON parsing is per-row but stays in Tungsten codegen (no
    Python); one shuffle of #event_type rows.
    """
    events = table(spark, sf_dir, "events").select(
        "event_type",
        F.from_json(
            "props", T.MapType(T.StringType(), T.LongType())
        ).alias("props_map"),
    )
    k = F.element_at("props_map", F.lit("k"))
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("events"),
        F.count(k).alias("with_k"),
        F.sum(F.when(k >= 50, 1).otherwise(0)).alias("high_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


@register(
    "best_part_per_brand",
    oracle="""
SELECT p_brand, p_partkey AS best_partkey,
       round(p_retailprice, 2) AS best_price
FROM (SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC,
                                         p_partkey DESC) AS rn
      FROM part)
WHERE rn = 1
""",
)
def best_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax via max_by: the priciest part per brand in ONE aggregate
    pass — no window sort, no self-join. The struct ordering key
    (price, partkey) makes ties deterministic; the oracle states the
    same semantics as a row_number window (DuckDB's max_by cannot take
    a composite ordering key).

    Scale: this is the shape that wins at 100TB — max_by partial-
    aggregates map-side, shuffling one row per (brand) per map task,
    where the window formulation would shuffle and sort the whole
    table.
    """
    best = (
        table(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(
            F.max_by(
                F.struct(
                    F.col("p_partkey").alias("best_partkey"),
                    F.round("p_retailprice", 2).alias("best_price"),
                ),
                F.struct("p_retailprice", "p_partkey"),
            ).alias("best")
        )
    )
    return best.select("p_brand", "best.best_partkey", "best.best_price")


@register(
    "session_window_native",
    oracle="""
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
m AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR date_diff('second', lag(ts) OVER w, ts) > 1800
                THEN 1 ELSE 0 END AS is_new
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
    SELECT user_id, ts, value,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM m
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM s GROUP BY user_id, sid
""",
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via the NATIVE ``F.session_window``
    aggregate (vs the lag/running-sum formulation in
    ``user_sessions_30min`` — same semantics, different operator). The
    session window's end is exclusive: last event + gap.

    Scale: Catalyst plans this as a single shuffle on user_id followed
    by a sort-merge of adjacent windows (MergingSessionsExec) — no
    window-function sort pass over the whole table, and it is the exact
    operator the streaming engine reuses with watermarks, so batch and
    streaming sessionization stay semantically identical.
    """
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@register(
    "robust_props_parse",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                     IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_k,
       CAST(sum(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) = 50
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
       round(avg(value / nullif(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                                - 50, 0)), 4) AS avg_ratio
FROM events
GROUP BY event_type
""",
)
def robust_props_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant ingestion with the ``try_*`` function family:
    ``try_cast`` string→bigint (malformed JSON values become NULL, not
    a task failure) and ``try_divide`` (division by zero becomes NULL,
    never an ANSI exception). The audit counts how many rows each
    guard absorbed — the pattern a 100 TB ingest needs, because one
    poisoned record must not kill a 1000-executor stage.

    Scale: pure map-side expressions inside whole-stage codegen + one
    hash aggregate on event_type; the JSON path extraction is Spark's
    built-in get_json_object (JVM, no UDF).
    """
    events = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    ratio = F.try_divide(F.col("value"), k - F.lit(50))
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k.isNull().cast("bigint")).alias("n_bad_k"),
        F.sum((k == 50).cast("bigint")).alias("n_div_null"),
        F.round(F.avg(ratio), 4).alias("avg_ratio"),
    )
