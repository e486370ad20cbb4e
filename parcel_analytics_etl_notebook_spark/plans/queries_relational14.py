"""Batch 14: classical seasonal decomposition, exact weighted median,
cohort LTV curves, and CUPED-adjusted experiment readout.

Seasonal decomposition splits the daily series into trend (centered
7-day MA), day-of-week seasonal index, and remainder — the additive
classical method, the precursor every anomaly detector assumes.
Weighted median is the quantity-weighted price statistic robust to
line-item blowouts where the plain median ignores volume. Cohort LTV
extends user_retention_cohorts from "did they come back" to "what are
they worth by age". CUPED is the industry-standard experiment variance
reducer: adjust the post-period metric by the pre-period covariate and
the error bars shrink by the squared correlation.

Oracle-parity conventions as in plans/catalog.py. The float-parity
strategy throughout is INTEGER-CENTS algebra: every aggregate that
would otherwise sum doubles in engine-dependent order is expressed as
an exact BIGINT sum (cents, 7×cents fractions, micro-units) with the
float division happening ONCE, on the reduced frame, in an identical
expression tree on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table


# --------------------------------------------------------------------------
# Classical additive decomposition: trend + day-of-week seasonal + remainder
# --------------------------------------------------------------------------
@register(
    "dow_seasonal_decomposition",
    oracle="""
WITH daily AS (
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           CAST(round(round(sum(value), 2) * 100, 0) AS BIGINT) AS cents
    FROM events WHERE value IS NOT NULL
    GROUP BY 1
),
offs AS (SELECT unnest(range(0, 7)) AS k),
tr AS (
    SELECT d.day, d.cents, sum(l.cents) AS t7, count(*) AS nw
    FROM daily d
    CROSS JOIN offs o
    JOIN daily l ON l.day = d.day + CAST(o.k - 3 AS INTEGER)
    GROUP BY d.day, d.cents
),
full7 AS (
    SELECT day, cents, t7,
           datediff('day', DATE '1970-01-05', day) % 7 AS dow,
           7 * cents - t7 AS dfrac
    FROM tr WHERE nw = 7
),
seas AS (
    SELECT dow, CAST(sum(dfrac) AS DOUBLE) / (7.0 * count(*)) AS s_cents
    FROM full7 GROUP BY dow
)
SELECT f.day,
       round(f.cents / 100.0, 2) AS v,
       round(f.t7 / 700.0, 4) AS trend,
       round(s.s_cents / 100.0, 4) AS seasonal,
       round(f.cents / 100.0 - f.t7 / 700.0 - s.s_cents / 100.0, 4)
           AS remainder
FROM full7 f JOIN seas s ON s.dow = f.dow
ORDER BY f.day
""",
)
def dow_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily event-value
    series: trend = centered 7-day moving average (calendar-correct:
    built by day-keyed spine join, NOT a ROWS window, so a missing day
    drops the estimate instead of silently widening it), seasonal =
    per-day-of-week mean of the detrended series (Monday-epoch integer
    dow, locale-free), remainder = what anomaly detectors should be
    looking at after trend and weekday rhythm are explained away. Days
    without a full 7-day neighborhood are excluded (no edge-padding
    bias).

    Float parity: daily sums collapse to integer CENTS; the trend
    numerator (sum of 7 cents) and the detrended series (7·cents − t7)
    stay EXACT integers; per-dow seasonal is an exact integer sum with
    one division — so no cross-engine float-accumulation order exists
    anywhere before the final rounded projections.

    Scale shape: one partial-combining groupBy(day) reduces raw rows to
    the day-grain frame; the 7× offset fan-out is an inline
    explode(sequence) over THAT frame (series-frame rule), the spine
    join is day-keyed, and the 7-row seasonal frame joins back
    broadcast. Raw scale touches only the first groupBy."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.round(F.round(F.sum("value"), 2) * 100, 0)
            .cast("bigint")
            .alias("cents")
        )
        .persist()  # spine + lag side
    )
    tr = (
        daily.alias("d")
        .select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k")
        )
        .join(
            daily.alias("l"),
            F.col("l.day") == F.date_add(F.col("d.day"), F.col("k") - 3),
        )
        .groupBy(F.col("d.day").alias("day"), F.col("d.cents").alias("cents"))
        .agg(
            F.sum(F.col("l.cents")).alias("t7"),
            F.count(F.lit(1)).alias("nw"),
        )
    )
    epoch = F.lit("1970-01-05").cast("date")
    full7 = tr.filter(F.col("nw") == 7).select(
        "day",
        "cents",
        "t7",
        (F.datediff(F.col("day"), epoch) % 7).alias("dow"),
        (7 * F.col("cents") - F.col("t7")).alias("dfrac"),
    )
    seas = full7.groupBy("dow").agg(
        (
            F.sum("dfrac").cast("double") / (7.0 * F.count(F.lit(1)))
        ).alias("s_cents")
    )
    return (
        full7.join(F.broadcast(seas), "dow")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            F.round(F.col("cents") / 100.0, 2).alias("v"),
            F.round(F.col("t7") / 700.0, 4).alias("trend"),
            F.round(F.col("s_cents") / 100.0, 4).alias("seasonal"),
            F.round(
                F.col("cents") / 100.0
                - F.col("t7") / 700.0
                - F.col("s_cents") / 100.0,
                4,
            ).alias("remainder"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Exact weighted median: quantity-weighted line price per brand
# --------------------------------------------------------------------------
@register(
    "weighted_median_price_by_brand",
    oracle="""
WITH w AS (
    SELECT p.p_brand AS brand, l.l_extendedprice AS price,
           CAST(sum(CAST(round(l.l_quantity, 0) AS BIGINT)) AS BIGINT) AS wt,
           count(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1, 2
),
c AS (
    SELECT brand, price, wt, n,
           sum(wt) OVER (PARTITION BY brand ORDER BY price) AS cum,
           sum(wt) OVER (PARTITION BY brand) AS tot
    FROM w
)
SELECT brand,
       CAST(sum(n) AS BIGINT) AS n_lines,
       CAST(max(tot) AS BIGINT) AS total_qty,
       round(min(CASE WHEN 2 * cum >= tot THEN price END), 2)
           AS weighted_median_price
FROM c
GROUP BY brand
ORDER BY brand
""",
)
def weighted_median_price_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact quantity-weighted median line price per brand: the
    smallest price whose cumulative quantity weight reaches half the
    brand total (2·cum ≥ tot — integer arithmetic, no half-weight
    float). The volume-aware center: a brand selling 10 000 units at
    $10 and one unit at $10 000 has weighted median $10, where the
    unweighted median of line rows can be dragged by row blowouts.

    Determinism: weights collapse to (brand, price) grain BEFORE the
    cumulative window, so the cumsum order is fully keyed by price —
    no row-order tie ambiguity; weights are exact BIGINTs.

    Scale shape: one shuffle to (brand, price) grain with map-side
    partial combine (the grain is |brands|×|distinct prices|, far
    below row scale), then the cumulative window partitions by brand.
    At 100 TB swap the exact window for approx_percentile with weight
    expansion only if the per-brand distinct-price frame itself blows
    up — for priced catalogs it does not."""
    li = table(spark, sf_dir, "lineitem")
    pt = table(spark, sf_dir, "part")
    w = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_extendedprice").alias("price"),
        )
        .agg(
            F.sum(F.round("l_quantity", 0).cast("bigint"))
            .cast("bigint")
            .alias("wt"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    wb = Window.partitionBy("brand")
    c = w.select(
        "brand",
        "price",
        "wt",
        "n",
        F.sum("wt").over(wb.orderBy("price")).alias("cum"),
        F.sum("wt").over(wb).alias("tot"),
    )
    return (
        c.groupBy("brand")
        .agg(
            F.sum("n").cast("bigint").alias("n_lines"),
            F.max("tot").cast("bigint").alias("total_qty"),
            F.round(
                F.min(
                    F.when(2 * F.col("cum") >= F.col("tot"), F.col("price"))
                ),
                2,
            ).alias("weighted_median_price"),
        )
        .orderBy("brand")
    )


# --------------------------------------------------------------------------
# Cohort LTV curve: cumulative purchase value per user by cohort age
# --------------------------------------------------------------------------
@register(
    "cohort_ltv_curve",
    oracle="""
WITH firsts AS (
    SELECT user_id,
           CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS DATE)
               AS cohort_week
    FROM events GROUP BY user_id
),
sizes AS (
    SELECT cohort_week, count(*) AS n_users FROM firsts GROUP BY 1
),
cells AS (
    SELECT f.cohort_week,
           CAST(floor(datediff('day', f.cohort_week,
                               CAST(CAST(e.ts AS TIMESTAMP) AS DATE)) / 7.0)
                AS BIGINT) AS age_week,
           CAST(round(round(sum(e.value), 2) * 100, 0) AS BIGINT) AS cents
    FROM events e JOIN firsts f ON f.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
    GROUP BY 1, 2
),
cum AS (
    SELECT cohort_week, age_week, cents,
           sum(cents) OVER (PARTITION BY cohort_week ORDER BY age_week)
               AS cum_cents
    FROM cells
)
SELECT c.cohort_week,
       c.age_week,
       CAST(s.n_users AS BIGINT) AS n_users,
       round(c.cum_cents / 100.0, 2) AS cum_revenue,
       round(c.cum_cents / (100.0 * s.n_users), 4) AS ltv_per_user
FROM cum c JOIN sizes s ON s.cohort_week = c.cohort_week
ORDER BY c.cohort_week, c.age_week
""",
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users grouped by first-event week,
    purchase revenue accumulated by whole weeks since cohort start, and
    normalized per cohort user — the "what is a user worth by age N"
    curve that pairs with user_retention_cohorts' activity triangle.
    Cumulative revenue is an exact integer-cents running sum, so the
    per-user division is the only float op.

    Scale shape: two partial-combining aggregations over events (firsts
    at user grain, revenue at (cohort, age) grain) plus one user-keyed
    join; the cumulative window runs on the (cohorts × ages)-sized
    frame and the cohort-size join back is broadcast-sized. Nothing
    after the first two shuffles sees row scale."""
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    cells = (
        ev.filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_week"))
                / 7.0
            )
            .cast("bigint")
            .alias("age_week"),
        )
        .agg(
            F.round(F.round(F.sum("value"), 2) * 100, 0)
            .cast("bigint")
            .alias("cents")
        )
    )
    cum = cells.select(
        "cohort_week",
        "age_week",
        F.sum("cents")
        .over(Window.partitionBy("cohort_week").orderBy("age_week"))
        .alias("cum_cents"),
    )
    return (
        cum.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("timestamp").alias("cohort_week"),
            "age_week",
            F.col("n_users").cast("bigint").alias("n_users"),
            F.round(F.col("cum_cents") / 100.0, 2).alias("cum_revenue"),
            F.round(
                F.col("cum_cents") / (100.0 * F.col("n_users")), 4
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "age_week")
    )


# --------------------------------------------------------------------------
# CUPED: variance-reduced experiment readout
# --------------------------------------------------------------------------
@register(
    "cuped_adjusted_lift",
    oracle="""
WITH u AS (
    SELECT user_id,
           CASE WHEN ((user_id % 1000003) * 2654435761) % 100 < 50
                THEN 'A' ELSE 'B' END AS arm,
           CAST(round(coalesce(round(sum(CASE
                WHEN event_type = 'purchase'
                     AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
                THEN value END), 2), 0.0) * 100, 0) AS BIGINT) AS x,
           CAST(round(coalesce(round(sum(CASE
                WHEN event_type = 'purchase'
                     AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'
                THEN value END), 2), 0.0) * 100, 0) AS BIGINT) AS y
    FROM events GROUP BY user_id
),
a AS (
    SELECT arm, count(*) AS n,
           sum(x) AS sx, sum(y) AS sy,
           sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
    FROM u GROUP BY arm
),
p AS (
    SELECT arm, n, sx, sy, sxy, sxx, syy,
           sum(n) OVER () AS np,
           sum(sx) OVER () AS sxp, sum(sy) OVER () AS syp,
           sum(sxy) OVER () AS sxyp, sum(sxx) OVER () AS sxxp
    FROM a
),
t AS (
    SELECT arm, n, sx, sy, sxy, sxx, syy,
           CAST(sxp AS DOUBLE) / np AS xbar,
           (CAST(sxyp AS DOUBLE)
              - CAST(sxp AS DOUBLE) * CAST(syp AS DOUBLE) / np)
             / nullif(CAST(sxxp AS DOUBLE)
                        - CAST(sxp AS DOUBLE) * CAST(sxp AS DOUBLE) / np,
                      0.0) AS theta
    FROM p
)
SELECT arm,
       CAST(n AS BIGINT) AS n_users,
       round(CAST(sy AS DOUBLE) / (100.0 * n), 4) AS mean_post,
       round((CAST(sy AS DOUBLE)
                - theta * (CAST(sx AS DOUBLE) - n * xbar))
             / (100.0 * n), 4) AS mean_adjusted,
       round((
           (CAST(syy AS DOUBLE)
              - 2.0 * theta * (CAST(sxy AS DOUBLE) - xbar * CAST(sy AS DOUBLE))
              + theta * theta
                * (CAST(sxx AS DOUBLE) - 2.0 * xbar * CAST(sx AS DOUBLE)
                   + n * xbar * xbar))
             / n
           - ((CAST(sy AS DOUBLE) - theta * (CAST(sx AS DOUBLE) - n * xbar))
              / n)
             * ((CAST(sy AS DOUBLE) - theta * (CAST(sx AS DOUBLE) - n * xbar))
                / n)
       ) / nullif(
           CAST(syy AS DOUBLE) / n
           - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n), 0.0),
       6) AS var_ratio
FROM t
ORDER BY arm
""",
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED experiment readout: users deterministically hash-split
    into arms A/B, post-period purchase spend adjusted by the
    pre-period covariate (y_adj = y − θ(x − x̄), θ = cov(x,y)/var(x)
    pooled across arms) — the standard variance-reduction technique
    that shrinks experiment error bars by the squared pre/post
    correlation without biasing the lift. `var_ratio` reports
    var(y_adj)/var(y) per arm: the fraction of metric variance the
    covariate failed to explain (≈1−ρ²).

    Float parity: per-user pre/post spends collapse to integer cents;
    ALL moment sums (Σx, Σy, Σxy, Σx², Σy²) are exact integer
    aggregates, and every adjusted-mean/variance term is derived
    ALGEBRAICALLY from those sums — no per-user float residual is ever
    summed, so no accumulation-order divergence exists. θ and x̄ fold
    in via a window over the 2-row arm frame, not a driver collect.

    Scale shape: one partial-combining groupBy(user), one
    partial-combining groupBy(arm) whose shuffle carries 2 rows, then
    constant-frame windows. At 100 TB the cents-squared moment sums
    need decimal(38,0) headroom instead of int64 (corpus-scale Σxy
    overflows ~1e19); the shape is otherwise unchanged."""
    ev = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    purchase = F.col("event_type") == "purchase"

    def cents(cond):
        return (
            F.round(
                F.coalesce(
                    F.round(F.sum(F.when(cond, F.col("value"))), 2),
                    F.lit(0.0),
                )
                * 100,
                0,
            )
        ).cast("bigint")

    u = ev.groupBy("user_id").agg(
        cents(purchase & (F.col("ts") < cutoff)).alias("x"),
        cents(purchase & (F.col("ts") >= cutoff)).alias("y"),
    ).select(
        F.when(
            ((F.col("user_id") % 1000003) * F.lit(2654435761)) % 100 < 50,
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("arm"),
        "x",
        "y",
    )
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    p = a.select(
        "*",
        F.sum("n").over(wall).alias("np"),
        F.sum("sx").over(wall).alias("sxp"),
        F.sum("sy").over(wall).alias("syp"),
        F.sum("sxy").over(wall).alias("sxyp"),
        F.sum("sxx").over(wall).alias("sxxp"),
    )
    d = F.col  # terse aliases for the moment algebra below
    xbar = d("sxp").cast("double") / d("np")
    theta = (
        d("sxyp").cast("double")
        - d("sxp").cast("double") * d("syp").cast("double") / d("np")
    ) / F.nullif(
        d("sxxp").cast("double")
        - d("sxp").cast("double") * d("sxp").cast("double") / d("np"),
        F.lit(0.0),
    )
    t = p.select("arm", "n", "sx", "sy", "sxy", "sxx", "syy",
                 xbar.alias("xbar"), theta.alias("theta"))
    adj_sum = d("sy").cast("double") - d("theta") * (
        d("sx").cast("double") - d("n") * d("xbar")
    )
    adj_sumsq = (
        d("syy").cast("double")
        - 2.0 * d("theta")
        * (d("sxy").cast("double") - d("xbar") * d("sy").cast("double"))
        + d("theta") * d("theta")
        * (
            d("sxx").cast("double")
            - 2.0 * d("xbar") * d("sx").cast("double")
            + d("n") * d("xbar") * d("xbar")
        )
    )
    var_y = d("syy").cast("double") / d("n") - (
        d("sy").cast("double") / d("n")
    ) * (d("sy").cast("double") / d("n"))
    return t.select(
        "arm",
        d("n").cast("bigint").alias("n_users"),
        F.round(d("sy").cast("double") / (100.0 * d("n")), 4).alias(
            "mean_post"
        ),
        F.round(adj_sum / (100.0 * d("n")), 4).alias("mean_adjusted"),
        F.round(
            (adj_sumsq / d("n") - (adj_sum / d("n")) * (adj_sum / d("n")))
            / F.nullif(var_y, F.lit(0.0)),
            6,
        ).alias("var_ratio"),
    ).orderBy("arm")


# --------------------------------------------------------------------------
# Session entry/exit census per event type
# --------------------------------------------------------------------------
@register(
    "session_entry_exit_stats",
    oracle="""
WITH e AS (
    SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
    FROM events
),
m AS (
    SELECT event_id, user_id, event_type, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR date_diff('second', lag(ts) OVER w, ts) > 1800
                THEN 1 ELSE 0 END AS is_new
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT event_id, user_id, event_type, ts,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS sid
    FROM m
),
r AS (
    SELECT event_type,
           row_number() OVER (PARTITION BY user_id, sid
                              ORDER BY ts, event_id) AS rf,
           row_number() OVER (PARTITION BY user_id, sid
                              ORDER BY ts DESC, event_id DESC) AS rl
    FROM s
),
tot AS (SELECT count(DISTINCT (user_id, sid)) AS n_sessions FROM s)
SELECT event_type,
       CAST(sum(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_entries,
       CAST(sum(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exits,
       round(CAST(sum(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / (SELECT n_sessions FROM tot), 6) AS entry_share,
       round(CAST(sum(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / (SELECT n_sessions FROM tot), 6) AS exit_share
FROM r
GROUP BY event_type
ORDER BY event_type
""",
)
def session_entry_exit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event types OPEN sessions and which CLOSE them: per type,
    how often it is the first / last event of a 30-minute-gap session
    (the user_sessions_30min definition, with an event_id tiebreak so
    first/last are well-defined under timestamp ties) and its share of
    all sessions — the entry/exit-page analysis of web analytics,
    generalized to event types. entry_share ≈ acquisition surface,
    exit_share ≈ where journeys die.

    Scale shape: one shuffle on user_id covers the sessionizing lag,
    the running session index, and both first/last row_numbers (all
    four windows share the partition key); the rollup then
    partial-combines to the |event_types| frame. The session total
    folds in via a window over that tiny frame, not a driver
    collect."""
    ev = table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    m = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.when(
            F.lag("ts").over(wu).isNull()
            | (
                F.unix_timestamp(F.col("ts"))
                - F.unix_timestamp(F.lag("ts").over(wu))
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    s = m.select(
        "event_id",
        "event_type",
        "user_id",
        "ts",
        F.sum("is_new")
        .over(wu.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sid"),
    )
    ws = Window.partitionBy("user_id", "sid")
    r = s.select(
        "event_type",
        F.row_number().over(ws.orderBy("ts", "event_id")).alias("rf"),
        F.row_number()
        .over(ws.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rl"),
    )
    per_type = r.groupBy("event_type").agg(
        F.sum(F.when(F.col("rf") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_entries"),
        F.sum(F.when(F.col("rl") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_exits"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # entries across types partition the sessions exactly once, so the
    # session total is the entry-count sum over this |types|-row frame
    return per_type.select(
        "event_type",
        "n_entries",
        "n_exits",
        F.round(
            F.col("n_entries").cast("double") / F.sum("n_entries").over(wall),
            6,
        ).alias("entry_share"),
        F.round(
            F.col("n_exits").cast("double") / F.sum("n_entries").over(wall),
            6,
        ).alias("exit_share"),
    ).orderBy("event_type")
