"""Batch 12: survival analysis (Kaplan–Meier), recency-weighted EWMA
bands, categorical mutual information, and largest-remainder quota
allocation.

Kaplan–Meier brings the censoring-aware time-to-event family — "how
long from signup to first purchase, counting users who never purchased
correctly" — which naive avg-of-durations silently biases. EWMA is the
recency-weighted twin of trailing_30d_revenue; mutual information
extends the chi2/PSI dependence family with the information-theoretic
score; largest-remainder is the exact integer-quota allocator every
stratified sampler needs (floor-only quotas under-fill, rounding
over-fills — Hamilton's method fills exactly).

Oracle-parity conventions as in plans/catalog.py. Cumulative ordered-
window sums are sequential in both engines, so log-space cumulative
products (KM survival) agree to the last ulp before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table


# --------------------------------------------------------------------------
# Kaplan–Meier: signup → first purchase, censored at last activity
# --------------------------------------------------------------------------
@register(
    "kaplan_meier_signup_purchase",
    oracle="""
WITH su AS (
    SELECT user_id,
           min(CAST(ts AS TIMESTAMP)) FILTER (event_type = 'signup') AS signup_ts,
           max(CAST(ts AS TIMESTAMP)) AS last_ts
    FROM events GROUP BY user_id
),
fp AS (
    SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS purchase_ts
    FROM events e JOIN su ON su.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= su.signup_ts
    GROUP BY e.user_id
),
obs AS (
    SELECT su.user_id,
           datediff('day', CAST(su.signup_ts AS DATE),
                    CAST(coalesce(fp.purchase_ts, su.last_ts) AS DATE)) AS t,
           CASE WHEN fp.user_id IS NULL THEN 0 ELSE 1 END AS ev
    FROM su LEFT JOIN fp ON fp.user_id = su.user_id
    WHERE su.signup_ts IS NOT NULL
),
grouped AS (
    SELECT t, sum(ev) AS d, count(*) - sum(ev) AS c
    FROM obs GROUP BY t
),
km AS (
    SELECT t, d, c,
           (SELECT count(*) FROM obs)
             - coalesce(sum(d + c) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
    FROM grouped
)
SELECT CAST(t AS BIGINT) AS t_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events,
       CAST(c AS BIGINT) AS n_censored,
       CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY t) = 1
            THEN 0.0
            ELSE round(exp(sum(CASE WHEN d > 0 AND d < n_risk
                                    THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                                    ELSE 0.0 END)
                           OVER (ORDER BY t)), 6)
       END AS survival
FROM km
ORDER BY t_days
""",
)
def kaplan_meier_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for days from first signup to first
    subsequent purchase, right-censoring users who never purchase at
    their last observed activity — the estimator that makes
    time-to-conversion honest (dropping non-converters biases the
    curve optimistic; counting them as converted-at-last-seen biases
    it pessimistic; KM does neither). S(t) = Π_{u≤t} (1 − d_u/n_u)
    computed in log space with the product restricted to event times.

    Parity note: the cumulative log-sum is an ORDERED window — both
    engines accumulate it sequentially in t order, so the float value
    agrees to the last ulp before the 6dp round; a terminal time where
    d = n_risk yields ln(0) → −inf → survival 0.0 identically.

    Scale shape: per-user reductions are one groupBy(user) (plus one
    filtered re-aggregation for the conditional first-purchase — a
    second pass, not a window over raw events); the KM frame is
    DISTINCT-DURATION-sized (≤ days of history — series-frame rule),
    so the ordered window is model-sized. The observation count folds
    in as a literal (model-sized collect) instead of a scalar
    subquery-per-row."""
    ev = table(spark, sf_dir, "events")
    su = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "signup_ts"
        ),
        F.max("ts").alias("last_ts"),
    ).filter(F.col("signup_ts").isNotNull())
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su.select("user_id", "signup_ts"), "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    obs = (
        su.join(fp, "user_id", "left")
        .select(
            F.datediff(
                F.coalesce("purchase_ts", "last_ts").cast("date"),
                F.col("signup_ts").cast("date"),
            ).alias("t"),
            F.when(F.col("purchase_ts").isNull(), 0).otherwise(1).alias("ev"),
        )
        .persist()  # total count + grouped frame
    )
    total = obs.count()
    grouped = obs.groupBy("t").agg(
        F.sum("ev").alias("d"),
        (F.count(F.lit(1)) - F.sum("ev")).alias("c"),
    )
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wcum = Window.orderBy("t")
    km = grouped.select(
        "t",
        "d",
        "c",
        (
            F.lit(total)
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0))
        ).alias("n_risk"),
    )
    return km.select(
        F.col("t").cast("bigint").alias("t_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.col("c").cast("bigint").alias("n_censored"),
        # a time where every remaining subject fails (d = n_risk) sends
        # the product to exactly 0 from there on — handled as an
        # explicit cumulative flag because ln(0) RAISES in DuckDB
        # (Spark would return null); both sides emit literal 0.0
        F.when(
            F.max(
                F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
            ).over(wcum)
            == 1,
            F.lit(0.0),
        )
        .otherwise(
            F.round(
                F.exp(
                    F.sum(
                        F.when(
                            (F.col("d") > 0)
                            & (F.col("d") < F.col("n_risk")),
                            F.log(
                                1.0
                                - F.col("d").cast("double")
                                / F.col("n_risk")
                            ),
                        ).otherwise(0.0)
                    ).over(wcum)
                ),
                6,
            )
        )
        .alias("survival"),
    ).orderBy("t_days")


# --------------------------------------------------------------------------
# EWMA bands over the daily event-value series (28-day kernel)
# --------------------------------------------------------------------------
@register(
    "ewma_value_bands",
    oracle="""
WITH daily AS (
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           round(sum(value), 2) AS v
    FROM events WHERE value IS NOT NULL
    GROUP BY 1
),
offs AS (SELECT unnest(range(0, 28)) AS k),
kern AS (
    SELECT d.day, sum(l.v * pow(0.8, o.k)) / sum(pow(0.8, o.k)) AS ewma
    FROM daily d
    CROSS JOIN offs o
    JOIN daily l ON l.day = d.day - CAST(o.k || ' days' AS INTERVAL)
    GROUP BY d.day
)
SELECT d.day, round(d.v, 2) AS v, round(k.ewma, 4) AS ewma,
       round(d.v - k.ewma, 4) AS resid
FROM daily d JOIN kern k ON k.day = d.day
ORDER BY d.day
""",
)
def ewma_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event value over
    a 28-day kernel (decay 0.8/day, renormalized over the days
    actually present) with residuals — the recency-weighted smoother
    ops dashboards prefer to flat trailing averages
    (trailing_30d_revenue): yesterday counts ~5× more than a week ago.

    Both sides express the kernel identically: explode 28 lag offsets,
    join the day spine at (day − k), weight by 0.8^k, renormalize by
    the realized weight mass (so series edges and calendar gaps are
    handled by construction, not special cases).

    Scale shape: the 28× offset explode multiplies the DAY-grain frame
    (series-frame rule: years of days × 28 is still tiny), never raw
    rows; the raw scan is one partial-combining groupBy(day). The
    offsets come from an inline explode(sequence) — a generator inside
    whole-stage codegen, not a 28-row crossJoin (which would plan a
    BroadcastNestedLoopJoin); the lag self-join is day-keyed. At
    100 TB nothing changes — the series frame is day-sized regardless
    of row count."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("v"))
        .persist()  # spine + lag side + final join
    )
    lagged = (
        daily.alias("d")
        .select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(27))).alias("k"),
        )
        .join(
            daily.alias("l"),
            F.col("l.day") == F.date_sub(F.col("d.day"), F.col("k")),
        )
    )
    kern = lagged.groupBy(F.col("d.day").alias("day")).agg(
        (
            F.sum(F.col("l.v") * F.pow(F.lit(0.8), F.col("k")))
            / F.sum(F.pow(F.lit(0.8), F.col("k")))
        ).alias("ewma")
    )
    return (
        daily.join(kern, "day")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            F.round("v", 2).alias("v"),
            F.round("ewma", 4).alias("ewma"),
            F.round(F.col("v") - F.col("ewma"), 4).alias("resid"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Mutual information between event type and day-of-week
# --------------------------------------------------------------------------
@register(
    "mutual_information_type_dow",
    oracle="""
WITH cells AS (
    SELECT event_type,
           datediff('day', DATE '1970-01-05', CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS dow,
           count(*) AS n
    FROM events GROUP BY 1, 2
),
tot AS (
    SELECT event_type, dow, n,
           sum(n) OVER () AS nn,
           sum(n) OVER (PARTITION BY event_type) AS nx,
           sum(n) OVER (PARTITION BY dow) AS ny
    FROM cells
),
scored AS (
    SELECT event_type, dow, n,
           (CAST(n AS DOUBLE) / nn)
             * ln((CAST(n AS DOUBLE) / nn)
                  / ((CAST(nx AS DOUBLE) / nn) * (CAST(ny AS DOUBLE) / nn))) AS term,
           ln((CAST(n AS DOUBLE) / nn)
              / ((CAST(nx AS DOUBLE) / nn) * (CAST(ny AS DOUBLE) / nn))) AS pmi
    FROM tot
)
SELECT event_type, CAST(dow AS BIGINT) AS dow, CAST(n AS BIGINT) AS n,
       round(pmi, 6) AS pmi,
       round(sum(term) OVER (), 6) AS mi_total
FROM scored
ORDER BY event_type, dow
""",
)
def mutual_information_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and day-of-week (0 =
    Monday, from the engine-neutral Monday-epoch integer arithmetic of
    business_day_lag — no locale-dependent dayofweek()), with the
    per-cell pointwise MI. The information-theoretic dependence score
    next to chi2_priority_status's frequentist one: MI = Σ p(x,y)·
    ln(p(x,y)/(p(x)p(y))), in nats.

    Scale shape: one groupBy over the (|types| × 7)-key contingency
    frame — bounded-cardinality by construction — then marginals as
    windows OVER that ≤35-row frame. The raw scan partial-combines;
    nothing downstream sees row scale."""
    ev = table(spark, sf_dir, "events")
    epoch = F.lit("1970-01-05").cast("date")
    cells = ev.groupBy(
        "event_type",
        (F.datediff(F.col("ts").cast("date"), epoch) % 7).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tot = cells.select(
        "event_type",
        "dow",
        "n",
        F.sum("n").over(wall).alias("nn"),
        F.sum("n").over(Window.partitionBy("event_type")).alias("nx"),
        F.sum("n").over(Window.partitionBy("dow")).alias("ny"),
    )
    pxy = F.col("n").cast("double") / F.col("nn")
    px = F.col("nx").cast("double") / F.col("nn")
    py = F.col("ny").cast("double") / F.col("nn")
    scored = tot.select(
        "event_type",
        "dow",
        "n",
        (pxy * F.log(pxy / (px * py))).alias("term"),
        F.log(pxy / (px * py)).alias("pmi"),
    )
    return scored.select(
        "event_type",
        F.col("dow").cast("bigint").alias("dow"),
        F.col("n").cast("bigint").alias("n"),
        F.round("pmi", 6).alias("pmi"),
        F.round(F.sum("term").over(wall), 6).alias("mi_total"),
    ).orderBy("event_type", "dow")


# --------------------------------------------------------------------------
# Largest-remainder (Hamilton) quota allocation across segments
# --------------------------------------------------------------------------
@register(
    "largest_remainder_quota",
    oracle="""
WITH seg AS (
    SELECT c_mktsegment AS seg, count(*) AS n FROM customer GROUP BY 1
),
based AS (
    SELECT seg, n,
           sum(n) OVER () AS nn,
           floor(1000.0 * n / sum(n) OVER ()) AS base,
           1000.0 * n / sum(n) OVER ()
             - floor(1000.0 * n / sum(n) OVER ()) AS frac
    FROM seg
),
ranked AS (
    SELECT seg, n, nn, base, frac,
           row_number() OVER (ORDER BY frac DESC, seg) AS r,
           1000 - sum(base) OVER () AS leftover
    FROM based
)
SELECT seg,
       CAST(n AS BIGINT) AS n_customers,
       round(1000.0 * n / nn, 6) AS exact_share,
       CAST(base + CASE WHEN r <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM ranked
ORDER BY seg
""",
)
def largest_remainder_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) allocation of exactly 1000 sample
    slots across market segments, proportional to customer counts:
    floor quotas first, then the leftover slots go to the largest
    fractional remainders (segment-name tiebreak). The allocator every
    stratified sampler / mixture builder needs — floors alone
    under-fill the budget, naive rounding can over-fill; this fills it
    EXACTLY, deterministically.

    Scale shape: one partial-combining groupBy to the |segments|-row
    frame; every window below runs over that model-sized frame. The
    same shape allocates token budgets across languages or shard
    quotas across tenants at any corpus size — the frame is
    |strata|-sized, never row-sized."""
    cust = table(spark, sf_dir, "customer")
    seg = cust.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    share = 1000.0 * F.col("n") / F.sum("n").over(wall)
    based = seg.select(
        "seg",
        "n",
        F.sum("n").over(wall).alias("nn"),
        F.floor(share).alias("base"),
        (share - F.floor(share)).alias("frac"),
    )
    ranked = based.select(
        "seg",
        "n",
        "nn",
        "base",
        "frac",
        F.row_number()
        .over(Window.orderBy(F.col("frac").desc(), "seg"))
        .alias("r"),
        (F.lit(1000) - F.sum("base").over(wall)).alias("leftover"),
    )
    return ranked.select(
        "seg",
        F.col("n").cast("bigint").alias("n_customers"),
        F.round(1000.0 * F.col("n") / F.col("nn"), 6).alias("exact_share"),
        (
            F.col("base")
            + F.when(F.col("r") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("quota"),
    ).orderBy("seg")
