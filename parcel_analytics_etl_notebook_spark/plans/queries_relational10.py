"""Batch 10: econometric / ML-feature / time-series shapes — Gini
spend concentration, leave-one-out target encoding, autocorrelation of
the daily revenue series, CUSUM changepoint detection, business-day
shipping lag, and exponentially time-decayed popularity.

These extend the statistical-monitoring family (queries_relational8/9:
KS, chi-square, PSI, Benford) with the shapes a revenue warehouse and
an ML feature platform run daily: concentration metrics for account
risk, leakage-free target encoding for model features, ACF/CUSUM for
series health paging, business-day SLAs (the reference's shipping-lag
KPI counts calendar days; real SLA clocks skip weekends), and decayed
popularity for ranking freshness.

Oracle-parity conventions as in plans/catalog.py: identical aliases,
BIGINT casts on counts, rounded floats (4dp where the value is a raw
float SUM whose accumulation order differs between engines, 6dp where
it is normalized/series-sized), deterministic tiebreaks everywhere a
rank or top-k cutoff appears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table


# --------------------------------------------------------------------------
# Gini coefficient of customer spend per market segment
# --------------------------------------------------------------------------
@register(
    "customer_spend_gini",
    oracle="""
WITH spend AS (
    SELECT o_custkey, round(sum(o_totalprice), 2) AS s
    FROM orders GROUP BY 1
),
ranked AS (
    SELECT c_mktsegment AS seg, s,
           row_number() OVER (PARTITION BY c_mktsegment ORDER BY s, o_custkey) AS i
    FROM spend JOIN customer ON c_custkey = o_custkey
)
SELECT seg,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(s), 2) AS total_spend,
       round(2.0 * sum(i * s) / (count(*) * sum(s))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM ranked
GROUP BY seg
ORDER BY seg
""",
)
def customer_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer spend within each market
    segment — the standard concentration metric (0 = perfectly equal,
    →1 = one whale) via the rank formula
    G = 2·Σ i·x_i / (n·Σx) − (n+1)/n over ascending spend.

    Per-customer spend is rounded to 2dp BEFORE ranking/summing on
    both sides so the float totals the two engines accumulate in
    different orders are re-canonicalized at the only point where a
    sub-ulp difference could flip a rank or the 6dp score.

    Scale shape: one groupBy(custkey) partial-agg shuffle, a broadcast
    -sized join to customer's segment column (segment is ON customer,
    so the join is big-big on custkey — shuffle; at 100 TB bucket both
    sides on custkey), then a rank window PARTITIONED BY segment. The
    segment partition is the skew point (5 segments → 5 reducers);
    the two-pass distributed ranking of operators/indexing.py is the
    drop-in replacement when a segment outgrows one executor — the
    formula only needs (i, x) per row, not a single sorted partition,
    and i from the global-index operator is identical."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    spend = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("s")
    )
    ranked = spend.join(
        cust.select(F.col("c_custkey"), F.col("c_mktsegment").alias("seg")),
        spend.o_custkey == F.col("c_custkey"),
    ).select(
        "seg",
        "s",
        F.row_number()
        .over(Window.partitionBy("seg").orderBy("s", "o_custkey"))
        .alias("i"),
    )
    n = F.count(F.lit(1))
    return (
        ranked.groupBy("seg")
        .agg(
            n.cast("bigint").alias("n_customers"),
            F.round(F.sum("s"), 2).alias("total_spend"),
            F.round(
                2.0 * F.sum(F.col("i") * F.col("s")) / (n * F.sum("s"))
                - (n + F.lit(1.0)) / n,
                6,
            ).alias("gini"),
        )
        .orderBy("seg")
    )


# --------------------------------------------------------------------------
# Leave-one-out target encoding (leakage-free categorical feature)
# --------------------------------------------------------------------------
@register(
    "loo_target_encoding",
    oracle="""
WITH enc AS (
    SELECT o_orderkey, o_orderpriority, o_orderdate, o_totalprice,
           sum(o_totalprice) OVER (PARTITION BY o_orderpriority) AS grp_sum,
           count(*) OVER (PARTITION BY o_orderpriority) AS grp_n
    FROM orders
)
SELECT o_orderkey, o_orderpriority,
       round(o_totalprice, 2) AS target,
       round((grp_sum - o_totalprice) / (grp_n - 1), 4) AS loo_enc
FROM enc
WHERE o_orderdate >= TIMESTAMP '1995-03-01' AND o_orderdate < TIMESTAMP '1995-04-01'
ORDER BY o_orderkey
""",
)
def loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of o_orderpriority against the
    o_totalprice target: each row's feature is the mean target of its
    category EXCLUDING the row itself, (Σ_grp − own)/(n_grp − 1) — the
    leakage-free form of mean encoding (naive mean encoding leaks the
    row's own label into its feature; LOO is the standard fix).
    Output restricted to one order-month so the feature frame stays
    result-sized while the encoding statistics still come from the
    FULL table.

    Encoded value rounded to 4dp (not 6): grp_sum is a raw float sum
    whose accumulation order differs between engines — ~1e-7 relative
    wobble at sf0.1 group sizes, below 4dp but not reliably below 6dp.

    Scale shape: the category stats are a 5-row aggregate; Catalyst
    plans the partition-by-priority window as one shuffle on a 5-value
    key — at 100 TB replace with a groupBy(priority) agg + broadcast
    join of the 5-row stats frame (same arithmetic, no skewed window);
    the month filter pushes down to the parquet scan either way."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    enc = orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        "o_totalprice",
        F.sum("o_totalprice").over(w).alias("grp_sum"),
        F.count(F.lit(1)).over(w).alias("grp_n"),
    )
    return (
        enc.filter(
            (F.col("o_orderdate") >= F.lit("1995-03-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("target"),
            F.round(
                (F.col("grp_sum") - F.col("o_totalprice"))
                / (F.col("grp_n") - 1),
                4,
            ).alias("loo_enc"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Autocorrelation function of the daily revenue series (lags 1..7)
# --------------------------------------------------------------------------
@register(
    "acf_daily_revenue",
    oracle="""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d, round(sum(o_totalprice), 2) AS v
    FROM orders GROUP BY 1
),
lagged AS (
    SELECT v,
           lag(v, 1) OVER w AS l1, lag(v, 2) OVER w AS l2,
           lag(v, 3) OVER w AS l3, lag(v, 4) OVER w AS l4,
           lag(v, 5) OVER w AS l5, lag(v, 6) OVER w AS l6,
           lag(v, 7) OVER w AS l7
    FROM daily WINDOW w AS (ORDER BY d)
)
SELECT CAST(lag AS BIGINT) AS lag, round(acf, 6) AS acf
FROM (
    SELECT 1 AS lag, corr(v, l1) AS acf FROM lagged UNION ALL
    SELECT 2, corr(v, l2) FROM lagged UNION ALL
    SELECT 3, corr(v, l3) FROM lagged UNION ALL
    SELECT 4, corr(v, l4) FROM lagged UNION ALL
    SELECT 5, corr(v, l5) FROM lagged UNION ALL
    SELECT 6, corr(v, l6) FROM lagged UNION ALL
    SELECT 7, corr(v, l7) FROM lagged
)
ORDER BY lag
""",
)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily-revenue series at lags 1–7 — the
    first thing a forecaster plots (weekly seasonality shows up as a
    spike at lag 7). Lag is in SERIES positions over the date-ordered
    daily frame (the calendar is dense here; on a gappy calendar
    compose with daily_orders_gap_filled first). Pearson correlation
    is scale-invariant, so the engines' population-vs-sample variance
    conventions cancel; null pairs from the first k rows are skipped
    by both corr implementations.

    Daily v is rounded to 2dp before correlating (re-canonicalizes the
    float day-sums), and the ACF to 6dp — corr is normalized to [−1,1]
    where cross-engine accumulation wobble is ~1e-12.

    Scale shape: one groupBy(date) partial-agg shuffle reduces the
    table to a series frame (one row per day — years of data is still
    only thousands of rows), then ONE unbounded-ordered window feeds
    all seven lag columns and one global aggregate computes all seven
    correlations; the 7-row melt is metadata-sized. The window is a
    single-partition sort of a day-count-sized frame — model-sized by
    construction, the same collect rule as k-means centroids."""
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("v"))
    w = Window.orderBy("d")
    lagged = daily.select(
        "v", *[F.lag("v", k).over(w).alias(f"l{k}") for k in range(1, 8)]
    )
    acfs = lagged.agg(
        *[F.corr("v", f"l{k}").alias(f"a{k}") for k in range(1, 8)]
    )
    melted = acfs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("bigint").alias("lag"),
                        F.round(F.col(f"a{k}"), 6).alias("acf"),
                    )
                    for k in range(1, 8)
                ]
            )
        ).alias("r")
    )
    return melted.select("r.lag", "r.acf").orderBy("lag")


# --------------------------------------------------------------------------
# CUSUM changepoint candidates on the daily order-count series
# --------------------------------------------------------------------------
@register(
    "cusum_changepoint",
    oracle="""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS c
    FROM orders GROUP BY 1
),
stats AS (
    SELECT avg(CAST(c AS DOUBLE)) AS mu, stddev_pop(CAST(c AS DOUBLE)) AS sigma
    FROM daily
),
cusum AS (
    SELECT d, c,
           sum((c - mu) / sigma) OVER (ORDER BY d) AS s
    FROM daily CROSS JOIN stats
)
SELECT d, CAST(c AS BIGINT) AS n_orders, round(s, 6) AS cusum,
       CAST(row_number() OVER (ORDER BY abs(round(s, 6)) DESC, d) AS BIGINT) AS rank
FROM cusum
QUALIFY rank <= 5
ORDER BY rank
""",
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on daily order counts: standardize
    each day against the global mean/std, cumulate, and report the 5
    dates where |CUSUM| peaks — the classic "where did the level
    shift" screen (the argmax of |S_t| is the maximum-likelihood
    single changepoint under a mean-shift model). Rank ties broken by
    date; rank computed on the ROUNDED statistic so the cutoff cannot
    straddle a sub-ulp cross-engine difference.

    Scale shape: identical series-frame reasoning to acf_daily_revenue
    — one groupBy(date) shuffle to a day-count-sized frame, a 1-row
    stats aggregate folded in as literals (Spark side collects the
    2-value stats — model-sized collect rule — avoiding the
    BroadcastNestedLoopJoin a 1-row crossJoin would plan), then one
    ordered window for the cumulative sum and one for the rank."""
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    mu, sigma = daily.agg(
        F.avg(F.col("c").cast("double")),
        F.stddev_pop(F.col("c").cast("double")),
    ).head()
    w = Window.orderBy("d")
    cusum = daily.select(
        "d",
        "c",
        F.round(
            F.sum((F.col("c") - F.lit(mu)) / F.lit(sigma)).over(w), 6
        ).alias("cusum"),
    )
    ranked = cusum.select(
        # date → timestamp for output: pandas canonicalizes DuckDB DATE
        # to a midnight Timestamp, so the Spark side must match
        F.col("d").cast("timestamp").alias("d"),
        F.col("c").cast("bigint").alias("n_orders"),
        "cusum",
        F.row_number()
        .over(Window.orderBy(F.abs(F.col("cusum")).desc(), F.col("d")))
        .cast("bigint")
        .alias("rank"),
    )
    return ranked.filter(F.col("rank") <= 5).orderBy("rank")


# --------------------------------------------------------------------------
# Business-day shipping lag (weekend-skipping SLA clock)
# --------------------------------------------------------------------------
# weekdays from the Monday epoch 1970-01-05 through day x (inclusive),
# for x >= 0: full weeks contribute 5, the partial week min(x%7+1, 5).
# bd(a, b) = f(b) - f(a) = business days in the half-open (a, b].
_BD_ORACLE = """
WITH lag AS (
    SELECT o_orderpriority,
           datediff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE)) AS xa,
           datediff('day', DATE '1970-01-05', CAST(l_shipdate AS DATE)) AS xb
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
bd AS (
    SELECT o_orderpriority,
           ((xb // 7) * 5 + least(xb % 7 + 1, 5))
         - ((xa // 7) * 5 + least(xa % 7 + 1, 5)) AS bdays
    FROM lag
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       round(avg(CAST(bdays AS DOUBLE)), 6) AS avg_bdays,
       CAST(min(bdays) AS BIGINT) AS min_bdays,
       CAST(max(bdays) AS BIGINT) AS max_bdays
FROM bd
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("business_day_lag", oracle=_BD_ORACLE)
def business_day_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship lag measured in BUSINESS days (weekends excluded) per
    order priority — the SLA clock real logistics contracts use, where
    the reference's KPI chain counts raw calendar days
    (reference: notebooks/report.ipynb KPI cells; etl/main.py KPI agg).
    Day-of-week comes from pure integer arithmetic off the Monday
    epoch 1970-01-05 (f(x) = ⌊x/7⌋·5 + min(x mod 7 + 1, 5) = weekdays
    through day x; lag = f(ship) − f(order)), identical on both
    engines — no locale-dependent dayofweek() anywhere.

    Scale shape: the lineitem⋈orders join shuffles on the natural key
    (bucket both sides on orderkey at 100 TB and it vanishes); the
    business-day expression is codegen'd integer arithmetic, and the
    aggregate partial-combines into 5 groups. All-integer lag values
    make avg() exact up to one deterministic division."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    epoch = F.lit("1970-01-05").cast("date")

    def f(days):
        return (F.floor(days / 7) * 5) + F.least(days % 7 + 1, F.lit(5))

    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        (
            f(F.datediff(F.col("l_shipdate").cast("date"), epoch))
            - f(F.datediff(F.col("o_orderdate").cast("date"), epoch))
        ).alias("bdays"),
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(F.avg(F.col("bdays").cast("double")), 6).alias(
                "avg_bdays"
            ),
            F.min("bdays").cast("bigint").alias("min_bdays"),
            F.max("bdays").cast("bigint").alias("max_bdays"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Exponentially time-decayed part popularity (freshness-weighted top-k)
# --------------------------------------------------------------------------
@register(
    "decayed_popularity_topk",
    oracle="""
WITH anchor AS (SELECT max(CAST(l_shipdate AS DATE)) AS a FROM lineitem),
scored AS (
    SELECT l_partkey,
           sum(exp(-datediff('day', CAST(l_shipdate AS DATE), a) / 365.0)) AS score,
           count(*) AS n_ships
    FROM lineitem CROSS JOIN anchor
    GROUP BY l_partkey
)
SELECT l_partkey, CAST(n_ships AS BIGINT) AS n_ships,
       round(score, 6) AS decayed_score,
       CAST(row_number() OVER (ORDER BY round(score, 6) DESC, l_partkey) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 20
ORDER BY rank
""",
)
def decayed_popularity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by exponentially time-decayed ship count
    (half-life ≈ 253 days: weight = e^(−age/365) anchored at the
    corpus max ship date) — the freshness-weighted popularity ranking
    feeds/recommenders use instead of raw counts, so a part hot five
    years ago no longer outranks one hot last month. Rank on the
    ROUNDED score with partkey tiebreak so the top-20 cutoff is
    deterministic cross-engine.

    Scale shape: the anchor is a 1-value aggregate (Spark collects it
    — model-sized collect rule — and folds it in as a literal, so no
    BroadcastNestedLoopJoin); scoring is then a codegen'd projection
    into one groupBy(partkey) partial-combining shuffle, and the
    top-20 comes from orderBy().limit(20) — which genuinely plans as
    TakeOrderedAndProject (per-partition partial top-k, no global
    sort; ADVICE r03 flagged the previous global row_number form) —
    with the rank column assigned afterwards over the already-cut
    20-row frame."""
    li = table(spark, sf_dir, "lineitem")
    anchor = li.agg(F.max(F.col("l_shipdate").cast("date"))).head()[0]
    scored = li.groupBy("l_partkey").agg(
        F.sum(
            F.exp(
                -F.datediff(F.lit(anchor), F.col("l_shipdate").cast("date"))
                / F.lit(365.0)
            )
        ).alias("score"),
        F.count(F.lit(1)).cast("bigint").alias("n_ships"),
    )
    top = (
        scored.select(
            "l_partkey", "n_ships", F.round("score", 6).alias("decayed_score")
        )
        .orderBy(F.col("decayed_score").desc(), "l_partkey")
        .limit(20)
    )
    return top.select(
        "l_partkey",
        "n_ships",
        "decayed_score",
        F.row_number()
        .over(Window.orderBy(F.col("decayed_score").desc(), "l_partkey"))
        .cast("bigint")
        .alias("rank"),
    ).orderBy("rank")
