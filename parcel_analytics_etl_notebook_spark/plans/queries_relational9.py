"""Batch 9: statistical data-quality and analytic shapes — PSI
distribution drift, Benford first-digit conformance, cross-field
amount reconciliation, 2-D Pareto skyline, rolling 7-day distinct
actives, and Spearman rank correlation.

These round out the monitoring family started by ks_drift_acctbal /
chi2_priority_status (queries_relational8): PSI is the binned drift
score model-ops teams actually page on, Benford and amount
reconciliation are the classic financial DQ checks a parcel-revenue
warehouse (reference: /root/reference/etl/main.py KPI chain) runs
before trusting its totals, and the skyline/rolling-distinct/Spearman
trio are textbook analytic patterns with non-obvious scale-safe
rewrites worth encoding once.

Oracle-parity conventions as in plans/catalog.py: identical aliases,
BIGINT casts, rounded floats, deterministic tiebreaks. Where the naive
semantic definition is quadratic (skyline NOT EXISTS) the ORACLE keeps
the quadratic definition and the Spark side carries the O(N log N)
rewrite — the point is proving the rewrite equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table


@register(
    "psi_acctbal_drift",
    oracle="""
WITH ref AS (SELECT c_acctbal AS v FROM customer WHERE c_mktsegment = 'BUILDING'),
tgt AS (SELECT c_acctbal AS v FROM customer WHERE c_mktsegment = 'MACHINERY'),
edges AS (
    SELECT round(quantile_cont(v, 0.1), 4) AS e1, round(quantile_cont(v, 0.2), 4) AS e2,
           round(quantile_cont(v, 0.3), 4) AS e3, round(quantile_cont(v, 0.4), 4) AS e4,
           round(quantile_cont(v, 0.5), 4) AS e5, round(quantile_cont(v, 0.6), 4) AS e6,
           round(quantile_cont(v, 0.7), 4) AS e7, round(quantile_cont(v, 0.8), 4) AS e8,
           round(quantile_cont(v, 0.9), 4) AS e9
    FROM ref
),
binned AS (
    SELECT 'ref' AS side,
           1 + (v > e1)::INT + (v > e2)::INT + (v > e3)::INT + (v > e4)::INT
             + (v > e5)::INT + (v > e6)::INT + (v > e7)::INT + (v > e8)::INT
             + (v > e9)::INT AS bin
    FROM ref CROSS JOIN edges
    UNION ALL
    SELECT 'tgt' AS side,
           1 + (v > e1)::INT + (v > e2)::INT + (v > e3)::INT + (v > e4)::INT
             + (v > e5)::INT + (v > e6)::INT + (v > e7)::INT + (v > e8)::INT
             + (v > e9)::INT AS bin
    FROM tgt CROSS JOIN edges
),
counts AS (
    SELECT b.bin,
           count(*) FILTER (side = 'ref') AS n_ref,
           count(*) FILTER (side = 'tgt') AS n_tgt
    FROM binned b GROUP BY 1
),
tot AS (SELECT sum(n_ref) AS nr, sum(n_tgt) AS nt FROM counts),
terms AS (
    SELECT bin, n_ref, n_tgt,
           (CAST(n_tgt AS DOUBLE) + 0.5) / (nt + 5.0) AS pt,
           (CAST(n_ref AS DOUBLE) + 0.5) / (nr + 5.0) AS pr
    FROM counts CROSS JOIN tot
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_tgt AS BIGINT) AS n_tgt,
       round((pt - pr) * ln(pt / pr), 6) AS psi_term,
       round(sum((pt - pr) * ln(pt / pr)) OVER (), 6) AS psi_total
FROM terms
ORDER BY bin
""",
)
def psi_acctbal_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two segments' account-balance
    distributions, binned by the REFERENCE side's exact deciles — the
    standard "is serving drifting from training" score (PSI > 0.2 =
    page). Laplace-smoothed (+0.5 per bin) so an empty target bin
    contributes a finite term instead of ±inf.

    Scale shape: the 9 decile edges are MODEL-sized — computed with one
    exact-percentile aggregation over the reference slice and collected
    to the driver (the same model-sized-collect rule as k-means
    centroids, operators/clustering.py), then folded into a literal
    comparison chain so bin assignment is a codegen'd projection with
    no join at all. At 100 TB swap the exact percentile for
    approx_percentile(1e-4) — bin EDGES only need to be stable, not
    exact — and the rest of the plan is unchanged: one groupBy(bin)
    over each slice, 10-row result. Edges are rounded to 4dp BEFORE
    binning on both sides so the bin boundaries are engine-stable."""
    cust = table(spark, sf_dir, "customer")
    ref = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_acctbal").alias("v")
    )
    tgt = cust.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_acctbal").alias("v")
    )
    qs = [i / 10 for i in range(1, 10)]
    edges = [
        round(e, 4)
        for e in ref.agg(
            F.expr(f"percentile(v, array({','.join(map(str, qs))}))")
        ).head()[0]
    ]

    def bin_of(col):
        b = F.lit(1)
        for e in edges:
            b = b + (F.col(col) > F.lit(e)).cast("int")
        return b

    counts = (
        ref.select(bin_of("v").alias("bin"), F.lit(1).alias("r"), F.lit(0).alias("t"))
        .unionAll(
            tgt.select(
                bin_of("v").alias("bin"), F.lit(0).alias("r"), F.lit(1).alias("t")
            )
        )
        .groupBy("bin")
        .agg(F.sum("r").alias("n_ref"), F.sum("t").alias("n_tgt"))
    )
    # grand totals via an unbounded window over the 10-row counts frame
    # (no 1-row crossJoin: that plans as BroadcastNestedLoopJoin, which
    # the catalog plan fence forbids)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pt = (F.col("n_tgt").cast("double") + 0.5) / (
        F.sum("n_tgt").over(wall).cast("double") + 5.0
    )
    pr = (F.col("n_ref").cast("double") + 0.5) / (
        F.sum("n_ref").over(wall).cast("double") + 5.0
    )
    term = (pt - pr) * F.log(pt / pr)
    return (
        counts.select(
            F.col("bin").cast("bigint").alias("bin"),
            F.col("n_ref").cast("bigint").alias("n_ref"),
            F.col("n_tgt").cast("bigint").alias("n_tgt"),
            F.round(term, 6).alias("psi_term"),
            F.round(F.sum(term).over(wall), 6).alias("psi_total"),
        )
        .orderBy("bin")
    )


@register(
    "benford_first_digit",
    oracle="""
WITH d AS (
    SELECT CAST(substring(CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS BIGINT) AS digit
    FROM orders WHERE o_totalprice >= 1
),
c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
tot AS (SELECT sum(n) AS total FROM c)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / total, 4) AS observed_p,
       round(log10(1.0 + 1.0 / digit), 4) AS benford_p,
       round(abs(CAST(n AS DOUBLE) / total - log10(1.0 + 1.0 / digit)), 4)
           AS abs_dev
FROM c CROSS JOIN tot
ORDER BY digit
""",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance of order totals: observed first-digit
    frequency vs log10(1 + 1/d) — the standard forensic-accounting
    anomaly screen (fabricated or capped amounts flatten the curve).

    First digit is taken from the DECIMAL(18,2) string rendering, not
    floor(v/10^floor(log10 v)): decimal formatting is exactly specified
    in both engines while float log10 at power-of-ten boundaries is
    not. Scale: one projection + one 9-row groupBy; total-normalization
    via an unbounded window over the 9-row frame (no 1-row crossJoin —
    plan-fence rule), so cost is a single scan of orders."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)").cast("string"),
            1,
            1,
        )
        .cast("bigint")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    obs = F.col("n").cast("double") / F.sum("n").over(wall)
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        c.select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round(obs, 4).alias("observed_p"),
            F.round(benford, 4).alias("benford_p"),
            F.round(F.abs(obs - benford), 4).alias("abs_dev"),
        )
        .orderBy("digit")
    )


@register(
    "order_amount_reconciliation",
    oracle="""
WITH li AS (
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS recomputed
    FROM lineitem GROUP BY 1
),
j AS (
    SELECT o.o_orderkey, o.o_totalprice, li.recomputed,
           CASE
             WHEN li.recomputed IS NULL THEN 'missing_lineitems'
             WHEN abs(o.o_totalprice - li.recomputed) / o.o_totalprice < 0.001
                 THEN 'ok'
             WHEN abs(o.o_totalprice - li.recomputed) / o.o_totalprice < 0.05
                 THEN 'minor_gap'
             ELSE 'major_gap'
           END AS status
    FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
)
SELECT status, CAST(count(*) AS BIGINT) AS n_orders,
       round(avg(CASE WHEN recomputed IS NOT NULL
                 THEN abs(o_totalprice - recomputed) / o_totalprice END), 4)
           AS avg_rel_gap
FROM j GROUP BY status ORDER BY status
""",
)
def order_amount_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-field consistency audit: recompute each order's total from
    its line items (extendedprice·(1-discount)·(1+tax)) and bucket the
    relative gap against the stored o_totalprice — the reconciliation
    every finance pipeline runs before publishing revenue, and the
    amount-level complement to referential_integrity_audit's key-level
    checks.

    Scale: one groupBy(l_orderkey) partial-aggregates map-side, one
    equi-join on the order key (both sides shuffle-partitioned on it),
    then a 4-row status rollup. Per-order sums are rounded to 2dp
    before the ratio so float accumulation order can't flip a bucket
    boundary between engines."""
    o = table(spark, sf_dir, "orders")
    li = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("recomputed")
        )
    )
    rel = F.abs(F.col("o_totalprice") - F.col("recomputed")) / F.col("o_totalprice")
    j = o.join(li, o.o_orderkey == li.l_orderkey, "left").select(
        "o_totalprice",
        "recomputed",
        F.when(F.col("recomputed").isNull(), "missing_lineitems")
        .when(rel < 0.001, "ok")
        .when(rel < 0.05, "minor_gap")
        .otherwise("major_gap")
        .alias("status"),
    )
    return (
        j.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(
                F.avg(F.when(F.col("recomputed").isNotNull(), rel)), 4
            ).alias("avg_rel_gap"),
        )
        .orderBy("status")
    )


@register(
    "pareto_customers",
    oracle="""
WITH pts AS (
    SELECT c.c_custkey, round(sum(o.o_totalprice), 2) AS spend, c.c_acctbal
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_acctbal
)
SELECT p.c_custkey, p.spend, p.c_acctbal
FROM pts p
WHERE NOT EXISTS (
    SELECT 1 FROM pts q
    WHERE q.spend >= p.spend AND q.c_acctbal >= p.c_acctbal
      AND (q.spend > p.spend OR q.c_acctbal > p.c_acctbal)
)
ORDER BY p.spend DESC, p.c_acctbal DESC, p.c_custkey
""",
)
def pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline: customers not dominated on (total spend,
    account balance) — the "best tradeoff frontier" query (supplier
    shortlists, price-vs-latency routing tables) whose semantic
    definition is a quadratic NOT EXISTS self-join.

    The oracle keeps that quadratic definition; this side carries the
    O(N log N) rewrite that survives 100 TB: collapse to one row per
    distinct spend value (max balance per group, one shuffle), take the
    running strictly-preceding max balance along descending spend (one
    single-partition window over the COLLAPSED frame — O(distinct
    spends), and at extreme cardinality the frontier is monotone so the
    frame can be pre-thinned per partition with mapInPandas before the
    global pass), then keep points whose balance (a) equals their spend
    group's max and (b) strictly exceeds every higher-spend group's
    max. Equal (spend, balance) duplicates all survive — neither
    dominates the other."""
    from parcel_analytics_etl_notebook_spark.operators.skyline import (
        pareto_frontier_2d,
    )

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    pts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .persist()  # reused by the frontier pass AND the final match —
        # without it the orders⨝customer aggregation runs twice
    )
    return (
        pareto_frontier_2d(pts, x="spend", y="c_acctbal")
        .select("c_custkey", "spend", "c_acctbal")
        .orderBy(F.col("spend").desc(), F.col("c_acctbal").desc(), "c_custkey")
    )


@register(
    "rolling_7d_active_users",
    oracle="""
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
days AS (SELECT DISTINCT d FROM du)
SELECT CAST(days.d AS VARCHAR) AS day,
       CAST(count(DISTINCT du.user_id) AS BIGINT) AS active_7d
FROM days JOIN du
  ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
GROUP BY days.d ORDER BY days.d
""",
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per observed day — the WAU
    curve. Sliding DISTINCT cannot use a plain window frame (distinct
    isn't decomposable over frames), so the classic rewrite: collapse
    events to distinct (day, user) once, then let each pair VOTE for
    the ≤7 observed days it keeps the user active in, and count
    distinct per day.

    Scale: the collapse is one shuffle of day-grain pairs (O(users ×
    active-days), vastly smaller than events); the vote explode is a
    bounded ×7; the day-filter join keys on the day grid, which is
    CALENDAR-bounded (grows with time horizon, not data volume) — a
    legitimate broadcast under the model-bounded-side rule
    (SCALING.md). The final distinct-count reshuffles on day."""
    from parcel_analytics_etl_notebook_spark.operators.aggregates import (
        rolling_distinct_actives,
    )

    ev = table(spark, sf_dir, "events")
    return (
        rolling_distinct_actives(
            ev, ts_col="ts", id_col="user_id", window_days=7,
            out_day="day", out_count="active_7d",
        )
        .select(F.col("day").cast("string").alias("day"), "active_7d")
        .orderBy("day")
    )


@register(
    "spearman_spend_balance",
    oracle="""
WITH pts AS (
    SELECT c.c_custkey, round(sum(o.o_totalprice), 2) AS spend, c.c_acctbal
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_acctbal
),
ranked AS (
    SELECT (2.0 * rank() OVER (ORDER BY spend)
            + count(*) OVER (PARTITION BY spend) - 1) / 2.0 AS r_spend,
           (2.0 * rank() OVER (ORDER BY c_acctbal)
            + count(*) OVER (PARTITION BY c_acctbal) - 1) / 2.0 AS r_bal
    FROM pts
)
SELECT CAST(count(*) AS BIGINT) AS n,
       round(corr(r_spend, r_bal), 4) AS spearman_rho
FROM ranked
""",
)
def spearman_spend_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between customer spend and account
    balance: Pearson correlation over AVERAGE ranks (the tie-correct
    fractional-rank form, (2·rank + ties − 1)/2), answering "is balance
    monotonically informative about spend" without assuming linearity —
    the feature-screening statistic for skewed monetary columns where
    Pearson is outlier-dominated.

    Scale: fully distributed — NO single-partition window anywhere
    (VERDICT r03 #3). Each dimension's tie-averaged rank comes from
    operators/indexing.global_frac_rank directly ON the customer-grain
    rows: one shuffle on the dimension's literal-boundary bucket, an
    in-bucket rank() window plus a (bucket, value) tie-count window
    sharing that partitioning, and the broadcast bucket offsets —
    no value-grain groupBy and no join-back (the rank-map composition
    this replaced spent both per dimension). ONE up-front aggregate
    supplies both dimensions' bucket boundaries (batched, so the
    operators spend zero percentile actions); corr() stays a one-pass
    mergeable aggregate. Ranks are exact rationals (.0/.5) so the only
    float rounding is in corr itself, rounded to 4dp both sides."""
    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        global_frac_rank,
    )

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    pts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .persist()  # read by the boundary action and the rank chain
    )
    probs = [i / 32 for i in range(1, 32)]
    brow = pts.agg(
        F.percentile_approx(F.col("spend").cast("double"), probs, 1000).alias("s"),
        F.percentile_approx(F.col("c_acctbal").cast("double"), probs, 1000).alias("b"),
    ).first()

    ranked = global_frac_rank(
        global_frac_rank(
            pts, "spend", out_col="r_spend", boundaries=brow["s"]
        ),
        "c_acctbal",
        out_col="r_bal",
        boundaries=brow["b"],
    ).select("r_spend", "r_bal")
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.corr("r_spend", "r_bal"), 4).alias("spearman_rho"),
    )


@register(
    "mom_revenue_growth",
    oracle="""
WITH m AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders GROUP BY 1
)
SELECT CAST(month AS VARCHAR) AS month, revenue,
       round((revenue - lag(revenue) OVER (ORDER BY month))
             / lag(revenue) OVER (ORDER BY month), 4) AS mom_growth
FROM m ORDER BY month
""",
)
def mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly rollup, then pct change
    vs the previous month via lag — the first derivative every revenue
    dashboard shows. First month's growth is NULL (no prior), not 0.

    Scale: the rollup is one shuffle with map-side partials; the lag
    window runs over the COLLAPSED month frame (calendar-bounded, not
    data-bounded), so the single-partition sort is O(months). Revenue
    rounded to 2dp before the ratio, ratio to 4dp, both sides."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return (
        m.select(
            F.col("month").cast("string").alias("month"),
            "revenue",
            F.round((F.col("revenue") - prev) / prev, 4).alias("mom_growth"),
        )
        .orderBy("month")
    )


@register(
    "daily_value_anomalies",
    oracle="""
WITH d AS (
    SELECT CAST(ts AS DATE) AS day, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1
),
s AS (
    SELECT day, total_value,
           avg(total_value) OVER ()         AS mu,
           stddev_samp(total_value) OVER () AS sigma
    FROM d
)
SELECT CAST(day AS VARCHAR) AS day, total_value,
       round((total_value - mu) / sigma, 4) AS zscore
FROM s
WHERE abs((total_value - mu) / sigma) > 1.5
ORDER BY day
""",
)
def daily_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-total anomaly flags: days whose event-value sum deviates
    more than 1.5 sample standard deviations from the all-days mean —
    the simplest useful pipeline-health monitor (traffic cliffs,
    double-ingest spikes) and the batch twin of a streaming alert.

    Scale: one shuffle collapses events to day grain; mean/stddev are
    unbounded windows over the O(days) calendar-bounded frame. Daily
    totals rounded to 2dp BEFORE the z-score so float accumulation
    order can't move a day across the threshold between engines."""
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("total_value")
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    z = (F.col("total_value") - F.avg("total_value").over(wall)) / F.stddev_samp(
        "total_value"
    ).over(wall)
    return (
        d.select(
            F.col("day").cast("string").alias("day"),
            "total_value",
            F.round(z, 4).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > 1.5)
        .orderBy("day")
    )


#: base poly hash of the id alone — computed once per row; the per-k
#: label derives from a cheap quadratic mix of (base + k·C), NOT a
#: per-(row,k) re-hash of the concatenated string (that ran the
#: char-level rolling hash N·K times — the mix is N hashes + N·K
#: integer ops). Quadratic, not affine: (a·h+b) mod p keeps too much
#: of h's parity structure for a parity-based label.
_RTEST_POLY = (
    "CAST(list_reduce(list_prepend('0', string_split("
    "CAST(id AS VARCHAR), '')), "
    "(acc, ch) -> CAST((CAST(acc AS BIGINT)*31 + unicode(ch)) % 1000000007 "
    "AS VARCHAR)) AS BIGINT)"
)
_RTEST_MIX = "((({h} + k * 12345) * (({h} + k * 12345) % 1000003)) % 1000000007)"


@register(
    "randomization_test_acctbal",
    oracle=f"""
WITH base AS (
    SELECT c_custkey AS id, c_acctbal AS v,
           (c_mktsegment = 'BUILDING') AS is_real
    FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
),
ks AS (SELECT unnest(range(0, 201)) AS k),
h AS (SELECT v, is_real, {_RTEST_POLY} AS hv FROM base),
ex AS (
    SELECT v, k,
           CASE WHEN k = 0 THEN is_real
                ELSE ({_RTEST_MIX.format(h='hv')} % 2 = 0) END AS lab
    FROM h CROSS JOIN ks
),
g AS (
    SELECT k,
           round(avg(v) FILTER (lab) - avg(v) FILTER (NOT lab), 6) AS diff
    FROM ex GROUP BY k
),
d0 AS (SELECT diff AS obs FROM g WHERE k = 0)
SELECT round(obs, 6) AS observed_diff,
       CAST(200 AS BIGINT) AS n_perms,
       round((1.0 + count(*) FILTER (k > 0 AND abs(diff) >= abs(obs)))
             / 201.0, 4) AS p_value
FROM g CROSS JOIN d0
GROUP BY obs
""",
)
def randomization_test_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization (approximate permutation) test for the mean
    account-balance difference between two market segments: 200
    deterministic label reassignments (Bernoulli-½ via a quadratic mix
    of the cross-engine poly base hash with k — one char-level hash per
    ROW, K cheap integer mixes, instead of N·K re-hashes) build the
    null distribution of the mean difference; the p-value is
    the add-one-smoothed fraction of reassignments at least as extreme
    as the observed difference (k = 0 carries the REAL labels through
    the identical code path, so "observed" and "null" are computed by
    the same expressions).

    The inferential complement to ks_drift/chi2/psi: those ask "how
    different are the distributions", this asks "could the mean gap be
    chance". Scale: the explode factor is the permutation count K —
    bounded by the test design, not the data; one groupBy(k) with
    map-side partials does all K aggregations in a single shuffle of
    K·2 partials per task; the p-value is arithmetic over the
    O(K)-row frame. Per-k means are rounded to 6dp BEFORE the
    extremity comparison so float accumulation order can't flip a
    permutation across the |diff| >= |obs| boundary between engines."""
    from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
        poly_hash,
    )

    K = 200
    base = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_acctbal").alias("v"),
            (F.col("c_mktsegment") == "BUILDING").alias("is_real"),
        )
    )
    h = base.select(
        "v", "is_real", poly_hash(F.col("id").cast("string")).alias("hv")
    )
    mixed = (F.col("hv") + F.col("k") * 12345) * (
        (F.col("hv") + F.col("k") * 12345) % 1000003
    ) % F.lit(1000000007)
    ex = h.select(
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(K))).alias("k"),
        "is_real",
        "hv",
    ).select(
        "v",
        "k",
        F.when(F.col("k") == 0, F.col("is_real"))
        .otherwise(mixed % 2 == 0)
        .alias("lab"),
    )
    g = ex.groupBy("k").agg(
        F.round(
            F.avg(F.when(F.col("lab"), F.col("v")))
            - F.avg(F.when(~F.col("lab"), F.col("v"))),
            6,
        ).alias("diff")
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    obs = F.max(F.when(F.col("k") == 0, F.col("diff"))).over(wall)
    extreme = (
        (F.col("k") > 0) & (F.abs(F.col("diff")) >= F.abs(F.col("obs")))
    ).cast("long")
    return (
        g.withColumn("obs", obs)
        .groupBy("obs")
        .agg(
            F.round((1.0 + F.sum(extreme)) / (K + 1.0), 4).alias("p_value")
        )
        .select(
            F.round(F.col("obs"), 6).alias("observed_diff"),
            F.lit(K).cast("bigint").alias("n_perms"),
            "p_value",
        )
    )


#: power-iteration count, shared by the engine loop and the oracle's
#: CTE unroll so the two always agree; every _PR_CHECKPOINT_EVERY
#: iterations the (model-sized, |nodes|-row) ranks frame is
#: localCheckpoint'ed — Catalyst re-optimization over an N-deep
#: join-agg chain grows superlinearly in N (VERDICT r04 #7), and
#: truncating lineage every few steps bounds plan depth at the cost of
#: one tiny job per checkpoint. (kmeans_fit needs no such bound: it
#: collects centroids each iteration, so its plan depth is constant.)
_PR_ITERS = 10
_PR_CHECKPOINT_EVERY = 5


def _pagerank_oracle() -> str:
    d = 0.85
    iters = _PR_ITERS
    ctes = []
    for i in range(1, iters + 1):
        prev = f"it{i - 1}"
        ctes.append(f"""
it{i} AS (
    SELECT e.dst AS node,
           (1 - {d}) / nn.n + {d} * sum({prev}.rank * e.p) AS rank
    FROM {prev} JOIN edges e ON {prev}.node = e.src
    CROSS JOIN nn
    GROUP BY e.dst, nn.n
)""")
    return f"""
WITH seq AS (
    SELECT event_type AS src,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS dst
    FROM events
),
cnt AS (
    SELECT src, dst, count(*) AS n FROM seq WHERE dst IS NOT NULL
    GROUP BY src, dst
),
edges AS (
    SELECT src, dst,
           CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src) AS p
    FROM cnt
),
nodes AS (SELECT DISTINCT event_type AS node FROM events),
nn AS (SELECT count(*) AS n FROM nodes),
it0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
{",".join(ctes)}
SELECT node AS event_type, round(rank, 6) AS pagerank
FROM it{iters} ORDER BY pagerank DESC, event_type
"""


@register("event_type_pagerank", oracle=_pagerank_oracle())
def event_type_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph (damping 0.85, 10
    fixed power iterations): which states of the behavioral Markov
    chain accumulate long-run importance — the graph-centrality member
    of the analytics family, next to the one-step
    event_transition_matrix view. The oracle unrolls all ten
    iterations as chained CTEs (the same hash-verified-iterative
    discipline as kmeans_centroids), so the fixpoint arithmetic is
    checked end-to-end, not just the final ordering.

    Scale shape: the EDGE build is the only data-scale work (one
    user_id window + one |types|²-row aggregate); the iteration runs
    entirely on model-sized frames (|nodes| rows), each step one
    hash-join + re-agg — on a billion-edge graph the same loop
    shuffles on dst per iteration, which is exactly distributed
    PageRank (Pregel's shape) expressed relationally. Node count
    enters as a driver scalar (model-sized collect rule)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    cnt = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    share = Window.partitionBy("src")
    edges = cnt.select(
        "src",
        "dst",
        (F.col("n").cast("double") / F.sum("n").over(share)).alias("p"),
    ).persist()
    nodes = ev.select(F.col("event_type").alias("node")).distinct().persist()
    n_nodes = nodes.count()
    d = 0.85
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for i in range(1, _PR_ITERS + 1):
        ranks = (
            ranks.join(edges, ranks.node == edges.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit((1 - d) / n_nodes)
                    + F.lit(d) * F.sum(F.col("rank") * F.col("p"))
                ).alias("rank")
            )
        )
        if i % _PR_CHECKPOINT_EVERY == 0 and i < _PR_ITERS:
            # bound lineage/plan depth on the |nodes|-row frame; at a
            # larger node alphabet swap for reliable checkpoint().
            # eager=False (r12): lineage truncation without a blocking
            # per-checkpoint driver job — materializes in the final
            # action's pipeline
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(
        F.col("node").alias("event_type"),
        F.round("rank", 6).alias("pagerank"),
    ).orderBy(F.col("pagerank").desc(), "event_type")


@register(
    "nearby_customer_pairs",
    oracle="""
WITH pts AS (
    SELECT c_custkey AS id,
           ((c_custkey * 9973) % 18000) / 100.0 - 90.0 AS lat,
           (((c_custkey * c_custkey) % 1000003) % 36000) / 100.0 - 180.0 AS lon
    FROM customer
)
SELECT a.id AS id_a, b.id AS id_b,
       round(sqrt((a.lat - b.lat) * (a.lat - b.lat)
                  + (a.lon - b.lon) * (a.lon - b.lon)), 4) AS dist
FROM pts a JOIN pts b
  ON a.id < b.id
WHERE (a.lat - b.lat) * (a.lat - b.lat)
      + (a.lon - b.lon) * (a.lon - b.lon) <= 1.0
ORDER BY id_a, id_b
""",
)
def nearby_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial self-join: all point pairs within distance 1.0 — the
    grid-bucketing rewrite of a quadratic distance join. Coordinates
    are synthetic (derived deterministically from the key, with the
    longitude squared-mixed so the two axes decorrelate — two LINEAR
    congruential coordinates put every point on a sparse lattice line
    and the join matched nothing; the driver tables carry no geo
    columns, the JOIN PATTERN is what this query encodes), planar
    Euclidean; the haversine swap changes only the
    residual predicate.

    The oracle keeps the quadratic definition; this side buckets the
    plane into r-sized grid cells, explodes ONE side to its 3×3 cell
    neighborhood (bounded ×9), equi-joins on the cell id against the
    other side's home cell, and re-applies the exact distance as a
    residual filter — each qualifying pair meets exactly once because
    the home cell is unique, so no post-dedup. Cost: 9·N join rows on
    a uniform integer key vs N²/2 comparisons; the same rewrite as
    operators/rangejoin (1-D) lifted to 2-D, and the standard shape
    for geo joins at 100 TB (geohash/S2/H3 cells are this with a
    sphere-aware cell function)."""
    r = 1.0
    c = table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (((F.col("c_custkey") * 9973) % 18000) / 100.0 - 90.0).alias("lat"),
        ((((F.col("c_custkey") * F.col("c_custkey")) % 1000003) % 36000)
         / 100.0 - 180.0).alias("lon"),
    )
    cx = F.floor(F.col("lon") / r)
    cy = F.floor(F.col("lat") / r)
    home = pts.select(
        F.col("id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.concat_ws(":", cx, cy).alias("cell"),
    )
    neigh = (
        pts.select(
            F.col("id").alias("id_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            cx.alias("cx"),
            cy.alias("cy"),
        )
        .select(
            "id_a",
            "lat_a",
            "lon_a",
            F.explode(
                F.array(
                    *[
                        F.concat_ws(
                            ":", F.col("cx") + dx, F.col("cy") + dy
                        )
                        for dx in (-1, 0, 1)
                        for dy in (-1, 0, 1)
                    ]
                )
            ).alias("cell"),
        )
    )
    d2 = (F.col("lat_a") - F.col("lat_b")) * (
        F.col("lat_a") - F.col("lat_b")
    ) + (F.col("lon_a") - F.col("lon_b")) * (F.col("lon_a") - F.col("lon_b"))
    return (
        neigh.join(home, "cell")
        .filter((F.col("id_a") < F.col("id_b")) & (d2 <= F.lit(r * r)))
        .select(
            "id_a",
            "id_b",
            F.round(F.sqrt(d2), 4).alias("dist"),
        )
        .orderBy("id_a", "id_b")
    )
