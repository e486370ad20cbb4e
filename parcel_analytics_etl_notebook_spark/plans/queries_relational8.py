"""Batch 8: classic warehouse analytics shapes the catalog lacked —
market-basket affinity, sweep-line concurrency, robust (MAD) outliers,
gaps-and-islands streaks, time-weighted averages, and the
sorted-neighborhood alternative to LSH blocking.

These generalize the reference's single fixed KPI pipeline
(``/root/reference/etl/main.py``) along the read-patterns a parcel
warehouse asks next: "what ships together" (affinity), "how many
orders are open at once" (concurrency), "which totals are anomalous"
(robust outliers), "how long do customers stay active" (streaks).
Oracle-parity conventions as in plans/catalog.py: identical aliases,
BIGINT casts, rounded floats, deterministic tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table


@register(
    "market_basket_lift",
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
    SELECT a.l_partkey AS part1, b.l_partkey AS part2,
           count(*) AS n_ab
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 2
),
item AS (SELECT l_partkey, count(DISTINCT l_orderkey) AS n
         FROM li GROUP BY 1),
tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li)
SELECT part1, part2, CAST(n_ab AS BIGINT) AS n_ab,
       round(CAST(n_ab AS DOUBLE) * tot.n_orders / (ia.n * ib.n), 4)
           AS lift
FROM pairs
CROSS JOIN tot
JOIN item ia ON ia.l_partkey = part1
JOIN item ib ON ib.l_partkey = part2
ORDER BY n_ab DESC, part1, part2
LIMIT 100
""",
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: part pairs co-occurring in the same
    order, with support count and lift = P(a,b) / (P(a)·P(b)).

    Scale shape: ONE shuffle builds per-order part sets
    (collect_set groups on l_orderkey, partial-aggregated map-side);
    pair expansion then happens INSIDE the row via higher-order
    functions — C(basket, 2) structs per order, bounded by the max
    basket size (7 in TPC-H-like data), with no self-join and no
    second scan of lineitem. Per-item order counts and the grand total
    derive from the same sets frame, so lineitem is read once. The
    1-row total broadcasts; the two item-count joins key on part
    (AQE strategy — part cardinality is data-scale, so no broadcast
    hint per the broadcast-side audit rule). Top-100 with a unique
    (n_ab desc, part1, part2) tiebreak compiles to
    TakeOrderedAndProject — no global sort materializes.
    (v1 used distinct + orderkey self-join: same answer and a similar
    exchange COUNT, but it scanned and shuffled full lineitem three
    times — this shape shuffles it once; the remaining exchanges move
    the post-filter pair/item frames, which are orders of magnitude
    smaller.)"""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    arr = F.col("parts")
    pair_structs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda y: F.struct(x.alias("part1"), y.alias("part2")),
            ),
        )
    )
    pairs = (
        sets.select(F.explode(pair_structs).alias("p"))
        .select("p.part1", "p.part2")
        .groupBy("part1", "part2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    item = (
        sets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = sets.agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        pairs.crossJoin(F.broadcast(tot))
        .join(
            item.select(
                F.col("l_partkey").alias("part1"), F.col("n").alias("na")
            ),
            "part1",
        )
        .join(
            item.select(
                F.col("l_partkey").alias("part2"), F.col("n").alias("nb")
            ),
            "part2",
        )
        .select(
            "part1",
            "part2",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n_orders")
                / (F.col("na") * F.col("nb")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_ab"), "part1", "part2")
        .limit(100)
    )


@register(
    "max_concurrent_orders",
    oracle="""
WITH iv AS (
    SELECT o.o_orderpriority,
           CAST(o.o_orderdate AS DATE) AS d0,
           CAST(max(l.l_shipdate) AS DATE) + 1 AS d1
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
),
deltas AS (
    SELECT o_orderpriority, d0 AS day, 1 AS delta FROM iv
    UNION ALL
    SELECT o_orderpriority, d1 AS day, -1 FROM iv
),
daily AS (
    SELECT o_orderpriority, day, sum(delta) AS net
    FROM deltas GROUP BY 1, 2
),
cum AS (
    SELECT o_orderpriority, day,
           sum(net) OVER (PARTITION BY o_orderpriority
                          ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS open_cnt
    FROM daily
)
SELECT o_orderpriority,
       CAST(max(open_cnt) AS BIGINT) AS peak_open,
       CAST(min(day) FILTER (
           WHERE open_cnt = (SELECT max(c2.open_cnt) FROM cum c2
                             WHERE c2.o_orderpriority
                                   = cum.o_orderpriority)
       ) AS VARCHAR) AS peak_day
FROM cum
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def max_concurrent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency: peak number of simultaneously-open
    orders per priority, where an order is open from o_orderdate
    through its last lineitem shipdate (inclusive).

    The interval-overlap counting problem without an interval self-join:
    each interval becomes a +1/-1 delta pair, deltas pre-aggregate to
    one row per (priority, day) BEFORE the window — so the running-sum
    window scans O(distinct days), not O(orders). That pre-aggregation
    is the 100 TB move: the cumulative window is partitioned by
    priority (bounded cardinality → one sort per partition of a
    day-grain frame, thousands of rows regardless of order count).
    Peak day = FIRST day the max is reached (deterministic tiebreak)."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    iv = (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            "o_orderpriority",
            F.to_date("o_orderdate").alias("d0"),
            F.date_add(F.to_date("last_ship"), 1).alias("d1"),
        )
    )
    deltas = iv.select(
        "o_orderpriority", F.col("d0").alias("day"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select(
            "o_orderpriority",
            F.col("d1").alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    daily = deltas.groupBy("o_orderpriority", "day").agg(
        F.sum("delta").alias("net")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.withColumn("open_cnt", F.sum("net").over(w))
    wp = Window.partitionBy("o_orderpriority")
    return (
        cum.withColumn("peak", F.max("open_cnt").over(wp))
        .groupBy("o_orderpriority")
        .agg(
            F.max("open_cnt").cast("bigint").alias("peak_open"),
            F.min(
                F.when(F.col("open_cnt") == F.col("peak"), F.col("day"))
            )
            .cast("string")
            .alias("peak_day"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "mad_outlier_rate",
    oracle="""
WITH med AS (
    SELECT o_orderpriority, median(o_totalprice) AS med
    FROM orders GROUP BY 1
),
dev AS (
    SELECT o.o_orderpriority, o.o_totalprice, m.med,
           abs(o.o_totalprice - m.med) AS adev
    FROM orders o JOIN med m USING (o_orderpriority)
),
mad AS (
    SELECT o_orderpriority, median(adev) AS mad FROM dev GROUP BY 1
)
SELECT d.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       round(any_value(d.med), 2) AS med,
       round(any_value(m.mad), 2) AS mad,
       CAST(count(*) FILTER (
            WHERE d.adev > 3 * 1.4826 * m.mad) AS BIGINT) AS n_outliers,
       round(CAST(count(*) FILTER (
            WHERE d.adev > 3 * 1.4826 * m.mad) AS DOUBLE)
            / count(*), 4) AS outlier_rate
FROM dev d JOIN mad m USING (o_orderpriority)
GROUP BY d.o_orderpriority
ORDER BY d.o_orderpriority
""",
)
def mad_outlier_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: per-priority outlier rate under the
    median/MAD rule (|x − median| > 3·1.4826·MAD) — the
    skew-insensitive alternative to mean/stddev z-scores, which a
    single mispriced order can drag.

    Two grouped exact medians (Spark's `median` is exact
    percentile(0.5), matching DuckDB's interpolation bit-for-bit on
    doubles), each joined back on the grouping key. The per-group
    median/MAD frames are group-cardinality (5 rows here, bounded by
    the priority enumeration), so both joins are explicit broadcasts:
    three scans of orders, zero shuffle of the fact beyond the grouped
    aggregations themselves. The boundary comparison is deterministic
    across engines because both sides derive med/MAD from identical
    double inputs with the same interpolation."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    med = o.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("med")
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").withColumn(
        "adev", F.abs(F.col("o_totalprice") - F.col("med"))
    )
    mad = dev.groupBy("o_orderpriority").agg(F.median("adev").alias("mad"))
    out_cond = F.col("adev") > 3 * 1.4826 * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.first("med"), 2).alias("med"),
            F.round(F.first("mad"), 2).alias("mad"),
            F.sum(out_cond.cast("long")).cast("bigint").alias("n_outliers"),
            F.round(
                F.sum(out_cond.cast("long")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("outlier_rate"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "monthly_order_streaks",
    oracle="""
WITH months AS (
    SELECT DISTINCT o_custkey,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
               AS mnum
    FROM orders
),
grp AS (
    SELECT o_custkey, mnum,
           mnum - row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY mnum) AS g
    FROM months
),
streaks AS (
    SELECT o_custkey, g, count(*) AS streak
    FROM grp GROUP BY 1, 2
),
best AS (
    SELECT o_custkey, max(streak) AS best_streak
    FROM streaks GROUP BY 1
)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(max(b.best_streak) AS BIGINT) AS max_streak,
       round(avg(CAST(b.best_streak AS DOUBLE)), 4) AS avg_best_streak
FROM best b JOIN customer c ON c.c_custkey = b.o_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""",
)
def monthly_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each customer's longest run of CONSECUTIVE
    months with at least one order, summarized per market segment —
    the engagement-streak metric behind retention dashboards.

    The islands trick (month_number − row_number = constant within a
    consecutive run) turns streak detection into two grouped counts:
    no self-join, no iterative pass. Everything keys on o_custkey, so
    the distinct, the window, and both aggregations share one shuffle
    partitioning; the final segment rollup joins the per-customer
    1-row frame to the customer dim on its key. Customer-month grain
    caps the window input at 12·years rows per customer."""
    o = table(spark, sf_dir, "orders")
    months = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("mnum"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("mnum")
    best = (
        months.withColumn("g", F.col("mnum") - F.row_number().over(w))
        .groupBy("o_custkey", "g")
        .agg(F.count(F.lit(1)).alias("streak"))
        .groupBy("o_custkey")
        .agg(F.max("streak").alias("best_streak"))
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        best.join(c, best.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.max("best_streak").cast("bigint").alias("max_streak"),
            F.round(F.avg(F.col("best_streak").cast("double")), 4).alias(
                "avg_best_streak"
            ),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "time_weighted_avg_value",
    oracle="""
WITH seq AS (
    SELECT user_id, value,
           epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
           lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id
               ORDER BY ts, event_id) AS nxt_us
    FROM events
    WHERE value IS NOT NULL
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value * (nxt_us - t_us))
             / sum(nxt_us - t_us), 4) AS twap,
       round(sum(nxt_us - t_us) / 1e6, 2) AS span_secs
FROM seq
WHERE nxt_us IS NOT NULL
GROUP BY user_id
HAVING sum(nxt_us - t_us) > 0
ORDER BY user_id
""",
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) of the event value per user: each
    observation is weighted by how long it was the "current" value —
    the honest average for irregularly-sampled measurements, where the
    arithmetic mean over-weights bursts.

    Single window (lead of the microsecond timestamp) and a grouped
    sum, both partitioned by user_id — one shuffle total. Microsecond
    integer arithmetic (`unix_micros` / `epoch_us`) on both sides
    keeps the weights exact; the (ts, event_id) sort tiebreak makes
    same-timestamp sequences deterministic. Users with one event (no
    observed holding duration) drop out via the HAVING guard rather
    than emitting a 0/0 NULL."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; unix_micros wants TIMESTAMP. pin_session
    # fixes the session timezone to UTC, so the cast is a pure
    # reinterpretation — identical to DuckDB's naive-to-timestamp cast.
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = ev.select(
        "user_id",
        "value",
        t_us.alias("t_us"),
        F.lead(t_us).over(w).alias("nxt_us"),
    ).filter(F.col("nxt_us").isNotNull())
    dt = F.col("nxt_us") - F.col("t_us")
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum(F.col("value") * dt) / F.sum(dt), 4).alias("twap"),
            F.round(F.sum(dt) / F.lit(1e6), 2).alias("span_secs"),
        )
        .filter(F.col("twap").isNotNull())
        .orderBy("user_id")
    )


@register(
    "sorted_neighborhood_pairs",
    oracle="""
WITH s AS (
    SELECT substr(p_name, 1, 1) AS block, p_name,
           lead(p_name, 1) OVER w AS nm1,
           lead(p_name, 2) OVER w AS nm2
    FROM part
    WINDOW w AS (PARTITION BY substr(p_name, 1, 1)
                 ORDER BY p_name, p_partkey)
),
cand AS (
    SELECT block, levenshtein(p_name, nm1) AS dist
    FROM s WHERE nm1 IS NOT NULL
    UNION ALL
    SELECT block, levenshtein(p_name, nm2) AS dist
    FROM s WHERE nm2 IS NOT NULL
)
SELECT block,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(count(*) FILTER (WHERE dist <= 20) AS BIGINT) AS n_close,
       CAST(min(dist) AS BIGINT) AS min_dist,
       round(avg(CAST(dist AS DOUBLE)), 4) AS avg_dist
FROM cand
GROUP BY block
ORDER BY block
""",
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking: the window-based candidate
    generator for fuzzy dedup — sort records on a blocking key, pair
    each with its next w neighbors, and score only those pairs.
    The join-free complement to the catalog's LSH/SimHash blocking
    (operators/dedup_fuzzy.py) and to the equality-blocked self-join
    of `similar_customer_names`: candidates per record are exactly w
    (here 2), so total work is w·N regardless of how skewed the key
    distribution is — the property LSH loses on hot buckets.

    Distributed form: the sort runs WITHIN first-letter blocks
    (window partition), so no global single-partition sort; the known
    limitation is that cross-block boundary pairs are never compared —
    the standard fix at scale is replicating each block's first w rows
    into the previous block (overlap replication), which keeps the
    plan shuffle-per-block. Edit-distance scoring happens on the
    candidate rows only (w·N evaluations, never N²)."""
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy(F.substring("p_name", 1, 1)).orderBy(
        "p_name", "p_partkey"
    )
    s = p.select(
        F.substring("p_name", 1, 1).alias("block"),
        "p_name",
        F.lead("p_name", 1).over(w).alias("nm1"),
        F.lead("p_name", 2).over(w).alias("nm2"),
    )
    cand = (
        s.filter(F.col("nm1").isNotNull())
        .select("block", F.levenshtein("p_name", "nm1").alias("dist"))
        .unionAll(
            s.filter(F.col("nm2").isNotNull()).select(
                "block", F.levenshtein("p_name", "nm2").alias("dist")
            )
        )
    )
    return (
        cand.groupBy("block")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.sum((F.col("dist") <= 20).cast("long"))
            .cast("bigint")
            .alias("n_close"),
            F.min("dist").cast("bigint").alias("min_dist"),
            F.round(F.avg(F.col("dist").cast("double")), 4).alias(
                "avg_dist"
            ),
        )
        .orderBy("block")
    )


@register(
    "aqp_revenue_by_region",
    oracle="""
WITH joined AS (
    SELECT r.r_name, o.o_orderkey, o.o_totalprice
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
),
samp AS (
    SELECT r_name,
           CAST(count(*) AS BIGINT) AS n_sampled,
           round(10 * sum(o_totalprice), 2) AS est_revenue,
           round(10 * stddev_samp(o_totalprice) * sqrt(count(*))
                 * sqrt(0.9) * 1.96, 2) AS ci95_half
    FROM joined WHERE o_orderkey % 10 = 0
    GROUP BY r_name
),
exact AS (
    SELECT r_name, round(sum(o_totalprice), 2) AS exact_revenue
    FROM joined GROUP BY r_name
)
SELECT s.r_name, s.n_sampled, s.est_revenue, s.ci95_half,
       e.exact_revenue,
       round(abs(s.est_revenue - e.exact_revenue)
             / e.exact_revenue, 4) AS rel_err
FROM samp s JOIN exact e USING (r_name)
ORDER BY s.r_name
""",
)
def aqp_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing: regional revenue estimated from a
    deterministic 10% systematic sample (o_orderkey % 10), scaled by
    the inverse inclusion probability (Horvitz-Thompson), with a
    normal-approximation 95% half-width — and, for this self-evaluating
    demo, the exact answer and realized relative error beside it.

    The scale story: at 100 TB the sample predicate is pushed to the
    parquet scan, so the estimate reads ~10% of the fact bytes and
    every downstream shuffle is 10% sized; the error column shows what
    that buys (sub-1% relative error at bench scale). Dims broadcast
    (region/nation/customer chain); the exact branch exists only for
    the self-report and would be dropped in production use."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", "o_orderkey", "o_totalprice")
    )
    samp = (
        joined.filter(F.col("o_orderkey") % 10 == 0)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
            F.round(10 * F.sum("o_totalprice"), 2).alias("est_revenue"),
            F.round(
                10
                * F.stddev_samp("o_totalprice")
                * F.sqrt(F.count(F.lit(1)).cast("double"))
                * F.sqrt(F.lit(0.9))
                * 1.96,
                2,
            ).alias("ci95_half"),
        )
    )
    exact = joined.groupBy("r_name").agg(
        F.round(F.sum("o_totalprice"), 2).alias("exact_revenue")
    )
    return (
        samp.join(exact, "r_name")
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("est_revenue") - F.col("exact_revenue"))
                / F.col("exact_revenue"),
                4,
            ),
        )
        .orderBy("r_name")
    )


@register(
    "ks_drift_acctbal",
    oracle="""
WITH s AS (
    SELECT c_acctbal AS v,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1,
           CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS g2
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
),
tot AS (SELECT sum(g1) AS n1, sum(g2) AS n2 FROM s),
grouped AS (
    SELECT v, sum(g1) AS d1, sum(g2) AS d2 FROM s GROUP BY v
),
ecdf AS (
    SELECT v,
           sum(d1) OVER (ORDER BY v) AS c1,
           sum(d2) OVER (ORDER BY v) AS c2
    FROM grouped
)
SELECT CAST(tot.n1 AS BIGINT) AS n1, CAST(tot.n2 AS BIGINT) AS n2,
       round(max(abs(CAST(c1 AS DOUBLE) / tot.n1
                     - CAST(c2 AS DOUBLE) / tot.n2)), 4) AS ks_stat
FROM ecdf CROSS JOIN tot
GROUP BY tot.n1, tot.n2
""",
)
def ks_drift_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the account-
    balance distributions of two market segments — the standard
    feature-drift detector (training-vs-serving, split-vs-split, or
    month-over-month), computed exactly.

    Exact-but-scalable shape: values first collapse to per-distinct-
    value group counts (one shuffle, output is O(distinct values) —
    for a continuous column that still scales with the data), THEN
    both ECDFs come from operators/indexing.global_running_sums — the
    two-pass distributed prefix sum (range partition on v,
    per-partition subtotals, driver prefix of the ≤cores subtotal
    rows, partition-local cumsum) — so no single task ever holds the
    collapsed frame, and both counters share one partitioning pass.
    Sample totals n1/n2 fold in as model-sized collected literals (2
    scalars off the persisted collapsed frame). Grouping by value
    BEFORE the ECDF also makes ties well-defined (both samples step at
    the same value point), which is what makes the statistic
    deterministic. Counts accumulate as exact BIGINTs; the only float
    math is the final c/n division, identical to the oracle's."""
    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        global_running_sums,
    )

    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    s = c.select(
        F.col("c_acctbal").alias("v"),
        (F.col("c_mktsegment") == "BUILDING").cast("long").alias("g1"),
        (F.col("c_mktsegment") == "MACHINERY").cast("long").alias("g2"),
    )
    grouped = s.groupBy("v").agg(
        F.sum("g1").alias("d1"), F.sum("g2").alias("d2")
    ).persist()  # read by the totals collect AND the ECDF pass
    tot = grouped.agg(F.sum("d1").alias("n1"), F.sum("d2").alias("n2")).head()
    n1, n2 = int(tot["n1"]), int(tot["n2"])
    ecdf = global_running_sums(
        grouped, ["v"], ["d1", "d2"], out_cols=["c1", "c2"]
    )
    return (
        ecdf.agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("c1").cast("double") / F.lit(n1)
                        - F.col("c2").cast("double") / F.lit(n2)
                    )
                ),
                4,
            ).alias("ks_stat")
        )
        .select(
            F.lit(n1).cast("bigint").alias("n1"),
            F.lit(n2).cast("bigint").alias("n2"),
            "ks_stat",
        )
    )


@register(
    "chi2_priority_status",
    oracle="""
WITH obs AS (
    SELECT o_orderpriority AS pri, o_orderstatus AS st,
           CAST(count(*) AS DOUBLE) AS o
    FROM orders GROUP BY 1, 2
),
margins AS (
    SELECT pri, st, o,
           sum(o) OVER (PARTITION BY pri) AS row_tot,
           sum(o) OVER (PARTITION BY st) AS col_tot,
           sum(o) OVER () AS n
    FROM obs
)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       round(sum(pow(o - row_tot * col_tot / n, 2)
                 / (row_tot * col_tot / n)), 4) AS chi2,
       CAST((count(DISTINCT pri) - 1) * (count(DISTINCT st) - 1)
            AS BIGINT) AS dof
FROM margins
""",
)
def chi2_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between order priority and
    order status — the categorical-drift / association detector
    (label-vs-source dependence checks in dataset QA).

    The contingency table is one grouped count (cells = priority ×
    status, an enumeration-bounded frame), margins are windows OVER
    THE CELLS (25 rows, not the fact table), so after the first
    aggregate everything is model-sized; expected counts and the
    statistic are pure arithmetic on that frame. At any corpus scale
    the cost is exactly one shuffle of partial counts."""
    o = table(spark, sf_dir, "orders")
    obs = (
        o.groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_orderstatus").alias("st"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("o"))
    )
    wr = Window.partitionBy("pri")
    wc = Window.partitionBy("st")
    wn = Window.partitionBy()
    m = obs.select(
        "pri",
        "st",
        "o",
        F.sum("o").over(wr).alias("row_tot"),
        F.sum("o").over(wc).alias("col_tot"),
        F.sum("o").over(wn).alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.round(F.sum(F.pow(F.col("o") - e, 2) / e), 4).alias("chi2"),
        (
            (F.countDistinct("pri") - 1) * (F.countDistinct("st") - 1)
        )
        .cast("bigint")
        .alias("dof"),
    )
