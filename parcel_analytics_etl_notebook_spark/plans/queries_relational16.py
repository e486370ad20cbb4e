"""Batch 16 (relational): the five shapes promised in the round-5
coverage ledger (tools/correctness_window.json) — per-group exact
heavy hitters, stack-counter interval union, sliding weighted OLS,
day-bitmap engagement classes, and a bounded-depth BOM rollup via
iterative frontier expansion.

Each generalizes an existing catalog family one axis further:
``group_topk_frequent_parts`` takes SURVEY §2.4 A4's group-pivot to
per-group top-k; ``interval_coverage_merge`` is the classical
merge-overlapping-intervals sweep (the scheduling/SLA "covered time"
primitive); ``weighted_sliding_regression`` extends the global OLS of
``price_quantity_regression`` (queries_relational4) to a trailing
28-day window with per-day sample weights; ``bitmap_daily_active_
segments`` materializes roaring-style 64-bit day bitmaps with
``bit_or``/``bit_count`` — the engagement-bitmap idiom; and
``recursive_bom_rollup`` complements the native recursive CTE of
``custkey_tree_depths`` (queries_relational4) with the ITERATIVE
frontier-expansion form — the driver-loop shape an engine needs when
recursion must carry arbitrary per-edge arithmetic (path-multiplied
quantities) under an explicit depth bound.

Oracle-parity conventions as in plans/catalog.py: exact BIGINT
algebra (cents, day indexes, bit words, path multipliers) everywhere
an accumulation order could differ; floats appear only in final
rounded divisions computed from identical exact integers on both
sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table


# --------------------------------------------------------------------------
# Per-group exact heavy hitters: top-3 most-shipped parts per nation
# --------------------------------------------------------------------------
@register(
    "group_topk_frequent_parts",
    oracle="""
WITH cnt AS (
    SELECT n.n_name, l.l_partkey, CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
),
rk AS (
    SELECT n_name, l_partkey, n_lineitems,
           row_number() OVER (PARTITION BY n_name
               ORDER BY n_lineitems DESC, l_partkey) AS rk
    FROM cnt
)
SELECT r.n_name, CAST(r.rk AS BIGINT) AS rk, p.p_name, r.n_lineitems
FROM rk r JOIN part p ON p.p_partkey = r.l_partkey
WHERE r.rk <= 3
ORDER BY n_name, rk
""",
)
def group_topk_frequent_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group heavy hitters: for every supplier nation, the 3
    parts appearing on the most lineitems (deterministic tiebreak:
    count DESC, partkey ASC). The exact twin of the CMS/heavy-hitter
    sketch family (operators/sketches, operators/heavyhitters): when
    the group count is bounded (25 nations) and the per-group candidate
    set fits a partitioned window, exact top-k is one count aggregate
    plus one PARTITIONED rank window — no sketch error to budget.

    Scale shape: the lineitem→supplier join shuffles on suppkey
    (supplier scales with SF — NOT broadcast); nation (fixed 25 rows)
    is broadcast. The count shuffles on (nation, partkey) with map-side
    partials; the rank window partitions by nation — parallel across
    the 25 groups, and the per-group input is the DISTINCT part set,
    not the fact rows. The 75-row top-k result is broadcast into the
    part join, so the part table (fact-scaling) is never shuffled."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    part = table(spark, sf_dir, "part")
    cnt = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", "l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lineitems"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("n_lineitems").desc(), F.col("l_partkey")
    )
    topk = cnt.withColumn("rk", F.row_number().over(w).cast("bigint")).filter(
        F.col("rk") <= 3
    )
    return (
        part.join(F.broadcast(topk), part.p_partkey == topk.l_partkey)
        .select("n_name", "rk", "p_name", "n_lineitems")
        .orderBy("n_name", "rk")
    )


# --------------------------------------------------------------------------
# Interval union via the max-end sweep: merged coverage per customer
# --------------------------------------------------------------------------
@register(
    "interval_coverage_merge",
    oracle="""
WITH iv AS (
    SELECT DISTINCT o_custkey,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS s,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) + 7 AS e
    FROM orders
),
blk AS (
    SELECT o_custkey, s, e,
           CASE WHEN s > coalesce(max(e) OVER (PARTITION BY o_custkey ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                THEN 1 ELSE 0 END AS new_block
    FROM iv
),
bid AS (
    SELECT o_custkey, s, e,
           sum(new_block) OVER (PARTITION BY o_custkey ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS block
    FROM blk
),
merged AS (
    SELECT o_custkey, block, max(e) - min(s) AS covered
    FROM bid GROUP BY 1, 2
),
per_cust AS (
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(covered) AS BIGINT) AS covered_days
    FROM merged GROUP BY 1
)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(p.n_blocks) AS BIGINT) AS merged_intervals,
       CAST(sum(p.covered_days) AS BIGINT) AS covered_days,
       round(avg(p.covered_days), 4) AS avg_covered_days
FROM per_cust p JOIN customer c ON c.c_custkey = p.o_custkey
GROUP BY 1 ORDER BY c_mktsegment
""",
)
def interval_coverage_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping per-customer activity intervals (each order
    opens a 7-day window) into disjoint blocks and measure coverage —
    the classical interval-union sweep: a new block starts exactly when
    an interval's start exceeds the running ``max(end)`` of everything
    before it, block ids are the running sum of those starts, and each
    merged block spans [min(start), max(end)). Interval arithmetic is
    exact integer DAY INDEXES (days since 1995-01-01), so no timestamp
    zone/rounding can disagree cross-engine.

    Scale shape: both sweep windows PARTITION BY custkey — parallel
    across customers, never a global sort; per-customer input is the
    DISTINCT order-day set (bounded by the calendar, ≤ ~2.4k rows per
    customer regardless of fact scale). Downstream is key-grain:
    groupBy(cust, block), groupBy(cust), a hash join to customer, and
    the 5-segment rollup."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    anchor = F.lit("1995-01-01").cast("date")
    iv = (
        orders.select(
            "o_custkey",
            F.datediff(F.col("o_orderdate").cast("date"), anchor).alias("s"),
        )
        .distinct()
        .withColumn("e", F.col("s") + 7)
    )
    w_prev = (
        Window.partitionBy("o_custkey")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("o_custkey")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    blk = iv.withColumn(
        "new_block",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("block", F.sum("new_block").over(w_cum))
    merged = blk.groupBy("o_custkey", "block").agg(
        (F.max("e") - F.min("s")).alias("covered")
    )
    per_cust = merged.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum("covered").cast("bigint").alias("covered_days"),
    )
    return (
        per_cust.join(customer, per_cust.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("n_blocks").cast("bigint").alias("merged_intervals"),
            F.sum("covered_days").cast("bigint").alias("covered_days"),
            F.round(F.avg("covered_days"), 4).alias("avg_covered_days"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Sliding weighted OLS: trailing-28-day revenue trend per day
# --------------------------------------------------------------------------
@register(
    "weighted_sliding_regression",
    oracle="""
WITH daily AS (
    SELECT datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS x,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sy
    FROM orders GROUP BY 1
),
sums AS (
    SELECT x,
           sum(n)         OVER w AS sw,
           sum(n * x)     OVER w AS swx,
           sum(sy)        OVER w AS swy,
           sum(n * x * x) OVER w AS swxx,
           sum(x * sy)    OVER w AS swxy
    FROM daily
    WINDOW w AS (ORDER BY x RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
)
SELECT CAST(x AS BIGINT) AS day_idx,
       CAST(sw AS BIGINT) AS n_orders_28d,
       round(swy / 100.0, 2) AS revenue_28d,
       CASE WHEN sw * swxx - swx * swx = 0 THEN NULL
            ELSE round((sw * swxy - swx * swy)
                       / (100.0 * (sw * swxx - swx * swx)), 6)
       END AS slope_per_day
FROM sums ORDER BY day_idx
""",
)
def weighted_sliding_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day OLS slope of order price vs time over the trailing 28
    calendar days, each day WEIGHTED by its order count — i.e. the
    regression runs over every individual order in the window, carried
    as day-grain sufficient statistics (n, Σy, and the derived n·x,
    n·x², x·Σy). slope = (Σw·Σwxy − Σwx·Σwy) / (Σw·Σwx² − (Σwx)²),
    the weighted normal-equation form; a window whose orders all share
    one day has zero x-variance → NULL slope. Extends the global
    ``regr_slope`` query (queries_relational4) to the sliding, gapped
    (RANGE, not ROWS — missing days shrink the window) weighted case.

    Determinism: x is an integer day index centered on 1995-01-01 (so
    products stay ≲2^54 — documented headroom: at fact scales where
    Σwxy could approach 2^63 the sums switch to DECIMAL(38,0) exactly
    as operators/indexing's PPS sampler does), y is exact BIGINT cents;
    every windowed sum is exact integer, and the only float is the
    final division — identical IEEE doubles from identical integers on
    both engines.

    Scale shape: one groupBy(day) with map-side partials collapses the
    fact table to calendar grain (≤ a few thousand rows regardless of
    SF); the sliding RANGE window then runs over that bounded frame —
    annotated in the single-partition-window fence as calendar-bounded,
    the same class as daily_value_anomalies."""
    orders = table(spark, sf_dir, "orders")
    anchor = F.lit("1995-01-01").cast("date")
    daily = (
        orders.select(
            F.datediff(F.col("o_orderdate").cast("date"), anchor).alias("x"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("x")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").alias("sy"),
        )
    )
    w = Window.orderBy("x").rangeBetween(-27, 0)
    sums = daily.select(
        "x",
        F.sum("n").over(w).alias("sw"),
        F.sum(F.col("n") * F.col("x")).over(w).alias("swx"),
        F.sum("sy").over(w).alias("swy"),
        F.sum(F.col("n") * F.col("x") * F.col("x")).over(w).alias("swxx"),
        F.sum(F.col("x") * F.col("sy")).over(w).alias("swxy"),
    )
    det = F.col("sw") * F.col("swxx") - F.col("swx") * F.col("swx")
    return sums.select(
        F.col("x").cast("bigint").alias("day_idx"),
        F.col("sw").cast("bigint").alias("n_orders_28d"),
        F.round(F.col("swy") / 100.0, 2).alias("revenue_28d"),
        F.when(det == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("sw") * F.col("swxy") - F.col("swx") * F.col("swy"))
                / (100.0 * det),
                6,
            )
        )
        .alias("slope_per_day"),
    ).orderBy("day_idx")


# --------------------------------------------------------------------------
# Roaring-style day bitmaps: engagement classes from bit_or/bit_count
# --------------------------------------------------------------------------
@register(
    "bitmap_daily_active_segments",
    oracle="""
WITH days AS (
    SELECT DISTINCT user_id,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
    FROM events
),
words AS (
    SELECT user_id, d // 64 AS word_idx,
           bit_or(CAST(1 AS BIGINT) << CAST(d % 64 AS INTEGER)) AS word
    FROM days GROUP BY 1, 2
),
per_user AS (
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(bit_count(word)) AS BIGINT) AS active_days
    FROM words GROUP BY 1
)
SELECT CASE WHEN active_days >= 25 THEN 'power'
            WHEN active_days >= 15 THEN 'regular'
            WHEN active_days >= 5 THEN 'casual'
            ELSE 'light' END AS segment,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(min(active_days) AS BIGINT) AS min_days,
       CAST(max(active_days) AS BIGINT) AS max_days,
       round(avg(active_days), 4) AS avg_days
FROM per_user GROUP BY 1 ORDER BY segment
""",
)
def bitmap_daily_active_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement classes from per-user DAY BITMAPS: each user's active
    days become set bits in 64-bit words (word = day_epoch div 64, bit
    = day_epoch mod 64 — the fixed-width container layout roaring
    bitmaps use before compression), built with the algebraic
    ``bit_or`` aggregate and counted with ``bit_count`` (popcount).
    Users are then classed power/regular/casual/light by active-day
    count. The bitmap form is the point: per-(user, word) OR-words
    merge map-side like any monoid, re-merge across days/partitions/
    increments without recounting raw events, and AND/OR between users
    or cohorts is one integer op per word — the same reason the
    engine's sketches (operators/sketches) ship as mergeable grids.

    Determinism: bit positions are absolute day-since-epoch indexes —
    no data-dependent anchor, no global min() action; the whole
    pipeline is integer algebra.

    Scale shape: dedup to (user, day) with map-side partials, then two
    key-grain aggregates (user×word, then user) and a ≤4-row rollup.
    No window, no join, nothing driver-side."""
    ev = table(spark, sf_dir, "events")
    epoch = F.lit("1970-01-01").cast("date")
    days = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), epoch).alias("d"),
    ).distinct()
    words = (
        days.select(
            "user_id",
            F.expr("d div 64").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(d % 64 AS INT))").alias("bit"),
        )
        .groupBy("user_id", "word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    per_user = words.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.bit_count("word")).cast("bigint").alias("active_days"),
    )
    seg = (
        F.when(F.col("active_days") >= 25, "power")
        .when(F.col("active_days") >= 15, "regular")
        .when(F.col("active_days") >= 5, "casual")
        .otherwise("light")
    )
    return (
        per_user.withColumn("segment", seg)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.min("active_days").cast("bigint").alias("min_days"),
            F.max("active_days").cast("bigint").alias("max_days"),
            F.round(F.avg("active_days"), 4).alias("avg_days"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# Bounded-depth BOM rollup: iterative frontier expansion
# --------------------------------------------------------------------------
_BOM_MAX_DEPTH = 8


@register(
    "recursive_bom_rollup",
    oracle=f"""
WITH RECURSIVE walk AS (
    SELECT p_partkey AS root, p_partkey AS node,
           CAST(1 AS BIGINT) AS mult, 0 AS depth
    FROM part
    UNION ALL
    SELECT w.root, p.p_partkey,
           w.mult * (1 + p.p_partkey % 3), w.depth + 1
    FROM walk w
    JOIN part p ON p.p_partkey // 2 = w.node AND p.p_partkey >= 2
    WHERE w.depth < {_BOM_MAX_DEPTH}
),
contrib AS (
    SELECT w.root, w.mult,
           CAST(round(p.p_retailprice * 100, 0) AS BIGINT) AS cents
    FROM walk w JOIN part p ON p.p_partkey = w.node
),
rollup AS (
    SELECT root,
           CAST(count(*) AS BIGINT) AS n_paths,
           CAST(sum(mult * cents) AS BIGINT) AS total_cents
    FROM contrib GROUP BY 1
)
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_roots,
       CAST(sum(r.n_paths) AS BIGINT) AS total_paths,
       round(sum(r.total_cents) / 100.0, 2) AS rollup_cost
FROM rollup r JOIN part p ON p.p_partkey = r.root
GROUP BY 1 ORDER BY p_brand
""",
)
def recursive_bom_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials cost rollup over the implicit part hierarchy
    parent(k) = k div 2 (children carry quantity 1 + k mod 3), bounded
    to 8 levels: every part's rolled-up cost is the sum, over all
    descendants within the depth bound, of the path-product of
    quantities times the descendant's price — aggregated to brand grain.
    Where ``custkey_tree_depths`` (queries_relational4) uses Spark 4's
    NATIVE recursive CTE, this query deliberately exercises the other
    recursion idiom a distributed engine needs: ITERATIVE FRONTIER
    EXPANSION — a driver loop of bounded, data-independent depth, each
    level one hash join of the previous frontier against the edge set,
    all levels unioned lazily into a single job. The loop form is what
    carries per-edge arithmetic (the quantity path-product) and an
    explicit depth budget; the CTE form bounds depth only via the
    global cteRecursionLevelLimit.

    Determinism: path multipliers are exact BIGINT (qty ≤ 3, depth ≤ 8
    → mult ≤ 3^8 = 6561), prices are integer cents; the only float is
    the final rounded division.

    Scale shape: each level is a shuffled hash join frontier⋈edges on
    the parent key plus a narrow projection — 8 bounded shuffles
    TOTAL, not data-dependent; the price join runs ONCE on the
    unioned walk (node key), and the rollup is two key-grain
    aggregates. Frontier fan-out is bounded by the BOM branching
    factor; a skewed hub part would be handled by AQE skew-join, and a
    real deployment would persist the edge frame across levels (here
    each level's scan is the same pruned 2-column parquet read, which
    the unioned job shares)."""
    part = table(spark, sf_dir, "part")
    nodes = part.select("p_partkey")
    edges = part.filter(F.col("p_partkey") >= 2).select(
        F.expr("p_partkey div 2").alias("parent"),
        F.col("p_partkey").alias("child"),
        (1 + F.col("p_partkey") % 3).cast("bigint").alias("qty"),
    )
    frontier = nodes.select(
        F.col("p_partkey").alias("root"),
        F.col("p_partkey").alias("node"),
        F.lit(1).cast("bigint").alias("mult"),
    )
    levels = [frontier]
    for _ in range(_BOM_MAX_DEPTH):
        frontier = frontier.join(
            edges, frontier.node == edges.parent
        ).select(
            "root",
            F.col("child").alias("node"),
            (F.col("mult") * F.col("qty")).alias("mult"),
        )
        levels.append(frontier)
    walk = levels[0]
    for lv in levels[1:]:
        walk = walk.unionByName(lv)
    prices = part.select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100, 0).cast("bigint").alias("cents"),
    )
    rollup = (
        walk.join(prices, walk.node == prices.p_partkey)
        .groupBy("root")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_paths"),
            F.sum(F.col("mult") * F.col("cents"))
            .cast("bigint")
            .alias("total_cents"),
        )
    )
    brand = part.select("p_partkey", "p_brand")
    return (
        rollup.join(brand, rollup.root == brand.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_roots"),
            F.sum("n_paths").cast("bigint").alias("total_paths"),
            F.round(F.sum("total_cents") / 100.0, 2).alias("rollup_cost"),
        )
        .orderBy("p_brand")
    )
