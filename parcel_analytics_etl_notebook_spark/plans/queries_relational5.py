"""Classic decision-support shapes (TPC-H Q3/Q5/Q15/Q16 adapted to the
driver's columns) — the canonical multi-join + aggregate + top-k plans
every warehouse engine is judged on, expressed declaratively so Catalyst
picks broadcast sides, pushes the date/segment filters into the parquet
scans, and map-side-combines the aggregates.

Generalizes the reference's join/agg repertoire (multi-dim joins +
pivoted KPIs, ``/root/reference/etl/main.py:217-266``,
``notebooks/report.ipynb`` cell 8) to the standard analytics benchmark
shapes. Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table

def _rev():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "shipping_priority_top10",
    oracle="""
SELECT l.l_orderkey AS l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): unshipped-as-of-date revenue per
    order for one market segment, top 10. The segment/date filters
    push into all three parquet scans; customer (filtered) broadcasts;
    the group key (l_orderkey) is the join key, so the aggregate rides
    the join's partitioning; top-10 is TakeOrderedAndProject, never a
    global sort."""
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    l = table(spark, sf_dir, "lineitem").filter(  # noqa: E741
        F.col("l_shipdate") > "1998-01-01"
    )
    joined = l.join(
        o, l.l_orderkey == o.o_orderkey
    ).join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return (
        joined.groupBy(
            # string-typed date: DuckDB's pandas bridge widens DATE to
            # datetime64, which isoformats differently from a true date
            F.to_date("o_orderdate").cast("string").alias("o_orderdate"),
            "l_orderkey",
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "local_supplier_volume",
    oracle="""
SELECT n.n_name AS n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
""",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue from orders where the
    customer and the line's supplier sit in the same nation of one
    region. The 5-way join keeps lineitem⋈orders as the only big-big
    shuffle; customer/supplier/nation/region are broadcast dims, and
    the same-nation predicate rides the supplier join condition instead
    of a post-join filter."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "top_supplier_by_revenue",
    oracle="""
WITH rev AS (
    SELECT l_suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-07-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, r.total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
ORDER BY r.total_revenue DESC, s.s_suppkey
LIMIT 1
""",
)
def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): highest 6-month revenue supplier.
    Q15's view+max+equality is restated as round → rank desc with the
    unique suppkey tiebreak so the answer is deterministic across
    engines (float-equality against a MAX is not); one partial-agg
    shuffle on l_suppkey, then a broadcast join to names."""
    l = table(spark, sf_dir, "lineitem").filter(  # noqa: E741
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-07-01")
    )
    s = table(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    return (
        rev.join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy(F.col("total_revenue").desc(), "s_suppkey")
        .limit(1)
    )


@register(
    "parts_supplier_counts",
    oracle="""
WITH ok_sup AS (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 2000.0),
ps AS (
    SELECT DISTINCT l_partkey, l_suppkey
    FROM lineitem JOIN ok_sup ON l_suppkey = s_suppkey
)
SELECT p.p_brand AS p_brand,
       CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt,
       CAST(count(DISTINCT ps.l_partkey) AS BIGINT) AS part_cnt
FROM ps JOIN part p ON ps.l_partkey = p.p_partkey
GROUP BY p.p_brand
ORDER BY supplier_cnt DESC, p_brand
""",
)
def parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct
    suppliers per brand, excluding flagged suppliers (here: balance
    below a threshold — the driver's supplier table has no comment
    column for the literal 'complaints' predicate). lineitem is
    pre-shrunk to DISTINCT (partkey, suppkey) before the part join —
    the dedup does the heavy lifting map-side; the exclusion list and
    part table broadcast."""
    sup_ok = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") >= 2000.0
    ).select("s_suppkey")
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    p = table(spark, sf_dir, "part")
    ps = (
        l.join(F.broadcast(sup_ok), l.l_suppkey == sup_ok.s_suppkey)
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"),
            F.count_distinct("l_partkey").cast("bigint").alias("part_cnt"),
        )
        .orderBy(F.col("supplier_cnt").desc(), "p_brand")
    )


@register(
    "returned_items_report",
    oracle="""
SELECT c.c_custkey AS c_custkey, c.c_name AS c_name, n.n_name AS n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def returned_items_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned items): top 20 customers by revenue of
    returned lines in a quarter — the "who is hurting us" report. The
    returnflag + date filters push into the scans; customer and nation
    broadcast; top-20 via TakeOrderedAndProject."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    l = table(spark, sf_dir, "lineitem").filter(  # noqa: E741
        F.col("l_returnflag") == "R"
    )
    n = table(spark, sf_dir, "nation")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "customer_spend_distribution",
    oracle="""
WITH spend AS (
    SELECT c.c_custkey AS c_custkey, c.c_mktsegment AS c_mktsegment,
           round(sum(o.o_totalprice), 2) AS total_spend
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
)
SELECT c_custkey, c_mktsegment, total_spend,
       round(percent_rank() OVER (PARTITION BY c_mktsegment
                                  ORDER BY total_spend), 6) AS spend_pr,
       round(cume_dist() OVER (PARTITION BY c_mktsegment
                               ORDER BY total_spend), 6) AS spend_cd
FROM spend
""",
)
def customer_spend_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-segment spend distribution via percent_rank + cume_dist —
    the distribution-function window family (reference's window gap,
    SURVEY §2.5). Both functions depend only on the ORDER key, so ties
    yield identical values on any engine; spend is rounded before
    ranking so float jitter can't reorder. One agg + one window on the
    same segment partitioning."""
    from pyspark.sql import Window

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("total_spend")
    return spend.select(
        "c_custkey",
        "c_mktsegment",
        "total_spend",
        F.round(F.percent_rank().over(w), 6).alias("spend_pr"),
        F.round(F.cume_dist().over(w), 6).alias("spend_cd"),
    )


@register(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
)
SELECT event_type, next_type,
       CAST(count(*) AS BIGINT) AS n,
       round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY event_type),
             4) AS p_next
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
ORDER BY event_type, next_type
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (lead window ordered by ts with the event_id tiebreak —
    deterministic under timestamp collisions). The classic
    behavioral-analytics view; one shuffle on user_id for the window,
    then a |types|²-row aggregate with a tiny share window on top."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    share = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(share), 4).alias("p_next"),
    ).orderBy("event_type", "next_type")


@register(
    "nation_pair_trade_volume",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
ORDER BY supp_nation, cust_nation, ship_year
""",
)
def nation_pair_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue flowing between two nations
    in either direction, per supplier-nation/customer-nation/year. The
    OR pair filter evaluates on broadcast dim columns AFTER the
    equi-joins — it never becomes a join condition, so no nested-loop
    plan; lineitem⋈orders stays the only shuffle."""
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("__sn_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("__cn_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7")
            )
            | (
                (F.col("supp_nation") == "NATION_7")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@register(
    "nation_market_share",
    oracle="""
WITH sales AS (
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           n1.n_name AS supp_nation,
           l.l_extendedprice * (1 - l.l_discount) AS rev
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    JOIN region r   ON n2.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
)
SELECT order_year,
       round(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev ELSE 0 END), 2)
           AS target_revenue,
       round(sum(rev), 2) AS total_revenue,
       round(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev ELSE 0 END)
             / sum(rev), 4) AS market_share
FROM sales GROUP BY order_year ORDER BY order_year
""",
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of PROMO
    part revenue sold into a region, per order year. The share is a
    conditional-sum ratio inside one aggregate — never a self-join of
    two aggregates; part/customer-region filters prune before the
    joins; all dims broadcast."""
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__cn_key"),
        F.col("n_regionkey").alias("__cn_region"),
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("__sn_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("__cn_key"))
        .join(F.broadcast(r), F.col("__cn_region") == r.r_regionkey)
    )
    rev = _rev()
    target = F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(0.0)
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            F.round(F.sum(target), 2).alias("target_revenue"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
            F.round(F.sum(target) / F.sum(rev), 4).alias("market_share"),
        )
        .orderBy("order_year")
    )


@register(
    "user_retention_cohorts",
    oracle="""
WITH firsts AS (
    SELECT user_id,
           CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT e.user_id, f.cohort_week,
           datediff('day', f.cohort_week,
                    CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS week_offset
    FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT CAST(cohort_week AS VARCHAR) AS cohort_week,
       CAST(week_offset AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM activity
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-event week,
    counted once per (cohort, week-offset) they were active in — the
    canonical product-analytics triangle. Two aggregates over events
    plus one join back; the firsts table is user-cardinality (small
    relative to events) and the DISTINCT collapses activity before the
    final count, both map-side combinable."""
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        ev.join(firsts, on="user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )
