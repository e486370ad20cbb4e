"""The remaining classic decision-support shapes (TPC-H Q2/Q4/Q6/Q9/
Q11/Q12/Q14/Q17/Q19/Q20/Q21/Q22 adapted to the driver's columns —
no partsupp/shipmode/commitdate tables exist, so each query keeps the
BENCHMARK SHAPE (the plan pattern an engine is graded on) with the
nearest available semantics, documented per query.

Together with queries_relational5 (Q3/Q5/Q7/Q8/Q10/Q15/Q16), the
order-count histogram (Q13 shape) and big_quantity_orders (Q18 shape),
this completes the TPC-H plan-pattern sweep: scan-only aggregates,
EXISTS/NOT-EXISTS decorrelation, correlated-average triggers,
scalar-subquery thresholds, OR-of-ANDs pushdown, and min-per-group
supplier selection.

Generalizes the reference's join/agg repertoire
(``/root/reference/etl/main.py:217-266``) exactly as queries_relational5
does; oracle-parity conventions per plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "forecast_revenue_change",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_delta,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): revenue given up to small
    discounts on low-quantity lines in one year. Scan-only — the whole
    query is a conjunctive filter + global agg, so everything pushes
    into the parquet scan (date range prunes row groups, the discount/
    quantity range filters evaluate on the vectorized reader) and no
    shuffle happens at all: partial sums merge into one row."""
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "order_priority_checks",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND datediff('day', o.o_orderdate, l.l_shipdate) > 30)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def order_priority_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): orders in one quarter with at
    least one line shipped >30 days after ordering (the driver's
    lineitem has no commit/receipt dates — lateness is ship-vs-order
    lag), counted per priority. The EXISTS decorrelates to a LEFT SEMI
    join: lineitem is the big probe side, the quarter-filtered orders
    shrink first, and the semi join emits each order at most once — no
    post-join dedup. The lag predicate rides the join condition."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    hit = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (F.datediff(l.l_shipdate, o.o_orderdate) > 30),
        "leftsemi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "product_profit_by_nation_year",
    oracle="""
SELECT n.n_name AS n_name,
       CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)
                 - 0.6 * p.p_retailprice * l.l_quantity), 2) AS profit
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, year(o.o_orderdate)
ORDER BY n_name, order_year
""",
)
def product_profit_by_nation_year(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q9 (product type profit): per supplier-nation/year profit on
    one product line. No partsupp table → supply cost is proxied as 60%
    of p_retailprice (fixed margin), keeping Q9's plan shape: a
    name-LIKE filter prunes part BEFORE its join (broadcast), lineitem⋈
    orders is the only big shuffle, supplier/nation broadcast, and the
    profit expression folds into the aggregate's partial phase."""
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    amount = _rev() - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            "n_name", F.year("o_orderdate").cast("bigint").alias("order_year")
        )
        .agg(F.round(F.sum(amount), 2).alias("profit"))
        .orderBy("n_name", "order_year")
    )


@register(
    "important_part_value",
    oracle="""
WITH v AS (
    SELECT l.l_partkey AS l_partkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS part_value
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE s.s_nationkey = 3
    GROUP BY l.l_partkey
)
SELECT l_partkey, part_value
FROM v, (SELECT round(sum(part_value), 2) AS total FROM v) g
WHERE part_value > 0.002 * g.total
ORDER BY part_value DESC, l_partkey
""",
)
def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification): parts whose traded
    value through one nation's suppliers exceeds a fraction of that
    nation's total (no partsupp → value is traded revenue, same
    HAVING-against-scalar-subquery shape). The per-part aggregate is
    computed ONCE and reused for both the rows and the global total —
    a broadcast of the 1-row total, not a re-aggregation; the fraction
    compare happens on rounded values so the boundary is
    engine-stable."""
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    s = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    v = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.round(F.sum(_rev()), 2).alias("part_value"))
    )
    # the threshold scalar is rounded too — an unrounded float sum
    # would expose the boundary compare to summation-order jitter
    total = v.agg(F.round(F.sum("part_value"), 2).alias("__total"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 0.002 * F.col("__total"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "shipping_lag_priority_counts",
    oracle="""
SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 30
            THEN 'FAST'
            WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 90
            THEN 'MEDIUM' ELSE 'SLOW' END AS lag_band,
       CAST(count(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 END) AS BIGINT) AS high_line_count,
       CAST(count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       THEN 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY lag_band
""",
)
def shipping_lag_priority_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q12 (shipping modes & order priority): high- vs low-
    priority line counts per shipping class — no l_shipmode column, so
    the class is the ship lag band (FAST ≤30d, MEDIUM ≤90d, SLOW). Same
    plan shape: one lineitem⋈orders shuffle, the CASE bands computed
    post-join, both priority counts in ONE aggregate pass (conditional
    counts, not two scans)."""
    l = table(spark, sf_dir, "lineitem").filter(  # noqa: E741
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    o = table(spark, sf_dir, "orders")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    band = (
        F.when(lag <= 30, "FAST").when(lag <= 90, "MEDIUM").otherwise("SLOW")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(band.alias("lag_band"))
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
        .orderBy("lag_band")
    )


@register(
    "promo_revenue_ratio",
    oracle="""
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
           AS promo_pct,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
  AND l.l_shipdate <  TIMESTAMP '1997-04-01'
""",
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): PROMO-type share of one month's
    revenue. The ratio is a conditional-sum inside a single aggregate
    (never two aggregates joined); the month filter prunes lineitem's
    scan before the broadcast part join."""
    l = table(spark, sf_dir, "lineitem").filter(  # noqa: E741
        (F.col("l_shipdate") >= "1997-03-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    p = table(spark, sf_dir, "part")
    rev = _rev()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return l.join(F.broadcast(p), l.l_partkey == p.p_partkey).agg(
        F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"),
        F.round(F.sum(rev), 2).alias("total_revenue"),
    )


@register(
    "small_quantity_order_revenue",
    oracle="""
WITH pa AS (
    SELECT l_partkey, round(avg(l_quantity), 4) AS avg_qty
    FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN pa ON pa.l_partkey = l.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3' AND l.l_quantity < 0.5 * pa.avg_qty
""",
)
def small_quantity_order_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue lost if
    below-half-average-quantity orders of one brand stopped. The
    correlated per-part AVG decorrelates into a pre-aggregate joined
    back on partkey; the per-part average is rounded before the
    threshold compare so summation-order jitter can't flip a boundary
    row between engines. At this SF the aggregate is broadcast; at
    100 TB it stays a shuffle join on l_partkey — both sides are
    already partitioned by the join key after the agg."""
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    pa = l.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.round(F.avg("l_quantity"), 4).alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(pa, l.l_partkey == F.col("__pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "bracketed_discount_revenue",
    oracle="""
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def bracketed_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, OR-of-ANDs): revenue matching any
    of three (brand, size, quantity) brackets. The part-only implication
    of the disjunction — brand ∈ {1,2,3} with its size cap — is applied
    as an explicit pre-filter so the part side shrinks BEFORE the
    broadcast join (Catalyst doesn't factor cross-side disjunctions
    itself); the full mixed predicate then evaluates post-join. This is
    the canonical "derived build-side filter" pattern for OR-of-ANDs
    join predicates at scale."""
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    part_side = (
        (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
        | (F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
        | (F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
    )
    p = table(spark, sf_dir, "part").filter(part_side)
    full = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
        | (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
        | (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(full)
        .agg(
            F.round(F.sum(_rev()), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "excess_volume_suppliers",
    oracle="""
WITH sp AS (
    SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS qty
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE '%gear%'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
),
pa AS (SELECT l_partkey, round(avg(qty), 4) AS avg_qty FROM sp GROUP BY 1)
SELECT DISTINCT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
       n.n_name AS n_name
FROM sp
JOIN pa USING (l_partkey)
JOIN supplier s ON s.s_suppkey = sp.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE sp.qty > 1.5 * pa.avg_qty
ORDER BY s_suppkey
""",
)
def excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion shape): suppliers who moved
    >1.5× the per-part average volume of one product line in a year (no
    partsupp availqty → the threshold is the cross-supplier average,
    same correlated-subquery-to-pre-aggregate decorrelation). Two
    stacked aggregates on aligned keys — (supp, part) then (part) —
    so the second agg rides the first's partitioning; the average is
    rounded before the compare for engine-stable boundaries; supplier/
    nation broadcast; DISTINCT collapses multi-part hits."""
    l = table(spark, sf_dir, "lineitem").filter(  # noqa: E741
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    sp = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    pa = sp.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.round(F.avg("qty"), 4).alias("avg_qty")
    )
    return (
        sp.join(pa, sp.l_partkey == F.col("__pk"))
        .filter(F.col("qty") > 1.5 * F.col("avg_qty"))
        .join(F.broadcast(s), sp.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
        .orderBy("s_suppkey")
    )


@register(
    "suppliers_kept_orders_waiting",
    oracle="""
WITH po AS (
    SELECT l.l_orderkey,
           count(DISTINCT l.l_suppkey) AS n_supp,
           count(DISTINCT CASE WHEN datediff('day', o.o_orderdate,
                                             l.l_shipdate) > 60
                               THEN l.l_suppkey END) AS n_late,
           max(CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) > 60
                    THEN l.l_suppkey END) AS late_supp
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY l.l_orderkey
)
SELECT s.s_name AS s_name, CAST(count(*) AS BIGINT) AS numwait
FROM po JOIN supplier s ON s.s_suppkey = po.late_supp
WHERE po.n_supp >= 2 AND po.n_late = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def suppliers_kept_orders_waiting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): on finished
    multi-supplier orders, the sole supplier who shipped >60 days late
    (ship-vs-order lag standing in for receipt-vs-commit). Q21's
    EXISTS + NOT-EXISTS pair decorrelates into ONE aggregate per order:
    distinct-supplier count, distinct-late-supplier count, and the late
    suppkey via MAX(CASE) — when n_late = 1 the max IS that supplier,
    so no third join back to lineitem. One lineitem⋈orders shuffle +
    one per-order aggregate replaces two correlated subqueries."""
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60
    po = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(F.when(late, F.col("l_suppkey"))).alias(
                "n_late"
            ),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    return (
        po.join(F.broadcast(s), po.late_supp == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "dormant_high_balance_customers",
    oracle="""
WITH pool AS (
    SELECT * FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9)
),
thr AS (SELECT round(avg(c_acctbal), 4) AS cutoff
        FROM pool WHERE c_acctbal > 0)
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM pool, thr
WHERE c_acctbal > thr.cutoff
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = pool.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def dormant_high_balance_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers in a nation set with no RECENT orders (every customer
    has ≥1 order in this dataset, so "never ordered" is restated as
    "dormant since 2000" — same NOT-EXISTS anti-join + scalar-subquery
    threshold shape). The positive-balance average broadcasts as a
    1-row cross join; the anti join probes only date-filtered orders;
    both the filter column set and the anti-join key reach the scans."""
    pool = table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9)
    )
    thr = pool.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 4).alias("__cutoff")
    )
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    )
    return (
        pool.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("__cutoff"))
        .join(recent, pool.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "min_cost_supplier_per_part",
    oracle="""
WITH offers AS (
    SELECT l_partkey, l_suppkey,
           round(avg(l_extendedprice / l_quantity), 4) AS unit_price
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
    SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
),
ranked AS (
    SELECT p.p_partkey, eu.s_suppkey, eu.s_name, eu.s_acctbal, eu.n_name,
           offers.unit_price,
           row_number() OVER (PARTITION BY p.p_partkey
                              ORDER BY offers.unit_price, eu.s_suppkey) AS rn
    FROM offers
    JOIN eu ON offers.l_suppkey = eu.s_suppkey
    JOIN part p ON p.p_partkey = offers.l_partkey
    WHERE p.p_type = 'LARGE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, unit_price
FROM ranked WHERE rn = 1
ORDER BY s_acctbal DESC, p_partkey
LIMIT 100
""",
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum cost supplier): for each part of one type, the
    cheapest in-region supplier (no partsupp → observed avg unit price
    from lineitem history stands in for ps_supplycost). Q2's correlated
    MIN subquery decorrelates into a row_number window partitioned by
    part, ordered by rounded price with the unique suppkey tiebreak —
    deterministic where float MIN-equality is not. The region-filtered
    supplier dim broadcasts into the offers aggregate's output; the
    type filter prunes part before its join."""
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    offers = l.groupBy("l_partkey", "l_suppkey").agg(
        F.round(
            F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4
        ).alias("unit_price")
    )
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_price", "s_suppkey")
    return (
        offers.join(F.broadcast(eu), offers.l_suppkey == eu.s_suppkey)
        .join(F.broadcast(p), offers.l_partkey == p.p_partkey)
        .select(
            "p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name",
            "unit_price",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_price")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey")
        .limit(100)
    )


@register(
    "large_volume_customers",
    oracle="""
WITH big AS (
    SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
       o.o_totalprice, big.total_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
LIMIT 100
""",
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large volume customers): orders whose total lineitem
    quantity exceeds 300, with their customer, top-100 by order value.
    Completes the catalog's TPC-H sweep (Q18 was the one classic shape
    missing). Threshold 300 is the spec's value; the synthetic
    lineitem's per-order quantity tops out near 450, so the filter is
    selective at every test SF exactly as in TPC-H proper.

    Scale shape: the classic Q18 rewrite — pre-aggregate lineitem to
    order grain ONCE with map-side partials and filter on the HAVING
    before any join (the naive form joins raw lineitem twice), then
    two equi-joins (order-grain frame ⋈ orders ⋈ customer) and a
    top-100 that plans as TakeOrderedAndProject (per-partition partial
    top-k, no global sort). Unique tiebreak (price desc, date,
    orderkey) makes the cut deterministic cross-engine."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 300)
        .select("l_orderkey", F.round("__qty", 2).alias("total_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderdate"), "o_orderkey"
        )
        .limit(100)
    )
