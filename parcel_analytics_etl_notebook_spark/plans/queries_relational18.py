"""Batch 18 (relational): FIFO layer matching (the inventory-costing
double-cumsum interval intersection), sweep-line peak concurrency, and
MAD-based robust outlier detection.

Each is a distinct engine shape the catalog lacked: FIFO matching
aligns TWO independently-ordered cumulative-quantity axes per key and
intersects their half-open layers — the classic FIFO cost-layer /
cash-application algorithm, expressed as window cumsums plus a
per-key equi-join with an interval filter (NOT an order-dependent
loop); peak concurrency is the +1/−1 sweep-line counter over interval
endpoints (interval_coverage_merge in batch 16 is the UNION sweep —
running max(end); this is the COUNT sweep — running sum of deltas);
MAD outliers are the two-phase grouped median-of-deviations robust
z-score (median and percentile shapes exist in the catalog; the
re-join + second grouped median over derived deviations is new).

Oracle-parity conventions as in plans/catalog.py: interval arithmetic
in exact integer day indexes; quantity cumsums are integral doubles
(exact below 2^53) accumulated in identical window order on both
engines; medians use Spark ``percentile`` ≡ DuckDB ``quantile_cont``
((n−1)·q rank interpolation, see queries_relational11); floats appear
only in final rounded expressions computed with the identical formula
on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table

# --------------------------------------------------------------------------
# FIFO layer matching: 1995 supply layers vs 1996 demand, per part
# --------------------------------------------------------------------------
_FIFO_SUPPLY_YEAR = 1995
_FIFO_DEMAND_YEAR = 1996


@register(
    "fifo_layer_matching",
    oracle=f"""
WITH s AS (
    SELECT l_partkey AS pk, l_quantity AS qty, CAST(l_shipdate AS DATE) AS d,
           sum(l_quantity) OVER w AS cum,
           sum(l_quantity) OVER w - l_quantity AS lo
    FROM lineitem WHERE year(l_shipdate) = {_FIFO_SUPPLY_YEAR}
    WINDOW w AS (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
d AS (
    SELECT l_partkey AS pk, l_quantity AS qty, CAST(l_shipdate AS DATE) AS d,
           sum(l_quantity) OVER w AS cum,
           sum(l_quantity) OVER w - l_quantity AS lo
    FROM lineitem WHERE year(l_shipdate) = {_FIFO_DEMAND_YEAR}
    WINDOW w AS (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
m AS (
    SELECT d.pk,
           least(s.cum, d.cum) - greatest(s.lo, d.lo) AS matched,
           datediff('day', s.d, d.d) AS age_days
    FROM s JOIN d ON s.pk = d.pk AND s.lo < d.cum AND d.lo < s.cum
),
dem AS (
    SELECT pk, sum(qty) AS demand_qty FROM d GROUP BY pk
),
sup AS (
    SELECT pk, sum(qty) AS supply_qty FROM s GROUP BY pk
),
ma AS (
    SELECT pk, sum(matched) AS matched_qty,
           CAST(count(*) AS BIGINT) AS n_layer_splits,
           sum(matched * age_days) AS age_wsum
    FROM m GROUP BY pk
)
SELECT p.p_brand,
       round(sum(dem.demand_qty), 2) AS demand_qty,
       round(coalesce(sum(ma.matched_qty), 0), 2) AS matched_qty,
       round(sum(dem.demand_qty) - coalesce(sum(ma.matched_qty), 0), 2)
           AS stockout_qty,
       round(coalesce(sum(sup.supply_qty), 0)
             - coalesce(sum(ma.matched_qty), 0), 2) AS leftover_qty,
       CAST(coalesce(sum(ma.n_layer_splits), 0) AS BIGINT) AS n_layer_splits,
       round(sum(ma.age_wsum) / sum(ma.matched_qty), 4) AS avg_age_days
FROM dem
LEFT JOIN sup ON dem.pk = sup.pk
LEFT JOIN ma ON dem.pk = ma.pk
JOIN part p ON dem.pk = p.p_partkey
GROUP BY p.p_brand ORDER BY p.p_brand
""",
)
def fifo_layer_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO cost-layer matching: each part's 1995 shipments form supply
    layers, its 1996 shipments form demand layers, and demand consumes
    supply strictly first-in-first-out. The imperative queue algorithm
    becomes pure relational algebra via the double-cumsum trick: order
    each side deterministically (shipdate, orderkey, linenumber), take
    the running-quantity interval [lo, cum) of every row, and a demand
    row matches a supply layer exactly where the intervals intersect —
    matched = least(cums) − greatest(los). Reports per part brand:
    demand, matched, stockout (demand past total supply), leftover
    (supply never consumed), layer-split count, and the matched-
    quantity-weighted average layer age in days (FIFO inventory aging).

    Scale shape: two filtered scans of lineitem (year predicate pushed
    to parquet), one window cumsum each — partitioned by partkey, so
    parallel across parts and, crucially, per-part input is BOUNDED
    (~30 lines per part at every TPC-H scale factor; parts scale with
    SF, lines-per-part doesn't). The match join is an EQUI-join on
    partkey with the interval predicate as a post-join filter — never
    an inequality nested loop; per-key fan-out is bounded by the same
    ~30×30 constant. Quantities are integral doubles, so cumsums and
    the interval comparisons are exact (< 2^53); the brand rollup is a
    key-grain aggregate after a partkey join to part (left to AQE —
    part is dimension-scale at any SF relative to lineitem).
    """
    li = table(spark, sf_dir, "lineitem")

    def layers(year: int) -> DataFrame:
        w = (
            Window.partitionBy("l_partkey")
            .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return (
            li.filter(F.year("l_shipdate") == year)
            .select(
                F.col("l_partkey").alias("pk"),
                F.col("l_quantity").alias("qty"),
                F.col("l_shipdate").cast("date").alias("d"),
                F.sum("l_quantity").over(w).alias("cum"),
            )
            .withColumn("lo", F.col("cum") - F.col("qty"))
        )

    s = layers(_FIFO_SUPPLY_YEAR).alias("s")
    d = layers(_FIFO_DEMAND_YEAR).alias("d")
    m = (
        s.join(d, "pk")
        .filter(
            (F.col("s.lo") < F.col("d.cum")) & (F.col("d.lo") < F.col("s.cum"))
        )
        .select(
            "pk",
            (
                F.least(F.col("s.cum"), F.col("d.cum"))
                - F.greatest(F.col("s.lo"), F.col("d.lo"))
            ).alias("matched"),
            F.datediff(F.col("d.d"), F.col("s.d")).alias("age_days"),
        )
    )
    dem = d.groupBy("pk").agg(F.sum("qty").alias("demand_qty"))
    sup = s.groupBy("pk").agg(F.sum("qty").alias("supply_qty"))
    ma = m.groupBy("pk").agg(
        F.sum("matched").alias("matched_qty"),
        F.count(F.lit(1)).cast("bigint").alias("n_layer_splits"),
        F.sum(F.col("matched") * F.col("age_days")).alias("age_wsum"),
    )
    part = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"), "p_brand"
    )
    z = F.lit(0.0)
    return (
        dem.join(sup, "pk", "left")
        .join(ma, "pk", "left")
        .join(part, "pk")
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("demand_qty"), 2).alias("demand_qty"),
            F.round(F.coalesce(F.sum("matched_qty"), z), 2).alias("matched_qty"),
            F.round(
                F.sum("demand_qty") - F.coalesce(F.sum("matched_qty"), z), 2
            ).alias("stockout_qty"),
            F.round(
                F.coalesce(F.sum("supply_qty"), z)
                - F.coalesce(F.sum("matched_qty"), z),
                2,
            ).alias("leftover_qty"),
            F.coalesce(F.sum("n_layer_splits"), F.lit(0))
            .cast("bigint")
            .alias("n_layer_splits"),
            F.round(F.sum("age_wsum") / F.sum("matched_qty"), 4).alias(
                "avg_age_days"
            ),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# Sweep-line peak concurrency: most simultaneously-open orders
# --------------------------------------------------------------------------
@register(
    "peak_concurrent_orders",
    oracle="""
WITH iv AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
               AS od,
           datediff('day', DATE '1970-01-01', CAST(max(l.l_shipdate) AS DATE))
               AS cd
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate
),
delta AS (
    SELECT od AS day, 1 AS dv FROM iv
    UNION ALL
    SELECT cd + 1 AS day, -1 AS dv FROM iv
),
daily AS (
    SELECT day, sum(dv) AS net FROM delta GROUP BY day
),
conc AS (
    SELECT day,
           sum(net) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open_orders
    FROM daily
)
SELECT CAST(DATE '1970-01-01' + CAST(day AS INTEGER) AS VARCHAR) AS day,
       CAST(open_orders AS BIGINT) AS open_orders
FROM conc ORDER BY open_orders DESC, day LIMIT 5
""",
)
def peak_concurrent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency: an order is 'open' from its order
    date through its last line's ship date; find the five event days
    with the most simultaneously-open orders. The classic +1/−1
    endpoint sweep — batch 16's interval_coverage_merge is the UNION
    sweep (running max of ends → merged blocks); this is the COUNT
    sweep (running sum of endpoint deltas → a concurrency step
    function whose value changes only on event days, so evaluating it
    at event days is exact). Day arithmetic is integer day indexes;
    the top-5 cutoff orders by the exact (count DESC, day) pair, so
    the limit boundary cannot be float-ambiguous.

    Scale shape: the only fact-scale work is max(l_shipdate) per order
    — one aggregate with map-side partials on the orderkey the two
    tables already share. Endpoint deltas collapse to DAY grain
    (calendar-bounded, ~2.5k rows at any SF) before the running sum,
    so the unpartitioned window sorts a calendar-sized frame, never
    fact rows — same justification as the EWMA/seasonal family
    (queries_relational12). The top-5 compiles to TakeOrdered."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    epoch = F.lit("1970-01-01").cast("date")
    iv = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.datediff(F.col("o_orderdate").cast("date"), epoch).alias("od"),
            F.datediff(F.col("last_ship").cast("date"), epoch).alias("cd"),
        )
    )
    delta = iv.select(F.col("od").alias("day"), F.lit(1).alias("dv")).unionAll(
        iv.select((F.col("cd") + 1).alias("day"), F.lit(-1).alias("dv"))
    )
    daily = delta.groupBy("day").agg(F.sum("dv").alias("net"))
    conc = daily.select(
        "day",
        F.sum("net")
        .over(
            Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("open_orders"),
    )
    return (
        conc.select(
            F.date_format(F.date_add(epoch, F.col("day")), "yyyy-MM-dd").alias(
                "day"
            ),
            F.col("open_orders").cast("bigint").alias("open_orders"),
        )
        .orderBy(F.col("open_orders").desc(), "day")
        .limit(5)
    )


# --------------------------------------------------------------------------
# MAD robust outliers: median-of-deviations z-scores per order status
# --------------------------------------------------------------------------
@register(
    "mad_robust_outliers",
    oracle="""
WITH med AS (
    SELECT o_orderstatus AS st,
           quantile_cont(o_totalprice, 0.5) AS med
    FROM orders GROUP BY 1
),
dev AS (
    SELECT o.o_orderstatus AS st, o.o_totalprice AS x, med.med,
           abs(o.o_totalprice - med.med) AS adev
    FROM orders o JOIN med ON o.o_orderstatus = med.st
),
mad AS (
    SELECT st, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1
)
SELECT dev.st AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(min(dev.med), 4) AS median_price,
       round(min(mad.mad), 4) AS mad,
       CAST(sum(CASE WHEN 0.6745 * dev.adev > 3.5 * mad.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(max(0.6745 * dev.adev / mad.mad), 4) AS max_robust_z
FROM dev JOIN mad ON dev.st = mad.st
GROUP BY 1 ORDER BY o_orderstatus
""",
)
def mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per order status: median absolute
    deviation (MAD) z-scores, the standard robust alternative to
    mean/stddev flagging (a single whale order inflates the stddev and
    hides itself; the median/MAD pair has a 50% breakdown point).
    Two-phase grouped median: median price per status, re-join to
    derive absolute deviations, median of THOSE per status, then flag
    rows where 0.6745·|x − med| > 3.5·MAD (the classic consistency
    constant and cutoff). Both engines interpolate medians identically
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, (n−1)·q rank —
    queries_relational11's convention) and the flag comparison uses
    the identical multiply-only formula, so no division rounding can
    flip a boundary row on one engine only.

    Scale shape: two grouped EXACT medians over the fact table — the
    oracle-parity choice; at 100 TB swap ``percentile`` for
    ``approx_percentile`` or the two-pass literal-boundary frac-rank
    (operators/indexing.py global_frac_rank) exactly as
    spend_global_percentile_bands documents — the surrounding plan
    (status-key joins with map-side partials, 3-row broadcast medians)
    is unchanged. The deviation join broadcasts the 3-row median
    frame, so the fact table shuffles only for the two medians."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("st"), F.col("o_totalprice").alias("x")
    )
    med = o.groupBy("st").agg(F.expr("percentile(x, 0.5)").alias("med"))
    dev = o.join(F.broadcast(med), "st").withColumn(
        "adev", F.abs(F.col("x") - F.col("med"))
    )
    mad = dev.groupBy("st").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "st")
        .groupBy(F.col("st").alias("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.min("med"), 4).alias("median_price"),
            F.round(F.min("mad"), 4).alias("mad"),
            F.sum(
                (0.6745 * F.col("adev") > 3.5 * F.col("mad")).cast("int")
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.round(F.max(0.6745 * F.col("adev") / F.col("mad")), 4).alias(
                "max_robust_z"
            ),
        )
        .orderBy("o_orderstatus")
    )
