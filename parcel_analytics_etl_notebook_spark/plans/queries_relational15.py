"""Batch 15 (relational): global percentile banding, weight-
proportional systematic sampling, and NOT IN (null-aware anti join)
semantics — three shapes the catalog exercised only in weaker forms.

``customer_spend_distribution`` covers percent_rank/cume_dist WITHIN a
segment (a partitioned window — trivially parallel); the GLOBAL
percentile of a fact-scaling measure is the form that breaks at scale
(single-partition window) and is closed here by
operators/indexing.global_frac_rank. Sampling so far was unweighted
systematic (``aqp_revenue_by_region``) or stratified-by-budget
(``token_weighted_sample``); probability-proportional-to-size
systematic sampling (Madow 1949) is the survey-sampling standard for
monetary audits and rides the exact BIGINT distributed prefix sum.
``NOT IN (subquery)`` has different NULL semantics than NOT EXISTS
(one NULL in the inner set empties the result) and a different — and
at scale DANGEROUS — physical plan; the engine-side query shows the
scalable rewrite.

Oracle-parity conventions as in plans/catalog.py: exact integer-cents
algebra wherever float accumulation order could differ; integer
(``div`` / ``//``) arithmetic for band and bucket assignment so no
float boundary can straddle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table


# --------------------------------------------------------------------------
# Global tie-aware percentile bands over customer spend
# --------------------------------------------------------------------------
@register(
    "spend_global_percentile_bands",
    oracle="""
WITH cust AS (
    SELECT o_custkey,
           CAST(round(round(sum(o_totalprice), 2) * 100, 0) AS BIGINT) AS cents
    FROM orders GROUP BY 1
),
r AS (
    SELECT cents,
           rank() OVER (ORDER BY cents) * 2
             + count(*) OVER (PARTITION BY cents) - 1 AS t2,
           count(*) OVER () AS n
    FROM cust
)
SELECT CAST((t2 - 1) * 10 // (2 * n) AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(min(cents) / 100.0, 2) AS min_spend,
       round(max(cents) / 100.0, 2) AS max_spend,
       round(sum(cents) / (100.0 * count(*)), 4) AS avg_spend
FROM r GROUP BY 1 ORDER BY band
""",
)
def spend_global_percentile_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Decile bands of the GLOBAL spend percentile: each customer's
    tie-averaged rank over the whole corpus (avg rank = lo + (ties+1)/2
    — the value every ECDF/percentile statistic wants under ties),
    banded into 10 population deciles and profiled (count, min/max/avg
    spend per band). The global twin of customer_spend_distribution's
    within-segment percent_rank — the form that needs distributed rank
    machinery instead of a partitioned window.

    Band arithmetic stays in INTEGERS end to end: 2·frac_rank is an
    exact BIGINT (frac ranks are .0/.5 rationals), so
    band = (2·frac − 1)·10 div 2n involves no float whose rounding
    could straddle a decile boundary cross-engine; spend aggregates use
    the integer-cents rule.

    Scale shape: one groupBy(custkey), then
    operators/indexing.global_frac_rank — one shuffle on the
    literal-boundary bucket with in-bucket rank/tie-count windows, no
    single-partition window, no value-grain join-back — and a 10-group
    aggregate. The customer count and bucket boundaries ride ONE
    model-sized action."""
    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        global_frac_rank,
    )

    orders = table(spark, sf_dir, "orders")
    cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.round(F.round(F.sum("o_totalprice"), 2) * 100, 0)
            .cast("bigint")
            .alias("cents")
        )
        .persist()  # boundary action + rank pass read this frame
    )
    row = cust.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx(
            F.col("cents").cast("double"), [i / 32 for i in range(1, 32)], 1000
        ).alias("bs"),
    ).first()
    n = row["n"]
    fr = global_frac_rank(cust, "cents", out_col="fr", boundaries=row["bs"])
    banded = fr.withColumn("t2", (F.col("fr") * 2).cast("bigint")).withColumn(
        "band", F.expr(f"(t2 - 1) * 10 div ({2 * n}L)")
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(F.min("cents") / 100.0, 2).alias("min_spend"),
            F.round(F.max("cents") / 100.0, 2).alias("max_spend"),
            F.round(F.sum("cents") / (100.0 * F.count(F.lit(1))), 4).alias(
                "avg_spend"
            ),
        )
        .select(
            F.col("band").cast("bigint").alias("band"),
            "n_customers",
            "min_spend",
            "max_spend",
            "avg_spend",
        )
        .orderBy("band")
    )


# --------------------------------------------------------------------------
# Probability-proportional-to-size systematic sample (Madow 1949)
# --------------------------------------------------------------------------
_PPS_K = 100

#: switch the bucket test to DECIMAL(38,0) when total·K could near
#: BIGINT range — well before the edge (2^62, one spare bit), since the
#: overflow risk is the cum·K intermediate PRODUCT, not the quotient
_PPS_BIGINT_HEADROOM = 2**62


def pps_selection(total: int, k: int) -> tuple:
    """(bucket Column, keep Column) for Madow systematic PPS selection
    over exact integer prefix sums ``cum``/weights ``cents``.

    The test is pure integer math — (cum−1)·K div T > (cum−cents−1)·K
    div T — whose intermediate product cum·K overflows BIGINT once
    ``total·k`` nears 2^63 (≈1e17 cents of turnover at K=100, i.e. the
    100 TB deployment). Past the headroom guard the SAME arithmetic
    runs in DECIMAL(38,0) — exact to 38 digits, identical quotients —
    so results are scale-invariant (VERDICT r04 #4 closed the
    documented-but-manual switch)."""
    wide = total * k >= _PPS_BIGINT_HEADROOM
    cum = "CAST(cum AS DECIMAL(38,0))" if wide else "cum"
    t = f"CAST({total} AS DECIMAL(38,0))" if wide else f"{total}L"
    hi = F.expr(f"({cum} - 1) * {k} div {t}").cast("bigint")
    lo = F.expr(f"({cum} - cents - 1) * {k} div {t}").cast("bigint")
    return hi, (hi > lo) | (F.col("cum") == F.col("cents"))


@register(
    "pps_systematic_sample",
    oracle=f"""
WITH w AS (
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
),
c AS (
    SELECT o_orderkey, cents,
           sum(cents) OVER (ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(cents) OVER () AS total
    FROM w
)
SELECT o_orderkey,
       round(cents / 100.0, 2) AS o_totalprice,
       CAST((cum - 1) * {_PPS_K} // total AS BIGINT) AS bucket
FROM c
WHERE (cum - 1) * {_PPS_K} // total > (cum - cents - 1) * {_PPS_K} // total
   OR cum = cents
ORDER BY o_orderkey
""",
)
def pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size systematic sample of ~K orders,
    weighted by order value (Madow 1949) — the survey-sampling standard
    behind monetary-unit audit sampling: lay all order values end to
    end on a line of total length T, cut the line into K equal buckets,
    and take the order under each cut. Selection probability is
    proportional to value; an order longer than a bucket is taken
    exactly once (its bucket ids jump by >1). Deterministic: the line
    order is the order key, the arithmetic is exact BIGINT cents —
    no RNG, no floats, reproducible across engines and repartitionings.

    A row is selected iff its cents-interval (cum−cents, cum] contains
    a bucket boundary, tested in integer math as
    (cum−1)·K div T > (cum−cents−1)·K div T (the first row is always
    selected: it owns boundary 0).

    Scale shape: the cumulative line position is
    operators/indexing.global_running_sums — exact BIGINT accumulation,
    literal-boundary bucketing, no single-partition window — the
    selection test is a pure projection, and the output is ~K rows.
    The total T and the operator's bucket boundaries ride ONE
    model-sized action. At 100 TB the cum·K product approaches BIGINT
    range — 1e17 cents · 100 — so :func:`pps_selection` auto-switches
    the test to DECIMAL(38,0) past the headroom guard; the shape is
    unchanged."""
    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        global_running_sums,
    )

    orders = table(spark, sf_dir, "orders")
    w = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    ).persist()  # total/boundary action + the prefix-sum pass read it
    row = w.agg(
        F.sum("cents").alias("t"),
        F.percentile_approx(
            F.col("o_orderkey").cast("double"),
            [i / 32 for i in range(1, 32)],
            1000,
        ).alias("bs"),
    ).first()
    total = int(row["t"])
    cum = global_running_sums(
        w,
        ["o_orderkey"],
        ["cents"],
        out_cols=["cum"],
        boundaries=row["bs"],
    )
    bucket, keep = pps_selection(total, _PPS_K)
    return (
        cum.withColumn("bucket", bucket)
        .filter(keep)
        .select(
            "o_orderkey",
            F.round(F.col("cents") / 100.0, 2).alias("o_totalprice"),
            "bucket",
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# NOT IN (subquery): null-aware anti join, rewritten scalably
# --------------------------------------------------------------------------
@register(
    "parts_never_ordered_notin",
    oracle="""
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS never_ordered_parts
FROM part
WHERE p_partkey NOT IN (
    SELECT l_partkey FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
)
GROUP BY 1 ORDER BY p_brand
""",
)
def parts_never_ordered_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts with no 1998+ shipment, per brand — expressed in the
    oracle as ``NOT IN (subquery)``, whose NULL semantics differ from
    NOT EXISTS: one NULL anywhere in the inner set makes the whole
    result EMPTY (x <> NULL is unknown for every x). Spark honors that
    by planning single-column NOT IN as a null-aware anti join, which
    degenerates to BroadcastNestedLoopJoin when the inner side is too
    big to broadcast — a data-scale cartesian at 100 TB.

    The engine side is the scalable REWRITE of the same semantics:
    a plain shuffled LEFT ANTI join (hash, partial-agg-friendly, safe
    at any inner size) over the NON-NULL-keyed outer rows, aggregated
    to brand grain, gated by the 1-row ``any(l_partkey IS NULL)``
    scalar (inner NULL ⇒ empty result); NULL-keyed OUTER rows take
    their own bounded branch gated on inner EMPTINESS — ``NULL NOT IN
    S`` is TRUE only when S is empty, UNKNOWN otherwise — so the
    union reproduces NOT IN row-for-row on arbitrary inputs (ADVICE
    r04 closed the previous NULL-outer-key gap). Both gates attach via
    the catalog's allowlisted broadcast-scalar pattern to BOUNDED
    brand-grain frames.

    (Here l_partkey and p_partkey are never NULL, so both gates are
    constant and the rewrite equals NOT EXISTS — the point is the
    PLAN: semantics preserved for general inputs with a hash anti
    join instead of the null-aware BNLJ cliff.)"""
    part = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= "1998-01-01"
    )
    inner = li.select("l_partkey")
    flags = inner.agg(
        F.max(F.coalesce(F.col("l_partkey").isNull(), F.lit(False))).alias(
            "__has_null"
        ),
        (F.count(F.lit(1)) > 0).alias("__nonempty"),
    )
    survivors = part.filter(F.col("p_partkey").isNotNull()).join(
        inner, part.p_partkey == inner.l_partkey, "left_anti"
    )
    counts = survivors.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    null_counts = (
        part.filter(F.col("p_partkey").isNull())
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    kept = counts.crossJoin(F.broadcast(flags)).filter(
        # empty inner set ⇒ the ungrouped max is NULL ⇒ no null was
        # seen ⇒ keep everything (NOT IN over an empty set is TRUE)
        ~F.coalesce(F.col("__has_null"), F.lit(False))
    )
    kept_null = null_counts.crossJoin(F.broadcast(flags)).filter(
        ~F.col("__nonempty")  # NULL key survives ONLY an empty inner set
    )
    return (
        kept.select("p_brand", "cnt")
        .unionByName(kept_null.select("p_brand", "cnt"))
        .groupBy("p_brand")
        .agg(F.sum("cnt").cast("bigint").alias("never_ordered_parts"))
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# Relational division: customers active in ALL four quarters of 1997
# --------------------------------------------------------------------------
@register(
    "customers_all_quarters_1997",
    oracle="""
WITH q AS (
    SELECT DISTINCT o_custkey,
           CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qt
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
),
full_year AS (
    SELECT o_custkey FROM q GROUP BY o_custkey HAVING count(*) = 4
)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS all_quarter_customers,
       round(sum(c.c_acctbal), 2) AS total_acctbal
FROM full_year f JOIN customer c ON c.c_custkey = f.o_custkey
GROUP BY 1 ORDER BY c_mktsegment
""",
)
def customers_all_quarters_1997(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational DIVISION — the classical "for all" query shape
    (Codd's ÷): customers who placed at least one order in EVERY
    quarter of 1997, profiled per market segment. Division has no
    direct SQL/DataFrame operator; the two textbook rewrites are
    double-NOT-EXISTS (two anti-join passes) and the counting form
    used here — dedup to (customer, quarter), then
    ``count(*) == |divisor|`` per customer — which is one dedup
    aggregate and one count aggregate, both hash-friendly with
    map-side partials, and is how a 100 TB engine should divide
    (the divisor cardinality is a CONSTANT literal 4, not a scalar
    subquery; the double-anti form shuffles the fact twice and cannot
    partial-aggregate).

    Scale shape: the date filter pushes to the parquet scan; the dedup
    shuffles on (custkey, quarter) with map-side partials and the
    division count on custkey (both key-grain, bounded fan-in ≤ 4 rows
    per customer into the count); the survivors then hash-join
    customer and reduce to the 5-segment frame."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    q = (
        orders.filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .select(
            "o_custkey",
            F.quarter(F.col("o_orderdate").cast("date")).alias("qt"),
        )
        .distinct()
    )
    full_year = (
        q.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("nq"))
        .filter(F.col("nq") == 4)
    )
    return (
        full_year.join(customer, full_year.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("all_quarter_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )
