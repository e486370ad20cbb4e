"""Batch 13: Poisson-bootstrap confidence intervals and RFM
segmentation.

The bootstrap rounds out the statistical-rigor family (HT-sampled AQP,
randomization test, KS/chi2/PSI): resampling-based error bars computed
WITHOUT shuffling the data per replicate — the Poisson(1) trick makes
bootstrap a single-pass groupBy, which is the only form that survives
100 TB. RFM is the canonical warehouse customer-scoring cube.

Oracle-parity conventions as in plans/catalog.py. Resampling weights
come from the repo's standard engine-neutral affine hash
(deterministic_sample, queries_relational2.py) — df.sample() is
partitioning-dependent and engine-specific, so no query uses it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table

# Poisson(1) CDF thresholds: weight = #{thresholds <= u}, u ~ U[0,1).
# Written to full double precision so both engines compare identical
# literals.
_POIS_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
)


@register(
    "bootstrap_mean_ci",
    oracle=f"""
WITH reps AS (SELECT unnest(range(0, 50)) AS b),
w AS (
    SELECT b,
           ((o_orderkey % 1000003) * 2654435761 + b * 40503) % 1000000
             / 1000000.0 AS u,
           o_totalprice AS x
    FROM orders CROSS JOIN reps
),
weighted AS (
    SELECT b, x,
           {" + ".join(f"CAST(u >= {c} AS INT)" for c in _POIS_CDF)} AS wt
    FROM w
),
means AS (
    SELECT b, round(sum(wt * x) / sum(wt), 4) AS m
    FROM weighted GROUP BY b
),
ranked AS (
    SELECT m, row_number() OVER (ORDER BY m, b) AS r, count(*) OVER () AS n
    FROM means
)
SELECT CAST(max(n) AS BIGINT) AS n_replicates,
       (SELECT round(avg(o_totalprice), 4) FROM orders) AS point_mean,
       max(CASE WHEN r = 2 THEN m END) AS ci_lo,
       max(CASE WHEN r = 25 THEN m END) AS ci_median,
       max(CASE WHEN r = 49 THEN m END) AS ci_hi
FROM ranked
""",
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for the mean order value via
    the POISSON bootstrap: replicate b resamples each row with weight
    ~ Poisson(1), realized deterministically from the repo's affine
    row hash against the Poisson CDF thresholds — so each of the 50
    replicate means is a weighted single-pass aggregate, and the whole
    bootstrap is ONE groupBy(replicate) over a 50× row explode. No
    engine-specific RNG anywhere: the resample is a pure function of
    (orderkey, replicate), reproducible across runs, engines, and
    repartitionings.

    Replicate means are rounded to 4dp (float sums re-canonicalized at
    the replicate boundary, the customer_spend_gini rule), and the CI
    endpoints are ORDER STATISTICS of the 50 means (ranks 2/25/49 ≈
    2.5/50/97.5%) rather than interpolated quantiles — interpolation
    arithmetic differs across engines in the last ulp and can straddle
    a rounding boundary; rank selection involves no float math.

    Scale shape: this is WHY Poisson bootstrap exists — the classical
    resample-n-rows bootstrap needs a per-replicate shuffle or a
    multinomial draw over row indices (driver-scale state); the
    Poisson form is embarrassingly parallel: the 50× replicate fan-out
    is an inline explode(sequence) — a codegen generator, not a 50-row
    crossJoin (which would plan a BroadcastNestedLoopJoin) — and it
    partial-combines into 50 groups map-side, so the shuffle carries
    50 rows per task no matter the corpus size. The point estimate
    folds in as a model-sized collected literal."""
    orders = table(spark, sf_dir, "orders")
    # collect the raw mean and round ENGINE-side (F.round = half away
    # from zero, matching the oracle's round()) — Python round() is
    # banker's half-even and would diverge on an exact 4dp halfway
    point = orders.agg(F.avg("o_totalprice")).head()[0]
    u = (
        (F.col("o_orderkey") % 1000003) * F.lit(2654435761)
        + F.col("b") * 40503
    ) % 1000000 / F.lit(1000000.0)
    wt = None
    for c in _POIS_CDF:
        term = (u >= F.lit(float(c))).cast("int")
        wt = term if wt is None else wt + term
    weighted = orders.select(
        F.explode(F.sequence(F.lit(0), F.lit(49))).alias("b"),
        F.col("o_totalprice").alias("x"),
        F.col("o_orderkey"),
    ).select("b", "x", wt.alias("wt"))
    means = weighted.groupBy("b").agg(
        F.round(F.sum(F.col("wt") * F.col("x")) / F.sum("wt"), 4).alias("m")
    )
    # CI endpoints by ORDER STATISTIC, not interpolated quantile: the
    # two engines' interpolation arithmetic differs in the last ulp
    # ((1-f)a+fb vs a+f(b-a)), which can straddle a 4dp rounding
    # boundary; selecting ranked elements involves no float arithmetic
    ranked = means.select(
        "m",
        F.row_number().over(Window.orderBy("m", "b")).alias("r"),
        F.count(F.lit(1))
        .over(Window.rowsBetween(Window.unboundedPreceding,
                                 Window.unboundedFollowing))
        .alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_replicates"),
        F.round(F.lit(point), 4).alias("point_mean"),
        F.max(F.when(F.col("r") == 2, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("r") == 25, F.col("m"))).alias("ci_median"),
        F.max(F.when(F.col("r") == 49, F.col("m"))).alias("ci_hi"),
    )


@register(
    "rfm_segmentation",
    oracle="""
WITH anchor AS (SELECT max(CAST(o_orderdate AS DATE)) AS a FROM orders),
cust AS (
    SELECT o_custkey,
           datediff('day', max(CAST(o_orderdate AS DATE)), a) AS recency,
           count(*) AS frequency,
           round(sum(o_totalprice), 2) AS monetary
    FROM orders CROSS JOIN anchor
    GROUP BY o_custkey, a
),
scored AS (
    SELECT ntile(5) OVER (ORDER BY recency, o_custkey) AS r_score,
           ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
           ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score,
           CAST(round(monetary * 100, 0) AS BIGINT) AS mon_cents
    FROM cust
)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(mon_cents) / (100.0 * count(*)), 4) AS avg_monetary
FROM scored
GROUP BY 1, 2, 3
ORDER BY r_score, f_score, m_score
""",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation cube: per-customer Recency (days since last
    order, vs the corpus max date), Frequency (order count), Monetary
    (total spend), each scored into quintiles (1 = best:
    most-recent / most-frequent / highest-spend), then the customer
    census per (R,F,M) cell — the classic CRM scoring cube. All three
    ntiles carry the custkey tiebreak, so cell assignment is
    deterministic cross-engine.

    Scale shape: one groupBy(custkey) reduces orders to the
    customer-grain frame — which still scales with the data, so no
    quintile may use a customer-grain single-partition window. The
    three quintile maps are computed FLAT off the one persisted
    customer frame and hash-joined back on custkey — chaining them
    (each ntile consuming the previous ntile's un-persisted output)
    recomputes every earlier layer in each later layer's offsets
    subtree, compounding per layer. Recency is CALENDAR-bounded and
    frequency ORDER-COUNT-bounded, so those use
    operators/indexing.exact_ntile_bounded (value-grain offsets +
    value-partitioned row_number, zero extra actions with the shared
    count); monetary is customer-grain, so it takes the full
    distributed exact_ntile over the negated column (monetary DESC ≡
    −monetary ASC — negation is exact for doubles, and a plain
    ascending numeric column keeps the literal-boundary fast path
    eligible). The anchor date is max(last_order) OVER customers, so
    it rides the same single action as the count and the monetary
    boundaries — no separate full-orders scan — and recency is a
    projection off the persisted customer frame."""
    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        exact_ntile,
        exact_ntile_bounded,
    )

    orders = table(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("__lastd"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    ).persist()  # three ntile passes + the shared action read this frame
    # ONE action: shared customer count, monetary bucket boundaries
    # (negated below — monetary ntile orders on −monetary), AND the
    # anchor date (= max last-order over customers, saving the separate
    # full-orders scan the collected-literal form spent)
    crow = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx(
            F.col("monetary"), [i / 32 for i in range(1, 32)], 1000
        ).alias("mb"),
        F.max("__lastd").alias("anchor"),
    ).first()
    n_cust = crow["n"]
    neg_bounds = sorted(-b for b in (crow["mb"] or []) if b is not None)
    cust = base.withColumn(
        "recency", F.datediff(F.lit(crow["anchor"]), F.col("__lastd"))
    )
    r = exact_ntile_bounded(
        cust.select("o_custkey", "recency"),
        "recency",
        ["o_custkey"],
        5,
        out_col="r_score",
        total=n_cust,
    ).select("o_custkey", "r_score")
    f = exact_ntile_bounded(
        cust.select("o_custkey", "frequency"),
        "frequency",
        ["o_custkey"],
        5,
        out_col="f_score",
        total=n_cust,
        descending=True,
    ).select("o_custkey", "f_score")
    m = exact_ntile(
        cust.select(
            "o_custkey", "monetary", (-F.col("monetary")).alias("__neg_mon")
        ),
        ["__neg_mon", "o_custkey"],
        5,
        out_col="m_score",
        total=n_cust,
        boundaries=neg_bounds,
    ).select("o_custkey", "m_score", "monetary")
    scored = m.join(r, "o_custkey").join(f, "o_custkey").select(
        "r_score",
        "f_score",
        "m_score",
        # integer cents: cell averages then come from an EXACT integer
        # sum + one division, immune to float accumulation order (the
        # raw per-cell avg() straddled a 4dp boundary cross-engine)
        F.round(F.col("monetary") * 100, 0).cast("bigint").alias("mon_cents"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(
                F.sum("mon_cents") / (100.0 * F.count(F.lit(1))), 4
            ).alias("avg_monetary"),
        )
        .select(
            F.col("r_score").cast("bigint").alias("r_score"),
            F.col("f_score").cast("bigint").alias("f_score"),
            F.col("m_score").cast("bigint").alias("m_score"),
            "n_customers",
            "avg_monetary",
        )
        .orderBy("r_score", "f_score", "m_score")
    )
