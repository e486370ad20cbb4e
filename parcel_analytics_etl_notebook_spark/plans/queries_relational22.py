"""Round-8 relational additions, batch 3: zone-map file skipping,
k-anonymity audit, lead-lag cross-correlation, and split-conformal
coverage.

Four shapes a 100 TB deployment leans on that the catalog lacked:
(1) the lakehouse data-layout question — how many files does a range
predicate skip under a date-clustered vs a hash-scattered layout —
stated as a query over synthetic zone maps (min/max per file), the
exact pruning mechanism Delta/Iceberg/Hudi manifests implement;
(2) the privacy-side curation audit (k-anonymity + l-diversity over a
quasi-identifier) a dataset release pipeline runs before shipping;
(3) the lead-lag cross-correlation between two daily series — the
time-series screening pass behind "does order volume lead revenue";
(4) split-conformal prediction intervals with exact BIGINT-cents
arithmetic — the distribution-free coverage audit an ML pipeline runs
on a frozen model, with the quantile rank ceil((n+1)·0.9)/n stated as
pure integer math so both engines agree bit-for-bit.

Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table

#: reduce-mod-p-BEFORE-multiply polynomial hash (the int64-overflow-safe
#: discipline of queries_llm11._split_case): same constants both engines
_P = 1_000_000_007
_MULT = 1_000_003

#: date-clustered layout: one "file" per 32 ingest days
_ZM_DAYS_PER_FILE = 32
#: hash-scattered layout: fixed 64-file bucket count
_ZM_HASH_FILES = 64
#: zone-map probe predicates: the 12 months of 1995
_ZM_MONTHS = [
    (f"1995-{m:02d}", f"1995-{m:02d}-01",
     f"1996-01-01" if m == 12 else f"1995-{m + 1:02d}-01")
    for m in range(1, 13)
]


# --------------------------------------------------------------------------
# Zone-map file-skipping effectiveness: clustered vs scattered layout
# --------------------------------------------------------------------------
@register(
    "zone_map_skip_rates",
    oracle=f"""
WITH f AS (
    SELECT 'date_clustered' AS layout,
           datediff('day', DATE '1992-01-01', o_orderdate) // {_ZM_DAYS_PER_FILE} AS file_id,
           min(o_orderdate) AS f_min, max(o_orderdate) AS f_max
    FROM orders GROUP BY 1, 2
    UNION ALL
    SELECT 'key_hashed' AS layout,
           ((o_orderkey % {_P}) * {_MULT}) % {_P} % {_ZM_HASH_FILES} AS file_id,
           min(o_orderdate) AS f_min, max(o_orderdate) AS f_max
    FROM orders GROUP BY 1, 2
),
p AS (
    SELECT * FROM (VALUES {", ".join(
        f"('{lbl}', DATE '{lo}', DATE '{hi}')" for lbl, lo, hi in _ZM_MONTHS
    )}) AS t(pred_month, lo, hi)
),
tot AS (SELECT layout, count(*) AS files_total FROM f GROUP BY 1),
sc AS (
    SELECT layout, pred_month, count(*) AS files_scanned
    FROM f JOIN p ON f.f_min < p.hi AND f.f_max >= p.lo
    GROUP BY 1, 2
)
SELECT tot.layout, p.pred_month,
       CAST(files_total AS BIGINT) AS files_total,
       CAST(coalesce(files_scanned, 0) AS BIGINT) AS files_scanned,
       CAST((files_total - coalesce(files_scanned, 0)) * 10000
            // files_total AS BIGINT) AS skip_rate_bp
FROM tot CROSS JOIN p
LEFT JOIN sc ON sc.layout = tot.layout AND sc.pred_month = p.pred_month
ORDER BY 1, 2
""",
)
def zone_map_skip_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping effectiveness of two physical layouts, measured
    with zone maps (per-file min/max of the predicate column) — the
    pruning mechanism behind Delta/Iceberg manifests and parquet
    row-group stats. Layout A clusters orders into one file per 32
    order-date days (what a date-partitioned ingest produces); layout B
    scatters them into 64 hash buckets of the order key (what an
    unclustered bulk load produces). For each month-of-1995 range
    predicate, a file must be scanned iff its zone map overlaps the
    range; the skip rate is reported in exact BIGINT basis points.
    The date-clustered layout skips ~everything outside the month; the
    hashed layout skips nothing — the measured argument for clustering
    (see morton_zorder_buckets for the multi-column variant).

    Scale shape: both zone maps are one map-combined groupBy over a
    single scan (file counts ~100, i.e. model-sized); the probe is a
    broadcast of 12 predicate rows against the tiny zone-map frame
    (the non-equi overlap join is bounded at files x months rows).
    At 100 TB the zone-map frame is manifest-sized (one row per file),
    never data-sized."""
    o = table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    hashed = (
        (F.col("o_orderkey") % _P) * _MULT % _P % _ZM_HASH_FILES
    )
    f = (
        o.select(
            F.lit("date_clustered").alias("layout"),
            F.expr(f"datediff(o_orderdate, date'1992-01-01') div {_ZM_DAYS_PER_FILE}").alias("file_id"),
            F.col("o_orderdate"),
        )
        .unionByName(
            o.select(
                F.lit("key_hashed").alias("layout"),
                hashed.alias("file_id"),
                F.col("o_orderdate"),
            )
        )
        .groupBy("layout", "file_id")
        .agg(
            F.min("o_orderdate").alias("f_min"),
            F.max("o_orderdate").alias("f_max"),
        )
    )
    preds = spark.createDataFrame(
        [(lbl, lo, hi) for lbl, lo, hi in _ZM_MONTHS],
        "pred_month string, lo string, hi string",
    ).select(
        "pred_month",
        F.col("lo").cast("date").alias("lo"),
        F.col("hi").cast("date").alias("hi"),
    )
    tot = f.groupBy("layout").agg(F.count(F.lit(1)).alias("files_total"))
    sc = (
        f.join(
            F.broadcast(preds),
            (F.col("f_min") < F.col("hi")) & (F.col("f_max") >= F.col("lo")),
        )
        .groupBy("layout", "pred_month")
        .agg(F.count(F.lit(1)).alias("files_scanned"))
    )
    spine = tot.crossJoin(F.broadcast(preds.select("pred_month")))
    return (
        spine.join(sc, ["layout", "pred_month"], "left")
        .select(
            "layout",
            "pred_month",
            F.col("files_total").cast("bigint").alias("files_total"),
            F.coalesce(F.col("files_scanned"), F.lit(0))
            .cast("bigint")
            .alias("files_scanned"),
            F.expr(
                "(files_total - coalesce(files_scanned, 0)) * 10000"
                " div files_total"
            )
            .cast("bigint")
            .alias("skip_rate_bp"),
        )
        .orderBy("layout", "pred_month")
    )


# --------------------------------------------------------------------------
# k-anonymity / l-diversity audit over a quasi-identifier
# --------------------------------------------------------------------------
@register(
    "k_anonymity_audit",
    oracle="""
WITH q AS (
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
           right(c_name, 1) AS sens
    FROM customer
),
g AS (
    SELECT c_nationkey, c_mktsegment, bal_band,
           count(*) AS k, count(DISTINCT sens) AS l
    FROM q GROUP BY 1, 2, 3
),
b AS (
    SELECT CASE WHEN k = 1 THEN '01'
                WHEN k <= 4 THEN '02-04'
                WHEN k <= 9 THEN '05-09'
                WHEN k <= 19 THEN '10-19'
                ELSE '20+' END AS k_band,
           k, l
    FROM g
)
SELECT k_band,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(k) AS BIGINT) AS n_rows,
       CAST(min(l) AS BIGINT) AS min_l,
       CAST(sum(l) * 100 // count(*) AS BIGINT) AS avg_l_c
FROM b GROUP BY 1 ORDER BY 1
""",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit before a dataset release: group
    customers by the quasi-identifier (nation, market segment,
    $1000-balance band) and report, per group-size band, how many
    equivalence classes and rows sit at each re-identification risk
    level (k=1 rows are unique on the QI — directly linkable) plus the
    sensitive-attribute diversity l (distinct last customer-name character) with
    its minimum and an exact-integer mean in hundredths. The
    suppression decision ("generalize or drop every class with k<5")
    reads straight off the first two bands.

    Scale shape: one map-combined groupBy on the QI, then a band
    re-aggregation over the class-grain frame — the class table is the
    largest intermediate and it is <= |distinct QI| rows. floor() on
    the double balance is IEEE-identical across engines (both floor
    toward -inf; integer div is avoided because Spark's `div`
    truncates toward zero on negatives while the band must floor)."""
    q = table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        F.expr("right(c_name, 1)").alias("sens"),
    )
    g = q.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct("sens").alias("l"),
    )
    band = (
        F.when(F.col("k") == 1, "01")
        .when(F.col("k") <= 4, "02-04")
        .when(F.col("k") <= 9, "05-09")
        .when(F.col("k") <= 19, "10-19")
        .otherwise("20+")
    )
    return (
        g.select(band.alias("k_band"), "k", "l")
        .groupBy("k_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("k").cast("bigint").alias("n_rows"),
            F.min("l").cast("bigint").alias("min_l"),
            F.expr("sum(l) * 100 div count(1)")
            .cast("bigint")
            .alias("avg_l_c"),
        )
        .orderBy("k_band")
    )


# --------------------------------------------------------------------------
# Lead-lag cross-correlation between two daily series
# --------------------------------------------------------------------------
@register(
    "cross_corr_lead_lag",
    oracle="""
WITH d AS (
    SELECT o_orderdate AS dt, sum(o_totalprice) AS rev, count(*) AS cnt
    FROM orders GROUP BY 1
),
l AS (SELECT unnest(range(-7, 8)) AS lag)
SELECT CAST(l.lag AS BIGINT) AS lag,
       CAST(count(*) AS BIGINT) AS n_days,
       round(corr(a.rev, b.cnt), 4) AS corr_rev_cnt
FROM l, d a, d b
WHERE datediff('day', a.dt, b.dt) = l.lag
GROUP BY 1 ORDER BY 1
""",
)
def cross_corr_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation function between daily revenue and
    daily order count: Pearson corr(rev_t, cnt_{t+lag}) for lags -7..+7
    days — the screening pass behind "does volume lead or trail value"
    (compare acf_daily_revenue, which correlates one series with
    itself). A flat CCF here is itself the finding: TPC-H-ish order
    totals are date-independent by construction.

    Scale shape: the fact table is touched ONCE (a map-combined daily
    aggregate); the CCF runs entirely on the day-grain frame — 15 lags
    explode the ~2400-day series to ~36k rows, joined back to itself on
    a shifted date key. Correlations round to 4dp on both engines (the
    catalog's correlation convention; co-moment accumulation-order
    jitter sits at ~1e-12)."""
    d = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("dt"))
        .agg(
            F.sum("o_totalprice").alias("rev"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    a = d.select(
        "dt",
        "rev",
        F.explode(F.sequence(F.lit(-7), F.lit(7))).alias("lag"),
    ).withColumn("dt_b", F.expr("date_add(dt, lag)"))
    b = d.select(F.col("dt").alias("dt_b"), F.col("cnt").alias("cnt_b"))
    return (
        a.join(b, "dt_b")
        .groupBy(F.col("lag").cast("bigint").alias("lag"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.corr("rev", "cnt_b"), 4).alias("corr_rev_cnt"),
        )
        .orderBy("lag")
    )


# --------------------------------------------------------------------------
# Split-conformal prediction-interval coverage (exact BIGINT cents)
# --------------------------------------------------------------------------
@register(
    "conformal_coverage_by_priority",
    oracle=f"""
WITH s AS (
    SELECT o_orderpriority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
           ((o_orderkey % {_P}) * {_MULT}) % {_P} % 10 AS b,
           o_orderkey
    FROM orders
),
model AS (
    SELECT o_orderpriority, sum(price_c) // count(*) AS mean_c,
           count(*) AS n_train
    FROM s WHERE b <= 5 GROUP BY 1
),
calib AS (
    SELECT s.o_orderpriority,
           abs(price_c - mean_c) AS resid_c, o_orderkey
    FROM s JOIN model USING (o_orderpriority) WHERE b IN (6, 7)
),
ranked AS (
    SELECT o_orderpriority, resid_c,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY resid_c, o_orderkey) AS rn,
           count(*) OVER (PARTITION BY o_orderpriority) AS n_calib
    FROM calib
),
qhat AS (
    SELECT o_orderpriority, n_calib, resid_c AS qhat_c
    FROM ranked WHERE rn = (9 * (n_calib + 1) + 9) // 10
),
test AS (
    SELECT s.o_orderpriority,
           count(*) AS n_test,
           sum(CASE WHEN abs(price_c - mean_c) <= qhat_c
                    THEN 1 ELSE 0 END) AS n_covered
    FROM s
    JOIN model USING (o_orderpriority)
    JOIN qhat USING (o_orderpriority)
    WHERE b >= 8 GROUP BY 1
)
SELECT m.o_orderpriority,
       CAST(n_train AS BIGINT) AS n_train,
       CAST(n_calib AS BIGINT) AS n_calib,
       CAST(qhat_c AS BIGINT) AS qhat_cents,
       CAST(n_test AS BIGINT) AS n_test,
       CAST(n_covered AS BIGINT) AS n_covered,
       CAST(n_covered * 10000 // n_test AS BIGINT) AS coverage_bp
FROM model m JOIN qhat USING (o_orderpriority)
JOIN test USING (o_orderpriority)
ORDER BY 1
""",
)
def conformal_coverage_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split-conformal prediction intervals with a coverage audit, per
    order priority: a 60/20/20 train/calibration/test split by the
    engine-portable key hash, a "model" (the train-split mean price,
    floored to integer cents so both engines agree exactly), the
    conformal quantile q-hat = the ceil(0.9·(n_calib+1))-th smallest
    absolute calibration residual (the finite-sample-valid rank, stated
    as pure integer math (9(n+1)+9)//10), and the empirical test
    coverage of mean±q-hat in exact basis points. The distribution-free
    guarantee says coverage >= 90% in expectation — the audit a
    production ML pipeline runs on every refresh.

    Scale shape: one scan, three hash-filtered passes over it; the
    per-group model and q-hat frames are group-grain (5 rows) and
    broadcast into the residual joins by AQE. The rank statistic is a
    single per-group window over the calibration split — no global
    sort. Everything after round(price*100) is BIGINT: no float
    residual can flip the k-th order statistic across engines."""
    s = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("price_c"),
        ((F.col("o_orderkey") % _P) * _MULT % _P % 10).alias("b"),
        "o_orderkey",
    )
    model = (
        s.filter(F.col("b") <= 5)
        .groupBy("o_orderpriority")
        .agg(
            F.expr("sum(price_c) div count(1)").alias("mean_c"),
            F.count(F.lit(1)).alias("n_train"),
        )
    )
    calib = (
        s.filter(F.col("b").isin(6, 7))
        .join(F.broadcast(model), "o_orderpriority")
        .select(
            "o_orderpriority",
            F.abs(F.col("price_c") - F.col("mean_c")).alias("resid_c"),
            "o_orderkey",
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy("resid_c", "o_orderkey")
    wc = Window.partitionBy("o_orderpriority")
    qhat = (
        calib.withColumn("rn", F.row_number().over(w))
        .withColumn("n_calib", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == F.expr("(9 * (n_calib + 1) + 9) div 10"))
        .select(
            "o_orderpriority",
            "n_calib",
            F.col("resid_c").alias("qhat_c"),
        )
    )
    test = (
        s.filter(F.col("b") >= 8)
        .join(F.broadcast(model.select("o_orderpriority", "mean_c")),
              "o_orderpriority")
        .join(F.broadcast(qhat.select("o_orderpriority", "qhat_c")),
              "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("price_c") - F.col("mean_c"))
                    <= F.col("qhat_c"),
                    1,
                ).otherwise(0)
            ).alias("n_covered"),
        )
    )
    return (
        model.join(qhat, "o_orderpriority")
        .join(test, "o_orderpriority")
        .select(
            "o_orderpriority",
            F.col("n_train").cast("bigint").alias("n_train"),
            F.col("n_calib").cast("bigint").alias("n_calib"),
            F.col("qhat_c").cast("bigint").alias("qhat_cents"),
            F.col("n_test").cast("bigint").alias("n_test"),
            F.col("n_covered").cast("bigint").alias("n_covered"),
            F.expr("n_covered * 10000 div n_test")
            .cast("bigint")
            .alias("coverage_bp"),
        )
        .orderBy("o_orderpriority")
    )
