"""Round-8 relational additions, batch 2: log2-bucketed inter-arrival
histogram, per-group exact mode, and rank-based top-k WITH TIES.

Three small named operators the catalog lacked: (1) the inter-arrival
distribution (the queueing/health metric behind session timeout and
watermark choices) bucketed on an exact integer log2 scale; (2) MODE
with a deterministic tiebreak — the categorical central-tendency
aggregate Spark has no built-in for; (3) SQL:2008 FETCH FIRST k ROWS
WITH TIES semantics via rank(), which row_number-based top-k silently
breaks (it drops tied boundary rows arbitrarily).

Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table

#: log2 bucket bound: gaps in this dataset span < 2^25 seconds (~1 yr)
_LOG2_MAX = 26


def _log2_bucket_sql(col: str) -> str:
    """CASE chain: bucket k ⇔ 2^k <= col+1 < 2^(k+1) — exact integer
    comparisons (identical on both engines; floor(log2(x)) in floats
    flips at power-of-two boundaries)."""
    whens = " ".join(
        f"WHEN {col} + 1 < {1 << (k + 1)} THEN {k}"
        for k in range(_LOG2_MAX)
    )
    return f"CASE {whens} ELSE {_LOG2_MAX} END"


def _log2_bucket(col):
    out = F.lit(_LOG2_MAX)
    for k in reversed(range(_LOG2_MAX)):
        out = F.when(col + 1 < (1 << (k + 1)), F.lit(k)).otherwise(out)
    return out


# --------------------------------------------------------------------------
# Inter-arrival time histogram (log2 buckets) per event type
# --------------------------------------------------------------------------
@register(
    "interarrival_log2_histogram",
    oracle=f"""
WITH e AS (
    SELECT event_type, user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
    FROM events
),
g AS (
    SELECT event_type,
           epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap_us
    FROM e
),
b AS (
    SELECT event_type, {_log2_bucket_sql('(gap_us // 1000000)')} AS log2_bucket
    FROM g WHERE gap_us IS NOT NULL
)
SELECT event_type, CAST(log2_bucket AS BIGINT) AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM b GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def interarrival_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type: the gap between
    consecutive same-type events of each user, bucketed as
    floor(log2(gap_seconds + 1)) — computed with exact integer
    comparisons (a CASE over power-of-two bounds), never float log2,
    which flips at the exact boundaries. This is the distribution that
    justifies session timeout and streaming-watermark choices
    (user_sessions_30min's 30-minute cut lives in this histogram's
    gap valley).

    Scale shape: one lag window per (user, type) partition — the same
    single shuffle as sessionization — then a map-combined groupBy
    over ~type×26 buckets."""
    e = table(spark, sf_dir, "events")
    _us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_us = _us - F.lag(_us).over(w)
    g = e.select("event_type", gap_us.alias("gap_us")).filter(
        F.col("gap_us").isNotNull()
    )
    bucket = _log2_bucket(F.expr("gap_us div 1000000"))
    return (
        g.select("event_type", bucket.cast("bigint").alias("log2_bucket"))
        .groupBy("event_type", "log2_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_gaps"))
        .orderBy("event_type", "log2_bucket")
    )


# --------------------------------------------------------------------------
# Exact mode per group (deterministic tiebreak)
# --------------------------------------------------------------------------
@register(
    "modal_event_type_per_user",
    oracle="""
WITH c AS (
    SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
    FROM c
)
SELECT user_id, event_type AS modal_type, CAST(n AS BIGINT) AS n_events
FROM r WHERE rn = 1 ORDER BY user_id
""",
)
def modal_event_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MODE per group: each user's most frequent event type, ties
    broken lexicographically (the deterministic convention every
    engine-portable mode needs — Spark's `mode()` aggregate documents
    its tie choice as non-deterministic, so the engine states the
    tiebreak explicitly via count + rank instead). Two map-combined
    aggregations and one group-sized window — the standard two-phase
    shape that scales to any cardinality because no per-group state
    exceeds the (group, value) count table."""
    c = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), "event_type"
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("modal_type"),
            F.col("n").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Top-k WITH TIES (rank-based, SQL:2008 FETCH FIRST ... WITH TIES)
# --------------------------------------------------------------------------
@register(
    "top_suppliers_with_ties",
    oracle="""
WITH r AS (
    SELECT s_nationkey, s_suppkey, s_acctbal,
           rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rnk
    FROM supplier
)
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, s_suppkey,
       round(s_acctbal, 2) AS acctbal, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3
ORDER BY s_nationkey, rnk, s_suppkey
""",
)
def top_suppliers_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-3 suppliers by account balance WITH TIES
    (SQL:2008 FETCH FIRST 3 ROWS WITH TIES): rank() keeps every
    supplier tied at the boundary, so the result SET is deterministic
    even though the data has no unique tiebreak — exactly the case
    where the catalog's usual row_number top-k (top_orders_per_
    customer) would silently drop an arbitrary tied row. Same
    single-shuffle group-window shape; the output size is data-
    dependent (>= 3 per group), which is the semantic the operator
    name promises."""
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc())
    return (
        table(spark, sf_dir, "supplier")
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("s_nationkey").cast("bigint").alias("s_nationkey"),
            "s_suppkey",
            F.round("s_acctbal", 2).alias("acctbal"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("s_nationkey", "rnk", "s_suppkey")
    )
