"""Round-8 relational additions, batch 4: shuffle-skew salting audit.

The catalog states many skew COUNTERMEASURES (hot-bucket caps, AQE
notes, broadcast hints); this query states the DIAGNOSIS: how uneven
is the shuffle-partition load for a key, and how much does salting
flatten it — measured, engine-portably, as a query.

Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table

_P = 1_000_000_007
_MULT = 1_000_003
#: shuffle-partition count the audit models
_N_BUCKETS = 32
#: salt fan-out
_N_SALT = 8

_SQL_BUCKET_UNSALTED = f"((user_id % {_P}) * {_MULT}) % {_P} % {_N_BUCKETS}"
_SQL_BUCKET_SALTED = (
    f"((((user_id % {_P}) * {_MULT}) % {_P} + event_id % {_N_SALT})"
    f" * {_MULT}) % {_P} % {_N_BUCKETS}"
)


@register(
    "salting_balance_audit",
    oracle=f"""
WITH b AS (
    SELECT 'unsalted' AS stage, {_SQL_BUCKET_UNSALTED} AS bucket
    FROM events
    UNION ALL
    SELECT 'salted_x{_N_SALT}' AS stage, {_SQL_BUCKET_SALTED} AS bucket
    FROM events
),
per AS (
    SELECT stage, bucket, count(*) AS n FROM b GROUP BY 1, 2
)
SELECT stage,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(n) AS BIGINT) AS total_rows,
       CAST(max(n) AS BIGINT) AS max_bucket_rows,
       CAST(max(n) * 10000 // sum(n) AS BIGINT) AS max_share_bp
FROM per GROUP BY stage ORDER BY stage
""",
)
def salting_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnosis and the salting fix, measured: hash every
    event's user_id into 32 model shuffle partitions (the
    engine-portable reduce-mod-p-first polynomial hash), then again
    with an 8-way salt mixed in BEFORE the final rehash — the
    standard skew mitigation for a hot join/agg key, where the salted
    side replicates its build rows per salt and the probe side fans
    out. Reported per stage: buckets touched, total rows, the hottest
    bucket's row count, and its load share in exact basis points
    (perfectly even = 312 bp). The delta between the
    two max_share_bp values is the straggler time a salted repartition
    buys back — the number that justifies the extra shuffle volume.

    Scale shape: two projections of one scan, each a map-combined
    two-level aggregate (bucket grain = 32 rows, stage grain
    = 2 rows); nothing data-sized shuffles beyond the counts
    themselves. The audit is what a pipeline runs BEFORE choosing a
    salting factor; the production fix itself is a repartition
    expression, not a query."""
    e = table(spark, sf_dir, "events")
    b = e.selectExpr(
        "'unsalted' AS stage", f"{_SQL_BUCKET_UNSALTED} AS bucket"
    ).unionByName(
        e.selectExpr(
            f"'salted_x{_N_SALT}' AS stage",
            f"{_SQL_BUCKET_SALTED} AS bucket",
        )
    )
    per = b.groupBy("stage", "bucket").agg(F.count(F.lit(1)).alias("n"))
    return (
        per.groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum("n").cast("bigint").alias("total_rows"),
            F.max("n").cast("bigint").alias("max_bucket_rows"),
            F.expr("max(n) * 10000 div sum(n)")
            .cast("bigint")
            .alias("max_share_bp"),
        )
        .orderBy("stage")
    )
