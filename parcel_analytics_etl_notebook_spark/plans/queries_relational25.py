"""Round-8 relational additions, batch 6: streaming-ops and
lakehouse-maintenance measurements.

Three operational queries: (1) the late-arrival lateness histogram —
how far behind the per-key event-time high-mark do events arrive,
which IS the distribution a streaming watermark delay is chosen from;
(2) the session-timeout sensitivity sweep — session counts at four
candidate timeouts from ONE lag pass (the tuning curve behind
user_sessions_30min's 30-minute constant); (3) small-file compaction
planning — greedy cumulative binning of a file manifest into
equal-row OPTIMIZE tasks, the maintenance job every
Delta/Iceberg-style table needs.

Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table
from parcel_analytics_etl_notebook_spark.plans.queries_relational21 import (
    _log2_bucket,
    _log2_bucket_sql,
)

#: session-timeout sweep points, minutes
_TIMEOUTS_MIN = (5, 15, 30, 60)

#: compaction: one manifest file per 8 order-date days, 16 target tasks
_CP_DAYS_PER_FILE = 8
_CP_N_TASKS = 16


# --------------------------------------------------------------------------
# Late-arrival lateness histogram (keyed watermark high-mark)
# --------------------------------------------------------------------------
@register(
    "late_arrival_lateness_histogram",
    oracle=f"""
WITH e AS (
    SELECT user_id, event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us
    FROM events
),
l AS (
    SELECT us,
           max(us) OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS high_mark
    FROM e
),
b AS (
    SELECT CASE WHEN high_mark IS NULL OR high_mark <= us THEN -1
                ELSE {_log2_bucket_sql('((high_mark - us) // 1000000)')}
           END AS log2_bucket
    FROM l
)
SELECT CAST(log2_bucket AS BIGINT) AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_events
FROM b GROUP BY 1 ORDER BY 1
""",
)
def late_arrival_lateness_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How late do events arrive? Arrival order is the ingest id
    (event_id), event time is ts; an event is LATE when its event time
    sits below the high-water mark of everything that already arrived
    for its key. Lateness = high_mark − ts, bucketed on the exact
    integer log2-seconds scale (bucket −1 = on-time or first arrival).
    This histogram IS the watermark decision: a streaming
    `withWatermark(delay)` drops exactly the events in buckets above
    log2(delay), so the tail mass here prices any candidate delay —
    the batch-side measurement behind the engine's streaming
    extensions (streaming/, late-data handling).

    Scale shape: one running-max window per user partition (the same
    single shuffle as sessionization; a keyed high-mark, like
    per-partition watermarks on a real cluster) and a map-combined
    ~28-bucket aggregate."""
    e = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    l_ = e.select(
        us.alias("us"), F.max(us).over(w).alias("high_mark")
    )
    bucket = F.when(
        F.col("high_mark").isNull() | (F.col("high_mark") <= F.col("us")),
        F.lit(-1),
    ).otherwise(_log2_bucket(F.expr("(high_mark - us) div 1000000")))
    return (
        l_.select(bucket.cast("bigint").alias("log2_bucket"))
        .groupBy("log2_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .orderBy("log2_bucket")
    )


# --------------------------------------------------------------------------
# Session-timeout sensitivity sweep (one lag pass)
# --------------------------------------------------------------------------
@register(
    "session_timeout_sweep",
    oracle=f"""
WITH e AS (
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
),
g AS (
    SELECT user_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
    FROM e
),
a AS (
    SELECT count(*) AS total_events,
           count(DISTINCT user_id) AS n_users,
           {", ".join(
               f"sum(CASE WHEN gap_us > {m * 60_000_000} THEN 1 ELSE 0 END)"
               f" AS s{m}" for m in _TIMEOUTS_MIN
           )}
    FROM g
)
{" UNION ALL ".join(
    f"SELECT CAST({m} AS BIGINT) AS timeout_minutes,"
    f" CAST(n_users + s{m} AS BIGINT) AS n_sessions,"
    f" CAST(total_events * 100 // (n_users + s{m}) AS BIGINT)"
    f" AS avg_events_per_session_c FROM a" for m in _TIMEOUTS_MIN
)}
ORDER BY timeout_minutes
""",
)
def session_timeout_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-count sensitivity to the inactivity timeout: sessions
    at 5/15/30/60-minute cuts, each = n_users + (gaps longer than the
    cut), all four from ONE lag pass with conditional aggregates —
    never four sessionization reruns (the sweep discipline of
    near_dup_threshold_sweep / ivf_nprobe_recall_curve applied to
    sessionization). A flat region in this curve is where the timeout
    choice is robust; user_sessions_30min's constant sits (or doesn't)
    in that valley, and interarrival_log2_histogram shows the same
    distribution at full resolution.

    Scale shape: one lag window per user partition, one 1-row
    conditional aggregate, unpivoted to 4 rows by a stack projection —
    the sweep costs the same as a single sessionization. Average
    events per session in exact integer hundredths."""
    e = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    )
    a = g.agg(
        F.count(F.lit(1)).alias("total_events"),
        F.countDistinct("user_id").alias("n_users"),
        *[
            F.sum(
                F.when(F.col("gap_us") > m * 60_000_000, 1).otherwise(0)
            ).alias(f"s{m}")
            for m in _TIMEOUTS_MIN
        ],
    )
    stack = (
        f"stack({len(_TIMEOUTS_MIN)}, "
        + ", ".join(
            f"CAST({m} AS BIGINT), n_users + s{m}" for m in _TIMEOUTS_MIN
        )
        + ") AS (timeout_minutes, n_sessions)"
    )
    return (
        a.selectExpr("total_events", stack)
        .select(
            "timeout_minutes",
            F.col("n_sessions").cast("bigint").alias("n_sessions"),
            F.expr("total_events * 100 div n_sessions")
            .cast("bigint")
            .alias("avg_events_per_session_c"),
        )
        .orderBy("timeout_minutes")
    )


# --------------------------------------------------------------------------
# Small-file compaction planning (greedy cumulative binning)
# --------------------------------------------------------------------------
@register(
    "compaction_task_plan",
    oracle=f"""
WITH f AS (
    SELECT datediff('day', DATE '1992-01-01', o_orderdate)
               // {_CP_DAYS_PER_FILE} AS file_id,
           count(*) AS n_rows
    FROM orders GROUP BY 1
),
t AS (
    SELECT file_id, n_rows,
           sum(n_rows) OVER (ORDER BY file_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum,
           sum(n_rows) OVER () AS total
    FROM f
),
a AS (
    SELECT file_id, n_rows,
           (cum - n_rows) // greatest(total // {_CP_N_TASKS}, 1) AS task_id
    FROM t
)
SELECT CAST(task_id AS BIGINT) AS task_id,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n_rows) AS BIGINT) AS task_rows,
       CAST(min(file_id) AS BIGINT) AS first_file_id,
       CAST(max(file_id) AS BIGINT) AS last_file_id
FROM a GROUP BY 1 ORDER BY 1
""",
)
def compaction_task_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (the OPTIMIZE job every
    Delta/Iceberg-style table needs): bin the file manifest — here the
    date-clustered synthetic layout of zone_map_skip_rates at 8-day
    grain — into ~16 equal-row rewrite tasks by greedy cumulative
    binning: task = floor(rows_before_this_file / target_task_rows).
    Adjacent files land in the same task, so each rewritten file keeps
    the date-clustering the layout had (compaction must not undo the
    zone-map win). Output is the task plan a maintenance scheduler
    would execute: files, rows, and the file-id span per task.

    Scale shape: the manifest aggregate is one map-combined groupBy
    (one row per FILE, never per data row); the cumulative sum runs on
    that manifest-sized frame — a partition-less window over ~hundreds
    of rows is driver-trivial, exactly like the real systems, whose
    planners do this on the manifest, not the data."""
    f = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.expr(
                f"datediff(o_orderdate, date'1992-01-01')"
                f" div {_CP_DAYS_PER_FILE}"
            ).alias("file_id")
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    wcum = Window.orderBy("file_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy()
    a = f.select(
        "file_id",
        "n_rows",
        (F.sum("n_rows").over(wcum) - F.col("n_rows")).alias("before"),
        F.sum("n_rows").over(wtot).alias("total"),
    ).select(
        "file_id",
        "n_rows",
        F.expr(
            f"before div greatest(total div {_CP_N_TASKS}, 1)"
        ).alias("task_id"),
    )
    return (
        a.groupBy("task_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("n_rows").cast("bigint").alias("task_rows"),
            F.min("file_id").cast("bigint").alias("first_file_id"),
            F.max("file_id").cast("bigint").alias("last_file_id"),
        )
        .select(
            F.col("task_id").cast("bigint").alias("task_id"),
            "n_files",
            "task_rows",
            "first_file_id",
            "last_file_id",
        )
        .orderBy("task_id")
    )
