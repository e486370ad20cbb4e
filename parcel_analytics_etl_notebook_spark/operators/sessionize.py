"""Gap-based sessionization (batch form).

The reference's data shape — a timestamped event log sessionized into
per-entity lifecycles — is exactly this operator (SURVEY §2.9 notes the
reference does it as a batch pivot; Structured Streaming's
``session_window`` is the streaming twin in streaming/sessions.py).

Batch algorithm: lag the previous timestamp per key, mark gap >
threshold as a session boundary, running-sum the markers into a session
index. One shuffle (the per-key window sort); the aggregation reuses
the same partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int = 1800,
    session_col: str = "session_idx",
) -> DataFrame:
    """Attach a 0-based per-key session index; a new session starts when
    the gap since the previous event exceeds ``gap_seconds``."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col))
    prev_ts = F.lag(ts_col).over(w)
    is_new = (
        prev_ts.isNull()
        | (F.unix_timestamp(ts_col) - F.unix_timestamp(prev_ts) > gap_seconds)
    ).cast("bigint")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, (F.sum(is_new).over(w_cum) - 1))


def session_stats(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session rollup: start/end, event count, duration seconds."""
    s = sessionize(df, key, ts_col, gap_seconds)
    return s.groupBy(key, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("duration_seconds"),
    )
