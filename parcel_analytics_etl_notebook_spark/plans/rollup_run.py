"""Disk-backed incremental rollup maintenance (executable runner).

`plans/queries_relational2.incremental_hourly_rollup` proves the
MERGE-of-partials algebra in one plan; this module is the operational
form a 100 TB deployment actually runs on a schedule: a micro-batch of
new raw events arrives, and the hourly rollup SINK on disk is brought
up to date by

1. partial-aggregating ONLY the batch (never re-reading raw history),
2. reading back ONLY the sink date-partitions the batch's days touch
   (partition pruning on the `event_date` directory key — the read is
   O(touched days), not O(rollup)),
3. merging partials (count/sum are commutative monoids, so
   batch-partial + sink-partial re-aggregates exactly),
4. rewriting ONLY the touched date partitions with dynamic partition
   overwrite (`sources/writers.overwrite_partitions`) — untouched
   partitions keep their files byte-for-byte.

The sink stores UNROUNDED double sums: rounding is applied only in the
read view (`read_rollup`), because merging already-rounded partials
drifts (documented in the in-plan twin). Re-running the same batch is
NOT idempotent by design (counts are additive); idempotent re-land of
a failed batch is done at the DAY grain by rebuilding the day from raw
and calling `overwrite_partitions` directly — the same primitive.

Reference anchor: the reference pipeline recomputes every output table
from raw on each run (`/root/reference/etl/main.py:296-301`); this
runner is the incremental replacement for its hourly/daily KPI
refresh at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.sources.writers import (
    overwrite_partitions,
)

_KEYS = ["event_date", "event_hour", "event_type"]


def _partial(batch: DataFrame) -> DataFrame:
    """Mergeable partial aggregate of a raw-event micro-batch, keyed by
    (date, hour, type). `event_date` doubles as the sink's partition
    directory key, derived from the hour bucket so the two can never
    disagree."""
    hour = F.date_trunc("hour", F.col("ts"))
    return (
        batch.select(
            hour.alias("event_hour"),
            F.to_date(hour).alias("event_date"),
            "event_type",
            "value",
        )
        .groupBy(*_KEYS)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )


def run_incremental_rollup(
    spark: SparkSession, batch: DataFrame, sink_path: str
) -> dict:
    """Merge one micro-batch of raw events into the rollup sink.

    Returns {"touched_days": [...], "rows_written": int}. The sink read
    is pruned to the touched days (`event_date IN (...)` hits the
    partition directories, verified by test_rollup_run's pruning
    assertion), and the write replaces only those directories.
    """
    partial = _partial(batch).persist()
    days = [r[0] for r in partial.select("event_date").distinct().collect()]
    if not days:
        return {"touched_days": [], "rows_written": 0}
    if os.path.isdir(sink_path):
        existing = spark.read.parquet(sink_path).filter(
            F.col("event_date").isin(days)
        )
        merged = (
            partial.unionByName(existing)
            .groupBy(*_KEYS)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )
    else:
        merged = partial
    # day-grain rewrite: a touched day's partition is small (one day of
    # rollup rows), so no target_files control needed; sibling days'
    # files are untouched by dynamic overwrite
    overwrite_partitions(merged, sink_path, partition_by=["event_date"])
    n = spark.read.parquet(sink_path).filter(F.col("event_date").isin(days)).count()
    partial.unpersist()
    return {"touched_days": sorted(str(d) for d in days), "rows_written": n}


def read_rollup(spark: SparkSession, sink_path: str) -> DataFrame:
    """Presentation view of the sink: rounding applied HERE, never to
    the stored mergeable sums."""
    return spark.read.parquet(sink_path).select(
        "event_hour",
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(F.col("sum_value"), 2).alias("total_value"),
    )


def streaming_incremental_rollup(
    stream: DataFrame, sink_path: str, checkpoint: str
):
    """Streaming twin of :func:`run_incremental_rollup`: every
    micro-batch lands through the SAME partition-pruned merge, so the
    continuously-maintained sink equals the batch recompute after any
    prefix of the stream (test_rollup_run proves it for a 2-batch
    split).

    foreachBatch is the right sink here — the merge needs a read of the
    sink's touched partitions, which a built-in streaming sink can't
    express. Exactly-once caveat (same as every foreachBatch merge that
    is not idempotent): a batch replayed after a crash between the
    write and the checkpoint commit would double-count; production
    hardens this by recording the landed batch_id IN the sink (skip if
    seen) — the pattern sources/pydatasink.JsonlStreamWriter implements
    for its epoch manifests.

    Returns the started StreamingQuery (caller awaits termination).
    """

    def land(batch_df: DataFrame, batch_id: int) -> None:
        run_incremental_rollup(batch_df.sparkSession, batch_df, sink_path)

    return (
        stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
