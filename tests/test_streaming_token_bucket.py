"""Streaming token bucket vs its batch twin: single-batch equality over
the driver events table, and a controlled two-micro-batch run whose
batch boundaries respect event-time order (the operator's stated
exactness condition)."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.operators.sequential import (
    clamped_balance_per_key,
)
from parcel_analytics_etl_notebook_spark.plans.catalog import table
from parcel_analytics_etl_notebook_spark.streaming.sessions import (
    read_events_stream,
)
from parcel_analytics_etl_notebook_spark.streaming.token_bucket import (
    token_bucket_updates,
)

SF = "/root/testdata/sf0.001"


def _final_rows(spark, name: str):
    """Last emitted (max n_events) row per user from the memory sink."""
    pdf = spark.table(name).toPandas()
    last = pdf.sort_values("n_events").groupby("user_id").tail(1)
    return {
        int(r.user_id): (
            int(r.n_events),
            int(r.floor_hits),
            int(r.cap_hits),
            int(r.final_balance_c),
        )
        for r in last.itertuples()
    }


def _batch_rows(df):
    return {
        r["user_id"]: (
            r["n_events"], r["floor_hits"], r["cap_hits"],
            r["final_balance_c"],
        )
        for r in df.collect()
    }


def test_streaming_bucket_matches_batch_single_batch(spark):
    stream = read_events_stream(spark, SF)
    q = (
        token_bucket_updates(stream)
        .writeStream.format("memory")
        .queryName("tbuck1")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = _final_rows(spark, "tbuck1")
    want = _batch_rows(clamped_balance_per_key(table(spark, SF, "events")))
    assert got == want and len(want) > 0


def test_streaming_bucket_two_ordered_micro_batches(spark, tmp_path):
    """Two files, one per trigger, split at an event-time boundary —
    the running state carries across micro-batches and the final rows
    equal the batch walk over the union."""
    rows_a = [(0, 1, 1, 30.0), (1, 1, 2, -50.0), (4, 2, 5, 10.0)]
    rows_b = [(2, 1, 3, 6000.0), (3, 1, 4, -1.0), (5, 2, 6, 5.0)]
    d = tmp_path / "ev"
    os.makedirs(d)
    for i, rows in enumerate((rows_a, rows_b)):
        tbl = pa.table(
            {
                "event_id": pa.array([e for e, _, _, _ in rows], pa.int64()),
                "ts": pa.array(
                    [t * 1_000_000 for _, _, t, _ in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([u for _, u, _, _ in rows], pa.int64()),
                "value": pa.array([v for _, _, _, v in rows], pa.float64()),
            }
        )
        p = str(d / f"part-{i:03d}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (time.time() + i, time.time() + i))  # mtime order
    schema = "event_id long, ts timestamp, user_id long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        token_bucket_updates(stream)
        .writeStream.format("memory")
        .queryName("tbuck2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _final_rows(spark, "tbuck2")
    want = _batch_rows(
        clamped_balance_per_key(spark.read.schema(schema).parquet(str(d)))
    )
    assert got == want
    # the walk genuinely crossed batches: user 1 hit floor in batch 1
    # and cap in batch 2
    assert got[1][1] == 1 and got[1][2] == 1
    # and the sink saw user 1 in both micro-batches (update mode emits
    # a running row per touched batch)
    n_rows_user1 = (
        spark.table("tbuck2").filter(F.col("user_id") == 1).count()
    )
    assert n_rows_user1 == 2
