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


def _write_event_file(path, rows, mtime_bump):
    tbl = pa.table(
        {
            "event_id": pa.array([e for e, _, _, _ in rows], pa.int64()),
            "ts": pa.array(
                [t for _, _, t, _ in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([u for _, u, _, _ in rows], pa.int64()),
            "value": pa.array([v for _, _, _, v in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, str(path))
    os.utime(path, (time.time() + mtime_bump, time.time() + mtime_bump))


def test_ordered_bucket_fixes_cross_batch_disorder(spark, tmp_path):
    """User 1's LATER events arrive in the EARLIER micro-batch. The
    watermark-ordered transformWithState bucket still matches the batch
    walk exactly; the plain applyInPandasWithState twin — which walks
    in arrival order — provably does not (its stated caveat, made
    visible). A far-future sentinel event advances the global watermark
    past all real data so every buffered event becomes walkable."""
    from tests.conftest import PROTOBUF_OK

    if not PROTOBUF_OK:
        import pytest

        pytest.skip("protobuf runtime unavailable for transformWithState")
    from parcel_analytics_etl_notebook_spark.streaming.stateful_tws import (
        rocksdb_state_conf,
    )
    from parcel_analytics_etl_notebook_spark.streaming.token_bucket import (
        token_bucket_ordered,
    )

    us = 1_000_000
    # true event-time order for user 1: +30, -50 (floor), +6000 (cap), -1
    late_file = [(2, 1, 3 * us, 6000.0), (3, 1, 4 * us, -1.0)]
    early_file = [(0, 1, 1 * us, 30.0), (1, 1, 2 * us, -50.0)]
    sentinel = [(9, 999, 10**9 * us, 1.0)]  # pushes the watermark
    d = tmp_path / "ev"
    os.makedirs(d)
    _write_event_file(d / "part-000.parquet", late_file, 0)
    _write_event_file(d / "part-001.parquet", early_file, 1)
    _write_event_file(d / "part-002.parquet", sentinel, 2)
    schema = "event_id long, ts timestamp, user_id long, value double"

    rocksdb_state_conf(spark)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        token_bucket_ordered(stream, watermark="10 seconds")
        .writeStream.format("memory")
        .queryName("tbuck3")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = _final_rows(spark, "tbuck3")
    want = _batch_rows(
        clamped_balance_per_key(
            spark.read.schema(schema).parquet(str(d))
        ).filter("user_id = 1")
    )
    assert got[1] == want[1]  # ordered stream == batch, despite disorder
    assert got[1][1] == 1 and got[1][2] == 1  # floor AND cap each fired

    # contrast: the arrival-order twin walks +6000,-1,+30,-50 -> cap
    # twice, floor never — the caveat the ordered variant exists to fix
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q2 = (
        token_bucket_updates(stream2)
        .writeStream.format("memory")
        .queryName("tbuck4")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt4"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got_unordered = _final_rows(spark, "tbuck4")
    assert got_unordered[1] != want[1]
    assert got_unordered[1][1] == 0 and got_unordered[1][2] == 2
