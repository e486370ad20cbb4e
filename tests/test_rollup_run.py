"""Disk-backed incremental rollup runner (plans/rollup_run): sequential
micro-batches must converge to the full recompute, touch only the date
partitions their events fall in, and leave sibling partitions'
files byte-for-byte untouched."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import table
from parcel_analytics_etl_notebook_spark.plans.rollup_run import (
    read_rollup,
    run_incremental_rollup,
)

SF = "/root/testdata/sf0.001"


def _file_state(sink: str) -> dict:
    out = {}
    for root, _dirs, files in os.walk(sink):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
    return out


def _full_recompute(events):
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("event_hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def test_incremental_rollup_converges_and_prunes(spark, tmp_path):
    events = table(spark, SF, "events")
    all_days = sorted(
        r[0] for r in events.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    assert len(all_days) >= 3, "need >=3 event days for a meaningful split"
    mid_day = all_days[len(all_days) // 2]
    early = events.filter(F.to_date("ts") < F.lit(mid_day))
    late = events.filter(F.to_date("ts") >= F.lit(mid_day))
    # carve ONE early-day straggler out of batch 1 and land it with
    # batch 2: batch 2 then touches (late days + that one early day),
    # and every other early day's files must survive batch 2 untouched
    straggler_day = early.select(F.to_date("ts").alias("d")).agg(
        F.min("d")
    ).head()[0]
    b1 = early.filter(
        ~(
            (F.to_date("ts") == F.lit(straggler_day))
            & (F.col("event_id") % 2 == 0)
        )
    )
    b2_extra = early.filter(
        (F.to_date("ts") == F.lit(straggler_day)) & (F.col("event_id") % 2 == 0)
    )
    b2 = late.unionByName(b2_extra)
    assert b2_extra.count() > 0, "straggler slice empty — test is vacuous"

    sink = str(tmp_path / "rollup_sink")
    r1 = run_incremental_rollup(spark, b1, sink)
    assert r1["rows_written"] > 0
    state_after_b1 = _file_state(sink)

    r2 = run_incremental_rollup(spark, b2, sink)
    touched = set(r2["touched_days"])
    assert str(straggler_day) in touched

    # convergence: sink == full recompute over all events
    got = sorted(
        tuple(r)
        for r in read_rollup(spark, sink).collect()
    )
    want = sorted(tuple(r) for r in _full_recompute(events).collect())
    assert got == want

    # partition preservation: every early-day file NOT in a touched
    # partition is still the same file (size + mtime) after batch 2
    state_after_b2 = _file_state(sink)
    untouched_before = {
        p: s
        for p, s in state_after_b1.items()
        if not any(f"event_date={d}" in p for d in touched)
    }
    assert untouched_before, "no untouched partitions — test is vacuous"
    for p, s in untouched_before.items():
        assert state_after_b2.get(p) == s, f"untouched partition rewritten: {p}"

    # and the touched early day WAS rewritten
    straggler_files_before = {
        p for p in state_after_b1 if f"event_date={straggler_day}" in p
    }
    straggler_files_after = {
        p for p in state_after_b2 if f"event_date={straggler_day}" in p
    }
    assert straggler_files_before
    assert not (
        straggler_files_before
        & {
            p
            for p in straggler_files_after
            if state_after_b2[p] == state_after_b1.get(p)
        }
    ), "straggler-day partition should have been rewritten"


def test_incremental_rollup_empty_batch_is_noop(spark, tmp_path):
    events = table(spark, SF, "events")
    sink = str(tmp_path / "rollup_sink")
    run_incremental_rollup(spark, events, sink)
    before = _file_state(sink)
    r = run_incremental_rollup(spark, events.limit(0), sink)
    assert r == {"touched_days": [], "rows_written": 0}
    assert _file_state(sink) == before


def test_streaming_rollup_matches_batch_recompute(spark, tmp_path):
    """Two-file staged stream, maxFilesPerTrigger=1 → two foreachBatch
    merges; the continuously-maintained sink must equal the one-shot
    batch recompute over all events."""
    from parcel_analytics_etl_notebook_spark.plans.rollup_run import (
        streaming_incremental_rollup,
    )

    events = table(spark, SF, "events")
    days = sorted(
        r[0] for r in events.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    mid = days[len(days) // 2]
    src = str(tmp_path / "stream_src")
    events.filter(F.to_date("ts") < F.lit(mid)).coalesce(1).write.parquet(
        src + "/f1"
    )
    events.filter(F.to_date("ts") >= F.lit(mid)).coalesce(1).write.parquet(
        src + "/f2"
    )
    # flatten the two part files into one source dir
    import glob
    import shutil

    os.makedirs(src + "/all")
    for i, f in enumerate(sorted(glob.glob(src + "/f*/part-*.parquet"))):
        shutil.copy(f, f"{src}/all/{i}.parquet")

    schema = spark.read.parquet(src + "/all").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/all")
    )
    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    sink = str(tmp_path / "stream_sink")
    q = streaming_incremental_rollup(
        stream, sink, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = sorted(tuple(r) for r in read_rollup(spark, sink).collect())
    base = events
    if dict(base.dtypes).get("ts") == "timestamp_ntz":
        base = base.withColumn("ts", F.col("ts").cast("timestamp"))
    want = sorted(tuple(r) for r in _full_recompute(base).collect())
    assert got == want
