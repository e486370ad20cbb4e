"""Structured Streaming session/lifecycle operators, driven end-to-end
with Trigger.AvailableNow over the sf0.001 events parquet, checked
against their batch equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import table
from parcel_analytics_etl_notebook_spark.streaming.sessions import (
    read_events_stream,
    streaming_lifecycle_counts,
    streaming_session_stats,
)

SF = "/root/testdata/sf0.001"


def _run_to_memory(stream_df, name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_sessions_match_batch(spark):
    stream = read_events_stream(spark, SF)
    assert stream.isStreaming
    _run_to_memory(streaming_session_stats(stream, gap="30 minutes"), "sess")
    got = spark.table("sess")
    # batch equivalent: session_window works identically on static frames
    batch = (
        table(spark, SF, "events")
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert got.count() == batch.count() > 0
    assert got.agg(F.sum("n_events")).collect()[0][0] == 1000  # every event in exactly one session


def test_streaming_lifecycle_counts(spark):
    stream = read_events_stream(spark, SF)
    _run_to_memory(streaming_lifecycle_counts(stream, window="6 hours"), "lc")
    got = spark.table("lc")
    total = got.agg(
        F.sum("signups").alias("s"), F.sum("views").alias("v"), F.sum("purchases").alias("p")
    ).collect()[0]
    batch = (
        table(spark, SF, "events")
        .groupBy("event_type")
        .count()
        .collect()
    )
    by_type = {r["event_type"]: r["count"] for r in batch}
    assert total["s"] == by_type.get("signup", 0)
    assert total["v"] == by_type.get("view", 0)
    assert total["p"] == by_type.get("purchase", 0)


def test_stateful_funnel_completions(spark):
    """applyInPandasWithState funnel: every user completing the ORDERED
    signup -> view(>=signup) -> purchase(>=view) chain emits exactly one
    completion row whose timestamps equal the batch ordered pivot."""
    from parcel_analytics_etl_notebook_spark.streaming.stateful import (
        funnel_completions,
    )

    stream = read_events_stream(spark, SF)
    q = (
        funnel_completions(stream)
        .writeStream.format("memory")
        .queryName("funnel")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["user_id"]: r for r in spark.table("funnel").collect()}

    from pyspark.sql import Window

    ev = table(spark, SF, "events").filter(
        F.col("event_type").isin("signup", "view", "purchase")
    )
    wu = Window.partitionBy("user_id")
    s1 = ev.withColumn(
        "s",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(wu),
    )
    s2 = s1.withColumn(
        "v",
        F.min(
            F.when(
                (F.col("event_type") == "view") & (F.col("ts") >= F.col("s")),
                F.col("ts"),
            )
        ).over(wu),
    )
    batch = (
        s2.groupBy("user_id")
        .agg(
            F.first("s").alias("s"),
            F.first("v").alias("v"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("v")),
                    F.col("ts"),
                )
            ).alias("p"),
        )
        .filter("s IS NOT NULL AND v IS NOT NULL AND p IS NOT NULL")
        .collect()
    )
    expected = {r["user_id"]: r for r in batch}
    assert set(got) == set(expected) and len(got) > 0
    for uid, row in expected.items():
        assert got[uid]["signup_ts"] == row["s"]
        assert got[uid]["first_view_ts"] == row["v"]
        assert got[uid]["first_purchase_ts"] == row["p"]


def test_stream_static_enrich(spark):
    """Stream ⋈ static dim: every event row enriched per micro-batch;
    counts and cohort sums match the batch join."""
    from parcel_analytics_etl_notebook_spark.streaming.joins import (
        stream_static_enrich,
    )

    batch_events = table(spark, SF, "events")
    dim = (
        batch_events.select("user_id")
        .dropDuplicates()
        .withColumn("cohort", (F.col("user_id") % 4).cast("bigint"))
    )
    stream = read_events_stream(spark, SF)
    q = (
        stream_static_enrich(stream, dim)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("enriched")
    assert got.count() == batch_events.count()
    batch = batch_events.join(dim, on="user_id", how="left")
    assert (
        got.agg(F.sum("cohort")).collect()[0][0]
        == batch.agg(F.sum("cohort")).collect()[0][0]
    )


def test_stream_stream_interval_join(spark):
    """Stream-stream interval join (purchase ⋈ views ≤1h before) equals
    the batch interval join row-for-row."""
    from parcel_analytics_etl_notebook_spark.streaming.joins import (
        stream_stream_purchase_after_view,
    )

    stream = read_events_stream(spark, SF)
    q = (
        stream_stream_purchase_after_view(stream, max_gap="1 hour")
        .writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["purchase_event_id"], r["view_event_id"])
        for r in spark.table("ssj").collect()
    }

    ev = table(spark, SF, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    expected = {
        (r["purchase_event_id"], r["view_event_id"]) for r in batch.collect()
    }
    assert got == expected and len(expected) > 0


def test_streaming_dedup_and_foreach_batch_sink(spark, tmp_path):
    """Duplicate the stream (union with itself) → watermarked streaming
    dedup must restore exact-once; deliver via foreachBatch parquet."""
    from parcel_analytics_etl_notebook_spark.streaming.sessions import (
        streaming_dedup,
        write_stream_foreach_batch,
    )

    stream = read_events_stream(spark, SF)
    doubled = stream.unionByName(stream)  # every event twice
    deduped = streaming_dedup(doubled)
    out = str(tmp_path / "out")
    q = write_stream_foreach_batch(deduped, out, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    back = spark.read.parquet(out)
    n_events = table(spark, SF, "events").count()
    assert back.select("event_id").dropDuplicates().count() == n_events
    assert back.count() == n_events  # dedup removed the doubling


def test_transform_with_state_running_totals(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 API): the final emitted
    running total per user must equal the batch groupBy aggregate.

    The API's Python state server speaks protobuf; conftest vendors a
    pure-Python runtime (vendor/sitecustomize.py) when pip protobuf is
    absent. Skip only if neither is available
    (applyInPandasWithState — stateful.py — is the no-extra-deps
    fallback and is tested above).
    """
    from tests.conftest import PROTOBUF_OK

    if not PROTOBUF_OK:
        pytest.skip("no protobuf runtime available")
    from parcel_analytics_etl_notebook_spark.streaming.sessions import (
        read_events_stream,
    )
    from parcel_analytics_etl_notebook_spark.streaming.stateful_tws import (
        rocksdb_state_conf,
        running_user_totals,
    )

    rocksdb_state_conf(spark)
    stream = read_events_stream(spark, SF)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("tws_totals")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # changelog semantics: keep the last (= max n_events) row per user
    emitted = spark.table("tws_totals")
    final = (
        emitted.groupBy("user_id")
        .agg(F.max_by(F.struct("n_events", "total_value"), "n_events").alias("s"))
        .select("user_id", "s.n_events", "s.total_value")
    )
    batch = (
        table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    got = {r["user_id"]: r for r in final.collect()}
    want = {r["user_id"]: r for r in batch.collect()}
    assert set(got) == set(want) and len(got) > 0
    for uid, w in want.items():
        g = got[uid]
        assert g["n_events"] == w["n_events"]
        assert abs(g["total_value"] - (w["total_value"] or 0.0)) < 1e-6


def test_python_streaming_datasource(spark, tmp_path):
    """Python DataSource streaming reader: micro-batches advance by the
    row-id offset and the stream's cumulative content equals the batch
    source's first maxRows rows (exactly-once, replayable offsets)."""
    from parcel_analytics_etl_notebook_spark.sources.pydatasource import (
        register_synthcorpus,
    )

    register_synthcorpus(spark)
    stream = (
        spark.readStream.format("synthcorpus")
        .option("seed", 11)
        .option("batchRows", 64)
        .option("maxRows", 300)
        .load()
    )
    assert stream.isStreaming
    # availableNow admits only the batch available at start for a
    # simple stream reader; run continuous micro-batches up to the cap
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "synth_ckpt"))
        .start()
    )
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.table("synth_stream").count() >= 300:
            break
        time.sleep(1)
    q.stop()
    got = spark.table("synth_stream")
    assert got.count() == 300
    batch = (
        spark.read.format("synthcorpus")
        .option("seed", 11)
        .option("rows", 300)
        .load()
    )
    assert sorted(got.collect()) == sorted(batch.collect())


def test_tws_sessionizer_with_event_time_timers(spark, tmp_path):
    """transformWithState sessionization: sessions closed by an in-batch
    gap emit from handleInputRows; the open tail closes via an
    EVENT-TIME TIMER when a later batch advances the watermark — state
    is O(open sessions). Two availableNow runs over one checkpoint
    (incremental processing)."""
    from tests.conftest import PROTOBUF_OK

    if not PROTOBUF_OK:
        pytest.skip("no protobuf runtime available")
    import datetime as dt

    from parcel_analytics_etl_notebook_spark.streaming.stateful_tws import (
        rocksdb_state_conf,
        session_stats_tws,
    )

    rocksdb_state_conf(spark)
    src = tmp_path / "events"
    src.mkdir()
    t0 = dt.datetime(2024, 3, 1, 8, 0, 0)
    MIN = dt.timedelta(minutes=1)

    def write_batch(name, rows):
        spark.createDataFrame(
            rows, "user_id bigint, ts timestamp, value double"
        ).coalesce(1).write.mode("append").parquet(str(src / name))

    # batch 1 — user 1: two sessions split by a 90-min gap (first closes
    # in-batch); user 2: one open session
    write_batch("b1", [
        (1, t0, 1.0), (1, t0 + 5 * MIN, 2.0),           # session A (closes in-batch)
        (1, t0 + 95 * MIN, 4.0),                          # session B (stays open)
        (2, t0 + 10 * MIN, 8.0),                          # session C (stays open)
    ])

    schema = "user_id bigint, ts timestamp, value double"

    out = str(tmp_path / "sessions_out")

    def run_once(_qname):
        # file sink (not memory): it supports checkpoint RECOVERY, which
        # run 2 exercises; output accumulates across runs
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        q = (
            session_stats_tws(stream, gap="30 minutes", watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r["user_id"], r["session_start_ms"]): r
            for r in spark.read.parquet(out).collect()
        }

    ms = lambda d: int(d.timestamp() * 1000)  # noqa: E731
    got1 = run_once("tws_sess1")
    # A closes on the in-batch gap. C closes by TIMER within run 1: the
    # batch-1 watermark (max ts − 10 min = t0+85min) already passed C's
    # expiry (t0+40min), and availableNow runs the timer batch. B's
    # expiry (t0+125min) is beyond the watermark — stays open in state.
    assert set(got1) == {(1, ms(t0)), (2, ms(t0 + 10 * MIN))}
    a = got1[(1, ms(t0))]
    assert a["session_end_ms"] == ms(t0 + 5 * MIN)
    assert a["n_events"] == 2 and a["total_value"] == 3.0
    assert got1[(2, ms(t0 + 10 * MIN))]["total_value"] == 8.0

    # batch 2 — user 3 only, hours later: advances the watermark past
    # B's timer, which must fire and close it; 3's own session stays
    # open (nothing has passed ITS expiry)
    write_batch("b2", [(3, t0 + dt.timedelta(hours=6), 1.0)])
    got2 = run_once("tws_sess2")
    assert (1, ms(t0 + 95 * MIN)) in got2  # B closed by timer
    b = got2[(1, ms(t0 + 95 * MIN))]
    assert b["session_end_ms"] == ms(t0 + 95 * MIN) and b["n_events"] == 1
    assert all(uid != 3 for uid, _ in got2)  # user 3 still open


class FakeListState:
    def __init__(self):
        self.v = []

    def exists(self):
        return bool(self.v)

    def get(self):
        return iter(self.v)

    def put(self, rows):
        self.v = [tuple(r) for r in rows]

    def clear(self):
        self.v = []


class FakeTWSHandle:
    def __init__(self):
        self._s = FakeListState()
        self.timers = []

    def getListState(self, name, schema):
        return self._s

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.remove(t)

    def registerTimer(self, t):
        self.timers.append(t)


class FakeTimerValues:
    def __init__(self, wm_ms):
        self._wm = wm_ms

    def getCurrentWatermarkInMs(self):
        return self._wm


def test_tws_sessionizer_backwards_extension_unit():
    """A late in-watermark event EARLIER than a pending session must
    extend it backwards (within gap) or form its own earlier PENDING
    session (> gap before start) — and nothing may emit before the
    watermark passes last+gap, even across an in-batch gap (a later
    batch can still deliver an in-watermark event for it). Pure-python
    unit test over the processor with a fake handle."""
    import pandas as pd

    from parcel_analytics_etl_notebook_spark.streaming.stateful_tws import (
        SessionizerProcessor,
    )

    GAP = 30 * 60 * 1000
    proc = SessionizerProcessor(gap_ms=GAP)
    handle = FakeTWSHandle()
    proc.init(handle)

    def feed(ms_vals, wm=-1):
        pdf = pd.DataFrame(
            {"ts": pd.to_datetime(ms_vals, unit="ms"), "value": [1.0] * len(ms_vals)}
        )
        return list(proc.handleInputRows((7,), iter([pdf]), FakeTimerValues(wm)))

    T = 100 * GAP
    assert feed([T]) == []  # opens (T, T), pending
    assert handle._s.v == [(T, T, 1, 1.0)]

    # late event within gap BEFORE the pending session: extends backwards
    assert feed([T - GAP // 2]) == []
    assert handle._s.v == [(T - GAP // 2, T, 2, 2.0)]

    # late event > gap before the session's START: its own earlier
    # session — PENDING, not emitted (watermark hasn't passed it)
    assert feed([T - 10 * GAP]) == []
    assert handle._s.v == [
        (T - 10 * GAP, T - 10 * GAP, 1, 1.0),
        (T - GAP // 2, T, 2, 2.0),
    ]
    # one timer at the EARLIEST pending expiry
    assert handle.timers == [T - 10 * GAP + GAP]

    # watermark passes the early session only → exactly it emits
    out = list(
        proc.handleExpiredTimer((7,), FakeTimerValues(T - 8 * GAP), None)
    )
    assert len(out) == 1 and len(out[0]) == 1
    row = out[0].iloc[0]
    assert row["session_start_ms"] == T - 10 * GAP
    assert row["session_end_ms"] == T - 10 * GAP
    assert handle._s.v == [(T - GAP // 2, T, 2, 2.0)]
    assert handle.timers == [T + GAP]

    # a bridging event merges two pending sessions into one
    assert feed([T - GAP]) == []
    assert handle._s.v == [(T - GAP, T, 3, 3.0)]


def test_stream_stream_left_outer_interval_join(spark):
    """LEFT OUTER stream-stream join: matched purchases equal the batch
    inner join; purchases with no view in the window emit exactly once,
    NULL-padded (possible because availableNow's final watermark passes
    every buffered row)."""
    from parcel_analytics_etl_notebook_spark.streaming.joins import (
        stream_stream_purchase_with_optional_view,
    )

    stream = read_events_stream(spark, SF)
    q = (
        stream_stream_purchase_with_optional_view(stream, max_gap="1 hour")
        .writeStream.format("memory")
        .queryName("ssloj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("ssloj").collect()

    ev = table(spark, SF, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    )
    # OUTER subtlety: a NULL-padded row only emits once the watermark
    # proves no match can still arrive. The final watermark is
    # max(event ts) − 2h, so unmatched purchases in the stream's last
    # 2h stay buffered when availableNow ends — exclude them from the
    # expectation (matched rows all emit regardless).
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    import datetime as dt

    cutoff = max_ts - dt.timedelta(hours=2)
    expected = {
        (r["purchase_event_id"], r["view_event_id"])
        for r in batch.collect()
        if r["view_event_id"] is not None or r["purchase_ts"] < cutoff
    }
    got_pairs = {(r["purchase_event_id"], r["view_event_id"]) for r in got}
    assert got_pairs == expected
    assert any(v is None for _, v in got_pairs)  # unmatched really emit


def test_streaming_cdc_latest_matches_batch(spark, tmp_path):
    """Kappa check: the final streaming CDC snapshot (last emission per
    key, deleted keys dropped) must equal the batch cdc_latest_state
    query over the same events."""
    from tests.conftest import PROTOBUF_OK

    if not PROTOBUF_OK:
        pytest.skip("no protobuf runtime available")
    from parcel_analytics_etl_notebook_spark.plans.catalog import queries
    from parcel_analytics_etl_notebook_spark.streaming.sessions import (
        read_events_stream,
    )
    from parcel_analytics_etl_notebook_spark.streaming.stateful_tws import (
        cdc_latest_stream,
        rocksdb_state_conf,
    )

    rocksdb_state_conf(spark)
    stream = read_events_stream(spark, SF)
    q = (
        cdc_latest_stream(stream)
        .writeStream.format("memory")
        .queryName("tws_cdc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cdc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    emitted = spark.table("tws_cdc")
    final = (
        emitted.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("last_value", "last_ts_ms", "n_changes", "deleted"),
                "n_changes",
            ).alias("s")
        )
        .select("user_id", "s.last_value", "s.last_ts_ms", "s.n_changes", "s.deleted")
        .filter(~F.col("deleted"))
    )
    got = {r["user_id"]: r for r in final.collect()}
    want = {
        r["user_id"]: r
        for r in queries()["cdc_latest_state"](spark, SF).collect()
    }
    assert set(got) == set(want) and len(got) > 0
    for uid, w in want.items():
        g = got[uid]
        assert g["n_changes"] == w["n_changes"]
        assert abs(round(g["last_value"], 4) - w["last_value"]) < 1e-9
        assert g["last_ts_ms"] == int(w["last_ts"].timestamp() * 1000)


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def test_cdc_processor_preserves_null_values_unit():
    """A non-tombstone change with a NULL value must emit last_value
    None (the batch twin emits NULL) — not NaN, which float(r.value)
    would produce; and a stale in-watermark change must not regress
    the (ts, event_id) state."""
    import pandas as pd

    from parcel_analytics_etl_notebook_spark.streaming.stateful_tws import (
        CdcLatestProcessor,
    )

    proc = CdcLatestProcessor()

    class H:
        def getValueState(self, name, schema):
            return FakeValueState()

    proc.init(H())

    def feed(rows):
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime([r[0] for r in rows], unit="ms"),
                "event_id": [r[1] for r in rows],
                "event_type": [r[2] for r in rows],
                "value": [r[3] for r in rows],
            }
        )
        outs = list(proc.handleInputRows((7,), iter([pdf]), None))
        return outs[-1].iloc[0]

    out = feed([(100, 1, "click", None)])
    assert out["last_value"] is None or pd.isna(out["last_value"])
    assert not out["deleted"]

    # newer real value
    out = feed([(200, 2, "click", 5.0)])
    assert out["last_value"] == 5.0
    # stale change (older ts) must not regress the snapshot
    out = feed([(150, 3, "click", 9.0)])
    assert out["last_value"] == 5.0 and out["n_changes"] == 3


def test_session_stats_tws_gap_is_parsed():
    """The gap parameter must reach the processor (it was silently
    ignored — every caller got the 30-minute default)."""
    from parcel_analytics_etl_notebook_spark.streaming.stateful_tws import (
        _interval_ms,
    )

    assert _interval_ms("30 minutes") == 1_800_000
    assert _interval_ms("5 seconds") == 5_000
    assert _interval_ms("2 hours") == 7_200_000
    with pytest.raises(ValueError):
        _interval_ms("fortnight")


def test_python_streaming_datasink_epoch_commit(spark, tmp_path):
    """Python DataSourceStreamWriter: the jsonlsink publishes each
    micro-batch under an atomic per-epoch manifest — part files named by
    epoch, one _epoch-N marker per batch, no staged leftovers — and a
    REPLAYED epoch (crash-recovery path) is swept, not republished
    (exactly-once on top of at-least-once replay)."""
    import json as _json
    import os
    import time

    from parcel_analytics_etl_notebook_spark.sources.pydatasink import (
        JsonlStreamWriter,
        register_jsonlsink,
    )
    from parcel_analytics_etl_notebook_spark.sources.pydatasource import (
        register_synthcorpus,
    )

    register_synthcorpus(spark)
    register_jsonlsink(spark)
    out = str(tmp_path / "stream_sink")
    q = (
        spark.readStream.format("synthcorpus")
        .option("seed", 3)
        .option("batchRows", 70)
        .option("maxRows", 200)
        .load()
        .writeStream.format("jsonlsink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "sink_ckpt"))
        .start()
    )
    deadline = time.time() + 120
    total = 0
    while time.time() < deadline:
        parts = [f for f in os.listdir(out) if f.startswith("part-")] if os.path.isdir(out) else []
        total = sum(1 for p in parts for _ in open(os.path.join(out, p)))
        if total >= 200:
            break
        time.sleep(1)
    q.stop()

    names = sorted(os.listdir(out))
    manifests = [n for n in names if n.startswith("_epoch-") and not n.endswith(".tmp")]
    parts = [n for n in names if n.startswith("part-")]
    assert total == 200
    assert len(manifests) >= 3  # 200 rows at 70/batch → ≥3 epochs
    assert not [n for n in names if n.startswith(".staged-")]
    # manifest contents name exactly the published epoch files
    listed = []
    for m in manifests:
        listed += _json.load(open(os.path.join(out, m)))["files"]
    assert sorted(listed) == parts
    # stream content == batch source content (exactly-once, no dup/loss)
    got = spark.read.json(out).select("doc_id", "text", "lang", "source", "n_chars")
    batch = (
        spark.read.format("synthcorpus")
        .option("seed", 3).option("rows", 200).load()
    )
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in batch.collect()
    )

    # replay path, unit-level: re-committing an epoch whose manifest
    # exists sweeps the staged duplicate instead of publishing it
    w = JsonlStreamWriter(out)
    epoch = int(manifests[0].split("-")[1])
    dup = os.path.join(out, ".staged-replayed.jsonl")
    with open(dup, "w") as f:
        f.write('{"doc_id": 0}\n')

    class _Msg:
        name = ".staged-replayed.jsonl"

    before = sorted(os.listdir(out))
    w.commit([_Msg()], epoch)
    assert sorted(os.listdir(out)) == [n for n in before if n != ".staged-replayed.jsonl"]


def test_streaming_sink_restart_recovery(spark, tmp_path):
    """Crash-recovery end-to-end: stop the stream mid-flight, restart
    from the same checkpoint, and the sink must land EXACTLY the source
    rows — the replayed boundary epoch is deduplicated by its manifest,
    so no row is lost or doubled across the restart."""
    import os
    import time

    from parcel_analytics_etl_notebook_spark.sources.pydatasink import (
        register_jsonlsink,
    )
    from parcel_analytics_etl_notebook_spark.sources.pydatasource import (
        register_synthcorpus,
    )

    register_synthcorpus(spark)
    register_jsonlsink(spark)
    out = str(tmp_path / "restart_sink")
    cp = str(tmp_path / "restart_ckpt")

    def start():
        return (
            spark.readStream.format("synthcorpus")
            .option("seed", 9)
            .option("batchRows", 40)
            .option("maxRows", 200)
            .load()
            .writeStream.format("jsonlsink")
            .option("path", out)
            .option("checkpointLocation", cp)
            .start()
        )

    def published() -> int:
        if not os.path.isdir(out):
            return 0
        return sum(
            1
            for p in os.listdir(out)
            if p.startswith("part-")
            for _ in open(os.path.join(out, p))
        )

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline and published() < 80:
        time.sleep(0.5)
    q.stop()  # "crash" mid-stream
    mid = published()
    assert 0 < mid < 200

    q2 = start()
    deadline = time.time() + 120
    while time.time() < deadline and published() < 200:
        time.sleep(0.5)
    q2.stop()

    got = spark.read.json(out)
    assert got.count() == 200
    assert got.select("doc_id").distinct().count() == 200  # no dup rows
    batch = (
        spark.read.format("synthcorpus")
        .option("seed", 9).option("rows", 200).load()
    )
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    assert sorted(tuple(r) for r in got.select(*cols).collect()) == sorted(
        tuple(r) for r in batch.collect()
    )


def test_streaming_content_dedup(spark, tmp_path):
    """Streaming content-hash dedup: byte-copies of a document arriving
    across micro-batches (fresh ids, later timestamps, within the
    watermark) collapse to ONE emitted row per distinct text; distinct
    texts all pass. File-source micro-batches make the cross-batch
    arrival order deterministic."""
    import json as _json
    import os
    import time

    from parcel_analytics_etl_notebook_spark.streaming.sessions import (
        streaming_content_dedup,
    )

    src = str(tmp_path / "docs_in")
    os.makedirs(src)

    def land(batch_id, rows):
        with open(os.path.join(src, f"b{batch_id}.jsonl"), "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    # batch 0: two distinct docs; batch 1: a byte-copy of doc A (new
    # id, later ts) plus one genuinely new doc
    land(0, [
        {"doc_id": 1, "text": "alpha beta gamma", "ts": "2024-01-01 10:00:00"},
        {"doc_id": 2, "text": "delta epsilon zeta", "ts": "2024-01-01 10:00:05"},
    ])
    stream = (
        spark.readStream.schema("doc_id bigint, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        streaming_content_dedup(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("content_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cd_ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table("content_dedup").count() < 2:
            time.sleep(0.5)
        land(1, [
            {"doc_id": 9, "text": "alpha beta gamma", "ts": "2024-01-01 10:00:30"},
            {"doc_id": 4, "text": "eta theta iota", "ts": "2024-01-01 10:00:35"},
        ])
        deadline = time.time() + 60
        while time.time() < deadline and spark.table("content_dedup").count() < 3:
            time.sleep(0.5)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("content_dedup").collect()
    # the byte-copy (doc_id 9) was dropped; the three distinct texts
    # survive exactly once, first-arrival wins
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 4]
    assert len({r["text"] for r in rows}) == 3


def test_streaming_heavy_hitters_matches_batch(spark, tmp_path):
    """Sharded streaming Misra-Gries: with k at least the per-shard
    distinct-key count nothing is ever evicted, so the final per-shard
    summary must equal the exact batch counts — and sharding must
    route every occurrence of a key to exactly one shard. (Eviction
    arithmetic is covered by test_mg_absorb_bound_property; this
    checks the streaming state fold + changelog semantics.)"""
    from tests.conftest import PROTOBUF_OK

    if not PROTOBUF_OK:
        pytest.skip("no protobuf runtime available")
    from parcel_analytics_etl_notebook_spark.streaming.sessions import (
        read_events_stream,
    )
    from parcel_analytics_etl_notebook_spark.streaming.stateful_tws import (
        rocksdb_state_conf,
        streaming_heavy_hitters,
    )

    rocksdb_state_conf(spark)
    stream = read_events_stream(spark, SF)
    q = (
        streaming_heavy_hitters(stream, "event_type", k=64, shards=4)
        .writeStream.format("memory")
        .queryName("tws_hh")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # changelog: latest emission per shard = rows carrying that shard's
    # max n_shard (summary rows are shards·k — driver-sized)
    rows = spark.table("tws_hh").collect()
    latest = {}
    for r in rows:
        latest[r["shard"]] = max(latest.get(r["shard"], 0), r["n_shard"])
    got = {
        (r["shard"], r["key"]): r["cnt_lower"]
        for r in rows
        if r["n_shard"] == latest[r["shard"]]
    }
    batch = (
        table(spark, SF, "events")
        .select(
            F.pmod(
                F.xxhash64(F.col("event_type").cast("string")), F.lit(4)
            ).alias("shard"),
            F.col("event_type").cast("string").alias("key"),
        )
        .groupBy("shard", "key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    want = {(r["shard"], r["key"]): r["cnt"] for r in batch}
    assert len(want) > 1 and got == want
