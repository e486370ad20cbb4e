"""Arbitrary stateful streaming via ``transformWithStateInPandas`` —
Spark 4's successor to ``applyInPandasWithState`` (see stateful.py for
the classic-API funnel). The new API gives named, typed state variables
(value/list/map) managed by the RocksDB state store, per-key timers,
and schema evolution of state — the production substrate for the
incrementally-maintained per-entity aggregates a 100 TB event pipeline
needs (the reference recomputes its per-shipment lifecycle pivot from
scratch each run; this maintains the running answer with O(1) state
per key).

Operator here: a running per-user spend tracker. State is one
(n_events, total_value) tuple per user; each micro-batch folds its
rows into the state and emits the updated running totals for exactly
the users it touched — a changelog of the aggregate, not a recompute.

Scale: state lives in RocksDB on each executor (spill-to-disk, not
heap-bound), keyed by the shuffle partitioning on user_id; emitted
rows are O(touched keys per batch). Requires
``spark.sql.streaming.stateStore.providerClass`` =
``RocksDBStateStoreProvider`` (set by :func:`rocksdb_state_conf`) and
the ``protobuf`` Python package at runtime (the per-executor state
server protocol); environments without it should use the
``applyInPandasWithState`` twin in stateful.py, which has identical
semantics for this operator and no extra dependencies.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_VENDOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "vendor",
)


def ensure_protobuf_runtime() -> bool:
    """Make ``google.protobuf`` importable in the driver AND future
    Python workers; return True when the transformWithState protocol can
    run.

    With a pip-installed ``protobuf`` this is a TRUE no-op — the import
    probe runs FIRST and the function touches neither PYTHONPATH nor
    sys.path (mutating them unconditionally would shadow real modules
    with the vendored shim for every later worker). Only on ImportError
    does it apply ``vendor/sitecustomize.py``'s shim (pure-Python
    runtime from the local Google Cloud SDK, version gate relaxed) to
    this process and prepend ``vendor/`` to ``PYTHONPATH`` so worker
    interpreters self-apply it via ``site`` at startup. Must be called
    BEFORE the SparkSession / JVM launches for workers to inherit the
    env.
    """
    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        if _VENDOR_DIR not in os.environ.get("PYTHONPATH", "").split(
            os.pathsep
        ):
            os.environ["PYTHONPATH"] = (
                _VENDOR_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")
            ).rstrip(os.pathsep)
        sys.path.insert(0, _VENDOR_DIR)
        import importlib

        try:
            importlib.import_module("sitecustomize")
            import google.protobuf.descriptor  # noqa: F401
        except ImportError:
            return False
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401
    except Exception:
        return False
    return True


def rocksdb_state_conf(spark: SparkSession) -> None:
    """transformWithState requires the RocksDB state store provider."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


class RunningTotalsProcessor(StatefulProcessor):
    """Fold each user's micro-batch rows into running (count, sum)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        n = 0
        total = 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        if self._totals.exists():
            prev_n, prev_total = self._totals.get()
            n += prev_n
            total += prev_total
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


class SessionizerProcessor(StatefulProcessor):
    """Gap-based sessionization with EVENT-TIME TIMERS — the stateful
    pattern ``session_window`` can't express when you need custom
    per-session state or output (here: value totals emitted exactly
    once per closed session).

    Per key, state is the LIST of pending sessions (start, last, count,
    sum). Each batch MERGES its events with the pending sessions as
    sorted intervals — so a late (in-watermark) event earlier than a
    pending session extends it backwards, bridges two pending sessions
    into one, or forms its own earlier session. A session is EMITTED
    only once the event-time watermark passes ``last + gap`` (checked
    on input and again when the timer at the earliest pending expiry
    fires) — an in-batch gap alone is NOT enough to close a session,
    because a later batch may still deliver an in-watermark event that
    belongs to it (the property test drives exactly that interleaving).
    State is O(pending sessions), never O(history). This is the
    streaming twin of operators/sessionize.session_stats.
    """

    def __init__(self, gap_ms: int = 30 * 60 * 1000) -> None:
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._pending = handle.getListState(
            "pending_sessions", _SESSION_STATE_SCHEMA
        )
        self._handle = handle

    def _out(self, key, sessions) -> Iterator[pd.DataFrame]:
        if sessions:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(sessions),
                    "session_start_ms": [s[0] for s in sessions],
                    "session_end_ms": [s[1] for s in sessions],
                    "n_events": [s[2] for s in sessions],
                    "total_value": [s[3] for s in sessions],
                }
            )

    @staticmethod
    def _watermark_ms(timerValues: Any) -> int:
        try:
            wm = timerValues.getCurrentWatermarkInMs()
            return int(wm) if wm is not None else -1
        except Exception:
            return -1

    def _flush(self, key, pending, wm_ms: int) -> Iterator[pd.DataFrame]:
        """Emit every pending session the watermark has passed; store
        the rest with a timer at the earliest remaining expiry.

        STRICT close (`last + gap < wm`): Spark's late filter drops
        only eventTime < watermark, so an event AT the watermark is
        still deliverable — and at ts == last + gap the batch twin's
        merge rule (`t - last > gap` starts a new session, equality
        merges) folds it into this session. Closing at equality would
        emit the session one event early and split it."""
        closed = [s for s in pending if s[1] + self._gap_ms < wm_ms]
        kept = [s for s in pending if s[1] + self._gap_ms >= wm_ms]
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._pending.clear()
        if kept:
            self._pending.put(kept)
            self._handle.registerTimer(
                min(s[1] for s in kept) + self._gap_ms
            )
        yield from self._out(key, closed)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        events: list[tuple[int, float]] = []
        for pdf in rows:
            # tz-aware or naive datetime64 both normalize to UTC ns here
            ts_ms = (
                pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
                // 1_000_000
            ).tolist()
            vals = pdf["value"].fillna(0.0).tolist()
            events.extend(zip(ts_ms, vals))
        intervals: list[tuple[int, int, int, float]] = [
            (t, t, 1, v) for t, v in events
        ]
        if self._pending.exists():
            intervals.extend(tuple(s) for s in self._pending.get())
        if not intervals:
            return
        # interval merge: pending sessions enter as atomic [start, last]
        # blocks alongside single-event intervals, all sorted by start —
        # late events extend/bridge/precede pending sessions exactly as
        # the batch twin would over the union of all events seen
        intervals.sort(key=lambda iv: (iv[0], iv[1]))
        merged: list[tuple[int, int, int, float]] = [intervals[0]]
        for s, e, n, v in intervals[1:]:
            ps, pe, pn, pv = merged[-1]
            if s - pe <= self._gap_ms:
                merged[-1] = (ps, max(pe, e), pn + n, pv + v)
            else:
                merged.append((s, e, n, v))
        yield from self._flush(key, merged, self._watermark_ms(timerValues))

    def handleExpiredTimer(
        self, key: Any, timerValues: Any, expiredTimerInfo: Any
    ) -> Iterator[pd.DataFrame]:
        if not self._pending.exists():
            return
        pending = [tuple(s) for s in self._pending.get()]
        yield from self._flush(key, pending, self._watermark_ms(timerValues))

    def close(self) -> None:
        pass


_INTERVAL_UNITS_MS = {
    "millisecond": 1, "milliseconds": 1,
    "second": 1000, "seconds": 1000,
    "minute": 60_000, "minutes": 60_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "day": 86_400_000, "days": 86_400_000,
}


def _interval_ms(spec: str) -> int:
    """Parse 'N unit' interval strings ('30 minutes') to milliseconds."""
    parts = spec.strip().split()
    if len(parts) != 2 or parts[1].lower() not in _INTERVAL_UNITS_MS:
        raise ValueError(f"unsupported interval spec: {spec!r}")
    return int(float(parts[0]) * _INTERVAL_UNITS_MS[parts[1].lower()])


def session_stats_tws(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Timer-closed per-user sessions via transformWithStateInPandas
    (timeMode EventTime — requires a watermark on ``ts`` and the
    RocksDB state store, :func:`rocksdb_state_conf`). ``gap`` accepts
    the same "N units" strings as the watermark and is parsed into the
    processor's gap_ms (it was silently ignored before — every caller
    got 30 minutes)."""
    gap_ms = _interval_ms(gap)
    return (
        events_stream.withWatermark("ts", watermark)
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionizerProcessor(gap_ms=gap_ms),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="EventTime",
        )
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Changelog stream of per-user running (n_events, total_value).

    Each emitted row is the post-batch running total for a user the
    batch touched; downstream consumers upsert by user_id (SCD1 shape,
    plans/star.scd1_upsert) or just keep the latest row per key.
    """
    return events_stream.select("user_id", "value").groupBy(
        "user_id"
    ).transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )


CDC_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("last_value", DoubleType()),
        StructField("last_ts_ms", LongType()),
        StructField("n_changes", LongType()),
        StructField("deleted", BooleanType()),
    ]
)

_CDC_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_ns", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_value", DoubleType()),
        StructField("n_changes", LongType()),
        StructField("deleted", BooleanType()),
    ]
)


class CdcLatestProcessor(StatefulProcessor):
    """Streaming twin of the batch ``cdc_latest_state`` query:
    last-writer-wins per key with tombstones ('error' rows), maintained
    incrementally. State is ONE row per key — (latest ts, event_id,
    value, change count, deleted flag) — so snapshot maintenance is
    O(keys) state and O(touched keys) output per micro-batch, never a
    history replay (the batch query's window over all changes). The
    (ts, event_id) comparison runs at FULL nanosecond precision (a
    millisecond truncation would let a stale event_id win between two
    sub-ms-apart changes, diverging from the batch tiebreak); only the
    emitted last_ts_ms column is truncated for display. A
    late-but-in-watermark change older than the current state is
    ignored rather than regressing the snapshot."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState("cdc", _CDC_STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        if self._st.exists():
            ts, eid, val, n, deleted = self._st.get()
        else:
            ts, eid, val, n, deleted = -1, -1, None, 0, False
        for pdf in rows:
            n += len(pdf)
            for r in pdf.itertuples(index=False):
                r_ts = int(r.ts.value)  # full ns — see docstring
                r_eid = int(r.event_id)
                if (r_ts, r_eid) > (ts, eid):
                    ts, eid = r_ts, r_eid
                    deleted = r.event_type == "error"
                    # preserve NULL values (batch twin emits NULL, not
                    # NaN — float(None)/float(nan) would diverge)
                    val = (
                        None
                        if deleted or pd.isna(r.value)
                        else float(r.value)
                    )
        self._st.update((ts, eid, val, n, deleted))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "last_value": [val],
                "last_ts_ms": [ts // 1_000_000 if ts >= 0 else ts],
                "n_changes": [n],
                "deleted": [deleted],
            }
        )

    def close(self) -> None:
        pass


def cdc_latest_stream(events_stream: DataFrame) -> DataFrame:
    """Changelog stream of per-key current state (CDC snapshot
    maintenance). Downstream sinks upsert by user_id and drop rows with
    ``deleted`` — together with the batch twin this is the
    Kappa-architecture pair: same semantics, incremental state."""
    return (
        events_stream.select("user_id", "ts", "event_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=CdcLatestProcessor(),
            outputStructType=CDC_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="None",
        )
    )


# --------------------------------------------------------------------------
# Streaming heavy hitters: sharded Misra-Gries over an unbounded stream
# --------------------------------------------------------------------------

HH_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("key", StringType()),
        StructField("cnt_lower", LongType()),
        StructField("n_shard", LongType()),
    ]
)

# MG summary serialized as JSON (key -> residual count): state schemas
# carry scalars; the summary is bounded at k entries so the string is
# model-sized by construction.
_HH_STATE_SCHEMA = StructType(
    [
        StructField("summary_json", StringType()),
        StructField("n_seen", LongType()),
    ]
)


class HeavyHittersProcessor(StatefulProcessor):
    """Per-shard Misra-Gries summary, folded across micro-batches.

    The streaming twin of ``operators/heavyhitters.py``: each shard
    (hash bucket of the key space) keeps one k-counter MG summary in
    state and, after absorbing a batch, emits its current summary as a
    changelog (one row per surviving key; downstream keeps the rows of
    the latest emission per shard, recognizable by the monotone
    ``n_shard``). Because a key's occurrences all hash to ONE shard,
    the batch-side guarantee carries over unchanged: a key with true
    count > n_shard/(k+1) is always present in its shard's summary,
    and ``cnt_lower`` undercounts by at most n_shard/(k+1).
    """

    def __init__(self, k: int = 50) -> None:
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState("mg", _HH_STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        import json

        from parcel_analytics_etl_notebook_spark.operators.heavyhitters import (
            _mg_absorb,
        )

        counters: dict = {}
        n = 0
        if self._st.exists():
            summary_json, n = self._st.get()
            counters = json.loads(summary_json)
            n = int(n)
        for pdf in rows:
            vc = pdf["key"].dropna().value_counts()
            n += int(vc.sum())
            counters = _mg_absorb(counters, vc.to_dict(), self._k)
        self._st.update((json.dumps(counters, sort_keys=True), n))
        ks = sorted(counters)
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(ks),
                "key": ks,
                "cnt_lower": [int(counters[x]) for x in ks],
                "n_shard": [n] * len(ks),
            }
        )

    def close(self) -> None:
        pass


def streaming_heavy_hitters(
    stream: DataFrame, key_col: str, k: int = 50, shards: int = 8
) -> DataFrame:
    """Changelog stream of per-shard MG heavy-hitter summaries.

    Sharding is ``pmod(xxhash64(key), shards)`` — the state for one
    shard is a single k-entry summary, so total state is shards·k
    entries regardless of stream length or key cardinality (contrast a
    streaming groupBy-count, whose state grows with distinct keys).
    Downstream, merge the latest per-shard summaries (same
    ``_mg_absorb`` rule) for global candidates, then verify exactly
    against any batch snapshot — the streaming half of the two-pass
    exact heavy-hitter design."""
    src = stream.select(
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(shards)).alias(
            "shard"
        ),
        F.col(key_col).cast("string").alias("key"),
    )
    return src.groupBy("shard").transformWithStateInPandas(
        statefulProcessor=HeavyHittersProcessor(k),
        outputStructType=HH_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )
