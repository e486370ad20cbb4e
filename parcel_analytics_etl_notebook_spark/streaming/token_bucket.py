"""Streaming twin of the batch token-bucket walk
(operators/sequential.clamped_balance_per_key): per-user clamped
running balance as an ``applyInPandasWithState`` state machine.

State per user is four integers (balance, floor hits, cap hits, event
count) — O(1) per key, the smallest state a stateful operator can
carry. Each micro-batch's events are walked in (ts, event_id) order;
deltas arrive as integer cents computed in the streaming projection
with the SAME expression as the batch twin, so no rounding mode can
diverge between the two.

Order caveat, stated: the clamp is order-DEPENDENT, so unlike the
funnel state machine (stateful.py, whose min-anchors are
order-insensitive), cross-batch reordering changes results. The
streaming form is exact when micro-batch boundaries respect event-time
order per key (the tests drive it that way with one file per trigger);
a production deployment gets that from an event-time-ordered source
per key (e.g. Kafka key partitioning) or buffers with
transformWithState event-time timers before applying the walk.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
from pyspark.sql.types import LongType, StructField, StructType

from parcel_analytics_etl_notebook_spark.operators.sequential import (
    BALANCE_CAP_C,
)

#: one row per user per micro-batch that touched them (running totals)
BUCKET_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("floor_hits", LongType()),
        StructField("cap_hits", LongType()),
        StructField("final_balance_c", LongType()),
    ]
)

#: state: (balance_c, floor_hits, cap_hits, n_events)
STATE_SCHEMA = StructType(
    [
        StructField("bal", LongType()),
        StructField("fhits", LongType()),
        StructField("chits", LongType()),
        StructField("n", LongType()),
    ]
)


def _bucket_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    bal, fhits, chits, n = state.get if state.exists else (0, 0, 0, 0)
    rows = []
    for pdf in pdfs:
        rows.extend(
            zip(pdf["__us"].astype("int64"),
                pdf["event_id"].astype("int64"),
                pdf["delta_c"].astype("int64"))
        )
    rows.sort()
    for _, _, d in rows:
        s = bal + int(d)
        if s < 0:
            fhits += 1
            bal = 0
        elif s > BALANCE_CAP_C:
            chits += 1
            bal = BALANCE_CAP_C
        else:
            bal = s
    n += len(rows)
    state.update((bal, fhits, chits, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "floor_hits": [fhits],
            "cap_hits": [chits],
            "final_balance_c": [bal],
        }
    )


#: buffered (not yet walkable) event: below-watermark events walk
_BUFFER_SCHEMA = StructType(
    [
        StructField("us", LongType()),
        StructField("event_id", LongType()),
        StructField("delta_c", LongType()),
    ]
)

#: walked running state
_WALKED_SCHEMA = StructType(
    [
        StructField("bal", LongType()),
        StructField("fhits", LongType()),
        StructField("chits", LongType()),
        StructField("n", LongType()),
    ]
)


class OrderedTokenBucketProcessor(StatefulProcessor):
    """Event-time-ORDERED token bucket via transformWithStateInPandas —
    the production answer to :func:`token_bucket_updates`'s order
    caveat. Events buffer per key until the event-time watermark passes
    them; only then do they walk, in (ts, event_id) order. Cross-batch
    disorder WITHIN the watermark horizon is therefore handled exactly
    (the test feeds a user's later events in an earlier micro-batch and
    still matches the batch twin); events later than the watermark are
    dropped by Spark's late filter, the same contract every
    event-time operator has.

    State per key: the pending buffer (O(events inside the watermark
    horizon) — bounded by the horizon, not history) + four walked
    integers. A timer at (earliest pending event time + 1ms) re-flushes
    when the watermark advances without new input for the key. Walk is
    strictly-below-watermark: Spark's late filter only drops
    eventTime < watermark, so an event exactly AT the watermark is
    still deliverable and must stay pending."""

    def init(self, handle) -> None:
        self._buf = handle.getListState("pending_events", _BUFFER_SCHEMA)
        self._walked = handle.getValueState("walked", _WALKED_SCHEMA)
        self._handle = handle

    @staticmethod
    def _wm_us(timerValues) -> int:
        try:
            wm = timerValues.getCurrentWatermarkInMs()
            return int(wm) * 1000 if wm is not None else -1
        except Exception:
            return -1

    def _flush(self, key, pending, wm_us):
        pending.sort()
        ready = [p for p in pending if p[0] < wm_us]
        kept = [p for p in pending if p[0] >= wm_us]
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._buf.clear()
        if kept:
            self._buf.put(kept)
            self._handle.registerTimer(min(p[0] for p in kept) // 1000 + 1)
        if not ready:
            return
        bal, fhits, chits, n = (
            self._walked.get() if self._walked.exists() else (0, 0, 0, 0)
        )
        for _, _, d in ready:
            s = bal + int(d)
            if s < 0:
                fhits += 1
                bal = 0
            elif s > BALANCE_CAP_C:
                chits += 1
                bal = BALANCE_CAP_C
            else:
                bal = s
        n += len(ready)
        self._walked.update((bal, fhits, chits, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "floor_hits": [fhits],
                "cap_hits": [chits],
                "final_balance_c": [bal],
            }
        )

    def handleInputRows(self, key, rows, timerValues):
        pending = []
        for pdf in rows:
            us = (
                pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
                // 1000
            ).tolist()
            pending.extend(
                zip(us, pdf["event_id"].astype("int64").tolist(),
                    pdf["delta_c"].astype("int64").tolist())
            )
        if self._buf.exists():
            pending.extend(tuple(p) for p in self._buf.get())
        if not pending:
            return
        yield from self._flush(key, pending, self._wm_us(timerValues))

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if not self._buf.exists():
            return
        pending = [tuple(p) for p in self._buf.get()]
        yield from self._flush(key, pending, self._wm_us(timerValues))

    def close(self) -> None:
        pass


def token_bucket_ordered(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Watermark-ordered token bucket (transformWithStateInPandas,
    EventTime mode — requires the RocksDB state store,
    stateful_tws.rocksdb_state_conf). Emits running totals whenever a
    key's walk advances; identical column names and clamp semantics to
    the batch twin."""
    base = events.withWatermark("ts", watermark).select(
        "user_id",
        "ts",
        "event_id",
        F.expr("CAST(round(coalesce(value, 0) * 100) AS BIGINT)").alias(
            "delta_c"
        ),
    )
    return base.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=OrderedTokenBucketProcessor(),
        outputStructType=BUCKET_SCHEMA,
        outputMode="append",
        timeMode="EventTime",
    )


def token_bucket_updates(events: DataFrame) -> DataFrame:
    """ARRIVAL-ORDER token bucket: walks events in (event-time,
    event_id) order only WITHIN each micro-batch — cross-batch disorder
    silently produces wrong clamp counts, so for event-time data whose
    arrival order is not guaranteed use :func:`token_bucket_ordered`
    (the watermark-buffered twin) instead; this variant is for
    pre-ordered feeds where its lower latency is safe (ADVICE r08 —
    this caveat is the contract, hence line one).

    Per-user running totals, one row per user per micro-batch that saw
    them (output mode: update). Column names and clamp semantics match
    operators/sequential.clamped_balance_per_key exactly — the tests
    assert row-for-row agreement when batch boundaries respect
    event-time order, and demonstrate the wrong-counts failure mode
    when they don't."""
    base = events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__us"),
        "event_id",
        F.expr("CAST(round(coalesce(value, 0) * 100) AS BIGINT)").alias(
            "delta_c"
        ),
    )
    return base.groupBy("user_id").applyInPandasWithState(
        _bucket_update,
        outputStructType=BUCKET_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
