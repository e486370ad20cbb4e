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


def token_bucket_updates(events: DataFrame) -> DataFrame:
    """Per-user running token-bucket totals, one row per user per
    micro-batch that saw them (output mode: update). Column names and
    clamp semantics match operators/sequential.clamped_balance_per_key
    exactly — the tests assert row-for-row agreement when batch
    boundaries respect event-time order."""
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
