"""Custom stateful streaming operator via ``applyInPandasWithState`` —
for semantics session_window can't express. Here: a per-user lifecycle
state machine that emits a row the moment a user completes the
signup→view→purchase funnel (the streaming form of the reference's
per-shipment lifecycle pivot, but incremental and emit-on-complete
instead of recompute-per-batch).

State per user: earliest signup/view/purchase timestamps seen so far.
A group emits exactly one completion row (then clears its state), so
state size is O(active incomplete users) — bounded further in
production with ``GroupStateTimeout.ProcessingTimeTimeout``.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

#: emitted when a user's funnel completes
FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("signup_ts", TimestampType()),
        StructField("first_view_ts", TimestampType()),
        StructField("first_purchase_ts", TimestampType()),
        StructField("n_events_seen", LongType()),
    ]
)

#: state tuple: (signup_epoch_us, view_epoch_us, purchase_epoch_us, n_seen, done)
STATE_SCHEMA = StructType(
    [
        StructField("signup_us", LongType()),
        StructField("view_us", LongType()),
        StructField("purchase_us", LongType()),
        StructField("n_seen", LongType()),
        StructField("done", LongType()),
    ]
)

_US = 1_000_000


def _funnel_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    signup, view, purchase, n_seen, done = (
        state.get if state.exists else (None, None, None, 0, 0)
    )
    # ORDERED funnel (matches the batch twin queries_relational7.
    # session_conversion_funnel): view counts only at-or-after the
    # earliest signup, purchase only at-or-after that view. Events are
    # processed in ts order within the batch; a later batch's earlier
    # signup lowers the anchor but already-accepted steps stay valid
    # (they are >= the old anchor > the new one).
    rows = []
    for pdf in pdfs:
        n_seen += len(pdf)
        rows.extend(zip(pdf["ts"], pdf["event_type"]))
    rows.sort(key=lambda r: r[0].value)
    for ts, et in rows:
        us = int(ts.value // 1000)  # pandas ns → µs
        if et == "signup" and (signup is None or us < signup):
            signup = us
        elif et == "view" and signup is not None and us >= signup and (
            view is None or us < view
        ):
            view = us
        elif et == "purchase" and view is not None and us >= view and (
            purchase is None or us < purchase
        ):
            purchase = us
    complete = (
        signup is not None and view is not None and purchase is not None
    )
    if complete:
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "signup_ts": [pd.Timestamp(signup * 1000)],
                "first_view_ts": [pd.Timestamp(view * 1000)],
                "first_purchase_ts": [pd.Timestamp(purchase * 1000)],
                "n_events_seen": [n_seen],
            }
        )
        # clear immediately: live state stays O(active incomplete
        # users), never O(all users ever completed). The trade: events
        # arriving AFTER completion re-open an empty funnel, and a user
        # could re-emit if all three ordered steps recur — downstream
        # sinks dedup on user_id (or add EventTimeTimeout eviction when
        # a late-data horizon exists)
        state.remove()
    else:
        state.update((signup, view, purchase, n_seen, done))


def funnel_completions(events: DataFrame) -> DataFrame:
    """Emit one row per user at the micro-batch where their ORDERED
    signup → view → purchase funnel first completes (view at-or-after
    the earliest signup, purchase at-or-after that view — the batch
    twin's step rule). State is removed once a user completes, keeping
    live state O(active incomplete users)."""
    filtered = events.filter(
        events.event_type.isin("signup", "view", "purchase")
    ).select("user_id", "ts", "event_type")
    return filtered.groupBy("user_id").applyInPandasWithState(
        _funnel_update,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
