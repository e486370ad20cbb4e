"""Per-key sequential (order-dependent) state over batch data.

Some per-key computations have NO windowed closed form because each
step depends nonlinearly on the previous one — the canonical example
is a clamped running sum (a balance floored at zero: ledgers,
inventory with no backorders, token buckets). The distributed shape
is: shuffle once on the key, then run the sequential loop per key
inside an Arrow grouped-map (`applyInPandas`) — each GROUP must fit
in one executor, which is exactly the contract per-key state has in
any engine (compare applyInPandasWithState, this operator's streaming
twin in streaming/). The catalog query `clamped_running_balance`
oracle-checks the loop against a DuckDB recursive CTE stating the
same recurrence.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

#: output of :func:`clamped_balance_per_key`
CLAMPED_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("floor_hits", LongType()),
        StructField("cap_hits", LongType()),
        StructField("final_balance_c", LongType()),
    ]
)

#: bucket capacity, integer cents ($5000 burst)
BALANCE_CAP_C = 500_000


def clamped_balance_per_key(events: DataFrame) -> DataFrame:
    """Two-sided clamped running balance per user over (ts, event_id)
    order: bal_i = min(CAP, max(0, bal_{i-1} + delta_i)), deltas in
    exact BIGINT cents — the token-bucket-with-capacity recurrence
    (rate limiters, inventory with a storage cap, prepaid balances).
    Returns (user_id, n_events, floor_hits, cap_hits, final_balance_c)
    where the *_hits columns count the steps each clamp fired.

    Why imperative: the ONE-sided floor has a windowed closed form
    (bal_i = S_i − min(0, min_{j≤i} S_j), prefix sum minus running
    prefix-min — two windows), but the TWO-sided clamp does not: each
    saturation erases history in a direction-dependent way, so no
    prefix identity exists and per-key sequential state is genuinely
    required. That makes this the honest Pandas-UDF case the engine's
    UDF policy reserves: one hash shuffle on user_id, then an O(group)
    Python loop per key over Arrow-delivered batches. Deltas are
    integer cents BEFORE the loop so no float accumulation can
    diverge from the oracle's recursive CTE."""
    base = events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__us"),
        "event_id",
        F.expr("CAST(round(coalesce(value, 0) * 100) AS BIGINT)").alias(
            "delta_c"
        ),
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__us", "event_id"])
        bal = 0
        floor_hits = 0
        cap_hits = 0
        for d in pdf["delta_c"].astype("int64"):
            s = bal + int(d)
            if s < 0:
                floor_hits += 1
                bal = 0
            elif s > BALANCE_CAP_C:
                cap_hits += 1
                bal = BALANCE_CAP_C
            else:
                bal = s
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "floor_hits": [floor_hits],
                "cap_hits": [cap_hits],
                "final_balance_c": [bal],
            }
        )

    return base.groupBy("user_id").applyInPandas(run, CLAMPED_SCHEMA)
