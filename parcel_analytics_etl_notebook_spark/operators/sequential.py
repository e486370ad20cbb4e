"""Per-key sequential (order-dependent) state over batch data.

Some per-key computations have NO windowed closed form because each
step depends nonlinearly on the previous one — the canonical example
is a clamped running sum (a balance floored at zero: ledgers,
inventory with no backorders, token buckets). The distributed shape
is: shuffle once on the key, then run the sequential recurrence per
key — since r12 as a JVM higher-order ``aggregate`` fold over the
key's ``sort_array(collect_list(...))`` (no Python boundary; the
pre-r12 Arrow grouped-map paid one Python call + Arrow batch per
group, a measured ~5s fixed floor at the bench SF). Each KEY's events
must fit in one executor, which is exactly the contract per-key state
has in any engine (compare applyInPandasWithState, this operator's
streaming twin in streaming/). The catalog query
`clamped_running_balance` oracle-checks the fold against a DuckDB
recursive CTE stating the same recurrence.
"""

from __future__ import annotations

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
    required.

    r12 opt — the sequential loop moved from an Arrow grouped-map into
    a JVM higher-order ``aggregate`` fold: the old ``applyInPandas``
    shape paid one Python call + one Arrow batch + one pandas
    ``sort_values`` PER GROUP (1,500 groups of ~67 rows at the bench
    SF — pure per-group overhead, the ~5s "fixed Arrow floor" the r10
    adjudication measured), where the same recurrence over a
    ``sort_array(collect_list(...))`` per key is one hash aggregate
    plus an exact-BIGINT fold with NO Python boundary (plan diff:
    FlatMapGroupsInPandas/ArrowEvalPython removed). Identical
    arithmetic: deltas become integer cents before the fold, the fold
    order is the (ts, event_id) sort the loop used (unique per key —
    the struct sort's delta_c tiebreak can never reorder real rows),
    and every branch matches the loop body, so results are
    bit-identical to the recursive-CTE oracle. Per-key state still
    bounds memory exactly as applyInPandasWithState does in the
    streaming twin; the collected array is O(events per key), the
    same data-model invariant the grouped-map relied on."""
    base = events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__us"),
        "event_id",
        F.expr("CAST(round(coalesce(value, 0) * 100) AS BIGINT)").alias(
            "delta_c"
        ),
    )
    per_key = base.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("__us", "event_id", "delta_c"))
        ).alias("__evs")
    )
    cap = int(BALANCE_CAP_C)
    fold = F.expr(
        "aggregate(__evs, "
        "named_struct('bal', CAST(0 AS BIGINT), 'fh', CAST(0 AS BIGINT), "
        "'ch', CAST(0 AS BIGINT)), "
        "(acc, e) -> CASE "
        f"WHEN acc.bal + e.delta_c < CAST(0 AS BIGINT) THEN "
        "named_struct('bal', CAST(0 AS BIGINT), 'fh', acc.fh + "
        "CAST(1 AS BIGINT), 'ch', acc.ch) "
        f"WHEN acc.bal + e.delta_c > CAST({cap} AS BIGINT) THEN "
        f"named_struct('bal', CAST({cap} AS BIGINT), 'fh', acc.fh, "
        "'ch', acc.ch + CAST(1 AS BIGINT)) "
        "ELSE named_struct('bal', acc.bal + e.delta_c, 'fh', acc.fh, "
        "'ch', acc.ch) END)"
    )
    return per_key.select(
        "user_id",
        F.size("__evs").cast("bigint").alias("n_events"),
        fold.getField("fh").alias("floor_hits"),
        fold.getField("ch").alias("cap_hits"),
        fold.getField("bal").alias("final_balance_c"),
    )
