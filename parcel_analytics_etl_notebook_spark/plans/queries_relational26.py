"""Round-8 relational additions, batch 7: per-key sequential state.

One query with NO windowed closed form: the token-bucket balance
(floored at zero AND capped at a capacity). The one-sided floor alone
would still be window-expressible (prefix sum minus running
prefix-min); the two-sided clamp is not — each saturation erases
history direction-dependently, so per-key sequential state is
genuinely required. The engine runs it as a per-key JVM aggregate
fold (operators/sequential.py; the Arrow grouped-map shape until
r12); the oracle states the same recurrence as a DuckDB recursive
CTE, so the sequential fold is hash-checked against a declarative
fixpoint — the strongest cross-engine check a stateful operator can
get.

Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parcel_analytics_etl_notebook_spark.operators.sequential import (
    BALANCE_CAP_C,
    clamped_balance_per_key,
)
from parcel_analytics_etl_notebook_spark.plans.catalog import register, table


@register(
    "clamped_running_balance",
    oracle=f"""
WITH RECURSIVE e AS (
    SELECT user_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn,
           CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS delta_c
    FROM events
),
r(user_id, rn, bal, fhits, chits) AS (
    SELECT user_id, rn,
           least({BALANCE_CAP_C}, greatest(0, delta_c)),
           CASE WHEN delta_c < 0 THEN 1 ELSE 0 END,
           CASE WHEN delta_c > {BALANCE_CAP_C} THEN 1 ELSE 0 END
    FROM e WHERE rn = 1
    UNION ALL
    SELECT e.user_id, e.rn,
           least({BALANCE_CAP_C}, greatest(0, r.bal + e.delta_c)),
           r.fhits + CASE WHEN r.bal + e.delta_c < 0 THEN 1 ELSE 0 END,
           r.chits + CASE WHEN r.bal + e.delta_c > {BALANCE_CAP_C}
                          THEN 1 ELSE 0 END
    FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
)
SELECT user_id,
       CAST(max(rn) AS BIGINT) AS n_events,
       CAST(arg_max(fhits, rn) AS BIGINT) AS floor_hits,
       CAST(arg_max(chits, rn) AS BIGINT) AS cap_hits,
       CAST(arg_max(bal, rn) AS BIGINT) AS final_balance_c
FROM r GROUP BY user_id ORDER BY user_id
""",
)
def clamped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket balance per user: bal = min(CAP, max(0, prev +
    value)) in exact BIGINT cents (CAP = $5000) — the rate-limiter /
    capped-inventory / prepaid-ledger recurrence. Output per user:
    event count, how often each clamp fired, final balance.

    Why this is the honest Pandas-UDF case: the one-sided floor ALONE
    has a windowed closed form (bal_i = S_i − min(0, min_{{j≤i}} S_j) —
    prefix sum minus running prefix-min, two windows, stated here so
    nobody reintroduces a Python loop for that case), but the
    TWO-sided clamp has no prefix identity — each saturation erases
    history direction-dependently, so per-key sequential state is
    required. Engine shape (r12): ONE hash shuffle on user_id, then
    the O(group) recurrence as a JVM higher-order ``aggregate`` fold
    over each key's sorted event array
    (operators/sequential.clamped_balance_per_key — no Python
    boundary; the pre-r12 Arrow grouped-map paid per-group Python
    calls, the measured ~5s floor); deltas become integer cents
    BEFORE the fold so no float accumulation exists to diverge. The
    oracle states the identical recurrence as a recursive CTE, making
    this the catalog's only sequential operator hash-checked against
    a declarative fixpoint. At 100 TB the group key bounds per-key
    state exactly as applyInPandasWithState does in the streaming
    twin; fold depth = max events per key, a data-model invariant,
    not a scale variable."""
    out = clamped_balance_per_key(table(spark, sf_dir, "events"))
    return out.orderBy("user_id")
