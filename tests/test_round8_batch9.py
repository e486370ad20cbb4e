"""Hand-computed fixtures pinning the batch-9 semantics: the
token-bucket clamp (floor AND cap hits, exact cents) and the
water-filling allocation invariants (sums to budget exactly, max-min
fairness, deterministic remainder)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from parcel_analytics_etl_notebook_spark.operators.sequential import (
    BALANCE_CAP_C,
    clamped_balance_per_key,
)
from parcel_analytics_etl_notebook_spark.plans import catalog


def test_token_bucket_floor_and_cap(spark):
    """Walk: +30.00, -50.00 (floor fires), +6000.00 (cap fires),
    -1.00 -> final = CAP - 100. A second user never saturates."""
    rows = [
        (1, 1, 30.0), (1, 2, -50.0), (1, 3, 6000.0), (1, 4, -1.0),
        (2, 5, 10.0), (2, 6, 5.0),
    ]
    df = spark.createDataFrame(
        [(e, u, t * 1_000_000, v) for (u, t, v), e in
         zip(rows, range(len(rows)))],
        "event_id long, user_id long, us long, value double",
    ).selectExpr(
        "event_id", "timestamp_micros(us) AS ts", "user_id", "value"
    )
    got = {
        r["user_id"]: (
            r["n_events"], r["floor_hits"], r["cap_hits"],
            r["final_balance_c"],
        )
        for r in clamped_balance_per_key(df).collect()
    }
    assert got[1] == (4, 1, 1, BALANCE_CAP_C - 100)
    assert got[2] == (2, 0, 0, 1500)


def _write_docs(path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _, _ in rows], pa.int64()),
            "text": pa.array([t for _, t, _ in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([s for _, _, s in rows], pa.string()),
            "n_chars": pa.array([len(t) for _, t, _ in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(path))


def test_waterfill_invariants(spark, tmp_path):
    """Demands 1/2/4/9 tokens, budget = 16//2 = 8. Water level lambda:
    serving src a (1) fully leaves 7 for 3 sources -> lambda = 2 < 4,
    so istar at the 4-demand source: lambda = (8-3)//2 = 2, rem = 1.
    Allocations: a=1, b=2, c=2+1 (first capped source gets the
    remainder), d=2. Sum = 8 = budget, exactly."""
    _write_docs(
        tmp_path / "documents.parquet",
        [
            (1, "w", "a"),
            (2, "w w", "b"),
            (3, "w w w w", "c"),
            (4, "w w w w w w w w w", "d"),
        ],
    )
    e = catalog.registry()["token_budget_waterfill"]
    rows = {
        r["source"]: (r["demand_tokens"], r["alloc_tokens"], r["capped"])
        for r in e.fn(spark, str(tmp_path)).collect()
    }
    assert rows == {
        "a": (1, 1, 0),
        "b": (2, 2, 0),
        "c": (4, 3, 1),
        "d": (9, 2, 1),
    }
    assert sum(a for _, a, _ in rows.values()) == 8  # == budget, exact
    # max-min fairness: no capped source below an uncapped one's alloc
    capped_min = min(a for _, a, c in rows.values() if c)
    uncapped_max = max(a for _, a, c in rows.values() if not c)
    assert capped_min >= uncapped_max


# ---------------------------------------------------------------------------
# The documented window identity for the ONE-sided floor walk
# ---------------------------------------------------------------------------
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _floor_walk(deltas):
    bal, hits = 0, 0
    for d in deltas:
        s = bal + d
        if s < 0:
            hits += 1
            bal = 0
        else:
            bal = s
    return bal, hits


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(-10_000, 10_000), min_size=1, max_size=200))
def test_one_sided_floor_has_window_form(deltas):
    """Pins the identity the clamped_running_balance docstring cites as
    the reason a ONE-sided floor needs no Python loop:
    final = S_n − min(0, min_i S_i) (prefix sum minus zero-capped
    running prefix-min), and floor_hits = number of strict decreases of
    that running min. The TWO-sided clamp the operator actually ships
    has no such identity — which is exactly why it is the honest
    Pandas-UDF case."""
    bal, hits = _floor_walk(deltas)
    s, m, win_hits = 0, 0, 0
    mins = []
    for d in deltas:
        s += d
        if s < m:
            win_hits += 1
            m = s
        mins.append(m)
    assert bal == s - m
    assert hits == win_hits
