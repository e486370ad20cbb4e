"""Property-based tests (hypothesis): cross-engine hash parity and
operator invariants, batched into one Spark job per test for speed."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.operators.dedup import dedup_first_row
from parcel_analytics_etl_notebook_spark.operators.flatten import flatten_structs

# non-whitespace printable + some unicode (tokenization splits on \s)
TOKEN_ALPHABET = st.characters(
    codec="utf-8", exclude_categories=("Zs", "Zl", "Zp", "Cc", "Cs")
)
token = st.text(alphabet=TOKEN_ALPHABET, min_size=1, max_size=8)


@settings(max_examples=5, deadline=None)
@given(st.lists(token, min_size=1, max_size=30))
def test_poly_hash_cross_engine(spark, strings):
    """Spark's codepoint rolling hash == DuckDB's for arbitrary unicode
    (the base hash under doc fingerprints, MinHash, SimHash, Jaccard)."""
    df = spark.createDataFrame([(s,) for s in strings], "t string")
    spark_h = [
        r[0]
        for r in df.select(
            F.aggregate(
                F.split("t", ""),
                F.lit(0).cast("long"),
                lambda acc, ch: (acc * 31 + F.ascii(ch)) % F.lit(1_000_000_007),
            )
        ).collect()
    ]
    con = duckdb.connect()
    duck_h = [
        con.execute(
            "SELECT CAST(list_reduce(list_prepend('0', string_split(?, '')), "
            "(acc, ch) -> CAST((CAST(acc AS BIGINT)*31 + unicode(ch)) % 1000000007 AS VARCHAR)) AS BIGINT)",
            [s],
        ).fetchone()[0]
        for s in strings
    ]
    assert spark_h == duck_h


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50), st.integers(-50, 50)),
        min_size=1,
        max_size=40,
    )
)
def test_dedup_first_row_matches_python_model(spark, rows):
    """Keyed dedup == Python's min-by-(ord, tiebreak) per key, for any
    duplicate/tie structure."""
    df = spark.createDataFrame(rows, "k int, o int, t int")
    got = {
        r["k"]: (r["o"], r["t"])
        for r in dedup_first_row(df, ["k"], [F.col("o"), F.col("t")]).collect()
    }
    expected: dict[int, tuple[int, int]] = {}
    for k, o, t in rows:
        if k not in expected or (o, t) < expected[k]:
            expected[k] = (o, t)
    assert got == expected


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 100), st.text(max_size=5), st.floats(allow_nan=False, allow_infinity=False)),
        min_size=1,
        max_size=20,
    )
)
def test_flatten_roundtrip_values(spark, rows):
    """Flattening a struct-of-scalars preserves every leaf value."""
    df = spark.createDataFrame(rows, "a int, b string, c double").select(
        F.struct("a", F.struct("b", "c").alias("inner")).alias("s")
    )
    flat = flatten_structs(df)
    assert flat.columns == ["s_a", "s_inner_b", "s_inner_c"]
    got = sorted(
        (r["s_a"], r["s_inner_b"], r["s_inner_c"]) for r in flat.collect()
    )
    assert got == sorted(rows)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(  # left events: (key, ts_offset_seconds)
        st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=1, max_size=15
    ),
    st.lists(  # right events
        st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=0, max_size=15
    ),
)
def test_asof_matches_python_model(spark, left_rows, right_rows):
    """As-of backward join == python max(right_ts <= left_ts) per key,
    for arbitrary key/timestamp structures (incl. duplicates)."""
    import datetime as dt

    from parcel_analytics_etl_notebook_spark.operators.asof import (
        asof_join_backward,
    )

    base = dt.datetime(2024, 1, 1)
    to_ts = lambda s: base + dt.timedelta(seconds=s)  # noqa: E731
    left = spark.createDataFrame(
        [(k, to_ts(s), i) for i, (k, s) in enumerate(left_rows)],
        "k bigint, ts timestamp, idx bigint",
    )
    right = spark.createDataFrame(
        [(k, to_ts(s)) for k, s in right_rows], "k bigint, ts timestamp"
    )
    out = asof_join_backward(left, right, on="k", left_ts="ts", right_ts="ts", right_values=[])
    got = {r["idx"]: r["ts_asof"] for r in out.collect()}
    assert len(got) == len(left_rows)
    for i, (k, s) in enumerate(left_rows):
        candidates = [rs for rk, rs in right_rows if rk == k and rs <= s]
        expected = to_ts(max(candidates)) if candidates else None
        assert got[i] == expected, (i, k, s, got[i], expected)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 50)),
        min_size=1,
        max_size=40,
        unique=True,  # (a, b) unique -> total order
    ),
    st.integers(1, 6),
)
def test_global_index_is_the_sorted_permutation(spark, rows, nparts):
    """stable_global_index == 1..n assigned in (a, b) sort order, for
    arbitrary data and partition counts."""
    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        stable_global_index,
    )

    df = spark.createDataFrame(rows, "a bigint, b bigint")
    out = stable_global_index(df, ["a", "b"], num_partitions=nparts).collect()
    assert len(out) == len(rows)
    expected = {t: i + 1 for i, t in enumerate(sorted(rows))}
    for r in out:
        assert r["global_idx"] == expected[(r["a"], r["b"])]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.floats(-500, 500)), min_size=0, max_size=25),
    st.lists(
        st.tuples(st.floats(-500, 500), st.floats(-500, 2000)),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from([7.0, 50.0, 400.0]),
)
def test_bucketized_range_join_matches_inequality_join(spark, vals, ivs, width):
    """The bucketized rewrite == the plain inequality join for ANY
    values/intervals (nulls, empty sides, degenerate hi<lo, intervals
    past the value max, any width)."""
    from parcel_analytics_etl_notebook_spark.operators.rangejoin import (
        range_join_bucketized,
    )

    values = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)] or [(0, None)], "id int, v double"
    )
    ivs_rows = [(j, lo, hi) for j, (lo, hi) in enumerate(ivs)]
    intervals = spark.createDataFrame(ivs_rows, "band int, lo double, hi double")
    got = {
        (r["id"], r["band"])
        for r in range_join_bucketized(
            values, intervals, "v", width=width
        ).collect()
    }
    expected = {
        (i, j)
        for i, v in enumerate(vals)
        if v is not None
        for j, (lo, hi) in enumerate(ivs)
        if lo <= v < hi
    }
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(0, 40), min_size=1, max_size=30),
    st.integers(1, 3),
)
def test_tws_sessionizer_interval_merge_matches_model(ts_units, n_batches):
    """Streaming sessionizer over ANY batch split / arrival order ==
    one-shot gap sessionization of the union — late events must extend
    pending sessions backwards, bridge them, or form earlier sessions,
    and nothing may close before the watermark allows it (the hazard:
    an in-batch gap is not sufficient evidence a session is over)."""
    import pandas as pd

    from parcel_analytics_etl_notebook_spark.streaming.stateful_tws import (
        SessionizerProcessor,
    )
    from tests.test_streaming import FakeTimerValues, FakeTWSHandle

    GAP = 10
    proc = SessionizerProcessor(gap_ms=GAP)
    handle = FakeTWSHandle()
    proc.init(handle)

    chunks = [ts_units[i::n_batches] for i in range(n_batches)]
    emitted = []

    def drain(outs):
        for out in outs:
            emitted.extend(
                (r.session_start_ms, r.session_end_ms, r.n_events)
                for r in out.itertuples(index=False)
            )

    for chunk in chunks:
        if not chunk:
            continue
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime(list(chunk), unit="ms"),
                "value": [1.0] * len(chunk),
            }
        )
        # watermark stuck at -1 while data is in flight: nothing closes
        drain(proc.handleInputRows((1,), iter([pdf]), FakeTimerValues(-1)))
    assert emitted == []  # watermark never advanced
    # watermark jumps past everything → all sessions emit exactly once
    drain(proc.handleExpiredTimer((1,), FakeTimerValues(10**9), None))
    assert not handle._s.exists()

    all_ts = sorted(ts_units)
    model = []
    cur = [all_ts[0], all_ts[0], 1]
    for t in all_ts[1:]:
        if t - cur[1] > GAP:
            model.append(tuple(cur))
            cur = [t, t, 1]
        else:
            cur[1] = t
            cur[2] += 1
    model.append(tuple(cur))
    assert sorted(emitted) == sorted(model)


def test_tws_sessionizer_watermark_boundary_event():
    """Regression: an event AT the watermark (Spark drops only
    eventTime < watermark) arriving exactly gap after the session's
    last event must MERGE into it (batch rule: strict `> gap` splits),
    so the session must not have been flushed when the watermark merely
    EQUALS last + gap."""
    import pandas as pd

    from parcel_analytics_etl_notebook_spark.streaming.stateful_tws import (
        SessionizerProcessor,
    )
    from tests.test_streaming import FakeTimerValues, FakeTWSHandle

    GAP = 10
    proc = SessionizerProcessor(gap_ms=GAP)
    handle = FakeTWSHandle()
    proc.init(handle)
    emitted = []

    def drain(outs):
        for out in outs:
            emitted.extend(
                (r.session_start_ms, r.session_end_ms, r.n_events)
                for r in out.itertuples(index=False)
            )

    def batch(ts_list, wm):
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime(ts_list, unit="ms"),
                "value": [1.0] * len(ts_list),
            }
        )
        drain(proc.handleInputRows((1,), iter([pdf]), FakeTimerValues(wm)))

    batch([100], 100 + GAP)  # wm == last + gap: still deliverable range
    assert emitted == []  # must NOT close yet
    batch([100 + GAP], 100 + GAP)  # the boundary event: merges
    drain(proc.handleExpiredTimer((1,), FakeTimerValues(10**9), None))
    assert emitted == [(100, 100 + GAP, 2)]  # ONE session, not two


@given(
    w=st.integers(min_value=0, max_value=2**31 - 1),
    h=st.integers(min_value=0, max_value=2**31 - 1),
    fmt=st.sampled_from(["png", "gif", "bmp", "jpeg"]),
)
@settings(max_examples=60, deadline=None)
def test_image_header_parse_roundtrip(w, h, fmt):
    """Spec-constructed container headers round-trip through the parser
    for ANY representable dimension (GIF is u16-limited; BMP height may
    be stored negative/top-down)."""
    import struct

    from parcel_analytics_etl_notebook_spark.operators.multimodal import (
        parse_image_header,
    )

    if fmt == "png":
        b = (
            b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
        )
        expect = (w, h)
    elif fmt == "gif":
        w, h = w % 65536, h % 65536
        b = b"GIF87a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"
        expect = (w, h)
    elif fmt == "bmp":
        sign = -1 if h % 2 else 1  # exercise top-down storage
        b = b"BM" + b"\x00" * 12 + struct.pack(
            "<Iii", 40, w, sign * h
        ) + b"\x00" * 4
        expect = (w, h)
    else:  # jpeg: u16 dims, APP0 + DHT before the SOF0
        w, h = w % 65536, h % 65536
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
        sof = b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 3)
        b = b"\xff\xd8" + app0 + dht + sof
        expect = (w, h)
    assert parse_image_header(b) == (fmt, *expect)


@given(payload=st.binary(min_size=0, max_size=64))
@settings(max_examples=150, deadline=None)
def test_image_header_parse_never_raises(payload):
    """Fuzz: arbitrary bytes — including ones starting with valid magic
    prefixes — must classify or return unknown, never raise (corrupt
    rows are data at 100 TB, not crashes)."""
    from parcel_analytics_etl_notebook_spark.operators.multimodal import (
        parse_image_header,
    )

    for prefix in (b"", b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"GIF89a", b"BM"):
        out = parse_image_header(prefix + payload)
        assert isinstance(out, tuple) and len(out) == 3


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**16 - 1),
            st.integers(min_value=0, max_value=2**16 - 1),
        ),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
@settings(max_examples=15, deadline=None)
def test_zorder_key_matches_python_morton(spark, pairs):
    """zorder_key_2d must equal the reference Morton interleave for any
    16-bit inputs — bijective, so distinct (a, b) map to distinct keys
    (file-skipping quality depends on the interleave being exact)."""
    from parcel_analytics_etl_notebook_spark.functions.zorder import (
        zorder_key_2d,
    )

    def morton(a: int, b: int) -> int:
        out = 0
        for i in range(16):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    df = spark.createDataFrame(pairs, "a bigint, b bigint")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zorder_key_2d(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    for (a, b), z in got.items():
        assert z == morton(a, b), (a, b)
    assert len(set(got.values())) == len(pairs)  # bijective on the grid


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8), st.integers(0, 99)),
        min_size=1,
        max_size=40,
    )
)
def test_pareto_frontier_matches_quadratic_model(spark, rows):
    """O(N log N) skyline rewrite == the quadratic dominance definition,
    for arbitrary tie/duplicate structures (small domain forces them)."""
    from parcel_analytics_etl_notebook_spark.operators.skyline import (
        pareto_frontier_2d,
    )

    df = spark.createDataFrame(rows, "x int, y int, tag int")
    got = sorted(
        (r.x, r.y, r.tag)
        for r in pareto_frontier_2d(df, "x", "y").collect()
    )
    want = sorted(
        (x, y, t)
        for (x, y, t) in rows
        if not any(
            qx >= x and qy >= y and (qx > x or qy > y) for (qx, qy, _) in rows
        )
    )
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 5)),
        min_size=1,
        max_size=50,
    ),
    st.integers(1, 7),
)
def test_rolling_distinct_actives_matches_bruteforce(spark, pairs, window):
    """Vote-explode rolling distinct == per-day brute-force recount,
    for any (day-offset, user) multiset and window length."""
    import datetime

    from parcel_analytics_etl_notebook_spark.operators.aggregates import (
        rolling_distinct_actives,
    )

    base = datetime.date(2024, 1, 1)
    rows = [
        (datetime.datetime.combine(base + datetime.timedelta(days=d),
                                   datetime.time(12)), u)
        for d, u in pairs
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user_id int")
    got = {
        (r[0], r[1])
        for r in rolling_distinct_actives(
            df, "ts", "user_id", window_days=window
        ).collect()
    }
    observed_days = sorted({base + datetime.timedelta(days=d) for d, _ in pairs})
    want = set()
    for day in observed_days:
        ids = {
            u
            for d, u in pairs
            if 0 <= (day - (base + datetime.timedelta(days=d))).days < window
        }
        want.add((day, len(ids)))
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(-20, 20)),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 6),
    st.one_of(st.none(), st.lists(st.floats(-15, 15), max_size=4)),
)
def test_global_frac_rank_matches_python_model(spark, vals, nparts, bounds):
    """global_frac_rank == lo + (ties + 1)/2 from a pure-Python model,
    for arbitrary values (nulls rank first), partition counts, and
    caller-supplied boundary lists of any quality — boundary choice
    must never affect the result, only bucket balance."""
    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        global_frac_rank,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    key = lambda v: (-(10**9)) if v is None else v  # noqa: E731
    expect = {}
    for i, v in rows:
        lo = sum(1 for _, u in rows if key(u) < key(v))
        ties = sum(1 for _, u in rows if key(u) == key(v))
        expect[i] = lo + (ties + 1) / 2
    out = global_frac_rank(
        df, "v", out_col="fr", num_partitions=nparts, boundaries=bounds
    ).collect()
    assert {r["id"]: float(r["fr"]) for r in out} == expect


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(0, 8), min_size=1, max_size=40),
    st.integers(1, 7),
)
def test_exact_ntile_bounded_matches_window_ntile(spark, vals, nbuckets):
    """exact_ntile_bounded == F.ntile over the same total order, for
    arbitrary duplicate-heavy value columns and bucket counts —
    including ties split across bucket boundaries."""
    from pyspark.sql import Window

    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        exact_ntile_bounded,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    got = {
        r["id"]: r["bucket"]
        for r in exact_ntile_bounded(
            df, "v", ["id"], nbuckets, total=len(rows)
        ).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["b"]
        for r in df.withColumn("b", F.ntile(nbuckets).over(w)).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# Funnel tie-handling convention (queries_relational17 module docstring,
# VERDICT r06 #8): strict step ordering, inclusive deadline, min-per-step
# --------------------------------------------------------------------------
_T0_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00 UTC
_H6_US = 6 * 3600 * 1_000_000


def _write_events_parquet(path, rows):
    """rows: (user_id, t_us, event_type) — written with the driver
    tables' exact physical schema (TIMESTAMP_NANOS ts) so the fixture
    exercises the same nanos→micros truncation path on both engines."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([t * 1000 for (_, t, _) in rows], pa.timestamp("ns")),
            "user_id": pa.array([u for (u, _, _) in rows], pa.int64()),
            "event_type": pa.array([e for (_, _, e) in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(path))


def test_funnel_equal_timestamp_ties(spark, tmp_path):
    """Pins the tie-handling convention on hand-computed fixtures:
    an equal-timestamp click never advances past its view (strict >),
    an equal-timestamp purchase never advances past its click, an
    event exactly ON the 6h deadline counts (inclusive <=), duplicate
    equal-timestamp step events collapse via min(t) — and Spark and
    the DuckDB oracle agree with the hand-computed histogram."""
    from parcel_analytics_etl_notebook_spark.plans import catalog

    rows = [
        # u1: click ties the view -> never advances -> max_step 1
        (1, _T0_US, "view"),
        (1, _T0_US, "click"),
        (1, _T0_US + 3_600_000_000, "purchase"),
        # u2: purchase ties the click -> stops at 2
        (2, _T0_US, "view"),
        (2, _T0_US + 1_000_000, "click"),
        (2, _T0_US + 1_000_000, "purchase"),
        # u3: clean chain, duplicate equal-ts click collapses -> 3
        (3, _T0_US, "view"),
        (3, _T0_US + 1_000_000, "click"),
        (3, _T0_US + 1_000_000, "click"),
        (3, _T0_US + 2_000_000, "purchase"),
        # u4: click exactly ON the deadline counts (inclusive);
        # purchase 1us past it cannot -> 2
        (4, _T0_US, "view"),
        (4, _T0_US + _H6_US, "click"),
        (4, _T0_US + _H6_US + 1, "purchase"),
        # u5: no view -> 0
        (5, _T0_US, "click"),
    ]
    _write_events_parquet(tmp_path / "events.parquet", rows)
    expected = {(0, 1), (1, 1), (2, 2), (3, 1)}

    e = catalog.registry()["window_funnel_max_step"]
    got = {
        (r["max_step"], r["n_users"])
        for r in e.fn(spark, str(tmp_path)).collect()
    }
    assert got == expected, f"Spark funnel broke the tie convention: {got}"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    oracle = {tuple(r) for r in con.execute(e.oracle).fetchall()}
    assert oracle == expected, f"oracle broke the tie convention: {oracle}"


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 4),  # user
            st.integers(0, 14),  # 30-min slot -> dense exact ties
            st.sampled_from(["view", "click", "purchase", "other"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_funnel_tie_grid_cross_engine(spark, tmp_path_factory, events):
    """Cross-engine property: for arbitrary tie-dense event streams
    (all timestamps on a 30-minute grid, guaranteeing equal-timestamp
    collisions within and across steps, some past the 6h deadline),
    the Spark funnel and its DuckDB oracle produce the identical
    histogram — i.e. neither engine's answer depends on how it orders
    equal timestamps."""
    from parcel_analytics_etl_notebook_spark.plans import catalog

    rows = [
        (u, _T0_US + slot * 1_800_000_000, et) for (u, slot, et) in events
    ]
    d = tmp_path_factory.mktemp("funnel_grid")
    _write_events_parquet(d / "events.parquet", rows)

    e = catalog.registry()["window_funnel_max_step"]
    got = {
        (r["max_step"], r["n_users"]) for r in e.fn(spark, str(d)).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    oracle = {tuple(r) for r in con.execute(e.oracle).fetchall()}
    assert got == oracle


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("aa bb cc dd ee ff gg hh".split()),
            min_size=3,
            max_size=10,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_prefix_candidate_bound_is_upper_bound(spark, docs_tokens):
    """The budget probe's Σ c·(c−1)/2 over prefix-shingle occupancy
    bounds the ACTUAL candidate-join output from above on arbitrary
    corpora — every candidate pair shares ≥ 1 prefix shingle, so the
    per-shingle pair sum can only overcount (multi-shingle pairs, pairs
    the size/positional filters later drop), never undercount. A bound
    that could undercount would let a quadratic join through the
    guardrail."""
    from parcel_analytics_etl_notebook_spark.functions.textfns import tokens
    from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
        poly_hash,
        shingle_hashes_from_tokens,
    )
    from parcel_analytics_etl_notebook_spark.plans.queries_llm7 import (
        _prefix_candidate_bound,
        _prefix_frame,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in enumerate(docs_tokens)],
        "doc_id long, text string",
    )
    tok_hashes = F.transform(tokens("text"), lambda t: poly_hash(t))
    sh = docs.select("doc_id", tok_hashes.alias("__th")).select(
        "doc_id",
        F.explode(
            F.array_distinct(shingle_hashes_from_tokens(F.col("__th"), 3))
        ).alias("shingle"),
    )
    prefix = _prefix_frame(sh)
    bound = _prefix_candidate_bound(prefix)
    a, b = prefix.alias("a"), prefix.alias("b")
    actual = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert bound >= actual


def test_correctness_window_front_is_valid(spark):
    """The external-harness front list must stay coherent: exactly 50
    names, no duplicates, every name registered in the catalog — a
    typo here would silently burn an external verification slot."""
    import json

    from parcel_analytics_etl_notebook_spark.plans import catalog

    with open("tools/correctness_window.json") as f:
        d = json.load(f)
    front = d["front"]
    assert len(front) == 50
    assert len(set(front)) == 50
    registered = set(catalog.queries())
    missing = [n for n in front if n not in registered]
    assert not missing, f"front names not in catalog: {missing}"
    # and the file keeps its POSIX trailing newline (ADVICE r08)
    with open("tools/correctness_window.json", "rb") as f:
        assert f.read().endswith(b"\n")
