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
