"""Unit tests for the round-8 operators: nearest as-of, skyline via
running-max window, exact rolling median, LSH banding frame, and the
incremental-LSH delta contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.operators.asof import (
    asof_join_nearest,
)
from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
    lsh_banded,
)


def test_asof_nearest_tie_and_directions(spark):
    """Equal-distance ties go backward; an exact-timestamp right row is
    a backward match with gap 0 and never a forward match; unmatched
    sides are NULL."""
    left = spark.createDataFrame(
        [(1, 10, "tie"), (1, 100, "exact"), (2, 50, "only_after"),
         (3, 50, "only_before"), (4, 50, "none")],
        "k int, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 5), (1, 15), (1, 100), (2, 60), (3, 40)], "k int, ts long"
    )
    out = asof_join_nearest(
        left, right, on="k", left_ts="ts", right_ts="ts"
    )
    got = {r["tag"]: (r["ts_before"], r["ts_after"]) for r in out.collect()}
    assert got["tie"] == (5, 15)          # caller picks; both exposed
    assert got["exact"] == (100, None)    # exact ts -> backward, gap 0
    assert got["only_after"] == (None, 60)
    assert got["only_before"] == (40, None)
    assert got["none"] == (None, None)


def test_asof_nearest_strictly_after_not_inclusive(spark):
    """The forward side is strictly-after: a right row at the left ts
    must appear ONLY as the backward match."""
    left = spark.createDataFrame([(1, 10)], "k int, ts long")
    right = spark.createDataFrame([(1, 10), (1, 11)], "k int, ts long")
    row = asof_join_nearest(
        left, right, on="k", left_ts="ts", right_ts="ts"
    ).collect()[0]
    assert row["ts_before"] == 10
    assert row["ts_after"] == 11


def test_skyline_matches_bruteforce(spark, sf_dir):
    """Windowed skyline == O(n²) dominance filter, brute-forced on the
    driver over the real part table."""
    from parcel_analytics_etl_notebook_spark.plans.queries_relational20 import (
        skyline_parts,
    )

    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_brand", "p_partkey", "p_size", "p_retailprice"
    )
    rows = part.collect()
    by_brand: dict[str, list] = {}
    for r in rows:
        by_brand.setdefault(r["p_brand"], []).append(r)
    expect = set()
    for brand, rs in by_brand.items():
        for p in rs:
            dominated = any(
                q["p_retailprice"] <= p["p_retailprice"]
                and q["p_size"] >= p["p_size"]
                and (
                    q["p_retailprice"] < p["p_retailprice"]
                    or q["p_size"] > p["p_size"]
                )
                for q in rs
            )
            if not dominated:
                expect.add((brand, p["p_partkey"]))
    got = {
        (r["p_brand"], r["p_partkey"])
        for r in skyline_parts(spark, sf_dir).collect()
    }
    assert got == expect


def test_rolling_median_small_frames(spark):
    """Odd frames take the middle element; even frames interpolate
    lo + (hi-lo)/2 exactly."""
    df = spark.createDataFrame(
        [(i, 1, float(v)) for i, v in enumerate([5.0, 1.0, 9.0, 3.0])],
        "event_id long, user_id long, value double",
    )
    # reuse the query's median expression via a local rebuild
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-4, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, (n / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    med = F.when(
        n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int"))
    ).otherwise(lo + (hi - lo) * F.lit(0.5))
    got = [
        r["m"]
        for r in df.select("event_id", med.alias("m"))
        .orderBy("event_id")
        .collect()
    ]
    assert got == [5.0, 3.0, 5.0, 4.0]


def test_lsh_banded_shape_and_cap(spark):
    """lsh_banded emits bands×rows bucket rows; a bucket above
    max_bucket is dropped entirely."""
    sig = spark.createDataFrame(
        [(i, list(range(16)) if i < 3 else [i * 100 + j for j in range(16)])
         for i in range(5)],
        "doc_id long, minhash array<bigint>",
    )
    full = lsh_banded(sig, bands=4, sig_len=16, max_bucket=None)
    assert full.count() == 5 * 4
    capped = lsh_banded(sig, bands=4, sig_len=16, max_bucket=2)
    # docs 0,1,2 share every band bucket (size 3 > 2) -> all dropped
    kept = {r["doc_id"] for r in capped.select("doc_id").distinct().collect()}
    assert kept == {3, 4}


def test_lsh_banded_rejects_indivisible(spark):
    sig = spark.createDataFrame(
        [(1, list(range(16)))], "doc_id long, minhash array<bigint>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        lsh_banded(sig, bands=5, sig_len=16)


def test_incremental_lsh_is_delta_of_full_pairs(spark, sf_dir):
    """Contract: the incremental query's pairs are exactly the
    batch-touching subset of what a FULL LSH+verify run finds — so
    `pairs' = corpus-only pairs ∪ delta` reconstructs the full table."""
    from parcel_analytics_etl_notebook_spark.plans.queries_llm12 import (
        _BATCH_MOD,
        incremental_lsh_near_dup,
    )

    inc = incremental_lsh_near_dup(spark, sf_dir).collect()
    for r in inc:
        assert (r["id_a"] % _BATCH_MOD == 0) or (r["id_b"] % _BATCH_MOD == 0)
        both = (r["id_a"] % _BATCH_MOD == 0) and (r["id_b"] % _BATCH_MOD == 0)
        assert r["pair_type"] == ("batch_batch" if both else "batch_corpus")
        assert r["jaccard"] >= 0.2
        assert r["id_a"] < r["id_b"]


def test_dbscan_core_counts_vs_bruteforce(spark, sf_dir):
    """Grid-bucketed neighbor counts == brute-force counts on the real
    embedding slice."""
    from parcel_analytics_etl_notebook_spark.plans.queries_llm12 import (
        _DBSCAN_EPS2,
        dbscan_core_points,
    )

    pts = [
        (r["vec_id"], float(r["embedding"][0]), float(r["embedding"][1]))
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ]
    expect = {}
    for i, x, y in pts:
        expect[i] = sum(
            1
            for j, u, v in pts
            if j != i and (x - u) * (x - u) + (y - v) * (y - v) <= _DBSCAN_EPS2
        )
    got = {
        r["vec_id"]: r["n_neighbors"]
        for r in dbscan_core_points(spark, sf_dir).collect()
    }
    assert got == expect
