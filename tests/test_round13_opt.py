"""Round-13 optimization-round tests: focused equivalence checks for
the rewrites that changed operator internals this round (oracle parity
pins end-to-end results; these pin the rewritten step against the
naive form it replaced)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.vectors import _f64
from parcel_analytics_etl_notebook_spark.operators.indexing import (
    windowed_adjacent_pairs,
)
from parcel_analytics_etl_notebook_spark.plans.queries_relational27 import (
    _build_snb_cands,
    _multipass_boundaries,
    _snb_candidate_ids,
)

SF = "/root/testdata/sf0.001"


def test_snb_cands_memo_flags_equal_per_pass_generators(spark):
    """The shared flagged candidate memo is LOSSLESS: filtering its
    flag columns reproduces each naive per-pass generator exactly —
    p1 = the single-pass (name-order) output every single-pass
    consumer reads, p1|p2 = the old c12 union+dropDuplicates of the
    recovery metric, p3 = the reversed-name pass, and the full row set
    = the 3-arm deduped multipass union."""
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    keyed = customer.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.reverse(F.col("c_name")).alias("rev_name"),
    )
    bnd = _multipass_boundaries(keyed)
    naive = {
        "p1": _snb_candidate_ids(keyed, ["c_name", "c_custkey"], bnd["c_name"]),
        "p2": _snb_candidate_ids(
            keyed, ["c_acctbal", "c_custkey"], bnd["c_acctbal"]
        ),
        "p3": _snb_candidate_ids(
            keyed, ["rev_name", "c_custkey"], bnd["rev_name"]
        ),
    }
    naive_sets = {
        k: {(r["id_a"], r["id_b"]) for r in v.collect()}
        for k, v in naive.items()
    }
    memo = _build_snb_cands(spark, SF).collect()
    memo_sets: dict[str, set] = {"p1": set(), "p2": set(), "p3": set()}
    for r in memo:
        for k in ("p1", "p2", "p3"):
            if r[k] == 1:
                memo_sets[k].add((r["id_a"], r["id_b"]))
    assert memo_sets == naive_sets
    # the memo's row set IS the deduped 3-arm union (groupBy = dedup)
    assert {(r["id_a"], r["id_b"]) for r in memo} == (
        naive_sets["p1"] | naive_sets["p2"] | naive_sets["p3"]
    )
    # and single-pass consumers lose nothing: pass-1 is non-empty here
    assert len(memo_sets["p1"]) > 0


def test_multi_windowed_pairs_equal_per_pass(spark):
    """multi_windowed_adjacent_pairs (one union-counts collect for all
    passes) returns, per pass, exactly the per-pass
    windowed_adjacent_pairs result — numeric AND string sort keys,
    NULL keys (bucket -1), ragged bucket boundaries."""
    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        multi_windowed_adjacent_pairs,
        windowed_adjacent_pairs,
    )

    rows = [(i, float(i % 7) * 100, f"name{i % 5:02d}" if i % 11 else None)
            for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, bal double, nm string")
    passes = [
        (["bal", "id"], [150.0, 350.0, 550.0]),
        (["nm", "id"], ["name01", "name03"]),
    ]
    multi = multi_windowed_adjacent_pairs(df, passes, 4, "id")
    for (order_cols, bnd), got in zip(passes, multi):
        want = windowed_adjacent_pairs(df, order_cols, 4, "id",
                                       boundaries=bnd)
        ws = {(r["id_a"], r["id_b"]) for r in want.collect()}
        gs = {(r["id_a"], r["id_b"]) for r in got.collect()}
        assert gs == ws, order_cols
        assert len(gs) > 0


def test_capped_populations_match_per_population_antijoin(spark):
    """The one-window occupancy rewrite of the apply-delta hot-bucket
    cap returns, for every predicate, exactly the rows the old
    per-population groupBy + left-anti-join shape kept — stressed with
    a bucket that is hot in one population but under the cap in
    another (the exact case that forbids sharing one global cap)."""
    import parcel_analytics_etl_notebook_spark.plans.queries_llm19 as llm19

    cap = llm19.MAX_LSH_BUCKET
    rows = []
    # bucket (0, 1): cap+2 rows of which cap+1 are even -> hot for the
    # full population AND the even population, but the odd population
    # (1 row) survives. bucket (1, 2): exactly cap rows -> never hot.
    for i in range(cap + 1):
        rows.append((2 * i, 0, 1))
    rows.append((3, 0, 1))
    for i in range(cap):
        rows.append((i, 1, 2))
    banded = spark.createDataFrame(
        rows, "doc_id bigint, band int, sig_band bigint"
    )
    preds = [
        F.col("doc_id") % 2 == 0,
        F.col("doc_id") % 2 == 1,
        None,
    ]

    def naive(pred):
        pop = banded.filter(pred) if pred is not None else banded
        hot = (
            pop.groupBy("band", "sig_band")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > cap)
            .select("band", "sig_band")
        )
        return pop.join(hot, on=["band", "sig_band"], how="left_anti")

    def keyset(df):
        # compare by NAME: the old anti-join's `on` list reordered
        # columns (band, sig_band first); every consumer is name-keyed
        return {
            (r["doc_id"], r["band"], r["sig_band"]) for r in df.collect()
        }

    got = llm19._capped_populations(banded, preds)
    for pred, g in zip(preds, got):
        assert keyset(g) == keyset(naive(pred))
    # sanity on the stressor itself: odd pop keeps its bucket-(0,1) row
    assert (3, 0, 1) in keyset(got[1])


def test_windowed_adjacent_pairs_rejects_window_below_2(spark):
    """window=1 would emit spurious pairs via the DESCENDING
    F.sequence fallback (ADVICE r12) — the guard fails loudly."""
    df = spark.range(10).select(F.col("id"), F.col("id").alias("k"))
    with pytest.raises(ValueError, match="window must be >= 2"):
        windowed_adjacent_pairs(df, ["k"], 1, "id")


def test_job_paired_anchor_severity_r12_names():
    """VERDICT r12 next #6 regression test, with the r12 names: under
    corrected-only anchoring, a rewrite that CUTS jobs at flat raw
    wall raises its corrected wall (less overhead subtracted) and
    drift-flags as a regression forever. The overhead-equalized
    job-paired severity (bench.severity_ratio) must rank such moves
    materially lower than the bare corrected ratio — and must still
    flag a genuine compute regression at equal job counts."""
    from bench import severity_ratio

    # driver-recorded r11 -> r12 values (BENCH_DETAIL_r11/r12): the
    # job-count rewrites' corrected walls ROSE because fewer jobs
    # means less subtracted; at the r12 host overhead (118.6 ms/job)
    # the equalized ratio credits the anchor its extra jobs.
    cases = [
        # (name, c_anchor, j_anchor, c_now, j_now)
        ("snb_canonical_pass_recovery", 0.1644, 53, 1.6867, 31),
        ("orders_global_index", 0.7997, 10, 1.1713, 8),
    ]
    oh = 0.1186
    for name, c_a, j_a, c_n, j_n in cases:
        bare = c_n / max(c_a, 0.05)
        equalized = severity_ratio(c_n, j_n, c_a, j_a, oh)
        assert equalized < bare, name
        # the job credit must be exactly the job delta at the current
        # overhead — no other rescaling hides real regressions
        expect = (c_n + j_n * oh) / max(c_a + j_a * oh, 0.05)
        assert abs(equalized - expect) < 1e-9, name
    # orders_global_index r13 shape: 8 -> 6 jobs with ~flat compute
    # must NOT flag (severity under the 1.5 trigger) ...
    assert severity_ratio(1.17, 6, 0.80, 10, oh) < 1.5
    # ... while a genuine compute regression at EQUAL jobs still does
    assert severity_ratio(2.5, 10, 0.80, 10, oh) > 1.5
    # ... and a pure JOB-COUNT regression now surfaces here too
    assert severity_ratio(0.80, 40, 0.80, 10, oh) > 1.5


def test_f64_nonfinite_literals_parse(spark):
    """_f64 emits parseable SQL for NaN/inf (ADVICE r12): the ...D
    repr form fails to parse for non-finite doubles, so they fall back
    to the CAST-string form."""
    nan, pinf, ninf = _f64(float("nan")), _f64(float("inf")), _f64(-float("inf"))
    row = spark.sql(
        f"SELECT {nan} AS a, {pinf} AS b, {ninf} AS c, {_f64(1.5)} AS d"
    ).collect()[0]
    assert math.isnan(row["a"])
    assert row["b"] == float("inf") and row["c"] == -float("inf")
    assert row["d"] == 1.5
