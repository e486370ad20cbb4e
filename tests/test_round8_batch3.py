"""Hand-computed fixtures pinning the round-8 batch-3 conventions:
zone-map boundary exclusivity, overlapping phrase occurrences,
conformal rank integer math, floor-banding on negative balances, and
chain-vs-clique cluster density."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans import catalog


def test_conformal_rank_integer_math():
    """(9*(n+1)+9) // 10 IS ceil(0.9*(n+1)) for every calibration size —
    the all-integer restatement both engines compute (float ceil flips
    at exact multiples of 10)."""
    for n in range(1, 2001):
        assert (9 * (n + 1) + 9) // 10 == math.ceil(0.9 * (n + 1))


def _write_docs(path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in rows], pa.int64()),
            "text": pa.array([t for _, t in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["t"] * len(rows), pa.string()),
            "n_chars": pa.array([len(t) for _, t in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(path))


def test_phrase_positional_counts_overlapping_occurrences(spark, tmp_path):
    """'x x x x' contains the trigram 'x x x' TWICE (overlapping
    starts) — the positional-index intersection must count both, and
    n_docs counts containing docs once."""
    _write_docs(
        tmp_path / "documents.parquet",
        [(1, "x x x x"), (2, "x x x"), (3, "a b c d")],
    )
    e = catalog.registry()["phrase_match_positional"]
    got = {
        r["phrase"]: (r["n_occurrences"], r["n_docs"])
        for r in e.fn(spark, str(tmp_path)).collect()
    }
    assert got == {
        "x x x": (3, 2),
        "a b c": (1, 1),
        "b c d": (1, 1),
    }


def test_zone_map_predicate_upper_bound_exclusive(spark, tmp_path):
    """A file whose zone map starts exactly AT a predicate's exclusive
    upper bound (1995-02-01 vs the January predicate) must be skipped;
    the same file must be scanned by the February predicate."""
    import datetime as dt

    tbl = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_orderdate": pa.array(
                [dt.date(1995, 1, 15), dt.date(1995, 2, 1)], pa.date32()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    e = catalog.registry()["zone_map_skip_rates"]
    rows = e.fn(spark, str(tmp_path)).collect()
    clustered = {
        r["pred_month"]: (r["files_total"], r["files_scanned"], r["skip_rate_bp"])
        for r in rows
        if r["layout"] == "date_clustered"
    }
    # days since 1992-01-01: 1110 -> file 34, 1127 -> file 35
    assert clustered["1995-01"] == (2, 1, 5000)
    assert clustered["1995-02"] == (2, 1, 5000)
    for m in range(3, 13):
        assert clustered[f"1995-{m:02d}"] == (2, 0, 10000)
    hashed = [r for r in rows if r["layout"] == "key_hashed"]
    assert len(hashed) == 12 and all(r["files_total"] == 2 for r in hashed)


def test_k_anonymity_floor_bands_negative_balances(spark, tmp_path):
    """Balance bands FLOOR toward -inf: -0.01 and -999.99 share band
    -1 (truncating integer division would put -0.01 in band 0 with the
    small positives). Hand-computed k/l per band."""
    tbl = pa.table(
        {
            "c_nationkey": pa.array([1, 1, 2], pa.int32()),
            "c_mktsegment": pa.array(["A", "A", "B"], pa.string()),
            "c_acctbal": pa.array([-0.01, -999.99, 5.0], pa.float64()),
            "c_name": pa.array(["Cust#1", "Cust#2", "Cust#3"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "customer.parquet"))
    e = catalog.registry()["k_anonymity_audit"]
    got = {
        r["k_band"]: (r["n_groups"], r["n_rows"], r["min_l"], r["avg_l_c"])
        for r in e.fn(spark, str(tmp_path)).collect()
    }
    # (1,'A',-1) holds both negatives (sens '1','2' -> l=2); (2,'B',0) is unique
    assert got == {"01": (1, 1, 1, 100), "02-04": (1, 2, 2, 200)}


def test_cluster_density_chain_vs_clique(spark):
    """Density separates a chained merge from a duplicate clique: a
    3-path (2 edges) scores 6666 bp, a 3-clique (3 edges) scores
    10000 bp — the audit near_dup_cluster_density reports over the
    pair memo, computed here directly from the component operator and
    the same exact-BIGINT arithmetic."""
    from parcel_analytics_etl_notebook_spark.operators.graph import (
        dup_groups_from_pairs,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    groups = dup_groups_from_pairs(pairs)
    m = groups.groupBy("canonical_id").agg(F.count(F.lit(1)).alias("n_members"))
    eg = (
        pairs.join(groups.withColumnRenamed("doc_id", "id_a"), "id_a")
        .groupBy("canonical_id")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    got = {
        r["canonical_id"]: r["density_bp"]
        for r in m.join(eg, "canonical_id")
        .select(
            "canonical_id",
            F.expr(
                "2 * n_edges * 10000 div (n_members * (n_members - 1))"
            ).alias("density_bp"),
        )
        .collect()
    }
    assert got == {1: 6666, 10: 10000}


# ---------------------------------------------------------------------------
# Zone-map pruning safety: no false skips on randomized layouts
# ---------------------------------------------------------------------------
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2405), st.integers(0, 10**6)),
        min_size=1,
        max_size=120,
    )
)
def test_zone_map_never_false_skips(rows):
    """Pruning-safety invariant, pure-python twin of the query's
    arithmetic: under BOTH layouts, every row whose order date falls in
    a month predicate must belong to a file the zone-map probe marks
    scanned — a false skip is silent data loss, the one failure mode a
    pruning layer must never have. (False SCANS are allowed — they only
    cost I/O; the skip-rate columns price them.)"""
    import datetime as dt

    base = dt.date(1992, 1, 1)
    P, M = 1_000_000_007, 1_000_003
    files: dict[tuple[str, int], list[dt.date]] = {}
    for day, key in rows:
        d = base + dt.timedelta(days=day)
        files.setdefault(("date_clustered", day // 32), []).append(d)
        files.setdefault(
            ("key_hashed", (key % P) * M % P % 64), []
        ).append(d)
    zone = {
        fk: (min(ds), max(ds)) for fk, ds in files.items()
    }
    for m in range(1, 13):
        lo = dt.date(1995, m, 1)
        hi = dt.date(1996, 1, 1) if m == 12 else dt.date(1995, m + 1, 1)
        scanned = {
            fk for fk, (fmin, fmax) in zone.items()
            if fmin < hi and fmax >= lo
        }
        for fk, ds in files.items():
            for d in ds:
                if lo <= d < hi:
                    assert fk in scanned, (
                        f"false skip: row {d} in unscanned file {fk}"
                    )
