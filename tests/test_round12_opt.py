"""Round-12 optimization-round tests: every rewrite that changed an
operator's internals gets a focused equivalence check here (the oracle
parity harness already pins the end-to-end results; these pin the
REWRITTEN step against the naive form it replaced, on inputs built to
stress the boundary the rewrite exploits)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.queries_relational20 import (
    _FS_THRESHOLD,
    _FS_W,
    _fs_links_are_band_and_name,
)
from parcel_analytics_etl_notebook_spark.plans.queries_relational27 import (
    _fs_score_candidates,
)


def test_fs_weight_algebra_holds():
    """The import-time proof the band-join rewrite rests on: over all
    2^3 agreement patterns, score >= threshold iff name AND balance
    agree. If a weight change breaks this, the assert in
    queries_relational20 fires at import — this test documents the
    property and fails first in CI."""
    assert _fs_links_are_band_and_name()
    # and the property is TIGHT: segment genuinely never decides
    assert (
        _FS_W["name"][0] + _FS_W["balance"][0] + _FS_W["segment"][1]
        >= _FS_THRESHOLD
    )
    assert (
        _FS_W["name"][0] + _FS_W["balance"][1] + _FS_W["segment"][0]
        < _FS_THRESHOLD
    )


def test_fs_links_only_equals_threshold_filter(spark):
    """links_only=True (band equality pushed before the levenshtein)
    returns exactly the score >= threshold subset of the full scoring
    path — including pairs that agree on balance but not name, name
    but not balance, and the segment-disagreeing link at exactly the
    threshold."""
    cust = spark.createDataFrame(
        [
            # (custkey, name, segment, acctbal)
            (1, "Customer#000000001", "AUTO", 100.0),
            (2, "Customer#000000002", "AUTO", 120.0),  # same band as 1
            (3, "Customer#000000003", "FURN", 130.0),  # band agree, seg no
            (4, "Customer#000000004", "AUTO", 900.0),  # different band
            (5, "Xustomer#000000005", "AUTO", 110.0),  # lev 2 from 1's twin
            (6, "Totally different!", "AUTO", 115.0),  # band agree, name no
        ],
        "c_custkey bigint, c_name string, c_mktsegment string, "
        "c_acctbal double",
    )
    ids = [(a, b) for a in range(1, 7) for b in range(a + 1, 7)]
    cand = spark.createDataFrame(ids, "id_a bigint, id_b bigint")
    naive = {
        (r["id_a"], r["id_b"])
        for r in _fs_score_candidates(cand, cust)
        .filter(F.col("score") >= _FS_THRESHOLD)
        .collect()
    }
    fast = {
        (r["id_a"], r["id_b"])
        for r in _fs_score_candidates(cand, cust, links_only=True).collect()
    }
    assert fast == naive
    # sanity: the fixture exercises both prune directions
    assert (1, 4) not in fast  # name agrees, band differs -> pruned
    assert (1, 6) not in fast  # band agrees, name differs -> pruned
    assert (1, 3) in fast  # band+name agree, segment differs -> linked


def test_windowed_adjacent_pairs_equals_rank_join(spark):
    """The lead+stitch pair generator must emit EXACTLY the rank-join
    pair set it replaced, on a fixture built to stress the stitch:
    num_partitions far above the row count forces tiny (and empty)
    buckets, so cross-bucket pairs span MULTIPLE buckets and every row
    is both head and tail; duplicate order values stress tie bucketing
    (equal keys share a bucket by the strict-boundary rule)."""
    from pyspark.sql import Window

    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        windowed_adjacent_pairs,
    )

    rows = [(i, float((i * 7919) % 97)) for i in range(1, 301)]
    # heavy ties: fold the key space so many rows share a value
    df = spark.createDataFrame(rows, "id bigint, k double")
    w = 8
    got = {
        (r["id_a"], r["id_b"])
        for r in windowed_adjacent_pairs(
            df, ["k", "id"], w, "id", num_partitions=64
        ).collect()
    }
    ranked = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("k", "id"))
    )
    a = ranked.select(F.col("id").alias("id_a"), F.col("rn").alias("ra"))
    b = ranked.select(F.col("id").alias("id_b"), F.col("rn").alias("rb"))
    naive = {
        (r["id_a"], r["id_b"])
        for r in a.join(
            b,
            (F.col("rb") > F.col("ra")) & (F.col("rb") <= F.col("ra") + w - 1),
        ).collect()
    }
    assert got == naive


def test_clamped_balance_jvm_fold_matches_reference(spark):
    """The JVM aggregate fold must reproduce the sequential clamp
    recurrence exactly — fixture drives both clamps, interleaved keys,
    and an out-of-order input (the fold's sort_array must restore
    (ts, event_id) order)."""
    from parcel_analytics_etl_notebook_spark.operators.sequential import (
        BALANCE_CAP_C,
        clamped_balance_per_key,
    )

    rows = []
    for uid in (1, 2):
        # values in dollars; delta pattern hits floor then cap
        seq = [(3, -99999.0), (1, 2.0), (2, -5.0), (4, 999999.0), (5, 1.0)]
        for eid, v in seq:
            rows.append((uid, f"2024-01-0{eid} 00:00:00", eid * 10 + uid, v))
    ev = spark.createDataFrame(
        rows, "user_id bigint, ts string, event_id bigint, value double"
    ).select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        "value",
    )
    got = {
        r["user_id"]: (
            r["n_events"], r["floor_hits"], r["cap_hits"],
            r["final_balance_c"],
        )
        for r in clamped_balance_per_key(ev).collect()
    }

    def ref(seq):
        bal = fh = ch = 0
        for _eid, v in sorted(seq):
            s = bal + round(v * 100)
            if s < 0:
                fh += 1
                bal = 0
            elif s > BALANCE_CAP_C:
                ch += 1
                bal = BALANCE_CAP_C
            else:
                bal = s
        return (len(seq), fh, ch, bal)

    seq = [(3, -99999.0), (1, 2.0), (2, -5.0), (4, 999999.0), (5, 1.0)]
    expected = ref(seq)
    assert got == {1: expected, 2: expected}
    assert expected[1] >= 1 and expected[2] >= 1  # both clamps fired
