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
