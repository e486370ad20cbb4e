"""Round-9 operator tests: the incremental-LSH delta APPLICATION
contract (idempotency, corpus-pair invariance, second-batch-sees-
first-batch), the 64-bit banded SimHash's structural guarantees, and
the prefix-filter candidate-budget guardrail."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
    with_simhash,
    with_simhash_bands,
)
from parcel_analytics_etl_notebook_spark.plans import catalog
from parcel_analytics_etl_notebook_spark.plans.queries_llm7 import (
    CandidateBudgetExceeded,
    prefix_filter_pairs,
)

SF = "/root/testdata/sf0.001"


def _pairs(spark):
    qs = catalog.queries()
    return qs["incremental_lsh_apply_delta"](spark, SF).cache()


def test_apply_delta_tags_are_disjoint_and_exhaustive(spark):
    """Every pair carries exactly one tag, and the tag is determined by
    the pair's batch membership: 'corpus' iff neither side is a batch
    doc, 'batch1' iff a side is in batch B, else 'batch0' — i.e. union
    with the delta IS application, no pair needs reconciling."""
    out = _pairs(spark)
    assert out.count() == out.select("id_a", "id_b").distinct().count()
    ma, mb = F.col("id_a") % 10, F.col("id_b") % 10
    expected = (
        F.when((ma == 1) | (mb == 1), "batch1")
        .when((ma == 0) | (mb == 0), "batch0")
        .otherwise("corpus")
    )
    assert out.filter(F.col("introduced_by") != expected).count() == 0


def test_apply_delta_corpus_pairs_invariant(spark):
    """pairs2 restricted to corpus docs == pairs0 (the standing pair
    table is untouched by two append-only batches), and re-applying any
    step's delta adds nothing (idempotency: pairs2 ∪ deltaB == pairs2)."""
    out = _pairs(spark)
    corpus_restricted = out.filter(
        (F.col("id_a") % 10 >= 2) & (F.col("id_b") % 10 >= 2)
    )
    pairs0 = out.filter(F.col("introduced_by") == "corpus")
    assert corpus_restricted.exceptAll(pairs0).count() == 0
    assert pairs0.exceptAll(corpus_restricted).count() == 0

    delta_b = out.filter(F.col("introduced_by") == "batch1")
    reapplied = out.unionByName(delta_b).dropDuplicates()
    assert reapplied.exceptAll(out).count() == 0
    assert out.exceptAll(reapplied).count() == 0


def test_apply_delta_second_batch_sees_first(spark):
    """The timeline is genuinely sequential: deltaB candidates are
    banded against the UPDATED corpus, so batchB×batchA pairs exist in
    the output wherever the corpora overlap (on this fixture at least
    one such pair; all are tagged batch1, never batch0)."""
    out = _pairs(spark)
    ma, mb = F.col("id_a") % 10, F.col("id_b") % 10
    cross = out.filter(((ma == 0) & (mb == 1)) | ((ma == 1) & (mb == 0)))
    assert cross.count() > 0
    assert (
        cross.filter(F.col("introduced_by") != "batch1").count() == 0
    )


def test_simhash_bands_band0_is_classic_16bit(spark):
    """band_0's mixer is 1, so it must equal with_simhash(bits=16)
    exactly — the documented recall-comparison bridge between the
    16-bit and 64-bit paths."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    wide = with_simhash_bands(docs)
    classic = with_simhash(docs, bits=16).withColumnRenamed(
        "simhash", "classic"
    )
    joined = wide.join(classic, "doc_id")
    assert joined.filter(F.col("band_0") != F.col("classic")).count() == 0
    assert joined.count() == 200


def test_simhash_bands_range_and_pigeonhole(spark):
    """Bands are 16-bit non-negative ints, and banding is EXACT for the
    hamming<=3 predicate: any two docs whose 64-bit fingerprints differ
    in <=3 bits agree on at least one band (verified exhaustively on
    the fixture's fingerprint set)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(300)
    f = with_simhash_bands(docs)
    bad = f.filter(
        sum(
            ((F.col(f"band_{k}") < 0) | (F.col(f"band_{k}") > 65535)).cast(
                "int"
            )
            for k in range(4)
        )
        > 0
    )
    assert bad.count() == 0
    rows = f.collect()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            ham = sum(
                bin(a[f"band_{k}"] ^ b[f"band_{k}"]).count("1")
                for k in range(4)
            )
            if ham <= 3:
                assert any(
                    a[f"band_{k}"] == b[f"band_{k}"] for k in range(4)
                )


def _boilerplate_docs(spark, n=30):
    """A degenerate corpus: every doc is the same 6-token text, so
    every shingle has df = n and the prefix join's candidate bound is
    ~n²/2 · p — the quadratic regime the budget exists to catch."""
    text = "alpha beta gamma delta epsilon zeta"
    return spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )


def test_prefix_filter_budget_fails_fast(spark):
    """Over-budget corpora raise CandidateBudgetExceeded at plan-build
    time (before the quadratic join runs), naming the scale paths."""
    docs = _boilerplate_docs(spark)
    with pytest.raises(CandidateBudgetExceeded, match="lsh_near_dup_pairs"):
        prefix_filter_pairs(docs, nparts=4, candidate_budget=100)


def test_prefix_filter_budget_cap_degrade(spark):
    """on_over_budget='cap' degrades to the df-capped EXACT join: on
    the all-boilerplate fixture every shingle exceeds cap_df, so the
    capped pair set is empty — bounded cost, documented semantics."""
    docs = _boilerplate_docs(spark)
    out = prefix_filter_pairs(
        docs, nparts=4, candidate_budget=100, on_over_budget="cap", cap_df=10
    )
    assert out.count() == 0


def test_prefix_filter_budget_under_is_noop(spark):
    """Under budget, the guarded query equals the unguarded one — the
    registered catalog entry's hashes cannot move."""
    docs = _boilerplate_docs(spark, n=4)
    free = prefix_filter_pairs(docs, nparts=4, candidate_budget=None)
    guarded = prefix_filter_pairs(docs, nparts=4, candidate_budget=10**9)
    assert free.exceptAll(guarded).count() == 0
    assert guarded.exceptAll(free).count() == 0
    assert guarded.count() == 6  # identical docs: all 4C2 pairs at J=1


def test_embedding_lsh_budget_fails_fast(spark, monkeypatch):
    """The fixed-256-bucket embedding LSH join fails fast when the
    bucket-occupancy candidate bound exceeds its budget (the quadratic
    regime the round-9 10x run measured at 54.5x), naming the banded
    scale path."""
    from parcel_analytics_etl_notebook_spark.plans import queries_llm2

    monkeypatch.setattr(queries_llm2, "EMB_LSH_CANDIDATE_BUDGET", 10)
    qs = catalog.queries()
    with pytest.raises(
        CandidateBudgetExceeded, match="embedding_lsh_banded_pairs"
    ):
        qs["embedding_lsh_dedup_pairs"](spark, SF)


def test_embedding_lsh_banded_superset_recall(spark):
    """On the fixture, the banded variant's verified pair set covers
    every pair the single-bucket query finds that ALSO collides in a
    band — and both verify the same exact cosine, so any shared pair
    carries an identical score."""
    qs = catalog.queries()
    single = qs["embedding_lsh_dedup_pairs"](spark, SF).select(
        "id_a", "id_b", "cosine"
    )
    banded = qs["embedding_lsh_banded_pairs"](spark, SF).select(
        "id_a", "id_b", "cosine"
    )
    # scores agree exactly on shared pairs (same verification expr)
    j = single.alias("s").join(banded.alias("b"), ["id_a", "id_b"])
    assert j.filter(F.col("s.cosine") != F.col("b.cosine")).count() == 0
    assert banded.count() > 0


def test_fellegi_block_budget_fails_fast(spark, monkeypatch):
    """The constant-block-count (25 nations) linkage join fails fast
    when the block-occupancy pair bound exceeds its budget (the r09
    10x run measured 38.8x), naming the finer blocking keys."""
    from parcel_analytics_etl_notebook_spark.plans import (
        queries_relational20,
    )

    monkeypatch.setattr(queries_relational20, "FS_CANDIDATE_BUDGET", 10)
    qs = catalog.queries()
    with pytest.raises(
        CandidateBudgetExceeded, match="fellegi_sunter_snb_linkage"
    ):
        qs["fellegi_sunter_linkage"](spark, SF)
