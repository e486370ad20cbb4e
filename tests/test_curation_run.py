"""End-to-end smoke of the corpus-curation runner (plans/curation_run):
the composed funnel must be monotone, publish a readable curated
corpus + manifest that reconcile with each other, and honor its
invariants (no exact dups survive, every survivor passes the quality
gate, per-language budgets hold)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import normalize_text
from parcel_analytics_etl_notebook_spark.plans.curation_run import run_curation

SF = "/root/testdata/sf0.001"
BUDGET = 3000


def test_curation_funnel_end_to_end(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "curated_run")
    os.makedirs(out)
    result = run_curation(
        spark, docs, out, lang_token_budget=BUDGET, holdout_pct=5
    )
    funnel = result["funnel"]

    # funnel shape: all stages present, docs monotonically nonincreasing
    assert [s["stage"] for s in funnel] == [
        "raw", "quality", "exact_dedup", "near_dedup",
        "decontaminated", "budgeted",
    ]
    doc_counts = [s["docs"] for s in funnel]
    assert doc_counts == sorted(doc_counts, reverse=True)
    assert funnel[0]["docs"] == docs.count()
    assert funnel[-1]["docs"] > 0  # the pipeline must not strip everything

    # the published corpus is the budgeted stage, partitioned by lang
    curated = spark.read.parquet(os.path.join(out, "curated"))
    assert curated.count() == funnel[-1]["docs"]
    assert os.path.isdir(os.path.join(out, "curated"))
    assert any(
        d.startswith("lang=")
        for d in os.listdir(os.path.join(out, "curated"))
        if os.path.isdir(os.path.join(out, "curated", d))
    )

    # invariant: no two survivors share normalized content (exact dedup)
    n_hashes = (
        curated.select(F.sha2(normalize_text("text"), 256).alias("h"))
        .distinct()
        .count()
    )
    assert n_hashes == curated.count()

    # invariant: per-language token budget holds exactly
    per_lang = curated.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    assert per_lang and all(r["t"] <= BUDGET for r in per_lang)

    # manifest reconciles with the published corpus
    manifest = spark.read.parquet(os.path.join(out, "manifest"))
    m_docs = manifest.agg(F.sum("n_docs")).first()[0]
    m_toks = manifest.agg(F.sum("n_tokens")).first()[0]
    assert m_docs == funnel[-1]["docs"]
    assert m_toks == funnel[-1]["tokens"]
    c = curated.groupBy("lang", "source").count().collect()
    m = {(r["lang"], r["source"]): r["n_docs"] for r in manifest.collect()}
    assert {(r["lang"], r["source"]): r["count"] for r in c} == m

    # funnel audit JSON matches the returned funnel
    with open(os.path.join(out, "funnel.json")) as f:
        assert json.load(f) == funnel


def test_curation_is_deterministic(spark, tmp_path):
    """Two runs over the same input publish the identical doc-id set —
    every stage (hash dedup tiebreaks, LSH grouping, hash holdout,
    budget order) is deterministic by construction."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ids = []
    for d in ("a", "b"):
        out = str(tmp_path / d)
        os.makedirs(out)
        run_curation(spark, docs, out, lang_token_budget=BUDGET)
        ids.append(
            sorted(
                r["doc_id"]
                for r in spark.read.parquet(os.path.join(out, "curated"))
                .select("doc_id")
                .collect()
            )
        )
    assert ids[0] == ids[1]


def test_curation_quarantines_invalid_docs(spark, tmp_path):
    """NULL/empty-text rows must land in the quarantine side-output
    with a reason — never in the funnel, never silently dropped."""
    import os

    base = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text", "lang", "source")
        .limit(20)
    )
    dirty = base.unionByName(
        spark.createDataFrame(
            [
                (900001, None, "en", "web"),
                (900002, "", "fr", "wiki"),
                (900003, "   ", "de", "web"),
            ],
            "doc_id bigint, text string, lang string, source string",
        )
    )
    out = str(tmp_path / "qrun")
    os.makedirs(out)
    result = run_curation(spark, dirty, out)
    assert result["quarantined"] == 3
    q = spark.read.parquet(os.path.join(out, "quarantine"))
    reasons = {r["doc_id"]: r["reason"] for r in q.collect()}
    assert reasons == {
        900001: "null_text", 900002: "empty_text", 900003: "empty_text"
    }
    # the funnel starts from the VALID rows only
    assert result["funnel"][0]["docs"] == 20
