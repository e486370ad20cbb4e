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


def test_curation_degenerate_corpora(spark, tmp_path):
    """Degenerate inputs must flow through the whole funnel without
    crashing: an all-identical corpus collapses to ONE survivor, an
    all-invalid corpus quarantines everything and publishes an empty
    (but readable) corpus, and a singleton corpus passes through
    unchanged — the empty-frame paths of LSH banding and the
    connected-components fixpoint are what these exercise."""
    import os

    # ≥20 tokens, all distinct: passes the quality gate (a repeated
    # pangram fails its 0.3 uniqueness heuristic — correctly)
    text = " ".join(f"word{i}" for i in range(40))

    # 1. all byte-identical → exact dedup keeps exactly one
    same = spark.createDataFrame(
        [(i, text, "en", "web") for i in range(8)],
        "doc_id bigint, text string, lang string, source string",
    )
    out1 = str(tmp_path / "same")
    os.makedirs(out1)
    r1 = run_curation(spark, same, out1)
    f1 = {s["stage"]: s["docs"] for s in r1["funnel"]}
    assert f1["exact_dedup"] == 1 and f1["budgeted"] == 1
    assert spark.read.parquet(os.path.join(out1, "curated")).count() == 1

    # 2. nothing valid → everything quarantined, empty publish survives
    junk = spark.createDataFrame(
        [(1, None, "en", "web"), (2, "", "fr", "web"), (3, "   ", "de", "wiki")],
        "doc_id bigint, text string, lang string, source string",
    )
    out2 = str(tmp_path / "junk")
    os.makedirs(out2)
    r2 = run_curation(spark, junk, out2)
    assert r2["quarantined"] == 3
    assert all(s["docs"] == 0 for s in r2["funnel"])
    assert spark.read.parquet(os.path.join(out2, "curated")).count() == 0

    # 3. singleton corpus → passes every stage intact
    one = spark.createDataFrame(
        [(7, text, "en", "wiki")],
        "doc_id bigint, text string, lang string, source string",
    )
    out3 = str(tmp_path / "one")
    os.makedirs(out3)
    r3 = run_curation(spark, one, out3)
    f3 = {s["stage"]: s["docs"] for s in r3["funnel"]}
    assert f3["budgeted"] in (0, 1)  # holdout hashing may claim it
    pub = spark.read.parquet(os.path.join(out3, "curated"))
    assert pub.count() == f3["budgeted"]
