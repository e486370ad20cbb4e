"""Executable end-to-end LLM training-data curation: the corpus
counterpart of plans/parcel_run.py. One run takes a raw documents
table through the standard curation funnel —

    quality filter → exact dedup → MinHash-LSH near-dedup →
    holdout decontamination → per-language token budget →
    partitioned parquet + manifest + funnel audit

— composed entirely from the engine's tested operators (textqa,
dedup, dedup_fuzzy, graph). Each stage is the scale shape its
operator module documents: no all-pairs joins (LSH banding with
bucket caps), no driver-side row data (funnel counts are 1-row
aggregates), one persist per reused frontier.

The reference repo has no corpus pipeline (its domain is parcel
events); this runner is the BASELINE.json north-star deliverable —
"a user could run their whole curation job on this engine" — made
concrete and smoke-tested.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from parcel_analytics_etl_notebook_spark.functions.textfns import (
    normalize_text,
    tokens,
)
from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
    lsh_candidate_pairs,
    with_minhash,
)
from parcel_analytics_etl_notebook_spark.operators.graph import (
    dup_groups_from_pairs,
)
from parcel_analytics_etl_notebook_spark.operators.textqa import (
    doc_fingerprint,
    quality_features,
)
from parcel_analytics_etl_notebook_spark.sources.writers import write_parquet


def _stage_counts(df: DataFrame) -> tuple[int, int]:
    row = df.agg(
        F.count(F.lit(1)).alias("docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("toks"),
    ).first()
    return int(row["docs"]), int(row["toks"])


def run_curation(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    *,
    lang_token_budget: int | None = None,
    holdout_pct: int = 5,
    lsh_bands: int = 4,
    target_files: int = 2,
) -> dict:
    """Run the curation funnel over ``docs`` (doc_id, text, lang,
    source); write curated parquet (partitioned by lang), a per-
    (lang, source) manifest, and a funnel audit JSON under
    ``out_dir``. Returns the funnel as a list of
    ``{stage, docs, tokens}`` dicts (docs monotonically nonincreasing).

    ``lang_token_budget``: optional per-language token cap applied in
    deterministic doc_id order (the reproducible "subset to N tokens
    per language" draw). ``holdout_pct``: percent of docs hashed into
    the decontamination holdout; TRAIN docs sharing a content
    fingerprint with any holdout doc are removed (split-leak guard).
    """
    funnel: list[dict] = []

    typed = docs.select(
        "doc_id", "text", "lang", "source", F.size(tokens("text")).cast("bigint").alias("n_tokens")
    )
    # invalid rows are DATA: quarantine them with a reason instead of
    # letting NULL text ride silently through every downstream hash
    reason = (
        F.when(F.col("doc_id").isNull(), "null_id")
        .when(F.col("text").isNull(), "null_text")
        .when(F.col("n_tokens") == 0, "empty_text")
    )
    quarantine = typed.withColumn("reason", reason).filter(
        F.col("reason").isNotNull()
    )
    write_parquet(
        quarantine, os.path.join(out_dir, "quarantine"), target_files=1
    )
    n_quarantined = quarantine.count()

    base = typed.filter(reason.isNull()).persist(StorageLevel.DISK_ONLY)
    funnel.append(dict(zip(("stage", "docs", "tokens"), ("raw", *_stage_counts(base)))))

    # 1. cheap quality pre-filters (length / uniqueness heuristics)
    q = quality_features(base.select("doc_id", "text"))
    quality = (
        base.join(q.filter("quality_flag").select("doc_id"), "doc_id", "left_semi")
        .persist(StorageLevel.DISK_ONLY)
    )
    funnel.append(dict(zip(("stage", "docs", "tokens"), ("quality", *_stage_counts(quality)))))

    # 2. exact dedup: keep the lowest doc_id per normalized-content hash
    #    (one shuffle on the 256-bit hash; uniform, skew-free)
    wmin = Window.partitionBy(F.sha2(normalize_text("text"), 256)).orderBy("doc_id")
    exact = (
        quality.withColumn("__rn", F.row_number().over(wmin))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .persist(StorageLevel.DISK_ONLY)
    )
    funnel.append(dict(zip(("stage", "docs", "tokens"), ("exact_dedup", *_stage_counts(exact)))))

    # 3. near-dup dedup: MinHash signatures → banded LSH candidate
    #    pairs (bucket-capped, never all-pairs) → connected components
    #    → keep each group's min-id canonical
    sigs = with_minhash(exact.select("doc_id", "text"))
    pairs = lsh_candidate_pairs(sigs, bands=lsh_bands).select("id_a", "id_b")
    groups = dup_groups_from_pairs(pairs)
    near = (
        exact.join(groups, "doc_id", "left")
        .filter(
            F.col("canonical_id").isNull()
            | (F.col("canonical_id") == F.col("doc_id"))
        )
        .drop("canonical_id")
        .persist(StorageLevel.DISK_ONLY)
    )
    funnel.append(dict(zip(("stage", "docs", "tokens"), ("near_dedup", *_stage_counts(near)))))

    # 4. decontamination: deterministic holdout split by id hash; drop
    #    TRAIN docs whose token fingerprint appears in the holdout
    #    (anti-join on the fingerprint — one shuffle of (id, hash))
    fp = near.withColumn("__fp", doc_fingerprint(tokens("text"))).withColumn(
        "__holdout", F.pmod(F.xxhash64("doc_id"), F.lit(100)) < holdout_pct
    )
    holdout_fps = fp.filter("__holdout").select("__fp").distinct()
    train = (
        fp.filter(~F.col("__holdout"))
        .join(holdout_fps, "__fp", "left_anti")
        .drop("__fp", "__holdout")
        .persist(StorageLevel.DISK_ONLY)
    )
    funnel.append(dict(zip(("stage", "docs", "tokens"), ("decontaminated", *_stage_counts(train)))))

    # 5. optional per-language token budget, deterministic doc_id order
    #    (running sum over the lang partition — one key shuffle; a doc
    #    is kept only if it fits entirely within the remaining budget)
    curated = train
    if lang_token_budget is not None:
        wrun = (
            Window.partitionBy("lang")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        curated = (
            train.withColumn("__cum", F.sum("n_tokens").over(wrun))
            .filter(F.col("__cum") <= lang_token_budget)
            .drop("__cum")
            .persist(StorageLevel.DISK_ONLY)
        )
    funnel.append(dict(zip(("stage", "docs", "tokens"), ("budgeted", *_stage_counts(curated)))))

    # 6. publish: curated corpus partitioned by lang + manifest + audit.
    # A partitionBy write of an EMPTY frame emits no data files at all
    # — the directory then fails schema inference on read. The funnel
    # already counted the stage, so an empty publish switches to a
    # plain write, which materializes a zero-row file WITH the schema
    # (readable, schema-stable downstream).
    write_parquet(
        curated,
        os.path.join(out_dir, "curated"),
        partition_by=["lang"] if funnel[-1]["docs"] > 0 else None,
        target_files=target_files,
    )
    manifest = (
        curated.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("lang", "source")
    )
    write_parquet(manifest, os.path.join(out_dir, "manifest"), target_files=1)
    with open(os.path.join(out_dir, "funnel.json"), "w") as f:
        json.dump(funnel, f, indent=1)
    # unpersist ONLY after everything is published: releasing an
    # upstream cache while a later stage still holds it in its logical
    # plan trips a CacheManager rebuild NPE inside the components
    # fixpoint's localCheckpoint (Spark 4.1, tryRebuildCacheEntry on a
    # session-less cached plan) — observed at the 150k-doc scale smoke.
    # One batch release at the end is also simply the safer lifetime:
    # every stage frame is model/corpus-projection-sized, not payload-
    # sized, so holding the caches to the end costs little.
    for frame in (base, quality, exact, near, train, curated):
        frame.unpersist()
    return {"out": out_dir, "funnel": funnel, "quarantined": n_quarantined}


def main(argv: list[str] | None = None) -> int:
    import argparse
    import tempfile

    from parcel_analytics_etl_notebook_spark.session import get_spark

    parser = argparse.ArgumentParser(prog="corpus-curation")
    parser.add_argument(
        "--sf-dir", default="/root/testdata/sf0.001",
        help="directory holding documents.parquet",
    )
    parser.add_argument("--out", default=None)
    parser.add_argument("--lang-token-budget", type=int, default=None)
    parser.add_argument("--holdout-pct", type=int, default=5)
    args = parser.parse_args(argv)

    out_dir = args.out or tempfile.mkdtemp(prefix="curated_corpus_")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="corpus-curation")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    result = run_curation(
        spark, docs, out_dir,
        lang_token_budget=args.lang_token_budget,
        holdout_pct=args.holdout_pct,
    )
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
