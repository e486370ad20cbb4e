"""Streaming near-dup maintenance: the incremental LSH loop as a
foreachBatch pipeline converges to the batch recompute in ANY arrival
order — the property that makes backfill + daily deltas trustworthy."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
    lsh_candidate_pairs,
    with_minhash,
)
from parcel_analytics_etl_notebook_spark.streaming.dedup_maintenance import (
    _batch_sets,
    run_maintenance_stream,
)

SF = "/root/testdata/sf0.001"


def _batch_recompute(spark, docs):
    """The recompute-the-world answer: full LSH self-join (uncapped)
    verified with exact Jaccard >= 0.2 over uncapped distinct-shingle
    sets — what the streaming state must converge to."""
    sig = with_minhash(docs, num_hashes=16)
    cand = lsh_candidate_pairs(sig, bands=4, sig_len=16, max_bucket=None)
    sets = _batch_sets(docs)
    sa = sets.select(
        F.col("doc_id").alias("id_a"),
        F.col("sh_set").alias("set_a"),
        F.col("n").alias("na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("id_b"),
        F.col("sh_set").alias("set_b"),
        F.col("n").alias("nb"),
    )
    shared = F.size(F.array_intersect("set_a", "set_b")).cast("bigint")
    jac = shared / (F.col("na") + F.col("nb") - shared)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.2)
        .select("id_a", "id_b")
    )


def test_stream_maintenance_converges_to_batch_recompute(spark, tmp_path):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(400)
        .cache()
    )
    # three arrival batches as three parquet files (file source feeds
    # one per micro-batch via maxFilesPerTrigger=1)
    docs_dir = str(tmp_path / "docs_in")
    os.makedirs(docs_dir)
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(docs_dir)

    state = str(tmp_path / "state")
    run_maintenance_stream(
        spark, docs_dir, state, str(tmp_path / "ckpt"), threshold=0.2
    )

    pairs = spark.read.parquet(os.path.join(state, "pairs"))
    # 1. no pair is emitted twice across the stream's lifetime
    assert pairs.count() == pairs.select("id_a", "id_b").distinct().count()
    # 2. convergence: pair set == batch recompute over the full corpus
    got = pairs.select("id_a", "id_b")
    want = _batch_recompute(spark, docs)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert want.count() > 0  # the fixture genuinely has near-dups
    # 3. the loop was genuinely incremental: pairs arrived across
    # multiple micro-batches (a pair lands in the batch of its LATER
    # doc, and the fixture's dups straddle batch boundaries)
    assert pairs.select("batch_id").distinct().count() >= 2


def _state_with_batches(spark, tmp_path, batches):
    """Drive apply_batch directly (unit-grain; the streaming harness is
    proven above) over explicit (batch_id, docs_df) steps."""
    from parcel_analytics_etl_notebook_spark.streaming.dedup_maintenance import (
        near_dup_maintenance_sink,
    )

    state = str(tmp_path / "state")
    sink = near_dup_maintenance_sink(state, threshold=0.2)
    for bid, df in batches:
        sink(df, bid)
    return state


def test_recrawl_supersedes_and_reconverges(spark, tmp_path):
    """A re-crawl (same doc_id, new text) kills the doc's stale pairs
    at read time and re-emits whichever still verify — live_pairs
    converges to the batch recompute over the FINAL corpus (latest
    text per doc), while the raw append-only pair table still holds
    the dead rows until compaction."""
    from parcel_analytics_etl_notebook_spark.streaming.dedup_maintenance import (
        compact_state,
        live_pairs,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
        .cache()
    )
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    # batch 2 re-crawls half of b0's docs with UNRELATED new text (a
    # unique token soup per doc): their old near-dup pairs must die and
    # (being unrelated) not come back
    recrawled = b0.filter(F.col("doc_id") % 4 == 0).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.lit("zq"),
            F.col("doc_id").cast("string"),
            F.lit("xv"),
            (F.col("doc_id") * 7).cast("string"),
            F.lit("wk"),
            (F.col("doc_id") * 13).cast("string"),
        ).alias("text"),
    )
    state = _state_with_batches(
        spark, tmp_path, [(0, b0), (1, b1), (2, recrawled)]
    )

    final_corpus = docs.join(
        recrawled.select("doc_id"), "doc_id", "left_anti"
    ).unionByName(recrawled)
    want = _batch_recompute(spark, final_corpus)
    got = live_pairs(spark, state).select("id_a", "id_b")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert want.count() > 0

    # the raw table still holds superseded rows (append-only), and at
    # least one pair genuinely died with the re-crawl
    import os

    got_cnt = got.count()  # materialize BEFORE compaction swaps files
    raw = spark.read.parquet(os.path.join(state, "pairs"))
    assert raw.count() > got_cnt

    # compaction drops the dead rows without changing the live answer
    compact_state(spark, state)
    raw2 = spark.read.parquet(os.path.join(state, "pairs"))
    assert raw2.count() == got_cnt
    got2 = live_pairs(spark, state).select("id_a", "id_b")
    assert got2.exceptAll(want).count() == 0
    assert want.exceptAll(got2).count() == 0


def test_recrawl_same_text_is_noop_for_live_pairs(spark, tmp_path):
    """Re-crawling docs with IDENTICAL text changes nothing in the live
    view: the re-crawl batch re-finds and re-emits the same pairs under
    its own wb, superseding rather than duplicating."""
    from parcel_analytics_etl_notebook_spark.streaming.dedup_maintenance import (
        live_pairs,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
        .cache()
    )
    resend = docs.filter(F.col("doc_id") % 5 == 0)
    state = _state_with_batches(spark, tmp_path, [(0, docs), (1, resend)])
    want = _batch_recompute(spark, docs)
    got = live_pairs(spark, state).select("id_a", "id_b")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() == got.distinct().count()
