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
