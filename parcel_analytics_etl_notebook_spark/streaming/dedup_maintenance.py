"""Streaming near-dup maintenance: the incremental LSH delta loop
(``plans/queries_llm19.incremental_lsh_apply_delta``) as an actual
Structured Streaming pipeline.

Each document micro-batch probes the STANDING corpus state (banded
MinHash signatures + verified shingle sets, both append-only parquet
tables) for LSH bucket collisions, verifies candidates with exact
Jaccard, appends the verified pair DELTA to the pair table, then
appends its own bands/sets to the standing state — exactly the
``pairs' = pairs ∪ delta`` semantics, executed per micro-batch via
``foreachBatch`` (the loop is stateful across batches through the
tables themselves, the standard pattern for state larger than the
keyed-state store should hold).

Convergence property (pinned in tests/test_streaming_dedup_maint.py):
with no hot-bucket cap, a pair's LSH bucket collision is detected
exactly once — when its LATER doc arrives (the earlier one is standing
by then; same-batch pairs dedup via least/greatest) — so after any
partition of the corpus into arrival batches the pair table equals the
batch self-join recompute, in any arrival order. That order-
independence is what makes the maintenance loop trustworthy: a
backfill + N daily deltas ends byte-identical to recompute-the-world.

Scale shape per micro-batch: banding the batch is O(batch); the
candidate join shuffles the batch's bucket keys against the standing
bands table — at 100 TB that table is bucketed parquet (written by the
backfill, bucket-pruned by the batch's keys), so the probe is
O(batch × bucket occupancy), never O(corpus). The pair/bands/sets
appends are O(batch). Nothing rescans the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import tokens
from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
    lsh_banded,
    poly_hash,
    shingle_hashes_from_tokens,
    with_minhash,
)

#: standing-state subdirectories under the maintenance root
BANDS_DIR, SETS_DIR, PAIRS_DIR = "bands", "sets", "pairs"


def _batch_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band, sig_band) rows for a batch — the bucket keys the
    batch probes and then contributes to the standing table. No
    hot-bucket cap here: capping is a per-PROBE cost decision (see
    apply-delta's per-population recount); the maintenance default
    keeps recall exact so the convergence property holds."""
    sig = with_minhash(docs, num_hashes=16)
    return lsh_banded(sig, bands=4, sig_len=16, max_bucket=None).select(
        "doc_id", "band", "sig_band"
    )


def _batch_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, sh_set, n) distinct-shingle sets for exact-Jaccard
    verification. Uncapped: the set definition must be corpus-
    independent so a pair verifies identically whenever it is found."""
    nparts = docs.sparkSession.sparkContext.defaultParallelism
    tok_hashes = F.transform(tokens("text"), lambda t: poly_hash(t))
    th = docs.select("doc_id", tok_hashes.alias("__th")).repartition(nparts)
    sh = th.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingle_hashes_from_tokens(F.col("__th"), 3))
        ).alias("shingle"),
    )
    return sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("shingle")).alias("sh_set"),
        F.count(F.lit(1)).alias("n"),
    )


def near_dup_maintenance_sink(state_root: str, threshold: float = 0.2):
    """foreachBatch sink maintaining ``state_root/{bands,sets,pairs}``.

    Returns the (batch_df, batch_id) callable to pass to
    ``writeStream.foreachBatch``. Pair rows: (id_a, id_b, jaccard,
    batch_id) with id_a < id_b, unique across the stream's lifetime —
    every pair is emitted by exactly the micro-batch that completes it.
    """
    bands_path = os.path.join(state_root, BANDS_DIR)
    sets_path = os.path.join(state_root, SETS_DIR)
    pairs_path = os.path.join(state_root, PAIRS_DIR)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs = batch_df.select("doc_id", "text")
        nb = _batch_bands(docs).persist()
        ns = _batch_sets(docs).persist()

        standing = None
        if os.path.isdir(bands_path):
            standing = spark.read.parquet(bands_path)
        probe_target = (
            nb if standing is None else nb.unionByName(standing)
        )
        a, b = nb.alias("a"), probe_target.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.sig_band") == F.col("b.sig_band"))
                & (F.col("a.doc_id") != F.col("b.doc_id")),
            )
            .select(
                F.least("a.doc_id", "b.doc_id").alias("id_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("id_b"),
            )
            .dropDuplicates()
        )
        # a batch×standing pair is found only from the batch side, but a
        # batch×batch pair appears from both docs' probes — the
        # least/greatest + dropDuplicates above collapses it. Pairs
        # whose BOTH docs are standing cannot appear: neither side is
        # in `a`.
        all_sets = ns
        if os.path.isdir(sets_path):
            all_sets = ns.unionByName(spark.read.parquet(sets_path))
        sa = all_sets.select(
            F.col("doc_id").alias("id_a"),
            F.col("sh_set").alias("set_a"),
            F.col("n").alias("na"),
        )
        sb = all_sets.select(
            F.col("doc_id").alias("id_b"),
            F.col("sh_set").alias("set_b"),
            F.col("n").alias("nb"),
        )
        shared = F.size(F.array_intersect("set_a", "set_b")).cast("bigint")
        jac = shared / (F.col("na") + F.col("nb") - shared)
        delta = (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(jac >= threshold)
            .select(
                "id_a",
                "id_b",
                F.round(jac, 4).alias("jaccard"),
                F.lit(batch_id).cast("bigint").alias("batch_id"),
            )
        )
        # delta FIRST, then state: if the job dies between the two
        # appends, replaying the batch re-emits the same delta rows
        # (dedup on (id_a, id_b) downstream) but never loses pairs a
        # future batch would no longer find (its docs would already be
        # standing, so the probe-side would skip them).
        delta.write.mode("append").parquet(pairs_path)
        nb.write.mode("append").parquet(bands_path)
        ns.select("doc_id", "sh_set", "n").write.mode("append").parquet(
            sets_path
        )
        nb.unpersist()
        ns.unpersist()

    return apply_batch


def run_maintenance_stream(
    spark, docs_dir: str, state_root: str, checkpoint: str,
    threshold: float = 0.2, max_files_per_trigger: int = 1,
):
    """Drive the maintenance loop over a parquet directory of document
    files with Trigger.AvailableNow (tests) — in production the same
    sink hangs off a Kafka/file stream and runs continuously."""
    schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            near_dup_maintenance_sink(state_root, threshold)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
