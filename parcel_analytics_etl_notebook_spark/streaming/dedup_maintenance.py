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

RE-CRAWLS (same doc_id, new text) are first-class: state rows carry
their write batch (``wb``) and a doc-grain version ledger records each
arrival, so a re-crawled doc's old bands/sets/pairs are superseded at
read time (:func:`_live_rows` / :func:`live_pairs`) and physically
dropped by the periodic :func:`compact_state` — the log-structured
upsert pattern for append-only parquet state. A re-crawl batch probes
with the NEW fingerprint, so stale pairs die and still-valid ones are
re-emitted in the same batch.

Scale shape per micro-batch: banding the batch is O(batch); the
candidate join shuffles the batch's bucket keys against the standing
bands table — at 100 TB that table is bucketed parquet (written by the
backfill, bucket-pruned by the batch's keys), so the probe is
O(batch × bucket occupancy), never O(corpus). The pair/bands/sets
appends are O(batch); the version ledger is doc-grain and broadcasts.
Nothing rescans the corpus.
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
#: doc-grain version ledger: one (doc_id, wb) row per arrival; a doc's
#: LIVE version is its max wb. This is what makes RE-CRAWLS (same id,
#: new text) correct on append-only parquet: old bands/sets/pairs are
#: never deleted in place — they are superseded at read time (the
#: log-structured-store pattern; :func:`compact_state` is the periodic
#: rewrite that physically drops dead rows).
VERSIONS_DIR = "versions"


def _batch_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band, sig_band) rows for a batch — the bucket keys the
    batch probes and then contributes to the standing table. No
    hot-bucket cap here: capping is a per-PROBE cost decision (see
    apply-delta's per-population recount); the maintenance default
    keeps recall exact so the convergence property holds.

    ``persist=False``: the caller persists the (wb-stamped) result
    itself, and a continuously-running stream must not leak one
    internally-cached banded frame per micro-batch (ADVICE r09 #3 —
    ``lsh_banded``'s default persist is for batch callers that rely on
    bench-style ``clearCache`` between queries)."""
    sig = with_minhash(docs, num_hashes=16)
    return lsh_banded(
        sig, bands=4, sig_len=16, max_bucket=None, persist=False
    ).select("doc_id", "band", "sig_band")


def _versions_or_none(spark, versions_path: str) -> DataFrame | None:
    """The version ledger, or ``None`` if it does not exist yet.

    Crash-replay guard (ADVICE r09 #1): batch writes go delta → bands →
    sets → versions, so a crash between the bands append and the
    versions append leaves state tables WITHOUT a ledger. On checkpoint
    replay that state is reachable only for the FIRST batch (later
    batches find the ledger from their predecessors), and with no
    completed versions append no re-crawl supersede has been recorded —
    every standing row is live. Treating a missing ledger as
    "everything live" is therefore exact, and it un-wedges the replay
    instead of raising AnalysisException forever."""
    if not os.path.isdir(versions_path):
        return None
    return spark.read.parquet(versions_path)


def _live_or_all(rows: DataFrame, versions: DataFrame | None) -> DataFrame:
    """:func:`_live_rows` when a ledger exists, identity when not."""
    return rows if versions is None else _live_rows(rows, versions)


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
    versions_path = os.path.join(state_root, VERSIONS_DIR)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs = batch_df.select("doc_id", "text")
        wb = F.lit(batch_id).cast("bigint")
        nb = _batch_bands(docs).withColumn("wb", wb).persist()
        ns = _batch_sets(docs).withColumn("wb", wb).persist()
        batch_ids = docs.select("doc_id")

        versions = _versions_or_none(spark, versions_path)
        standing = None
        if os.path.isdir(bands_path):
            # live-version filter: a doc RE-CRAWLED by an earlier batch
            # left its superseded bands in the append-only table; keep
            # only each doc's max-wb rows. Then drop docs the CURRENT
            # batch re-crawls — their new bands replace the old ones in
            # this probe (versions for this batch are appended below).
            # A missing ledger (crash before the first versions append)
            # means all standing rows are live — see _versions_or_none.
            standing = _live_or_all(
                spark.read.parquet(bands_path), versions
            ).join(batch_ids, on="doc_id", how="left_anti")
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
            live_sets = _live_or_all(
                spark.read.parquet(sets_path), versions
            ).join(batch_ids, on="doc_id", how="left_anti")
            all_sets = ns.unionByName(
                live_sets.select("doc_id", "sh_set", "n", "wb")
            )
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
        # delta FIRST, then state, then versions: if the job dies
        # mid-batch, replaying it re-emits the same delta rows (dedup
        # on (id_a, id_b, batch_id) downstream) but never loses pairs a
        # future batch would no longer find (its docs would already be
        # standing, so the probe-side would skip them). Versions LAST:
        # a re-crawl only supersedes old state once its replacement
        # bands/sets are durably written.
        delta.write.mode("append").parquet(pairs_path)
        nb.write.mode("append").parquet(bands_path)
        ns.select("doc_id", "sh_set", "n", "wb").write.mode(
            "append"
        ).parquet(sets_path)
        batch_ids.withColumn("wb", wb).write.mode("append").parquet(
            versions_path
        )
        nb.unpersist()
        ns.unpersist()

    return apply_batch


def _live_rows(rows: DataFrame, versions: DataFrame) -> DataFrame:
    """Read-time reconciliation: keep only each doc's rows from its
    LATEST arrival (max wb in the version ledger). Append-only parquet
    cannot delete superseded rows in place; this filter is the
    log-structured-store read path and :func:`compact_state` the
    physical cleanup. At 100 TB the ledger is doc-grain (tiny next to
    the corpus) and broadcast-joins against the bucketed state table."""
    latest = versions.groupBy("doc_id").agg(F.max("wb").alias("wb"))
    return rows.join(latest, on=["doc_id", "wb"], how="inner")


def live_pairs(spark, state_root: str) -> DataFrame:
    """The CURRENT pair table: a pair row is live iff it was written at
    or after BOTH its docs' latest arrivals — a re-crawl (same doc_id,
    new text) kills every stale pair of that doc at read time, and the
    re-crawl batch re-emits whichever pairs still verify against the
    new text. Unique on (id_a, id_b) by construction plus dedup (a
    crash-replayed batch may append its delta twice). A missing ledger
    (crash before the first versions append) means nothing has been
    superseded — every appended pair is live (see _versions_or_none)."""
    pairs = spark.read.parquet(os.path.join(state_root, PAIRS_DIR))
    versions = _versions_or_none(
        spark, os.path.join(state_root, VERSIONS_DIR)
    )
    if versions is None:
        return pairs.select(
            "id_a", "id_b", "jaccard", "batch_id"
        ).dropDuplicates(["id_a", "id_b"])
    latest = versions.groupBy("doc_id").agg(F.max("wb").alias("latest_wb"))
    va = latest.select(
        F.col("doc_id").alias("id_a"), F.col("latest_wb").alias("wa")
    )
    vb = latest.select(
        F.col("doc_id").alias("id_b"), F.col("latest_wb").alias("wb2")
    )
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .filter(
            (F.col("batch_id") >= F.col("wa"))
            & (F.col("batch_id") >= F.col("wb2"))
        )
        .select("id_a", "id_b", "jaccard", "batch_id")
        .dropDuplicates(["id_a", "id_b"])
    )


def _swap_in(path: str) -> None:
    """Atomically-enough replace ``path`` with ``path + '.compact'``
    (ADVICE r09 #2): the live directory is renamed ASIDE (``.old``)
    before the compacted one is renamed into place, so at no instant is
    the canonical path missing with the data only in ``.compact`` — a
    crash between the two renames leaves a recoverable ``.old`` that
    :func:`recover_state` restores or cleans up on startup. Each
    ``os.rename`` is atomic on POSIX; only the window BETWEEN them
    needs the recovery protocol."""
    import shutil

    old = path + ".old"
    shutil.rmtree(old, ignore_errors=True)  # stale leftover, data is live
    os.rename(path, old)
    os.rename(path + ".compact", path)
    shutil.rmtree(old)


def recover_state(state_root: str) -> None:
    """Repair a state root after a crash mid-:func:`compact_state`.

    Idempotent; call on startup (``run_maintenance_stream`` does, and
    ``compact_state`` re-runs it before writing). Cases per subdir:

    - ``path`` exists → live. Any ``.compact`` is an unswapped rewrite
      of the same live rows (drop it); any ``.old`` is a superseded
      pre-swap copy (drop it).
    - ``path`` missing, ``.old`` present → crashed between the two
      renames. If ``.compact`` survives, finish the swap (it holds the
      complete compacted table); else restore ``.old``.
    """
    import shutil

    for sub in (BANDS_DIR, SETS_DIR, PAIRS_DIR, VERSIONS_DIR):
        path = os.path.join(state_root, sub)
        tmp, old = path + ".compact", path + ".old"
        if os.path.isdir(path):
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(old, ignore_errors=True)
        elif os.path.isdir(old):
            if os.path.isdir(tmp):
                os.rename(tmp, path)
                shutil.rmtree(old)
            else:
                os.rename(old, path)


def compact_state(spark, state_root: str) -> None:
    """Physically drop superseded rows: rewrite bands/sets to each
    doc's live version and pairs to the live set. The periodic
    maintenance job that keeps read-time reconciliation cheap; safe to
    run between batches (never concurrently with one). Each table is
    rewritten to a ``.compact`` sibling and swapped in via
    :func:`_swap_in` (rename-aside, never delete-then-rename), so a
    crash at ANY point leaves either the original or the compacted
    table recoverable by :func:`recover_state`."""
    recover_state(state_root)
    versions = spark.read.parquet(os.path.join(state_root, VERSIONS_DIR))
    lp = live_pairs(spark, state_root).persist()
    lp.count()
    for sub in (BANDS_DIR, SETS_DIR):
        path = os.path.join(state_root, sub)
        live = _live_rows(spark.read.parquet(path), versions).persist()
        live.count()
        live.write.mode("overwrite").parquet(path + ".compact")
        live.unpersist()
        _swap_in(path)
    pairs_path = os.path.join(state_root, PAIRS_DIR)
    lp.write.mode("overwrite").parquet(pairs_path + ".compact")
    lp.unpersist()
    _swap_in(pairs_path)
    latest = versions.groupBy("doc_id").agg(F.max("wb").alias("wb")).persist()
    latest.count()
    vp = os.path.join(state_root, VERSIONS_DIR)
    latest.write.mode("overwrite").parquet(vp + ".compact")
    latest.unpersist()
    _swap_in(vp)
    # Spark caches file listings per path; after the swap the old
    # part-files are gone, so invalidate every rewritten directory or
    # the next read fails with FILE_NOT_EXIST
    for sub in (BANDS_DIR, SETS_DIR, PAIRS_DIR, VERSIONS_DIR):
        spark.catalog.refreshByPath(os.path.join(state_root, sub))


def run_maintenance_stream(
    spark, docs_dir: str, state_root: str, checkpoint: str,
    threshold: float = 0.2, max_files_per_trigger: int = 1,
):
    """Drive the maintenance loop over a parquet directory of document
    files with Trigger.AvailableNow (tests) — in production the same
    sink hangs off a Kafka/file stream and runs continuously."""
    recover_state(state_root)
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
