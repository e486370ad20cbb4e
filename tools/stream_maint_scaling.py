"""Measure the streaming near-dup maintenance loop's per-batch cost
against STANDING-STATE size (VERDICT r09 #6): the loop's claim is that
a micro-batch probe is O(batch × bucket occupancy), never O(corpus),
so a FIXED batch applied to a 10× standing corpus must cost far less
than 10× the 1× wall.

Protocol: backfill the standing state as one batch 0 (sf0.1's 5,000
docs vs scaledata/x10's 50,000), then time apply_batch on the SAME
fixed 500-doc delta (sf0.1 texts under shifted doc_ids — near-dup-rich
against the standing corpus, the expensive realistic case) against
each standing state. Backfill wall is reported separately (it is the
one-time O(corpus) cost by definition). Best-of-RUNS per state, fresh
state root per run (an applied batch would otherwise be standing for
the next run).

Run: ``python tools/gen_scaledata.py && python tools/stream_maint_scaling.py``
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1/documents.parquet"
#: standing-state tier (default x10; SPARK_GRAFT_SCALE_TIER=x100 after
#: an x100 gen_scaledata.py run pins the occupancy-bound claim one
#: decade further — VERDICT r10 #7)
TIER = os.environ.get("SPARK_GRAFT_SCALE_TIER", "x10")
X10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scaledata", TIER, "documents.parquet",
)
STANDING_RATIO = float(TIER.lstrip("x"))
DELTA_N = 500
RUNS = 2


def main() -> None:
    from pyspark.sql import functions as F

    from parcel_analytics_etl_notebook_spark.plans import catalog
    from parcel_analytics_etl_notebook_spark.session import get_spark
    from parcel_analytics_etl_notebook_spark.streaming.dedup_maintenance import (
        near_dup_maintenance_sink,
    )

    spark = get_spark(
        app_name="stream-maint-scaling",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "32g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # fixed delta: 500 sf0.1 texts under doc_ids far above both corpora
    delta = (
        spark.read.parquet(BASE)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(DELTA_N)
        .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
        .persist()
    )
    delta.count()

    # warmup: one full backfill+probe on a throwaway root, so neither
    # measured state pays the one-time codegen/compile of the banding
    # and probe stages (without this, whichever state runs first reads
    # ~2x slower than it is)
    warm_root = tempfile.mkdtemp(prefix="maint_warm_")
    try:
        warm = near_dup_maintenance_sink(warm_root, threshold=0.2)
        warm(spark.read.parquet(BASE).select("doc_id", "text"), 0)
        warm(delta, 1)
    finally:
        shutil.rmtree(warm_root, ignore_errors=True)

    out = {}
    for tag, src in (("sf0.1", BASE), (TIER, X10)):
        docs = spark.read.parquet(src).select("doc_id", "text")
        n_standing = docs.count()
        backfill_walls, probe_walls = [], []
        for _ in range(RUNS):
            root = tempfile.mkdtemp(prefix=f"maint_{tag}_")
            try:
                sink = near_dup_maintenance_sink(root, threshold=0.2)
                catalog.release_caches(spark)
                t0 = time.perf_counter()
                sink(docs, 0)
                backfill_walls.append(time.perf_counter() - t0)
                catalog.release_caches(spark)
                # release_caches unpersisted the delta frame too —
                # re-materialize it OUTSIDE the timed window so the
                # probe wall measures maintenance work only, not the
                # delta's re-read/order/limit (ADVICE r10 #5)
                delta.persist()
                delta.count()
                t0 = time.perf_counter()
                sink(delta, 1)
                probe_walls.append(time.perf_counter() - t0)
            finally:
                shutil.rmtree(root, ignore_errors=True)
        out[tag] = {
            "standing_docs": n_standing,
            "backfill_s": round(min(backfill_walls), 2),
            "probe_batch_s": round(min(probe_walls), 2),
        }
        print(f"{tag}: standing={n_standing} backfill={out[tag]['backfill_s']}s "
              f"probe({DELTA_N}-doc batch)={out[tag]['probe_batch_s']}s",
              flush=True)
    ratio = round(out[TIER]["probe_batch_s"] / out["sf0.1"]["probe_batch_s"], 2)
    print(json.dumps({"delta_docs": DELTA_N, "standing_ratio": STANDING_RATIO,
                      "probe_wall_ratio": ratio, "states": out}))
    spark.stop()


if __name__ == "__main__":
    main()
