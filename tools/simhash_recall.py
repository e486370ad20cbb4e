"""Recall comparison: 16-bit SimHash banding (8-bit bands + hot-bucket
cap) vs the 64-bit 4×16-bit-band variant (VERDICT r08 #2).

For each corpus (sf0.1 and the 10× scale-up) report:

- pair counts of both registered queries and their overlap — the two
  paths measure hamming over DIFFERENT fingerprint widths, so this is
  a precision story: 16-bit hamming saturates (only 65,536 distinct
  fingerprints exist; unrelated docs collide at hamming 0), while
  64-bit hamming separates them;
- cap pressure: how many (band, value) buckets exceed MAX_LSH_BUCKET
  in each scheme and how many doc-slots that DROPS — the 16-bit path's
  silent recall loss at scale, vs zero for 16-bit-wide bands.

Run: ``python tools/simhash_recall.py`` (after tools/gen_scaledata.py).
Results go into SCALING.md's round-9 section.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
X10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scaledata", "x10",
)


def main() -> None:
    from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
        with_simhash,
        with_simhash_bands,
    )
    from parcel_analytics_etl_notebook_spark.plans import catalog
    from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
        MAX_LSH_BUCKET,
    )
    from parcel_analytics_etl_notebook_spark.session import get_spark

    spark = get_spark(
        app_name="simhash-recall",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()

    out = {}
    for tag, sf_dir in (("sf0.1", BASE), ("x10", X10)):
        catalog.release_caches(spark)
        p16 = (
            qs["simhash_near_dup_pairs"](spark, sf_dir)
            .select("id_a", "id_b")
            .cache()
        )
        p64 = (
            qs["simhash64_near_dup_pairs"](spark, sf_dir)
            .select("id_a", "id_b")
            .cache()
        )
        n16, n64 = p16.count(), p64.count()
        both = p16.join(p64, ["id_a", "id_b"]).count()

        docs = catalog.table(spark, sf_dir, "documents")
        f16 = with_simhash(docs, bits=16)
        b16 = f16.select(
            "doc_id", (F.col("simhash") % 256).alias("val"), F.lit(0).alias("band")
        ).unionByName(
            f16.select(
                "doc_id",
                (F.col("simhash") / 256).cast("bigint").alias("val"),
                F.lit(1).alias("band"),
            )
        )
        f64 = with_simhash_bands(docs)
        b64 = f64.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("band"),
                            F.col(f"band_{k}").alias("val"),
                        )
                        for k in range(4)
                    ]
                )
            ).alias("bv"),
        ).select("doc_id", "bv.band", "bv.val")

        def cap_pressure(banded):
            occ = banded.groupBy("band", "val").agg(
                F.count(F.lit(1)).alias("n")
            )
            hot = occ.filter(F.col("n") > MAX_LSH_BUCKET)
            row = hot.agg(
                F.count(F.lit(1)).alias("hot_buckets"),
                F.coalesce(F.sum("n"), F.lit(0)).alias("dropped_slots"),
            ).collect()[0]
            return int(row["hot_buckets"]), int(row["dropped_slots"])

        hb16, drop16 = cap_pressure(b16)
        hb64, drop64 = cap_pressure(b64)
        out[tag] = {
            "pairs_16bit_ham3": n16,
            "pairs_64bit_ham3": n64,
            "pairs_in_both": both,
            "hot_buckets_16bit": hb16,
            "dropped_doc_slots_16bit": drop16,
            "hot_buckets_64bit": hb64,
            "dropped_doc_slots_64bit": drop64,
        }
        print(tag, json.dumps(out[tag]), flush=True)
        p16.unpersist()
        p64.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
