"""Measured scaling curve for the heavy pair family (VERDICT r06 #3):
run each query at sf0.1 and at the 10× corpus (scaledata/x10, built by
tools/gen_scaledata.py), record wall ratios vs the 10× data ratio.

Each query pays its FULL cost at each scale (release_caches before
every run — no memo sharing), best-of-2 runs. Results go into
SCALING.md's measured-curve table.

Run: ``python tools/gen_scaledata.py && python tools/run_scaling.py``
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "ngram_jaccard_pairs",
    "lsh_near_dup_pairs",
    "winnowing_fingerprint_pairs",
    "minhash_jaccard_error",
    "kcore_bounded_peel",
]
# any names on the command line override HEAVY (used to extend the
# SCALING.md table without re-running already-measured rows):
#   python tools/run_scaling.py simhash_fingerprints semdedup_cluster_pairs
if len(sys.argv) > 1:
    HEAVY = sys.argv[1:]
BASE = "/root/testdata/sf0.1"
#: scale tier to measure against (default x10; set
#: SPARK_GRAFT_SCALE_TIER=x100 after SPARK_GRAFT_REPLICAS=100
#: gen_scaledata.py for the second-decade rows, VERDICT r10 #4)
TIER = os.environ.get("SPARK_GRAFT_SCALE_TIER", "x10")
X10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scaledata", TIER,
)
DATA_RATIO = float(TIER.lstrip("x"))
RUNS = 2


def main() -> None:
    from parcel_analytics_etl_notebook_spark.plans import catalog
    from parcel_analytics_etl_notebook_spark.session import get_spark

    spark = get_spark(
        app_name="scaling-run",
        master="local[32]",
        shuffle_partitions=32,
        # local mode: one JVM holds all 32 executor threads — at the 10x
        # corpus the default heap OOMs in the pair joins; size it like a
        # real executor fleet would be (32 cores x ~1 GiB task headroom)
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "32g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    # warmup: codegen + parquet footers at both scales
    qs["exact_dedup_documents"](spark, BASE).collect()
    qs["exact_dedup_documents"](spark, X10).collect()

    from parcel_analytics_etl_notebook_spark.plans.queries_llm7 import (
        CandidateBudgetExceeded,
    )

    guards = catalog.scale_guards()
    out = {}
    for name in HEAVY:
        walls = {}
        tripped = None
        for tag, sf_dir in (("sf0.1", BASE), (TIER, X10)):
            ws = []
            for _ in range(RUNS):
                catalog.release_caches(spark)
                t0 = time.perf_counter()
                try:
                    qs[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except CandidateBudgetExceeded as e:
                    # contract-recorded skip (scale_guards()), not a
                    # failure: the guard exists to trip here
                    tripped = {"at": tag, "msg": str(e).split(":")[0],
                               "scale_path": (guards.get(name) or {}).get(
                                   "scale_path")}
                    break
                ws.append(time.perf_counter() - t0)
            if tripped:
                break
            walls[tag] = round(min(ws), 2)
        if tripped:
            out[name] = {**walls, "guard_tripped": tripped}
            print(f"{name:32s} guard tripped at {tripped['at']} -> "
                  f"scale path: {tripped['scale_path']}", flush=True)
            continue
        ratio = round(walls[TIER] / walls["sf0.1"], 2)
        out[name] = {**walls, "wall_ratio": ratio}
        print(f"{name:32s} sf0.1={walls['sf0.1']:7.2f}s "
              f"{TIER}={walls[TIER]:7.2f}s ratio={ratio}", flush=True)
    print(json.dumps({"data_ratio": DATA_RATIO, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
