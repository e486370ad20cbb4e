"""Standalone per-query profiler for the r12 optimization round.

Times named catalog queries with the bench's methodology (noop sink,
local[$SPARK_GRAFT_CPUS], shuffle partitions = cores, warm tables) and
writes ``plans/r12/<name>_<tag>.txt`` with the ``explain("formatted")``
output so plan claims in OPTIMIZATION_r12.md are checkable offline.

Usage:
    python tools/opt_profile.py <tag> <query> [<query> ...]
        [--runs N] [--no-plan]

``tag`` is normally ``before`` or ``after``. Walls are printed as JSON
(one line per query: first run + min of runs + job count) — the same
noop-sink timing bench.py uses, so numbers are comparable to
BENCH_DETAIL's raw walls (not corrected ones).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    no_plan = "--no-plan" in sys.argv
    tag, names = args[0], args[1:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from parcel_analytics_etl_notebook_spark.plans import catalog
    from parcel_analytics_etl_notebook_spark.session import get_spark

    spark = get_spark(
        app_name="opt-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    # warm: JVM/codegen + first-touch of every table (same as bench.py)
    qs["lifecycle_kpis"](spark, sf_dir).collect()
    from parcel_analytics_etl_notebook_spark.sources.readers import (
        TESTDATA_TABLES,
    )

    for t in TESTDATA_TABLES:
        catalog.table(spark, sf_dir, t).count()
    for key, builder in sorted(catalog.MEMO_BUILDERS.items()):
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", "r12")
    os.makedirs(plan_dir, exist_ok=True)
    sc = spark.sparkContext
    out = {}
    for name in names:
        sc.setJobDescription(f"opt-profile:{name}")
        walls = []
        nj = 0
        for i in range(runs):
            sc.setJobGroup(f"{name}#{i}", name)
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 3))
            nj = max(
                nj, len(sc.statusTracker().getJobIdsForGroup(f"{name}#{i}"))
            )
            sc.setJobGroup("", "")
            spark.catalog.clearCache()
        if not no_plan:
            plan = qs[name](spark, sf_dir)._jdf.queryExecution().explainString(
                sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
        out[name] = {"runs": walls, "min": min(walls), "n_jobs": nj}
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
