"""Interleaved same-session A/B profiler (VERDICT r12 #1/#2 protocol).

The r12 round showed two-session A/Bs are WRONG on this host (the
second JVM is warmer — codegen cache, JIT — so whichever variant runs
second wins; see OPTIMIZATION_r12.md §7). This tool measures a code
variant pair honestly: ONE session, a module-level knob flipped per
run, A/B order alternated across rounds so warmup drift cancels.

Usage:
    python tools/ab_profile.py --knob pkg.mod:ATTR \
        [--rounds N] [--runs-per N] <query> [<query> ...]

``--knob`` names a module attribute that query-build code reads at
CALL time (never at import time). Variant A sets it True, variant B
False. Output: one JSON line per (query, variant) with all walls, the
min, and job counts — plus a verdict line comparing mins and medians.
"""

from __future__ import annotations

import importlib
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    rounds = 4
    knobs = []
    for a in sys.argv[1:]:
        if a.startswith("--rounds="):
            rounds = int(a.split("=", 1)[1])
        if a.startswith("--knob="):
            knobs.append(a.split("=", 1)[1])
    if not knobs:
        raise SystemExit("need at least one --knob=pkg.mod:ATTR")
    targets = []
    for k in knobs:
        modname, attr = k.split(":")
        mod = importlib.import_module(modname)
        if not hasattr(mod, attr):
            raise SystemExit(f"{modname} has no attribute {attr}")
        targets.append((mod, attr))

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from parcel_analytics_etl_notebook_spark.plans import catalog
    from parcel_analytics_etl_notebook_spark.session import get_spark

    spark = get_spark(
        app_name="ab-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    qs["lifecycle_kpis"](spark, sf_dir).collect()
    from parcel_analytics_etl_notebook_spark.sources.readers import (
        TESTDATA_TABLES,
    )

    for t in TESTDATA_TABLES:
        catalog.table(spark, sf_dir, t).count()
    for key, builder in sorted(catalog.MEMO_BUILDERS.items()):
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    sc = spark.sparkContext

    def set_knobs(value: bool) -> None:
        for mod, attr in targets:
            setattr(mod, attr, value)

    def run_once(name: str, tag: str, i: int) -> tuple[float, int]:
        grp = f"{name}:{tag}#{i}"
        sc.setJobGroup(grp, grp)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        w = time.perf_counter() - t0
        sc.setJobGroup("", "")
        nj = len(sc.statusTracker().getJobIdsForGroup(grp))
        spark.catalog.clearCache()
        return round(w, 3), nj

    walls: dict[tuple[str, str], list[float]] = {}
    jobs: dict[tuple[str, str], list[int]] = {}
    for name in names:
        # one throwaway warm run per query (whichever variant is
        # current) so neither variant's first sample eats cold codegen
        set_knobs(True)
        run_once(name, "warm", 0)
        for r in range(rounds):
            order = ["A", "B"] if r % 2 == 0 else ["B", "A"]
            for tag in order:
                set_knobs(tag == "A")
                w, nj = run_once(name, tag, r)
                walls.setdefault((name, tag), []).append(w)
                jobs.setdefault((name, tag), []).append(nj)
        for tag in ("A", "B"):
            ws = walls[(name, tag)]
            print(
                json.dumps(
                    {
                        "query": name,
                        "variant": tag,
                        "walls": ws,
                        "min": min(ws),
                        "median": round(statistics.median(ws), 3),
                        "n_jobs": max(jobs[(name, tag)]),
                    }
                ),
                flush=True,
            )
        a, b = walls[(name, "A")], walls[(name, "B")]
        print(
            json.dumps(
                {
                    "query": name,
                    "verdict": (
                        "A" if min(a) < min(b) else "B"
                    ),
                    "min_ratio_B_over_A": round(min(b) / min(a), 3),
                    "median_ratio_B_over_A": round(
                        statistics.median(b) / statistics.median(a), 3
                    ),
                }
            ),
            flush=True,
        )
    set_knobs(True)
    spark.stop()


if __name__ == "__main__":
    main()
