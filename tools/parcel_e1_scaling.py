"""Parcel E1 (the full CSV → star → parquet build) at a replicated
tier (VERDICT r11 next #7): the analytics queries the warehouse feeds
all have x10/x100 rows, but the build itself only had pytest +
sf-fixture evidence. This measures ``run_parcel_etl`` end-to-end at a
base and a 10×-replicated fixture and records the wall ratio — the
claim under test is that the cached-lineage design keeps the build
ONE-PASS (the reference re-executes the full lineage ~30× per run:
``/root/reference/etl/main.py`` re-counts + re-writes each table), so
wall grows ~linearly with rows, not 30×-linearly.

Fixture: ``write_fixture_csv`` with n_shipments scaled (base 20k ≈
57k event rows ≈ 25 MB CSV; 10× = 200k shipments). Both CSVs are
written under /tmp and removed after. Best-of-RUNS walls, full cost
each run (fresh SparkSession caches are NOT dropped between runs —
the janino/codegen warm state mirrors a long-lived production session;
run 1 is recorded separately as the cold wall).

Run on an IDLE machine: ``python tools/parcel_e1_scaling.py``.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SHIPMENTS = 20_000
RATIO = 10
RUNS = 2


def main() -> None:
    from parcel_analytics_etl_notebook_spark.plans.parcel_fixtures import (
        write_fixture_csv,
    )
    from parcel_analytics_etl_notebook_spark.plans.parcel_run import (
        run_parcel_etl,
    )
    from parcel_analytics_etl_notebook_spark.session import get_spark

    spark = get_spark(
        app_name="parcel-e1-scaling",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "32g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="parcel_e1_")
    out = {}
    try:
        for tag, n in (("base", BASE_SHIPMENTS),
                       (f"x{RATIO}", BASE_SHIPMENTS * RATIO)):
            csv_path = os.path.join(tmp, f"events_{tag}.csv")
            t0 = time.perf_counter()
            rows = write_fixture_csv(csv_path, n_shipments=n)
            gen_s = time.perf_counter() - t0
            walls = []
            for i in range(RUNS):
                wh = os.path.join(tmp, f"wh_{tag}_{i}")
                t0 = time.perf_counter()
                kpi = run_parcel_etl(spark, csv_path, wh, target_files=8)
                walls.append(time.perf_counter() - t0)
                shutil.rmtree(wh, ignore_errors=True)
            os.remove(csv_path)
            out[tag] = {
                "shipments": n,
                "csv_rows": rows,
                "fixture_gen_s": round(gen_s, 2),
                "cold_wall_s": round(walls[0], 2),
                "wall_s": round(min(walls), 2),
                "kpi_keys": sorted(kpi)[:4],
            }
            print(f"{tag}: rows={rows} walls={[round(w, 2) for w in walls]}",
                  flush=True)
        ratio = round(out[f"x{RATIO}"]["wall_s"] / out["base"]["wall_s"], 2)
        print(json.dumps({"data_ratio": RATIO, "wall_ratio": ratio,
                          "tiers": out}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
