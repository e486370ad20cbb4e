"""Ad-hoc parity check for a subset of catalog queries.

Usage: python tools/check_queries.py name1 name2 ... [--sf DIR]
Runs each named query on Spark and its oracle on DuckDB over the same
parquet directory (default sf0.001, override with --sf) and prints the
harness compare verdict.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

argv = sys.argv[1:]
SF = "/root/testdata/sf0.001"
if "--sf" in argv:
    i = argv.index("--sf")
    SF = argv[i + 1]
    argv = argv[:i] + argv[i + 2:]

from pyspark.sql import SparkSession  # noqa: E402

from parcel_analytics_etl_notebook_spark.plans.catalog import (  # noqa: E402
    oracle_sql,
    queries,
)
from tests.oracle_harness import compare, duckdb_con  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

qs, os_ = queries(), oracle_sql()
con = duckdb_con(SF)
fail = 0
for name in argv:
    try:
        spdf = qs[name](spark, SF).toPandas()
        opdf = con.execute(os_[name]).df()
        res = compare(name, spdf, opdf)
        status = "OK " if res.ok else "FAIL"
        print(f"{status} {name} rows={len(spdf)}")
        for p in res.problems:
            print(f"     {p}")
        fail += 0 if res.ok else 1
    except Exception as e:  # noqa: BLE001
        print(f"ERR  {name}: {type(e).__name__}: {e}")
        fail += 1
sys.exit(1 if fail else 0)
