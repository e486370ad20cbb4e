"""Regenerate ``tools/plan_budget.json``: the committed per-query
shuffle ledger.

For every catalog query this records how many shuffle Exchanges and
BroadcastExchanges its physical plan contains (pre-AQE initial plan,
counted from ``explain("formatted")`` node headers — ReusedExchange
intentionally excluded, it is the optimizer sharing work, not a new
shuffle). ``tests/test_plans.py::test_catalog_shuffle_budget`` fails
if any query's count drifts from this ledger in EITHER direction:
a regression (new shuffle snuck into a hot path) and a silent
improvement (ledger stale) both demand a human look and a regenerate.

Run: ``python tools/plan_budget.py`` (rewrites the json in place).
"""

import contextlib
import io
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from parcel_analytics_etl_notebook_spark.plans.catalog import queries  # noqa: E402

SF = "/root/testdata/sf0.001"

NODE = re.compile(r"^\(\d+\)\s+(Exchange|BroadcastExchange)\b", re.M)


def exchange_counts(df) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    kinds = NODE.findall(buf.getvalue())
    return {
        "shuffle": sum(1 for k in kinds if k == "Exchange"),
        "broadcast": sum(1 for k in kinds if k == "BroadcastExchange"),
    }


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name, fn in sorted(queries().items()):
        # Standalone plan per query: persisted frames registered by an
        # earlier query otherwise substitute InMemoryRelation into this
        # one's plan, making exchange counts depend on run ORDER.
        spark.catalog.clearCache()
        out[name] = exchange_counts(fn(spark, SF))
        print(name, out[name], flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plan_budget.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path, len(out), "queries")


if __name__ == "__main__":
    main()
