"""Audit: which catalog queries plan a Window over a single-partition
Exchange (the one-task global-sort shape)?

Walks each query's pre-AQE physical plan tree and reports every
Window / WindowGroupLimit whose child chain (through Sort/Project)
reaches ``Exchange SinglePartition``. Output feeds the allowlist in
``tests/test_scale_hygiene.py::test_no_row_grain_single_partition_window``:
every hit must either be annotated there as bounded-frame-safe
(dimension grain, calendar grain, top-k capped) or rewritten via the
two-pass operators in ``operators/indexing``.

Run: ``python tools/window_audit.py [name ...]``
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

SF = "/root/testdata/sf0.001"


def single_partition_windows(df) -> int:
    """Count Window-family nodes fed (through Sort/Project chains) by an
    Exchange SinglePartition in the pre-AQE physical plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    hits = 0
    for i, line in enumerate(lines):
        if not re.search(r"\b(Window|WindowGroupLimit)\b", line):
            continue
        # scan the direct child chain: following lines at deeper indent,
        # passing through Sort / Project / WindowGroupLimit only
        for nxt in lines[i + 1 : i + 6]:
            if "Exchange SinglePartition" in nxt:
                hits += 1
                break
            if not re.search(r"\b(Sort|Project|WindowGroupLimit)\b", nxt):
                break
    return hits


def main() -> None:
    from parcel_analytics_etl_notebook_spark.plans.catalog import queries

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    names = sys.argv[1:] or sorted(qs)
    for name in names:
        spark.catalog.clearCache()
        n = single_partition_windows(qs[name](spark, SF))
        if n:
            print(f"{name}\t{n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
