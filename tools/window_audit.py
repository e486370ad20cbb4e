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


def _depth_and_node(line: str) -> tuple[int, str]:
    """(tree depth, node text) for one line of Spark's tree rendering.

    Depth = column where the node text starts, after the tree art
    (``+- `` / ``:- `` / ``:  `` / spaces); the ``*(n)`` whole-stage
    codegen tag is stripped so node-name matches anchor at position 0.
    """
    m = re.match(r"^[ :+\-]*", line)
    depth = m.end()
    return depth, re.sub(r"^\*\(\d+\)\s*", "", line[depth:])


def single_partition_windows(df) -> int:
    """Count Window-family nodes fed (through Sort/Project chains) by an
    Exchange SinglePartition in the pre-AQE physical plan.

    Walks the ACTUAL first-child chain by tree indentation (each
    pass-through node — Sort / Project / WindowGroupLimit — has exactly
    one child, the next line at deeper indent), rather than a fixed
    lookahead: a fixed window both missed chains longer than it and
    could mis-attribute a sibling subtree's Exchange (ADVICE r04).
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    parsed = [_depth_and_node(ln) for ln in plan.splitlines()]
    hits = 0
    for i, (d, node) in enumerate(parsed):
        if not re.match(r"(Window|WindowGroupLimit)\b", node):
            continue
        cur_depth = d
        for cd, cnode in parsed[i + 1 :]:
            if cd <= cur_depth:
                break  # sibling/ancestor — chain ended without a child
            if cnode.startswith("Exchange SinglePartition"):
                hits += 1
                break
            if re.match(r"(Sort|Project|WindowGroupLimit)\b", cnode):
                cur_depth = cd  # single-child pass-through: descend
                continue
            break  # any other node terminates the chain
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
