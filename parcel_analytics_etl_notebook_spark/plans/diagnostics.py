"""Plan diagnostics: inspect a DataFrame's physical plan for the scale
properties the engine cares about — the programmatic form of the
`.explain("formatted")` audits in tests/test_plans.py.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_summary(df: DataFrame) -> dict:
    """Counts of the plan features that determine scale behavior.

    ``exchanges`` is the number to watch: every one is a full shuffle
    of its subtree's output. ``pushed_filters`` not reaching the scan
    (empty list while the query filters raw columns) means a filter is
    evaluated post-read — usually a cast or UDF blocking pushdown.
    """
    p = formatted_plan(df)
    return {
        "exchanges": len(re.findall(r"\bExchange\b", p)),
        "broadcast_hash_joins": p.count("BroadcastHashJoin"),
        "sort_merge_joins": p.count("SortMergeJoin"),
        "nested_loop_joins": p.count("BroadcastNestedLoopJoin"),
        "take_ordered": p.count("TakeOrderedAndProject"),
        "wholestage_codegen_spans": len(set(re.findall(r"codegen id : (\d+)", p))),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", p),
        "scans": p.count("Scan parquet"),
    }
