"""Count-Min sketch (Cormode & Muthukrishnan 2005), relationally.

The CMS is a d×W counter grid: each item increments one bucket per
hash row; an item's estimate is the MIN of its d bucket counters —
always ≥ the true count, and ≤ true + εN with probability 1−δ for
W = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. The grid is a pure sum-monoid, so it
map-side combines and merges across partitions/streams/days for free —
the point of sketching at 100 TB: the full corpus frequency table is
unbounded, the sketch is d·W integers.

Implementation is deliberately RELATIONAL: the grid is a (row, bucket,
count) DataFrame built by one explode(×d) + groupBy — no UDF, no
driver-side state — and estimation is a broadcast join of the
model-sized grid. Hashes are the cross-engine polynomial hash
(operators/dedup_fuzzy.poly_hash) with per-row seed prefixes, so a SQL
oracle can restate the ENTIRE sketch bucket-for-bucket — the estimate
column is hash-checked against DuckDB, not just bounded
(plans/queries_llm6.countmin_word_frequencies); the ≥-true guarantee is
additionally asserted in-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import poly_hash


def cms_bucket(item, seed: int, width: int):
    """Bucket of ``item`` (string column) in hash row ``seed``:
    poly_hash('<seed>:' || item) mod width — engine-portable."""
    return poly_hash(
        F.concat(F.lit(f"{seed}:"), item)
    ) % F.lit(width)


def cms_build(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch grid from an item stream (one row per
    occurrence): returns (row, bucket, cnt), d·W rows max.

    One explode(×depth) + one groupBy — the explode factor is the
    sketch DEPTH (a constant), never the data. Grids from disjoint
    slices merge by summing cnt on (row, bucket)."""
    ex = items.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
        F.col(item_col).alias("__item"),
    )
    return (
        ex.select("row", _bucket_by_row("__item", depth, width).alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _bucket_by_row(item_col: str, depth: int, width: int):
    """Bucket expression dispatching on the exploded `row` value: a
    when-chain over the ``depth`` seeds (depth is a small constant, so
    the chain stays codegen-friendly)."""
    expr = None
    for s in range(depth):
        cond = F.col("row") == s
        b = cms_bucket(F.col(item_col), s, width)
        expr = F.when(cond, b) if expr is None else expr.when(cond, b)
    return expr


def cms_estimate(
    queries: DataFrame,
    grid: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    out_col: str = "cms_estimate",
) -> DataFrame:
    """Point-query the sketch for each row of ``queries``: min over the
    d bucket counters. The grid is model-sized (d·W) — broadcast; a
    bucket an item never hashed into simply doesn't appear, and the
    missing counter means estimate 0 (only possible for items absent
    from the build stream, where 0 is exact)."""
    probes = queries.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).withColumn("bucket", _bucket_by_row(item_col, depth, width))
    others = [c for c in queries.columns]
    return (
        probes.join(F.broadcast(grid), ["row", "bucket"], "left")
        .groupBy(*others)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias(out_col)
        )
    )
