"""Sorts / limits / top-k (SURVEY §2.6).

``orderBy().limit(k)`` compiles to TakeOrderedAndProject — each
partition keeps only its local top-k, the driver merges k·numPartitions
rows. No global sort materializes, so this is 100-TB-safe for small k.
Per-group top-k is a rank window: one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k. Pass a unique tiebreak column last for determinism."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_keys: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k rows per group via row_number (deterministic with a unique
    tiebreak in ``order_by``). Keeps the rank column."""
    w = Window.partitionBy(*group_keys).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def top_k_per_group_salted(
    df: DataFrame,
    group_keys: list[str],
    order_by: list[Column],
    k: int,
    salts: int | None = None,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k per group for LOW-CARDINALITY groups — same result as
    :func:`top_k_per_group`, different physical plan.

    A plain rank window partitioned by a 10-value key runs 10 tasks no
    matter the cluster size, and every row of a group sorts in one task.
    Two-phase instead: (1) rank within (group, random salt) — parallel
    across salts·groups tasks, each keeps its local top-k; (2) re-rank
    the surviving k·salts rows per group — trivially small. Identical
    output because any row in the true global top-k is necessarily in
    its salt's top-k (``order_by`` must be a total order, unique
    tiebreak included; the first-phase salt assignment is an arbitrary
    but DETERMINISTIC content hash and the RESULT is salt-independent).

    When you DON'T need this: Spark ≥3.5 plans
    row_number/rank/dense_rank + a ``<= k`` filter as WindowGroupLimit
    with a partial pre-shuffle phase — map tasks already prune to their
    local top-k, which is this operator's phase 1 without the extra
    exchange. Use the plain :func:`top_k_per_group` there; reach for
    this one on engines without the rule or for window functions the
    pushdown doesn't cover.
    """
    nparts = salts or df.sparkSession.sparkContext.defaultParallelism
    # DETERMINISTIC salt (repo invariant, see skew.py): rand(seed) still
    # depends on partition index and in-partition order, so a retried
    # task after a fetch failure could re-salt rows differently than
    # the copies consumers already fetched — dropping/duplicating
    # phase-1 survivors. A content hash re-derives identically.
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(nparts)).cast("int"),
    )
    w1 = Window.partitionBy(*group_keys, "__salt").orderBy(*order_by)
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__salt", "__r1")
    )
    w2 = Window.partitionBy(*group_keys).orderBy(*order_by)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )
