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
