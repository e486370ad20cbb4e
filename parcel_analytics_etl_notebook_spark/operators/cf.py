"""Item-item collaborative filtering primitives (full co-occurrence
matrix), with the hot-user fan-out cap.

The catalog query ``item_item_cf_topk`` bounds the basket self-join by
restricting one side to 10 broadcast seeds. The FULL-matrix form —
every item pair, the shape a real recommender precomputes — has no
seed bound: each user with a k-item basket emits k·(k−1)/2 pairs, so
one power user (a reseller account with 10⁵ items) contributes 5·10⁹
rows to the join all by itself. The standard fix (mirrors
``dedup_fuzzy.drop_hot_shingles`` for shingle df): drop users whose
basket exceeds ``max_basket`` BEFORE pairing. Power-user baskets are
catalog-wide and carry almost no item-item signal, so the cap improves
both runtime and similarity quality — same argument as dropping
boilerplate shingles.

Reference parity: the reference pipeline has no recommender; this is
part of the training-data-pipeline extension surface (SURVEY.md §2
extension families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cap_hot_users(
    basket: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    max_basket: int = 1000,
) -> DataFrame:
    """Drop every (user, item) row of users holding more than
    ``max_basket`` distinct items.

    The hot list is at most (total rows)/max_basket users — small by
    construction, so AQE broadcasts the anti-join build side. Pair
    fan-out after the cap is bounded by max_basket²/2 per user."""
    hot = (
        basket.groupBy(user_col)
        .agg(F.count_distinct(F.col(item_col)).alias("__k"))
        .filter(F.col("__k") > max_basket)
        .select(user_col)
    )
    return basket.join(hot, on=user_col, how="left_anti")


def item_cooccurrence(
    basket: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    max_basket: int | None = 1000,
) -> DataFrame:
    """Full item-item co-occurrence counts over (user, item) baskets.

    Returns ``(item_a, item_b, cooc)`` with ``item_a < item_b`` (each
    unordered pair once). One dedup shuffle, the optional hot-user
    anti-join, then a self-equi-join on the user key — co-partitioned
    on ``user_col``, so the pairing is shuffle-local — and one pair
    groupBy. With ``max_basket`` set, candidate volume is
    Σ_user min(k_u, max_basket)² — linear in users, not quadratic in
    the catalog."""
    b = basket.select(
        F.col(user_col).alias("__u"), F.col(item_col).alias("__i")
    ).distinct()
    if max_basket is not None:
        b = cap_hot_users(b, "__u", "__i", max_basket)
    pairs = (
        b.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.__u") == F.col("b.__u"))
            & (F.col("a.__i") < F.col("b.__i")),
        )
        .groupBy(
            F.col("a.__i").alias("item_a"), F.col("b.__i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("cooc"))
    )
    return pairs


def item_item_cosine(
    basket: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    max_basket: int | None = 1000,
    min_cooc: int = 1,
) -> DataFrame:
    """Full-matrix co-occurrence cosine:
    sim(a,b) = cooc / √(n_a·n_b) over deduped (user, item) baskets,
    n_* counted AFTER the hot-user cap so the norm matches the pairing
    population. ``min_cooc`` prunes the long tail of 1-cooccurrence
    pairs before the two frequency joins."""
    b = basket.select(
        F.col(user_col).alias("__u"), F.col(item_col).alias("__i")
    ).distinct()
    if max_basket is not None:
        b = cap_hot_users(b, "__u", "__i", max_basket).persist()
    freq = b.groupBy("__i").agg(F.count(F.lit(1)).alias("__n"))
    pairs = item_cooccurrence(b, "__u", "__i", max_basket=None)
    if min_cooc > 1:
        pairs = pairs.filter(F.col("cooc") >= min_cooc)
    fa = freq.select(F.col("__i").alias("item_a"), F.col("__n").alias("__na"))
    fb = freq.select(F.col("__i").alias("item_b"), F.col("__n").alias("__nb"))
    return (
        pairs.join(fa, "item_a")
        .join(fb, "item_b")
        .select(
            "item_a",
            "item_b",
            "cooc",
            (
                F.col("cooc")
                / F.sqrt(F.col("__na").cast("double") * F.col("__nb"))
            ).alias("cosine"),
        )
    )
