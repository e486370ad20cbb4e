"""Full-matrix item-item CF: hot-user cap bounds the pair fan-out.

The cap promised in ``plans/queries_llm7.item_item_cf_topk``'s
docstring ("the full-matrix variant at 100 TB adds the standard
hot-customer cap exactly as drop_hot_shingles does") lives in
``operators/cf.py`` — these tests pin its semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.operators.cf import (
    cap_hot_users,
    item_cooccurrence,
    item_item_cosine,
)


def _basket(spark):
    """3 normal users (3-item baskets) + 1 hot user with 40 items."""
    rows = []
    for u, items in [
        ("u1", [1, 2, 3]),
        ("u2", [2, 3, 4]),
        ("u3", [1, 3, 5]),
    ]:
        rows += [(u, i) for i in items]
    rows += [("hot", i) for i in range(100, 140)]
    # duplicate purchases must not double-count pairs
    rows += [("u1", 1), ("hot", 100)]
    return spark.createDataFrame(rows, "user string, item int")


def test_cap_drops_only_hot_users(spark):
    b = _basket(spark)
    kept = cap_hot_users(b, "user", "item", max_basket=10)
    assert kept.filter(F.col("user") == "hot").count() == 0
    # normal users keep every row (including the duplicate)
    assert kept.count() == b.filter(F.col("user") != "hot").count()


def test_cooccurrence_fanout_is_bounded_by_cap(spark):
    b = _basket(spark)
    uncapped = item_cooccurrence(b, "user", "item", max_basket=None)
    capped = item_cooccurrence(b, "user", "item", max_basket=10)
    # uncapped: hot user alone contributes C(40,2) = 780 pairs
    assert uncapped.agg(F.sum("cooc")).head()[0] == 780 + 3 * 3
    # capped: only the 3-item baskets pair — 3 users × C(3,2)
    assert capped.agg(F.sum("cooc")).head()[0] == 3 * 3
    assert capped.filter(F.col("item_a") >= 100).count() == 0
    # each unordered pair appears once, canonically ordered
    assert capped.filter(F.col("item_a") >= F.col("item_b")).count() == 0


def test_cooccurrence_counts_and_cosine(spark):
    b = _basket(spark)
    pairs = {
        (r["item_a"], r["item_b"]): r["cooc"]
        for r in item_cooccurrence(b, "user", "item", max_basket=10).collect()
    }
    # item 3 co-occurs with 1 (u1,u3), 2 (u1,u2), 4 (u2), 5 (u3)
    assert pairs[(1, 3)] == 2 and pairs[(2, 3)] == 2
    assert pairs[(3, 4)] == 1 and pairs[(3, 5)] == 1
    cos = {
        (r["item_a"], r["item_b"]): r["cosine"]
        for r in item_item_cosine(b, "user", "item", max_basket=10).collect()
    }
    # n1=2, n3=3, cooc=2 → 2/√6
    assert abs(cos[(1, 3)] - 2 / 6**0.5) < 1e-12


def test_cosine_norms_counted_after_cap(spark):
    """Frequencies feeding the cosine must reflect the capped
    population, or sims of items the hot user touched are deflated."""
    rows = [("hot", i) for i in range(1, 30)] + [
        ("u1", 1),
        ("u1", 2),
        ("u2", 1),
        ("u2", 2),
    ]
    b = spark.createDataFrame(rows, "user string, item int")
    cos = {
        (r["item_a"], r["item_b"]): r["cosine"]
        for r in item_item_cosine(b, "user", "item", max_basket=10).collect()
    }
    # after dropping hot: n1 = n2 = 2, cooc = 2 → cosine exactly 1.0
    assert cos[(1, 2)] == 1.0
