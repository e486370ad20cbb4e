"""Two-pass exact heavy hitters: Misra-Gries candidate generation
(shuffle-free) + exact recount of candidates only.

The full-cardinality alternative — ``groupBy(key).count()`` over a
100 TB corpus with a vocabulary-scale key space — shuffles every
distinct key. This operator never does: pass 1 scans each partition
once through an Arrow-batched Misra-Gries summary (k counters per
partition, mergeable per Agarwal et al., "Mergeable Summaries",
PODS'12), collects the P·k-row summaries (model-sized: partitions ×
k, independent of data volume) and merges them on the driver; pass 2
re-scans with an ``isin(candidates)`` filter — pushed to the parquet
scan — and exactly counts ≤ k surviving keys.

Guarantee: a Misra-Gries summary with k counters undercounts any key
by at most n/(k+1), and the batch/partition merge preserves that
bound. Hence every key with true count > n/k survives pass 1, and
pass 2's exact HAVING makes the final answer EXACT — identical to the
full groupBy, at a fraction of the shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_absorb(counters: dict, other: dict, k: int) -> dict:
    """Merge ``other``'s counts into ``counters``, keeping ≤ k keys.

    The mergeable-summaries rule: add counts, then subtract the
    (k+1)-th largest count from every key and drop the non-positive —
    each merge adds at most (its input's) n/(k+1) undercount, and
    undercounts are additive across merges, so the global bound n/(k+1)
    holds whatever the partition/batch split was."""
    for key, c in other.items():
        counters[key] = counters.get(key, 0) + int(c)
    if len(counters) > k:
        spill = sorted(counters.values(), reverse=True)[k]
        counters = {
            key: c - spill for key, c in counters.items() if c > spill
        }
    return counters


def mg_candidates(df: DataFrame, key_col: str, k: int) -> list:
    """Pass 1: per-partition Misra-Gries summaries, merged driver-side.

    Returns the candidate key list (≤ k entries) — a superset of every
    key whose global count exceeds n/k. The summaries travel as ≤ k
    rows per partition; the per-batch counting is vectorized
    (``value_counts``), so Python-side work is O(batches · k log k),
    not O(rows)."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            vc = pdf[key_col].dropna().value_counts()
            counters = _mg_absorb(counters, vc.to_dict(), k)
        yield pd.DataFrame(
            {"key": list(counters), "cnt": list(counters.values())}
        )

    summaries = df.select(key_col).mapInPandas(
        summarize, schema=f"key {dict(df.dtypes)[key_col]}, cnt long"
    )
    merged: dict = {}
    # P·k rows total: model-sized by construction, never row-scale.
    for row in summaries.collect():
        merged = _mg_absorb(merged, {row["key"]: row["cnt"]}, k)
    return sorted(merged)


def exact_heavy_hitters(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Exact keys with count > n/k, without a full-cardinality shuffle.

    Pass 2 filters to the ≤ k candidates (an ``In`` predicate the
    optimizer pushes into the scan), groups only those rows, and
    applies the exact threshold against the true total (a 1-row
    aggregate broadcast in). Output: key_col, cnt, freq (round 6),
    ordered (cnt desc, key)."""
    cands = mg_candidates(df, key_col, k)
    tot = df.agg(F.count(key_col).alias("__n"))
    return (
        df.filter(F.col(key_col).isin(cands))
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") > F.col("__n") / k)
        .select(
            key_col,
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round(F.col("cnt").cast("double") / F.col("__n"), 6).alias(
                "freq"
            ),
        )
        .orderBy(F.desc("cnt"), key_col)
    )
