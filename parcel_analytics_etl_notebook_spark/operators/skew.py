"""Skew mitigation: salting for hot keys (SURVEY §'Optimize for scale').

AQE's skew-join handling splits oversized partitions at runtime, but
two shapes still need explicit salting at 100 TB:

- **aggregation on a power-law key** (token counts: 'the' alone can be
  10% of the corpus): ``salted_agg`` pre-aggregates on (key, salt) so
  no single reducer receives a hot key's full volume, then combines.
  Same result as the direct groupBy — it's associative reshaping.
- **join against a hot-keyed fact** : ``salted_join_small`` replicates
  the (small) build side once per salt and routes each probe row to a
  deterministic salt — the hot key's rows spread over N partitions.

Salts are DETERMINISTIC (hash of a unique column, not rand()) so runs
are reproducible and retried tasks don't double-count.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, buckets) from a unique column."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(buckets))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    unique_col: str,
    partial_aggs: list[Column],
    final_aggs: Callable[[], list[Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: groupBy(keys + salt) with
    ``partial_aggs``, then groupBy(keys) with ``final_aggs`` (which must
    combine the partial columns — e.g. partial count → final sum).

    Result is identical to the direct groupBy; only the shuffle layout
    changes (hot keys fan out over ``buckets`` reducers first)."""
    salted = with_salt(df, unique_col, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs())


def salted_join_small(
    large: DataFrame,
    small: DataFrame,
    on: str,
    unique_col: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate the small side ``buckets``× with
    an exploded salt column, salt the large side deterministically, and
    join on (key, salt). Row-identical to the plain join for ``inner``
    and ``left`` (each large row meets exactly one replica per key).

    ``right``/``full`` are rejected: unmatched SMALL-side rows would
    surface once per replica (buckets× duplication) — use the plain
    join for those, the small side can't be the skewed one anyway."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join_small supports inner/left joins only, got {how!r}: "
            "outer-preserving the replicated small side would emit "
            f"{buckets} copies of every unmatched row"
        )
    salts = F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("__salt")
    small_rep = small.select("*", salts)
    large_s = with_salt(large, unique_col, buckets)
    out = large_s.join(small_rep, on=[on, "__salt"], how=how)
    return out.drop("__salt")
