"""Bucketized range join — the scale-safe form of `value ∈ [lo, hi)`.

A raw inequality join plans as BroadcastNestedLoopJoin (fine for a
3-row band table — see plans/queries_relational.value_band_stats — fatal
for a large interval table: O(|values|·|intervals|) comparisons). The
standard rewrite makes it an EQUI-join: pick a bucket width, explode
each interval to every bucket it overlaps, tag each value with its own
bucket, hash-join on the bucket id, and re-apply the exact predicate as
a residual filter. Cost: |values| + Σ(interval span / width) join rows —
linear, shuffled (or broadcast) on a uniform integer key.

Width is the knob: smaller → more interval replication, larger → more
residual-filter misses per bucket. Open-ended catch-all intervals would
explode to unbounded buckets, so ``clamp_hi`` caps the bucket range at
the observed value maximum (one tiny driver-side agg) while the residual
filter still uses the ORIGINAL bounds — results are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketized(
    values: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    width: float = 50.0,
    clamp_hi: bool = True,
) -> DataFrame:
    """Inner-join ``values`` to the intervals containing them
    (``lo <= value < hi``) via the bucketized equi-join rewrite.

    Returns values columns + interval columns (minus helpers). Rows
    with NULL ``value_col`` never match — the same semantics the
    inequality predicate has.
    """
    if clamp_hi:
        vmax = values.agg(F.max(value_col)).collect()[0][0]
        hi_bucket_src = F.least(F.col(hi_col), F.lit(float(vmax) + width))
    else:
        hi_bucket_src = F.col(hi_col)
    iv = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / width).cast("bigint"),
                F.floor(hi_bucket_src / width).cast("bigint"),
            )
        ),
    )
    v = values.withColumn(
        "__bkt", F.floor(F.col(value_col) / width).cast("bigint")
    )
    joined = v.join(iv, on="__bkt", how="inner").filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    )
    return joined.drop("__bkt")
