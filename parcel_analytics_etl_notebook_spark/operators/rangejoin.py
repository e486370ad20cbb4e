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
    value_max: float | None = None,
) -> DataFrame:
    """Inner-join ``values`` to the intervals containing them
    (``lo <= value < hi``) via the bucketized equi-join rewrite.

    Returns values columns + interval columns (minus helpers). Rows
    with NULL ``value_col`` never match — the same semantics the
    inequality predicate has.

    ``value_max``: caller-supplied clamp bound (exact max not required —
    any upper bound works; results are identical because the residual
    filter uses the ORIGINAL interval bounds). Pass it at scale: the
    fallback computes ``max(value_col)`` with a driver-side action,
    which is a full extra scan of the big side.
    """
    if clamp_hi:
        vmax = value_max
        if vmax is None:
            vmax = values.agg(F.max(value_col)).collect()[0][0]
        if vmax is None:
            # empty/all-null values: the join result is empty whatever
            # the intervals explode to — clamp to 0 to keep it bounded
            vmax = 0.0
        # intervals starting past every value can never match; dropping
        # them also guarantees lo_bucket <= clamped hi_bucket below, so
        # F.sequence never emits a descending (unbounded) bucket list
        intervals = intervals.filter(F.col(lo_col) <= F.lit(float(vmax)))
        hi_bucket_src = F.least(F.col(hi_col), F.lit(float(vmax) + width))
    else:
        hi_bucket_src = F.col(hi_col)
    lo_bkt = F.floor(F.col(lo_col) / width).cast("bigint")
    # greatest() guards degenerate hi < lo intervals (empty by the
    # residual filter anyway): sequence stays ascending and 1-long
    iv = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                lo_bkt,
                F.greatest(lo_bkt, F.floor(hi_bucket_src / width).cast("bigint")),
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
