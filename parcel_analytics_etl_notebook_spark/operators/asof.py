"""As-of (point-in-time) join — an operator Spark lacks natively
(SURVEY §2.3 lists it among the join-family completions; DuckDB has a
native ASOF JOIN we use as the oracle).

Implementation is the union-and-window trick, NOT a range join:
tag both inputs, union them, and per key carry the last-seen right-side
value forward with ``last(..., ignorenulls=True)`` over an ordered
window. Cost: ONE shuffle on the key (the window sort), no range
explosion — at 100 TB this beats an inequality join (which Spark plans
as a broadcast-nested-loop or cartesian) by orders of magnitude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key (backward as-of,
    inclusive). Unmatched left rows keep NULLs — left-join semantics.

    ``right_values`` are the right-side columns to carry (each emitted
    as ``<name><suffix>``); ``right_ts`` itself is always carried as
    ``<right_ts><suffix>``.
    """
    carry = [right_ts] + [c for c in right_values if c != right_ts]
    rtypes = dict(right.dtypes)
    # carry ONE struct of the whole right row, not per-column fills: a
    # per-column last(..., ignorenulls) would skip a legitimately-NULL
    # value in the matched row and stitch values from DIFFERENT right
    # rows. The struct is non-null exactly when a right row exists, so
    # ignorenulls means "no right row yet", never "this value was NULL".
    struct_type = "struct<" + ",".join(
        f"`{c}`:{rtypes[c]}" for c in carry
    ) + ">"
    l_tag = left.withColumn("__side", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(struct_type)
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in carry]).alias("__r"),
    )
    l_cols = [c for c in l_tag.columns if c not in ("__side",)]
    l_tag = l_tag.withColumn("__ts", F.col(left_ts))
    # align schemas for unionByName
    r_full = r_tag
    for c in l_cols:
        if c not in r_full.columns:
            r_full = r_full.withColumn(c, F.lit(None).cast(dict(l_tag.dtypes)[c]))
    unioned = l_tag.unionByName(r_full.select(*l_tag.columns))

    # right rows (side 0) sort before left rows at equal ts → inclusive <=
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__r", F.last(F.col("__r"), ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__side") == 1)
    for c in carry:
        out = out.withColumn(f"{c}{suffix}", F.col("__r").getField(c))
    return out.drop("__side", "__ts", "__r")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    suffixes: tuple[str, str] = ("_before", "_after"),
) -> DataFrame:
    """For each left row, attach BOTH the latest right ``right_ts`` at
    or before ``left_ts`` (inclusive backward match, ``<ts><suffixes[
    0]>``) and the earliest right ``right_ts`` strictly after it
    (forward match, ``<ts><suffixes[1]>``) within the same ``on`` key;
    the caller picks the nearer one (left-join semantics — either side
    may be NULL).

    Same union-and-window trick as :func:`asof_join_backward`, still
    ONE shuffle on the key: the backward fill is ``last(...,
    ignorenulls)`` over the preceding frame and the forward fill is
    ``first(..., ignorenulls)`` over the following frame of the SAME
    sorted partition — Spark plans both windows over one Exchange +
    one Sort (identical partitioning and ordering), so the second
    direction is free of shuffle cost. An inequality join would plan a
    nested loop; at 100 TB this shape is the difference between a
    sort and a cartesian.

    Tie conventions: a right row at exactly ``left_ts`` is a BACKWARD
    match (gap 0) and never a forward match — right rows sort before
    left rows at equal timestamps, placing them in the preceding frame
    only. Only the timestamp is carried; carrying right-side VALUE
    columns would need an explicit right-row tiebreak at duplicate
    timestamps to stay deterministic (see asof_join_backward's struct
    carry)."""
    l_tag = left.select(
        "*",
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("__rts"),
    )
    r_tag = right.select(
        F.col(on),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        F.col(right_ts).alias("__rts"),
    )
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(l_tag.dtypes)[c]))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))
    # right rows (side 0) sort before left rows at equal ts: inclusive
    # <= for the backward fill, strictly-after for the forward fill
    order = [F.col("__ts"), F.col("__side")]
    w_back = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.select(
        "*",
        F.last(F.col("__rts"), ignorenulls=True).over(w_back).alias(
            f"{right_ts}{suffixes[0]}"
        ),
        F.first(F.col("__rts"), ignorenulls=True).over(w_fwd).alias(
            f"{right_ts}{suffixes[1]}"
        ),
    )
    return filled.filter(F.col("__side") == 1).drop("__side", "__ts", "__rts")
