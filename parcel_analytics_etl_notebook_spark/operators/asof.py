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
