"""2-D Pareto skyline (maximize both dimensions).

Semantic definition: a row is ON the skyline iff no other row
dominates it — dominates = ≥ in both dimensions and > in at least
one. Equal points never dominate each other, so duplicates of a
frontier point all survive.

The naive form is a quadratic NOT-EXISTS self-join (kept as the
oracle in plans/queries_relational9.pareto_customers). The scale-safe
rewrite here is O(N log N):

1. collapse to one row per distinct x (max y per group) — one shuffle,
   output O(distinct x);
2. running strictly-preceding max of y along descending x over that
   collapsed frame — computed WITHOUT a single-partition window, via
   the same two-pass construction as ``operators/indexing``
   (range-partition on x desc, per-partition max of y — a tiny
   aggregate — driver prefix-max of the ≤cores partition maxima, then
   prev_max = greatest(partition-local preceding max, earlier
   partitions' max)). Max is a monoid, so the split is exact;
3. a (x, y)-equi-join back tags the surviving rows.

Property-tested against the quadratic Python model for arbitrary
duplicate/tie structures (tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_global_prev_max(
    grp: DataFrame,
    x: str,
    val_col: str,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach the strictly-preceding global running max of ``val_col``
    along descending ``x`` (NULL for the first row), two-pass — no
    single task ever sees the whole frame. ``x`` values must be unique
    (callers pass a groupBy(x) output)."""
    n = num_partitions or grp.sparkSession.sparkContext.defaultParallelism
    with_pid = (
        grp.repartitionByRange(n, F.col(x).desc())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()  # offsets and the window pass must see ONE
        # partition assignment (repartitionByRange resamples per job)
    )
    maxes = {
        r["__pid"]: r["m"]
        for r in with_pid.groupBy("__pid")
        .agg(F.max(val_col).alias("m"))
        .collect()
    }
    offsets: dict[int, object] = {}
    running = None
    for pid in sorted(maxes):
        if running is not None:
            offsets[pid] = running
        m = maxes[pid]
        if m is not None and (running is None or m > running):
            running = m
    w = Window.partitionBy("__pid").orderBy(F.col(x).desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local_prev = F.max(val_col).over(w)
    if offsets:
        off_map = F.create_map(
            *[
                c
                for pid, v in sorted(offsets.items())
                for c in (F.lit(pid), F.lit(v))
            ]
        )
        # missing pid (first partition) → NULL; greatest skips NULLs
        prev = F.greatest(local_prev, off_map[F.col("__pid")])
    else:
        prev = local_prev
    return with_pid.withColumn(out_col, prev).drop("__pid")


def pareto_frontier_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Rows of ``df`` not dominated on (``x``, ``y``), both maximized.

    All input columns are preserved; row multiplicity of frontier
    points is preserved (equal points don't dominate each other).
    NULL in either dimension never reaches the frontier (dropped, the
    same convention an inequality join would apply).
    """
    pts = df.filter(F.col(x).isNotNull() & F.col(y).isNotNull())
    grp = pts.groupBy(x).agg(F.max(y).alias("__gmax"))
    frontier = (
        _with_global_prev_max(grp, x, "__gmax", "__prevmax")
        .filter(
            F.col("__prevmax").isNull() | (F.col("__gmax") > F.col("__prevmax"))
        )
        .select(F.col(x).alias("__fx"), F.col("__gmax").alias("__fy"))
    )
    return (
        pts.join(
            frontier, (F.col(x) == F.col("__fx")) & (F.col(y) == F.col("__fy"))
        )
        .drop("__fx", "__fy")
    )
