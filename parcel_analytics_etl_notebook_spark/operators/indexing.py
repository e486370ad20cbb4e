"""Scalable global row numbering.

The naive form — ``row_number() OVER (ORDER BY ...)`` with no
PARTITION BY — forces every row through ONE task (Spark plans a global
Window after a total sort, with no partition key to parallelize on).
Fine at 60k rows, fatal at 100 TB.

The scalable form here is the classic two-pass construction:

1. range-repartition + sort within partitions on the total order
   (this is exactly what a global ``orderBy`` does — parallel);
2. count rows per partition (a tiny per-partition aggregate — the only
   extra action) and prefix-sum the counts on the driver;
3. global index = partition offset + per-partition ``row_number``
   (window PARTITIONED by ``spark_partition_id()`` — parallel).

Cost: one extra, trivially small pass for the counts. Every heavy step
is fully parallel. The result equals the single-task form row-for-row
whenever ``order_cols`` is a total order (enforce uniqueness via a
tiebreak column, same rule as every dedup/top-k in this engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stable_global_index(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "global_idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based dense global index following ``order_cols``.

    ``order_cols`` must be a total order (unique tiebreak included) or
    the assignment within ties is partition-dependent.

    The pid-tagged frame is localCheckpoint'ed (materialized) before
    the counts pass: the counts job and the final indexing job MUST see
    the same partition assignment, and a re-executed repartitionByRange
    can sample different range boundaries per job. On a cluster where
    executor loss matters, swap in reliable ``checkpoint()``.
    """
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    with_pid = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )

    counts = {
        r["__pid"]: r["cnt"]
        for r in with_pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets = {}
    running = 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]

    # range partitioner keys partitions in order, so pid order == sort
    # order; map pid -> offset via a tiny literal map (broadcast-free)
    offset_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        with_pid.withColumn(
            out_col,
            (offset_map[F.col("__pid")] + F.row_number().over(w)).cast("bigint"),
        )
        .drop("__pid")
    )
