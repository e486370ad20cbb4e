"""Sinks (SURVEY §2.1 S3/S4).

The reference writes six warehouse tables with default partitioning
(``/root/reference/etl/main.py:296-301``) and merges a driver-side
pandas DQ CSV (``:304-315``). Here both are Spark-native and
scale-aware: explicit partition-count / partition-column control on the
parquet sink, append-mode CSV for the audit log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_files: int | None = None,
) -> None:
    """Parquet sink. ``partition_by`` (e.g. an ingest date) gives
    partition pruning on read; ``target_files`` coalesces/repartitions
    to avoid the small-file problem the reference ignores."""
    if target_files is not None:
        if partition_by:
            df = df.repartition(target_files, *partition_by)
        else:
            df = df.repartition(target_files)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv_audit(df: DataFrame, path: str) -> None:
    """Append-mode CSV audit sink replacing the reference's pandas
    read-concat-rewrite merge (``etl/main.py:304-315``) — append is
    O(new rows), the reference's rewrite is O(history)."""
    df.coalesce(1).write.mode("append").option("header", True).csv(path)
