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
    O(new rows), the reference's rewrite is O(history). The merged,
    sorted view the reference materializes on every write is available
    on demand via :func:`read_dq_report`."""
    df.coalesce(1).write.mode("append").option("header", True).csv(path)


def read_dq_report(spark, path: str) -> DataFrame:
    """Compacted read view of the append-mode DQ audit log: all
    generations merged, newest first — the exact shape the reference
    rewrites into its metadata CSV on every run (``etl/main.py:308-315``:
    concat history, ``sort_values('timestamp', ascending=False)``),
    recovered here at READ time so writes stay O(new rows).

    The timestamp column is parsed to a real timestamp for the sort but
    returned in its original string form (schema equals what was
    written). Each append generation is a separate part file, so the
    scan parallelizes across generations."""
    df = spark.read.option("header", True).csv(path)
    from pyspark.sql import functions as F

    return (
        df.orderBy(
            F.to_timestamp("timestamp").desc(),
            *[c for c in df.columns if c != "timestamp"],
        )
    )


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed, sorted table sink: co-locates rows by key so repeated
    big-big joins/aggregations on ``bucket_cols`` run WITHOUT a shuffle
    (verified in tests/test_scale_hygiene.py: SortMergeJoin with zero
    Exchange). Bucketing requires saveAsTable (the bucket layout lives
    in the catalog, not the files)."""
    writer = (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .option("path", path)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    target_files: int | None = None,
) -> None:
    """ORC sink (native, vectorized) — see read_orc for when."""
    if target_files is not None:
        df = df.repartition(target_files)
    df.write.mode(mode).orc(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    target_files: int | None = None,
    compression: str | None = "gzip",
) -> None:
    """JSON-lines sink — the interchange format most LLM training
    toolchains ingest. Compressed by default (text JSON is 5-10× parquet
    size uncompressed); one row per line keeps the files splittable for
    downstream Spark/Beam readers when uncompressed or zstd-framed."""
    if target_files is not None:
        df = df.repartition(target_files)
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def overwrite_partitions(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in ``df``, leaving sibling partitions untouched — the idempotent
    re-run primitive for incremental backfills (re-land one ingest date
    without rewriting the table; static overwrite mode would drop ALL
    partitions first). Setting is per-write via the DataFrameWriter
    option, not a session-wide config flip."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def compact_parquet(spark, path: str, target_files: int) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` files (read → repartition → write-aside → swap).
    Returns the row count (sanity-checked before the swap). The swap is
    directory-rename based — atomic enough for a maintenance window;
    table formats (Delta/Iceberg) do this transactionally via OPTIMIZE.
    """
    import shutil

    df = spark.read.parquet(path)
    n_before = df.count()
    staged = path.rstrip("/") + "__compacting"
    write_parquet(df, staged, target_files=target_files)
    n_after = spark.read.parquet(staged).count()
    if n_after != n_before:
        shutil.rmtree(staged, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {n_before} -> {n_after}; aborted"
        )
    old = path.rstrip("/") + "__old"
    shutil.move(path, old)
    shutil.move(staged, path)
    shutil.rmtree(old)
    return n_after
