"""Bucketed-table sink: the shuffle-free co-located join layout.

The catalog's docstrings repeatedly name the 100 TB answer for a
recurring fact-to-fact join: "bucket both sides on the key". This
module is that answer as code. ``bucketBy(n, key)`` +
``sortBy(key)`` + ``saveAsTable`` writes each side hash-partitioned
into the SAME bucket scheme, so a later equi-join on the key needs NO
Exchange on either side — the join runs bucket-against-bucket, which
is what turns a recurring daily fact join from the cluster's biggest
shuffle into a scan-and-merge (tests/test_bucketed_join.py pins the
no-Exchange plan and the result parity against the shuffled join).

Bucketing requires the table metastore path (``saveAsTable``) because
the bucket spec lives in catalog metadata, not the parquet files —
a plain ``.parquet(path)`` write silently ignores ``bucketBy``. The
writes here are EXTERNAL tables (explicit ``path`` option) so the
data lands where the caller says and only the bucket spec lives in
the session catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external parquet table bucketed (and
    bucket-sorted) on ``bucket_cols``. Both sides of a co-located join
    must use the SAME ``n_buckets`` and key order — mismatched bucket
    counts silently fall back to a shuffled join."""
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def drop_table(spark: SparkSession, table: str) -> None:
    """Drop the catalog entry (external data files are left in place)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
