"""Deduplication family (SURVEY §2.4 A2/A3 + LLM-pipeline exact dedup).

The reference's keyed ``dropDuplicates(["shipping_id"])``
(``/root/reference/etl/main.py:171,245``) is nondeterministic — which
duplicate survives depends on partitioning. The engine's keyed dedup is
a ``row_number`` window with an explicit tiebreak: deterministic,
oracle-reproducible, and the same shuffle cost (one exchange on the
key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import normalize_text


def dedup_full_row(df: DataFrame) -> DataFrame:
    """Distinct over all columns (hash aggregate; map-side partials)."""
    return df.dropDuplicates()


def dedup_first_row(
    df: DataFrame, keys: list[str], order_by: list[Column | str]
) -> DataFrame:
    """Keep exactly one row per key — the first under ``order_by``
    (ties must be broken by a unique column for determinism)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact near-byte dedup: hash normalized text, keep the lowest id
    per hash. Returns (content_hash, canonical id, dup_count).

    Scale: one shuffle on the 256-bit hash; hashes distribute uniformly
    so no skew. 100 TB of documents → hash-groupBy is the right shape.
    """
    return (
        df.withColumn("content_hash", F.sha2(normalize_text(text_col), 256))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )
