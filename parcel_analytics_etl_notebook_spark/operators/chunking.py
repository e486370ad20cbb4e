"""Context-window chunking (RAG / pretraining shard prep): slide a
fixed token window with overlap over each document, one output row per
chunk. Pure sequence+slice arithmetic over the token array — JVM-side,
map-only, no UDF, no shuffle.

Window layout: chunk i covers tokens [i*stride+1, i*stride+chunk_size]
(1-based, inclusive); n_chunks = 1 if n <= chunk_size else
ceil((n - chunk_size)/stride) + 1. The last chunk may be shorter than
chunk_size but every token belongs to at least one chunk, and
consecutive chunks overlap by chunk_size - stride tokens.

The reference has no text operators at all; this generalizes its
projection machinery (SURVEY §2.2) to the array domain the LLM
pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_count(n_tokens: Column, chunk_size: int, stride: int) -> Column:
    """Closed-form number of sliding-window chunks for a token count."""
    return F.when(n_tokens <= chunk_size, F.lit(1)).otherwise(
        F.ceil((n_tokens - chunk_size) / F.lit(float(stride))) + 1
    )


def chunk_tokens(
    df: DataFrame,
    tokens_col: str,
    chunk_size: int = 64,
    stride: int = 48,
    out_col: str = "chunk",
    index_col: str | None = "chunk_idx",
) -> DataFrame:
    """Explode ``tokens_col`` (array<string>) into one row per chunk.

    All other columns ride along unchanged. ``index_col`` (0-based
    chunk position within the doc) is omitted when None.

    Scale: map-only fan-out of ~n_tokens/stride rows per doc; feed the
    result straight into the embedding/tokenizer stage (mapInPandas)
    without materializing, or aggregate it (doc_chunk_stats).
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    if stride > chunk_size:
        raise ValueError(
            f"stride={stride} > chunk_size={chunk_size} would silently "
            "skip tokens between chunks — every token must belong to at "
            "least one chunk"
        )
    n = F.size(tokens_col)
    n_chunks = chunk_count(n, chunk_size, stride)
    pairs = F.explode(
        F.transform(
            F.sequence(F.lit(0), n_chunks.cast("int") - 1),
            lambda i: F.struct(
                i.alias("idx"),
                F.slice(F.col(tokens_col), i * stride + 1, chunk_size).alias(
                    "toks"
                ),
            ),
        )
    ).alias("__chunk_pair")
    out = df.select("*", pairs)
    cols = [c for c in df.columns] + [F.col("__chunk_pair.toks").alias(out_col)]
    if index_col is not None:
        cols.append(F.col("__chunk_pair.idx").cast("bigint").alias(index_col))
    return out.select(*cols)
