"""Similarity search over embedding columns (LLM-pipeline extension).

Brute-force cosine top-k is the exact baseline: one broadcast of the
query vector, one pass over the corpus, TakeOrderedAndProject for the
top-k — no shuffle at all. The scale path is IVF: a coarse centroid
assignment prunes the corpus to the nearest buckets before scoring
(probe cost drops by ~n_centroids/n_probe), trading recall for the
pruning exactly like FAISS IVF-Flat.

All vector math via higher-order functions in double precision
(functions/vectors.py) — JVM-side, Arrow-free, oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.vectors import (
    _unrolled_dot_sql,
    cosine_prenormed,
    cosine_similarity,
    norm_literal_sq,
)


def brute_force_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors of a single query vector.

    ``query`` is a 1-row DataFrame (id + vector) — broadcast, so the
    corpus never shuffles; ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject (per-partition top-k, driver merge).
    Similarity is rounded before ranking so that accumulation-order
    jitter can't reorder the boundary; ties break on id.
    """
    q = query.select(
        F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    if dim is not None:
        # norms as their own projected columns: the fused form blows the
        # 64 KB codegen method limit and runs interpreted (see
        # cosine_prenormed) — the query-side norm is computed once on
        # the 1-row broadcast side, the corpus-side norm once per row
        q = q.withColumn("__nq", F.sqrt(norm_literal_sq("__qvec", dim)))
        scored = (
            corpus.withColumn("__nc", F.sqrt(norm_literal_sq(vec_col, dim)))
            .crossJoin(F.broadcast(q))
            .filter(F.col(id_col) != F.col("__qid"))
            .select(
                id_col,
                F.round(
                    cosine_prenormed(vec_col, "__qvec", "__nc", "__nq", dim),
                    round_to,
                ).alias("cosine"),
            )
        )
    else:
        score = cosine_similarity(F.col(vec_col), F.col("__qvec"))
        scored = (
            corpus.crossJoin(F.broadcast(q))
            .filter(F.col(id_col) != F.col("__qid"))
            .select(
                id_col,
                F.round(score, round_to).alias("cosine"),
            )
        )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def assign_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    dim: int | None = None,
) -> DataFrame:
    """IVF coarse quantization: attach each vector's nearest centroid
    (max cosine, ties to the lowest centroid id). The centroid table is
    tiny and broadcast; cost is |corpus| × |centroids| dot products,
    all codegen'd — no shuffle."""
    c = centroids.select(
        F.col(id_col).alias(centroid_id), F.col(vec_col).alias("__cvec")
    )
    if dim is not None:
        # per-side norm columns, not the fused expression — |corpus| + k
        # sqrt chains instead of |corpus|·k·2, and codegen stays under
        # the 64 KB method limit (see cosine_prenormed)
        c = c.withColumn("__nc", F.sqrt(norm_literal_sq("__cvec", dim)))
        sim = cosine_prenormed(vec_col, "__cvec", "__nv", "__nc", dim)
        scored = (
            corpus.withColumn("__nv", F.sqrt(norm_literal_sq(vec_col, dim)))
            .crossJoin(F.broadcast(c))
            .withColumn("__sim", F.round(sim, 9))
        )
    else:
        sim = cosine_similarity(F.col(vec_col), F.col("__cvec"))
        scored = corpus.crossJoin(F.broadcast(c)).withColumn(
            "__sim", F.round(sim, 9)
        )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col(centroid_id)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__sim", "__cvec", "__nv", "__nc")
    )


def ivf_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only vectors whose centroid is among the
    query's ``n_probe`` nearest centroids. At 100 TB the assignment is
    precomputed/persisted (partitioned by centroid) so a query touches
    only n_probe partitions — this is the partition-pruning ANN shape."""
    assigned = assign_centroids(corpus, centroids, id_col, vec_col, dim=dim)
    probe_ids = assign_probe_centroids(query, centroids, n_probe, id_col, vec_col)
    pruned = assigned.join(
        F.broadcast(probe_ids), on="centroid_id", how="inner"
    ).drop("centroid_id")
    return brute_force_topk(pruned, query, k, id_col, vec_col, dim=dim)


def assign_probe_centroids(
    query: DataFrame,
    centroids: DataFrame,
    n_probe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The query's n_probe nearest centroid ids (1-row query)."""
    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("__cvec")
    )
    q = query.select(F.col(vec_col).alias("__qvec"))
    return (
        c.crossJoin(F.broadcast(q))
        .select(
            "centroid_id",
            F.round(cosine_similarity("__cvec", "__qvec"), 9).alias("__sim"),
        )
        .orderBy(F.col("__sim").desc(), F.col("centroid_id"))
        .limit(n_probe)
        .select("centroid_id")
    )


def _cosine_pandas_udf(round_to: int):
    """Arrow-vectorized pairwise cosine: numpy einsum over the batch.
    Measured 2.7× faster than the HOF expression at 660k pairs × 64
    dims (3.9s vs 10.3s, local[32] sf0.1) — numpy's SIMD reduction
    beats interpreted lambda folds. Tradeoff: numpy's summation order
    differs from the sequential fold, so values can differ in the last
    float ulps — fine in production, but the oracle-gated catalog query
    keeps the HOF form for bit-identical cross-engine rounding."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def cos(a, b):
        # no type hints: this module uses `from __future__ import
        # annotations`, which stringifies hints and breaks pyspark's
        # pandas-UDF signature inference — pass returnType explicitly
        va = np.stack(a.values).astype(np.float64)
        vb = np.stack(b.values).astype(np.float64)
        dots = np.einsum("ij,ij->i", va, vb)
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = dots / (na * nb)
        return pd.Series(np.round(out, round_to))

    return pandas_udf(cos, "double")


def cosine_pairs_blocked(
    df: DataFrame,
    block_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    vectorized: bool = False,
    broadcast_build: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """All pairs with cosine ≥ threshold WITHIN a blocking key (e.g. an
    LSH bucket or label): the self-join shuffles both sides on the
    block key once, and the quadratic blow-up is bounded per block —
    the standard embedding-dedup shape at scale. Never call without a
    blocking key on a large corpus.

    ``vectorized=True`` scores with the Arrow-batched numpy UDF (2.7×
    faster, last-ulp float differences possible — see _cosine_pandas_udf).

    ``broadcast_build=True`` broadcasts the build side and round-robin
    repartitions the probe side — use when the corpus fits in executor
    memory but has FEW distinct blocks (a shuffle join on a 10-value
    key caps parallelism at 10 tasks; broadcast spreads the quadratic
    scoring over every core). At corpus sizes past broadcast range,
    keep the default shuffle join and salt the block key instead."""
    a = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
    )
    b = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
    )
    if dim is not None and not vectorized:
        # norms precomputed per SIDE (not per pair): N + M sqrt chains
        # instead of 2·N·M, and each codegen unit stays under the JVM's
        # 64 KB method limit (one fused dot+2·norm+guard expression
        # overflowed it and fell back to interpreted)
        a = a.withColumn("__na", F.sqrt(norm_literal_sq("__va", dim)))
        b = b.withColumn("__nb", F.sqrt(norm_literal_sq("__vb", dim)))
    if broadcast_build:
        a = a.repartition(df.sparkSession.sparkContext.defaultParallelism)
        b = F.broadcast(b)
    if vectorized:
        score = _cosine_pandas_udf(round_to)(F.col("__va"), F.col("__vb"))
    elif dim is not None:
        # the ONE place the guard/divide expression lives — inlining a
        # copy here once let the two "bit-identical" paths drift
        score = F.round(
            cosine_prenormed("__va", "__vb", "__na", "__nb", dim), round_to
        )
    else:
        score = F.round(cosine_similarity("__va", "__vb"), round_to)
    return (
        a.join(b, on="__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("__blk").alias(block_col),
            "id_a",
            "id_b",
            score.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
