"""Distributed Lloyd's k-means over embedding columns — the trainer for
the IVF coarse quantizer (operators/similarity.ivf_topk takes the
centroid table this produces; the reference pipeline has no trainer, its
IVF demo uses fixed corpus vectors as centroids).

Scale shape per iteration (the only shapes in the loop):
- ASSIGN: broadcast the k·dim centroid table, argmax-cosine per row —
  map-only, zero shuffle, whole-stage codegen'd;
- RECOMPUTE: groupBy(centroid) with ``dim`` per-component AVG aggregates
  — map-side partials, ONE shuffle of k·dim partial sums per partition.
Centroids are collected to the driver between iterations (k·dim doubles
— inherently driver-small; the same thing MLlib's KMeans does) so each
iteration starts from a literal frame: flat lineage, no recursive plan
growth, and the values can be rounded identically to what a SQL oracle
computes.

Determinism: assignment rounds cosine to 9 dp with ties to the lowest
centroid id; recomputed components are rounded to 6 dp. Both rules are
restated in the catalog oracle (plans/queries_llm2.kmeans_centroids), so
3 unrolled iterations hash-match DuckDB exactly. Empty clusters keep
their previous centroid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.vectors import (
    dot_literal,
    norm_literal_sq,
)


def assign_nearest(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out_col: str = "centroid_id",
) -> DataFrame:
    """Attach argmax-cosine centroid id (ties → lowest id) from a
    driver-side centroid list. Map-only: the centroid constants unroll
    into whole-stage-codegen'd dot/norm chains (functions/vectors.
    dot_literal — bit-identical to the HOF form, faster since HOF
    lambdas are interpreted), the row norm is computed ONCE and shared
    across the k cosines (the literals change per k-means iteration, so
    every iteration pays a fresh codegen compile — tree size is the
    compile-time knob), and the per-row argmax is one fold over k
    (cid, sim) structs — no join, no shuffle, no window."""
    dim = len(centroids[0][1])
    corpus = corpus.withColumn(
        "__na", F.sqrt(norm_literal_sq(vec_col, dim))
    )

    def sim_to(vec: list[float]) -> F.Column:
        wnorm_sq = 0.0
        for x in vec:
            wnorm_sq = wnorm_sq + float(x) * float(x)
        wnorm = wnorm_sq ** 0.5
        na = F.col("__na")
        return F.when(
            (na == 0) | (F.lit(wnorm) == 0), F.lit(None).cast("double")
        ).otherwise(dot_literal(vec_col, vec) / (na * F.lit(wnorm)))

    pairs = F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.round(sim_to(vec), 9).alias("sim"),
            )
            for cid, vec in centroids
        ]
    )
    # fold: keep the struct with higher sim (or lower cid on exact tie).
    # A NULL-sim candidate (zero-norm vector) must never WIN — the old
    # `acc.sim IS NULL → take x` rule let every candidate replace the
    # previous one, pinning zero-norm rows to the LAST centroid. Now a
    # zero-norm row keeps cid NULL (no nearest centroid), matching the
    # window twin's semantics of "similarity undefined".
    best = F.aggregate(
        pairs,
        F.struct(
            F.lit(None).cast("bigint").alias("cid"),
            F.lit(None).cast("double").alias("sim"),
        ),
        lambda acc, x: F.when(
            x["sim"].isNotNull()
            & (
                acc["sim"].isNull()
                | (x["sim"] > acc["sim"])
                | ((x["sim"] == acc["sim"]) & (x["cid"] < acc["cid"]))
            ),
            x,
        ).otherwise(acc),
    )
    return corpus.withColumn(out_col, best["cid"]).drop("__na")


def kmeans_fit(
    corpus: DataFrame,
    init: list[tuple[int, list[float]]],
    dim: int,
    iters: int = 3,
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Run ``iters`` Lloyd iterations from ``init``; return the trained
    (centroid_id, components) list (components rounded to 6 dp).

    Each iteration: one map-only assign pass + one single-shuffle
    groupBy with ``dim`` AVG aggregates. Driver holds only k·dim
    doubles. Deterministic (see module docstring) — the catalog query
    hash-checks 3 iterations against a DuckDB restatement."""
    centroids = [(cid, [round(float(x), 6) for x in vec]) for cid, vec in init]
    for _ in range(iters):
        assigned = assign_nearest(corpus, centroids, vec_col)
        means = assigned.groupBy("centroid_id").agg(
            *[
                F.expr(
                    f"round(avg(CAST({vec_col}[{d}] AS DOUBLE)), 6)"
                ).alias(f"c{d}")
                for d in range(dim)
            ]
        )
        new = {
            r["centroid_id"]: [r[f"c{d}"] for d in range(dim)]
            for r in means.collect()
        }
        # empty cluster → keep previous centroid
        centroids = [(cid, new.get(cid, vec)) for cid, vec in centroids]
    return centroids


def centroids_frame(
    spark: SparkSession, centroids: list[tuple[int, list[float]]]
) -> DataFrame:
    """(vec_id, embedding) frame from a trained centroid list — the
    shape operators/similarity.ivf_topk expects for its coarse
    quantizer."""
    return spark.createDataFrame(
        [(cid, [float(x) for x in vec]) for cid, vec in centroids],
        "vec_id bigint, embedding array<double>",
    )
