"""LLM batch 10: per-dimension embedding variance screening — the
feature-quality pass a training-data pipeline runs before indexing or
distilling an embedding column (dead dimensions waste index width;
near-constant dimensions carry no retrieval signal and distort
unnormalized distance metrics).

Oracle-parity: the per-dimension moments are accumulated as DOUBLE
sums of the float32 values' exact double widenings (float→double is
value-preserving), with the final mean/variance divisions computed by
the identical formula on both engines and rounded; the output is ALL
dimensions ordered by dimension index — never a variance-ranked
cutoff, which could flip on a last-ulp accumulation difference
between a distributed and a serial summation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table


@register(
    "embedding_dim_variance",
    oracle="""
WITH x AS (
    SELECT u.dim - 1 AS dim, CAST(u.val AS DOUBLE) AS v
    FROM (
        SELECT unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings
    ) u(val, dim)
),
m AS (
    SELECT dim, CAST(count(*) AS BIGINT) AS n,
           sum(v) AS s1, sum(v * v) AS s2,
           min(v) AS lo, max(v) AS hi
    FROM x GROUP BY dim
)
SELECT CAST(dim AS BIGINT) AS dim, n,
       round(s1 / n, 6) AS mean,
       round((s2 - s1 * s1 / n) / (n - 1), 6) AS variance,
       round(lo, 6) AS min_val,
       round(hi, 6) AS max_val
FROM m ORDER BY dim
""",
)
def embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance screening of the embedding column: for
    every vector component, its count, mean, sample variance, and
    range — the standard pre-index feature audit (a dimension with
    ~zero variance is dead weight in the ANN index and a distortion in
    unnormalized metrics; one with an extreme range dominates
    unwhitened distances). Variance via the sum/sum-of-squares
    identity (s2 − s1²/n)/(n−1), computed from the same two
    accumulations on both engines.

    Scale shape: posexplode fans each vector ×dims, but the groupBy
    key is the DIMENSION INDEX — a fixed, tiny domain — so map-side
    partial aggregation collapses every task's output to (dims) rows
    before the shuffle; the shuffle itself moves executors × dims
    rows regardless of corpus size, and the low key cardinality is
    harmless because the reduce side is already partial-aggregated
    (the classic low-cardinality-groupBy shape that needs no salting).
    Stays entirely in whole-stage codegen — no UDF."""
    emb = table(spark, sf_dir, "embeddings")
    x = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        )
    )
    n = F.count(F.lit(1)).cast("bigint")
    s1, s2 = F.sum("v"), F.sum(F.col("v") * F.col("v"))
    return (
        x.groupBy(F.col("dim").cast("bigint").alias("dim"))
        .agg(
            n.alias("n"),
            F.round(s1 / n, 6).alias("mean"),
            F.round((s2 - s1 * s1 / n) / (n - 1), 6).alias("variance"),
            F.round(F.min("v"), 6).alias("min_val"),
            F.round(F.max("v"), 6).alias("max_val"),
        )
        .orderBy("dim")
    )
