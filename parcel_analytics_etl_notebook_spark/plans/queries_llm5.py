"""Batch: corpus-diagnostics additions — sketch-based exact heavy
hitters over the vocabulary, and the adjacent-pair cosine histogram
that profiles embedding-space health.

Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.vectors import (
    cosine_similarity,
)
from parcel_analytics_etl_notebook_spark.operators.heavyhitters import (
    exact_heavy_hitters,
)
from parcel_analytics_etl_notebook_spark.plans.catalog import register, table

# DuckDB twin of functions/vectors.cosine_similarity (1-indexed lists),
# shared idiom with plans/queries_llm.
_SQL_COS = (
    "(list_sum(list_transform(range(1, len({0})+1), i -> CAST({0}[i] AS DOUBLE)*CAST({1}[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(range(1, len({0})+1), i -> CAST({0}[i] AS DOUBLE)*CAST({0}[i] AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(range(1, len({1})+1), i -> CAST({1}[i] AS DOUBLE)*CAST({1}[i] AS DOUBLE))))))"
)


@register(
    "heavy_hitter_words",
    oracle="""
WITH w AS (
    SELECT lower(unnest(string_split(text, ' '))) AS word FROM documents
),
wf AS (SELECT word FROM w WHERE word <> ''),
tot AS (SELECT count(*) AS n FROM wf)
SELECT word,
       CAST(count(*) AS BIGINT) AS cnt,
       round(CAST(count(*) AS DOUBLE) / any_value(tot.n), 6) AS freq
FROM wf CROSS JOIN tot
GROUP BY word
HAVING count(*) > any_value(tot.n) / 200.0
ORDER BY cnt DESC, word
""",
)
def heavy_hitter_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT vocabulary heavy hitters (words with > 0.5% of all
    tokens) without a full-vocabulary shuffle: Misra-Gries candidate
    sketching + exact recount of candidates only
    (operators/heavyhitters.py).

    The oracle is the naive full GROUP BY — the point of the parity
    check is precisely that the two-pass sketch path returns the
    IDENTICAL answer. Scale shape: pass 1 is a shuffle-free
    mapInPandas scan emitting k-row summaries per partition (collected
    rows = partitions × k, independent of corpus size); pass 2
    shuffles only rows matching the ≤ k candidates, with the In-filter
    pushed to the scan. At 100 TB with a 10⁸-term vocabulary the full
    groupBy shuffles every term once — this shape shuffles ≤ k of
    them. The stopword head of a Zipf corpus is exactly what
    quality-filter rules (stopword ratio) and tokenizer-vocab audits
    need enumerated."""
    docs = table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    return exact_heavy_hitters(words, "word", k=200)


@register(
    "adjacent_cosine_histogram",
    oracle=f"""
WITH p AS (
    SELECT label, embedding,
           lead(embedding) OVER (PARTITION BY label ORDER BY vec_id)
               AS nxt
    FROM embeddings
),
c AS (
    SELECT label, round({_SQL_COS.format('embedding', 'nxt')}, 6) AS cos
    FROM p WHERE nxt IS NOT NULL
)
SELECT label,
       round(floor(cos * 10) / 10, 1) AS bin,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(avg(cos), 4) AS avg_cos
FROM c
GROUP BY label, round(floor(cos * 10) / 10, 1)
ORDER BY label, bin
""",
)
def adjacent_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health profile: histogram of cosine similarity
    between vec_id-adjacent vectors within each label, in 0.1-wide
    bins. A collapsed embedding model (everything similar) piles mass
    at the top bins; a healthy one spreads — the cheap O(N) diagnostic
    that catches representation collapse without any pairwise join.

    Deterministic O(N) pairing: lead() within the label partition —
    never an all-pairs sample. The window and the histogram groupBy
    both key on label, one shuffle; cosine runs in codegen'd
    higher-order functions with float64 accumulation, bit-identical to
    the oracle's list_transform chain, and the round-6-before-binning
    order makes bin boundaries engine-stable."""
    emb = table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    p = emb.select(
        "label",
        "embedding",
        F.lead("embedding").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    c = p.select(
        "label",
        F.round(cosine_similarity("embedding", "nxt"), 6).alias("cos"),
    )
    return (
        c.groupBy(
            "label",
            F.round(F.floor(F.col("cos") * 10) / 10, 1).alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.avg("cos"), 4).alias("avg_cos"),
        )
        .orderBy("label", "bin")
    )
