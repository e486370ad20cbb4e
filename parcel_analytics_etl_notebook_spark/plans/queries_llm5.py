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


def _containment_oracle() -> str:
    from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
        _SQL_POLY,
        _SQL_TOKS,
        MAX_SHINGLE_DF,
    )

    return f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
hh AS (SELECT doc_id, list_transform(l, tok -> {_SQL_POLY.format('tok')}) AS th FROM t),
sh0 AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(1, len(th)-1),
               i -> ((th[i]*1000003 + th[i+1]) % 1000000007 * 1000003 + th[i+2]) % 1000000007))) AS shingle
    FROM hh
),
sh AS (SELECT * FROM sh0 QUALIFY count(*) OVER (PARTITION BY shingle) <= {MAX_SHINGLE_DF}),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT id_a, id_b, shared,
       round(CAST(shared AS DOUBLE) / least(sa.n, sb.n), 4) AS containment,
       round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 4) AS jaccard,
       CASE WHEN sa.n <= sb.n THEN id_a ELSE id_b END AS contained_id
FROM pairs
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE CAST(shared AS DOUBLE) / least(sa.n, sb.n) >= 0.6
"""


@register("ngram_containment_pairs", oracle=_containment_oracle())
def ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection: containment coefficient
    |A∩B| / min(|A|,|B|) over 3-gram shingle sets, threshold 0.6 —
    the quote/subset detector. A short document wholly embedded in a
    long one scores containment ≈ 1 while its Jaccard stays low (the
    union is dominated by the long side), so the symmetric
    `ngram_jaccard_pairs` threshold never sees it; dedup pipelines
    that only check Jaccard keep both copies of every quoted passage.
    Emits both scores plus which side is the contained (smaller) set.

    Same scale armor as the Jaccard twin (shared inverted-index
    machinery): int64 shingle hashes, hot-shingle df cap before the
    self-join (the cap is part of the operator definition — restated
    in the oracle), pair counting only on colliding docs. The only
    semantic difference is the denominator and the looser asymmetric
    threshold."""
    from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
        drop_hot_shingles,
        shingle_hashes_from_tokens,
    )
    from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
        MAX_SHINGLE_DF,
        poly_hash,
        tokens,
    )

    docs = table(spark, sf_dir, "documents")
    tok_hashes = F.transform(tokens("text"), lambda t: poly_hash(t))
    th = docs.select("doc_id", tok_hashes.alias("__th")).repartition(
        spark.sparkContext.defaultParallelism
    )
    sh0 = th.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingle_hashes_from_tokens(F.col("__th"), 3))
        ).alias("shingle"),
    ).persist()
    sh = drop_hot_shingles(sh0, max_df=MAX_SHINGLE_DF).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).persist()
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    cont = F.col("shared").cast("double") / F.least(
        F.col("sa.n"), F.col("sb.n")
    )
    jac = F.col("shared") / (F.col("sa.n") + F.col("sb.n") - F.col("shared"))
    return (
        pairs.join(sa, F.col("id_a") == F.col("sa.doc_id"))
        .join(sb, F.col("id_b") == F.col("sb.doc_id"))
        .filter(cont >= 0.6)
        .select(
            "id_a",
            "id_b",
            "shared",
            F.round(cont, 4).alias("containment"),
            F.round(jac, 4).alias("jaccard"),
            F.when(F.col("sa.n") <= F.col("sb.n"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("contained_id"),
        )
    )
