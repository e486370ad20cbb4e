"""LLM-pipeline batch 8: corpus-distribution divergence (Jensen–
Shannon between source token distributions) and mutual-nearest-
neighbor pairing inside LSH blocks.

JSD is the symmetric, bounded (≤ ln 2) divergence data-mixture work
standardizes on — PSI/KL (psi_acctbal_drift) blow up on disjoint
support, JSD doesn't, which is exactly the corpus-comparison case
(most tokens appear in only one source). Mutual-NN is the bitext-
mining / strict-dedup pairing rule: a pair survives only if each side
is the OTHER's best match inside the block, which kills the hub-vector
false positives a one-sided top-1 keeps.

Oracle-parity conventions as in plans/catalog.py; the float strategy
is the batch-14 integer-collapse rule — per-token/per-pair float terms
round to integer micro/nano units BEFORE any many-row sum, so no
cross-engine accumulation order exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import tokens
from parcel_analytics_etl_notebook_spark.plans.catalog import register, table
from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
    _SQL_COS,
    _SQL_TOKS,
)
from parcel_analytics_etl_notebook_spark.plans.queries_llm2 import (
    _LSH_DIM,
    _lsh_bucket_col,
    _lsh_bucket_sql,
)


# --------------------------------------------------------------------------
# Jensen–Shannon divergence between per-source token distributions
# --------------------------------------------------------------------------
@register(
    "jsd_source_token_divergence",
    oracle=f"""
WITH toks AS (
    SELECT source, unnest({_SQL_TOKS}) AS token FROM documents
),
dist AS (
    SELECT source, token, count(*) AS cnt FROM toks GROUP BY 1, 2
),
tot AS (
    SELECT source, sum(cnt) AS tot FROM dist GROUP BY 1
),
d AS (
    SELECT dist.source, dist.token, dist.cnt, tot.tot
    FROM dist JOIN tot USING (source)
),
pairs AS (
    SELECT a.source AS source_a, b.source AS source_b,
           a.cnt AS cnt_a, a.tot AS tot_a,
           b.cnt AS cnt_b, b.tot AS tot_b,
           CAST(a.cnt AS DOUBLE) / a.tot AS p,
           CAST(b.cnt AS DOUBLE) / b.tot AS q
    FROM d a JOIN d b ON a.token = b.token AND a.source < b.source
),
terms AS (
    SELECT source_a, source_b, cnt_a, tot_a, cnt_b, tot_b,
           CAST(round(
               (0.5 * p * ln(p / ((p + q) / 2.0))
                + 0.5 * q * ln(q / ((p + q) / 2.0))) * 1000000000.0,
               0) AS BIGINT) AS t_nano
    FROM pairs
)
SELECT source_a, source_b,
       CAST(count(*) AS BIGINT) AS n_common_tokens,
       round(1.0 - CAST(sum(cnt_a) AS DOUBLE) / max(tot_a), 6)
           AS miss_mass_a,
       round(1.0 - CAST(sum(cnt_b) AS DOUBLE) / max(tot_b), 6)
           AS miss_mass_b,
       round(CAST(sum(t_nano) AS DOUBLE) / 1000000000.0
             + 0.5 * ln(2.0) * (1.0 - CAST(sum(cnt_a) AS DOUBLE) / max(tot_a))
             + 0.5 * ln(2.0) * (1.0 - CAST(sum(cnt_b) AS DOUBLE) / max(tot_b)),
             6) AS jsd_nats
FROM terms
GROUP BY source_a, source_b
ORDER BY source_a, source_b
""",
)
def jsd_source_token_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise Jensen–Shannon divergence (nats) between the unigram
    token distributions of every source pair — the mixture-design
    matrix answering "which corpora are interchangeable and which add
    genuinely different text". Tokens private to one side contribute
    exactly 0.5·p·ln2 each, so the whole private-mass term collapses
    ALGEBRAICALLY to 0.5·ln2·(1 − Σ_common p): only common tokens are
    ever joined, no union grid is materialized, and disjoint support
    is handled exactly (JSD → ln 2), where KL/PSI would divide by
    zero.

    Float parity: per-token JS terms round to integer NANO-units
    before the pair sum; the private-mass corrections come from exact
    integer count sums. The only float aggregation anywhere is an
    exact bigint sum.

    Scale shape: explode → one partial-combining groupBy to the
    (source, token) frame, a broadcast-sized totals join, then ONE
    token-keyed self-join whose fan-out is bounded by |sources|²/2 per
    token (sources is catalog-sized, not row-sized). The pair rollup
    partial-combines to |sources|² rows."""
    docs = table(spark, sf_dir, "documents")
    dist = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = dist.groupBy("source").agg(F.sum("cnt").alias("tot"))
    d = dist.join(F.broadcast(tot), "source")
    a = d.select(
        F.col("source").alias("source_a"),
        "token",
        F.col("cnt").alias("cnt_a"),
        F.col("tot").alias("tot_a"),
    )
    b = d.select(
        F.col("source").alias("source_b"),
        "token",
        F.col("cnt").alias("cnt_b"),
        F.col("tot").alias("tot_b"),
    )
    pairs = a.join(b, "token").filter(F.col("source_a") < F.col("source_b"))
    p = F.col("cnt_a").cast("double") / F.col("tot_a")
    q = F.col("cnt_b").cast("double") / F.col("tot_b")
    m = (p + q) / 2.0
    t_nano = (
        F.round(
            (0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m))
            * 1000000000.0,
            0,
        )
    ).cast("bigint")
    terms = pairs.select(
        "source_a", "source_b", "cnt_a", "tot_a", "cnt_b", "tot_b",
        t_nano.alias("t_nano"),
    )
    miss_a = 1.0 - F.sum("cnt_a").cast("double") / F.max("tot_a")
    miss_b = 1.0 - F.sum("cnt_b").cast("double") / F.max("tot_b")
    ln2 = 0.6931471805599453
    return (
        terms.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common_tokens"),
            F.round(miss_a, 6).alias("miss_mass_a"),
            F.round(miss_b, 6).alias("miss_mass_b"),
            F.round(
                F.sum("t_nano").cast("double") / 1000000000.0
                + 0.5 * ln2 * miss_a
                + 0.5 * ln2 * miss_b,
                6,
            ).alias("jsd_nats"),
        )
        .orderBy("source_a", "source_b")
    )


# --------------------------------------------------------------------------
# Mutual nearest neighbors inside LSH blocks
# --------------------------------------------------------------------------
@register(
    "mutual_nn_blocked_pairs",
    oracle=f"""
WITH bk AS (
    SELECT vec_id, embedding, {_lsh_bucket_sql('embedding')} AS bucket
    FROM embeddings
),
scored AS (
    SELECT x.bucket, x.vec_id AS src, y.vec_id AS dst,
           round({_SQL_COS.format('x.embedding', 'y.embedding')}, 9) AS cos
    FROM bk x JOIN bk y
      ON x.bucket = y.bucket AND x.vec_id <> y.vec_id
),
best AS (
    SELECT bucket, src, dst, cos
    FROM (SELECT bucket, src, dst, cos,
                 row_number() OVER (PARTITION BY src
                                    ORDER BY cos DESC, dst) AS rn
          FROM scored)
    WHERE rn = 1
)
SELECT a.bucket AS bucket,
       a.src AS id_a, a.dst AS id_b,
       round(a.cos, 6) AS cosine
FROM best a JOIN best b ON a.dst = b.src AND b.dst = a.src
WHERE a.src < a.dst
ORDER BY id_a, id_b
""",
)
def mutual_nn_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-nearest-neighbor pairs inside hyperplane-LSH blocks:
    keep (a, b) only when b is a's best in-block match AND a is b's —
    the strict pairing rule from bitext mining and conservative dedup.
    A hub vector that is merely "everyone's second-favorite" matches
    nobody here, unlike threshold pairing (embedding_lsh_dedup_pairs)
    where hubs fan out into giant clusters.

    Determinism: best-match selection ranks on 9dp-rounded cosine with
    a dst-id tiebreak; the mutuality join is pure id equality.

    Scale shape: linear bucketing pass, one shuffle on the bucket key,
    per-bucket quadratic scoring with the top-1 pruned map-side via
    WindowGroupLimit, then a vec-grain self-join on (src, dst) ids.
    The same blow-up guards as the LSH dedup path apply (bucket caps
    in operators/dedup_fuzzy for skewed blocks). The quadratic stage
    scores with the prenormed-HOF cosine (per-side norms projected
    once per VECTOR before the bucket join; the per-pair work is one
    HOF dot — the fastest wholestage-codegen-safe form measured, see
    functions/vectors.cosine_prenormed_hof — bit-identical doubles to
    every other cosine form in the engine)."""
    from parcel_analytics_etl_notebook_spark.functions.vectors import (
        cosine_prenormed_hof,
        norm_literal_sq,
    )

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        _lsh_bucket_col("embedding").alias("bucket"),
        F.sqrt(norm_literal_sq("embedding", _LSH_DIM)).alias("__n"),
    )
    # The probe side round-robins to the session's parallelism: a small
    # benchmark corpus arrives as ONE parquet split and the broadcast
    # bucket join would run the whole quadratic stage on a single core
    # (same fix as knn_label_consistency; at 100 TB the scan already
    # has more splits than cores and this is a no-op-grade rebalance).
    x = emb.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("bucket"),
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("__va"),
        F.col("__n").alias("__na"),
    )
    y = emb.select(
        F.col("bucket"),
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    scored = (
        x.join(y, "bucket")
        .filter(F.col("src") != F.col("dst"))
        .select(
            "bucket",
            "src",
            "dst",
            F.round(
                cosine_prenormed_hof("__va", "__vb", "__na", "__nb"), 9
            ).alias("cos"),
        )
    )
    wbest = Window.partitionBy("src").orderBy(F.col("cos").desc(), "dst")
    best = (
        scored.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select("bucket", "src", "dst", "cos")
    )
    # Mutuality without a self-join: each src contributes exactly one
    # best-match row, so the UNORDERED pair {a, b} appears twice in
    # `best` iff a→b AND b→a (cos is symmetric bit-for-bit: identical
    # per-dim products, same fold order). A self-join here would
    # recompute the whole quadratic scoring lineage once per side;
    # the canonical-pair count is one pass and one tiny shuffle.
    return (
        best.groupBy(
            F.least("src", "dst").alias("id_a"),
            F.greatest("src", "dst").alias("id_b"),
        )
        .agg(
            F.min("bucket").alias("bucket"),
            F.count(F.lit(1)).alias("n_directions"),
            F.round(F.min("cos"), 6).alias("cosine"),
        )
        .filter(F.col("n_directions") == 2)
        .select("bucket", "id_a", "id_b", "cosine")
        .orderBy("id_a", "id_b")
    )
