"""Round-8 LLM-pipeline additions, batch 4: blocking-quality
evaluation and token-level dedup savings.

Two audits a production dedup pipeline publishes alongside its output:
(1) the blocking tradeoff — pair completeness (what fraction of true
near-dup pairs the cheap candidate generator actually surfaces) vs
reduction ratio (what fraction of the all-pairs space it never had to
score) for the MinHash-LSH blocker, measured against the exactly
verified n-gram Jaccard truth pairs; (2) the payoff statement — how
many TRAINING TOKENS near-dedup removes per source (doc counts
understate the win when duplicates skew long).

Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import token_count
from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
    lsh_candidate_pairs,
    with_minhash,
)
from parcel_analytics_etl_notebook_spark.plans.catalog import register, table
from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
    _SQL_DUP_COMPONENTS,
    _SQL_TOKS,
    MAX_LSH_BUCKET,
    near_dup_pairs_frame,
)


# --------------------------------------------------------------------------
# Blocking quality: pair completeness vs reduction ratio of MinHash-LSH
# --------------------------------------------------------------------------
@register(
    "blocking_quality_eval",
    oracle=f"""
WITH RECURSIVE {_SQL_DUP_COMPONENTS},
shl AS (
    SELECT doc_id,
           list_transform(range(1, len(th)-1),
               i -> ((th[i]*1000003 + th[i+1]) % 1000000007 * 1000003 + th[i+2]) % 1000000007) AS sh
    FROM hh
),
sig AS (SELECT doc_id,
               list_transform(range(0, 16),
                   s -> list_min(list_transform(sh, x -> ((2*s+1)*x + s*7919) % 1000000007))) AS m
        FROM shl),
banded0 AS (
    SELECT doc_id, band, list_slice(m, band*4 + 1, band*4 + 4) AS bkey
    FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS band) bands
),
banded AS (
    SELECT * FROM banded0
    QUALIFY count(*) OVER (PARTITION BY band, array_to_string(bkey, '_')) <= {MAX_LSH_BUCKET}
),
lshcand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
nd AS (SELECT count(*) AS n_docs FROM documents),
nt AS (SELECT count(*) AS n_truth FROM good),
nc AS (SELECT count(*) AS n_candidates FROM lshcand),
nf AS (SELECT count(*) AS n_found
       FROM lshcand c JOIN good g ON c.id_a = g.id_a AND c.id_b = g.id_b)
SELECT 'minhash_lsh_4x4' AS scheme,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_found AS BIGINT) AS n_found,
       CAST(n_found * 10000 // n_truth AS BIGINT) AS pair_completeness_bp,
       CAST(10000 - n_candidates * 10000 // (n_docs * (n_docs - 1) // 2)
            AS BIGINT) AS reduction_ratio_bp
FROM nd, nt, nc, nf
""",
)
def blocking_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blocking tradeoff, measured: pair completeness (recall of
    true near-dup pairs among the blocker's candidates) and reduction
    ratio (fraction of the C(n,2) all-pairs space the blocker never
    scores) for MinHash-LSH 4x4 banding, against the exactly verified
    n-gram Jaccard truth pairs (the session pair memo). These two
    numbers ARE the blocking literature's quality axes (Christen 2012):
    a blocker is deployable when PC stays near 10000 bp while RR is
    also near 10000 bp — and the S-curve math says 4 bands x 4 rows
    holds PC high precisely for the >=0.2-Jaccard pairs the truth set
    contains. Exact BIGINT basis points; no sampling.

    Scale shape: candidates come from the banded bucket join (hot
    buckets capped, never all-pairs); truth comes from the shared pair
    memo; the intersection is a pair-grain equi-join. The four scalar
    counts combine as 1-row cross joins (plan-fence allowlisted) —
    nothing data-sized crosses anything."""
    docs = table(spark, sf_dir, "documents")
    cand = lsh_candidate_pairs(
        with_minhash(docs, num_hashes=16), bands=4, max_bucket=MAX_LSH_BUCKET
    )
    truth = near_dup_pairs_frame(spark, sf_dir).select("id_a", "id_b")
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    nf = cand.join(truth, ["id_a", "id_b"], "leftsemi").agg(
        F.count(F.lit(1)).alias("n_found")
    )
    return (
        nd.crossJoin(nt)
        .crossJoin(nc)
        .crossJoin(nf)
        .select(
            F.lit("minhash_lsh_4x4").alias("scheme"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_truth").cast("bigint").alias("n_truth"),
            F.col("n_candidates").cast("bigint").alias("n_candidates"),
            F.col("n_found").cast("bigint").alias("n_found"),
            F.expr("n_found * 10000 div n_truth")
            .cast("bigint")
            .alias("pair_completeness_bp"),
            F.expr(
                "10000 - n_candidates * 10000"
                " div (n_docs * (n_docs - 1) div 2)"
            )
            .cast("bigint")
            .alias("reduction_ratio_bp"),
        )
    )


# --------------------------------------------------------------------------
# Token-level dedup savings per source
# --------------------------------------------------------------------------
@register(
    "token_dedup_inflation",
    oracle=f"""
WITH RECURSIVE {_SQL_DUP_COMPONENTS},
d AS (
    SELECT source, doc_id, CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens
    FROM documents
),
j AS (
    SELECT d.source, d.n_tokens,
           CASE WHEN c.doc_id IS NULL OR c.canonical_id = d.doc_id
                THEN 1 ELSE 0 END AS kept
    FROM d LEFT JOIN comp c ON d.doc_id = c.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS total_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(kept) AS BIGINT) AS kept_docs,
       CAST(sum(kept * n_tokens) AS BIGINT) AS kept_tokens,
       CAST((sum(n_tokens) - sum(kept * n_tokens)) * 10000
            // sum(n_tokens) AS BIGINT) AS saved_tokens_bp
FROM j GROUP BY source ORDER BY source
""",
)
def token_dedup_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What near-dedup actually SAVES, in training tokens per source:
    each document's token count weighted by whether canonical-member
    dedup keeps it (docs outside any near-dup group keep themselves).
    Doc-count summaries (near_dup_dedup_summary) understate the win
    when duplicates skew long — token basis points are the number a
    training-budget owner cares about, and comparing saved_tokens_bp
    against the doc-level drop rate per source is itself the length-
    bias diagnostic.

    Scale shape: corpus touched once (token counts are a projection);
    the component map joins at doc grain (AQE picks broadcast vs
    shuffle as in near_dup_dedup_summary); the component map itself is
    pair-memo-derived and shared across the family."""
    from parcel_analytics_etl_notebook_spark.operators.graph import (
        dup_groups_from_pairs,
    )

    docs = table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        token_count("text").cast("bigint").alias("n_tokens"),
    )
    pairs = near_dup_pairs_frame(spark, sf_dir).select("id_a", "id_b")
    groups = dup_groups_from_pairs(pairs)
    kept = F.when(
        F.col("canonical_id").isNull()
        | (F.col("canonical_id") == F.col("doc_id")),
        1,
    ).otherwise(0)
    return (
        docs.join(groups, "doc_id", "left")
        .select("source", "n_tokens", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("kept").cast("bigint").alias("kept_docs"),
            F.sum(F.col("kept") * F.col("n_tokens"))
            .cast("bigint")
            .alias("kept_tokens"),
            F.expr(
                "(sum(n_tokens) - sum(kept * n_tokens)) * 10000"
                " div sum(n_tokens)"
            )
            .cast("bigint")
            .alias("saved_tokens_bp"),
        )
        .orderBy("source")
    )
