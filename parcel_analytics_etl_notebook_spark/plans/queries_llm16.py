"""Round-8 LLM-pipeline additions, batch 5: IVF index operations.

Two index-operations queries the ANN family lacked: (1) the
nprobe-vs-recall tuning curve — the single chart every IVF deployment
is tuned from (recall@k and scan cost at nprobe = 1, 2, 4, 8, from ONE
assignment pass); (2) the inverted-list balance audit — skewed
centroid lists are the ANN twin of shuffle skew (hot lists dominate
probe latency), and rebalancing (re-training centroids, splitting hot
lists) is justified by exactly this measurement.

Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.operators.similarity import (
    assign_centroids,
    brute_force_topk,
)
from parcel_analytics_etl_notebook_spark.functions.vectors import (
    cosine_similarity,
)
from parcel_analytics_etl_notebook_spark.plans.catalog import register, table
from parcel_analytics_etl_notebook_spark.plans.queries_llm import _SQL_COS

#: probe-sweep levels (powers of two up to the centroid count)
_NPROBES = (1, 2, 4, 8)


# --------------------------------------------------------------------------
# IVF nprobe-vs-recall tuning curve (one assignment pass)
# --------------------------------------------------------------------------
@register(
    "ivf_nprobe_recall_curve",
    oracle=f"""
WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0),
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
assigned AS (
    SELECT corpus.vec_id, corpus.embedding, c.cid,
           row_number() OVER (PARTITION BY corpus.vec_id
               ORDER BY round({_SQL_COS.format('corpus.embedding', 'c.cvec')}, 9) DESC, c.cid) AS rn
    FROM corpus CROSS JOIN c
),
crank AS (
    SELECT cid, row_number() OVER (
        ORDER BY round({_SQL_COS.format('cvec', 'qvec')}, 9) DESC, cid) AS crk
    FROM c CROSS JOIN q
),
scored AS (
    SELECT a.vec_id, crank.crk,
           round({_SQL_COS.format('a.embedding', 'qvec')}, 6) AS cosine
    FROM assigned a JOIN crank ON a.cid = crank.cid CROSS JOIN q
    WHERE a.rn = 1
),
lv AS (
    SELECT l.n_probe, s.vec_id, s.cosine
    FROM (VALUES {", ".join(f"({p})" for p in _NPROBES)}) l(n_probe), scored s
    WHERE s.crk <= l.n_probe
),
topk AS (
    SELECT * FROM lv
    QUALIFY row_number() OVER (PARTITION BY n_probe
                               ORDER BY cosine DESC, vec_id) <= 5
),
scanned AS (SELECT n_probe, count(*) AS n_scanned FROM lv GROUP BY 1),
exact AS (
    SELECT corpus.vec_id
    FROM corpus CROSS JOIN q
    ORDER BY round({_SQL_COS.format('corpus.embedding', 'qvec')}, 6) DESC, corpus.vec_id
    LIMIT 5
)
SELECT CAST(t.n_probe AS BIGINT) AS n_probe,
       CAST(s.n_scanned AS BIGINT) AS n_scanned,
       CAST(count(*) AS BIGINT) AS k,
       CAST(coalesce(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS hits,
       round(coalesce(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 END), 0)
             / count(*), 4) AS recall_at_5
FROM topk t
LEFT JOIN exact e USING (vec_id)
JOIN scanned s USING (n_probe)
GROUP BY t.n_probe, s.n_scanned
ORDER BY 1
""",
)
def ivf_nprobe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF tuning curve: recall@5 AND scan cost at nprobe = 1, 2,
    4, 8, against exact brute-force ground truth — the
    accuracy-vs-latency frontier every FAISS-style deployment picks its
    operating point from (ivf_recall_at_5 is this curve's single
    nprobe=2 point). n_scanned makes the tradeoff explicit: recall
    climbs with nprobe exactly as the scanned fraction does.

    Scale shape: ONE centroid-assignment pass serves all four sweep
    points (each corpus vector explodes only to the levels that include
    its centroid's query-rank — at most 4 rows, on average ~half), one
    per-level window picks the top-5s, and ground truth is computed
    once. The naive sweep would re-run ivf_topk per level, re-assigning
    the corpus 4x. Query vector and 8-row centroid-rank frames
    broadcast (plan-fence allowlisted)."""
    emb = table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") != 0)
    query = emb.filter(F.col("vec_id") == 0)
    centroids = emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= 8))

    assigned = assign_centroids(corpus, centroids)
    q = query.select(F.col("embedding").alias("__qvec"))
    crank = (
        centroids.select(F.col("vec_id").alias("centroid_id"), "embedding")
        .crossJoin(F.broadcast(q))
        .select(
            "centroid_id",
            F.round(cosine_similarity(F.col("embedding"), F.col("__qvec")), 9)
            .alias("__sim"),
        )
        .withColumn(
            "crk",
            F.row_number().over(
                Window.orderBy(F.col("__sim").desc(), "centroid_id")
            ),
        )
        .select("centroid_id", "crk")
    )
    levels = F.array(*[F.lit(p) for p in _NPROBES])
    scored = (
        assigned.join(F.broadcast(crank), "centroid_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "crk",
            F.round(
                cosine_similarity(F.col("embedding"), F.col("__qvec")), 6
            ).alias("cosine"),
        )
    )
    lv = scored.select(
        "vec_id",
        "cosine",
        F.explode(
            F.filter(levels, lambda l: l >= F.col("crk"))
        ).alias("n_probe"),
    )
    w = Window.partitionBy("n_probe").orderBy(
        F.col("cosine").desc(), "vec_id"
    )
    topk = lv.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 5
    )
    scanned = lv.groupBy("n_probe").agg(
        F.count(F.lit(1)).alias("n_scanned")
    )
    exact = (
        brute_force_topk(emb, query, k=5)
        .select("vec_id")
        .withColumn("__hit", F.lit(1))
    )
    return (
        topk.join(exact, "vec_id", "left")
        .groupBy("n_probe")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            F.coalesce(F.sum("__hit"), F.lit(0))
            .cast("bigint")
            .alias("hits"),
            F.round(
                F.coalesce(F.sum("__hit"), F.lit(0)) / F.count(F.lit(1)), 4
            ).alias("recall_at_5"),
        )
        .join(scanned, "n_probe")
        .select(
            F.col("n_probe").cast("bigint").alias("n_probe"),
            F.col("n_scanned").cast("bigint").alias("n_scanned"),
            "k",
            "hits",
            "recall_at_5",
        )
        .orderBy("n_probe")
    )


# --------------------------------------------------------------------------
# IVF inverted-list balance audit
# --------------------------------------------------------------------------
@register(
    "ivf_list_balance",
    oracle=f"""
WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
assigned AS (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round({_SQL_COS.format('e.embedding', 'c.cvec')}, 9) DESC, c.cid) AS rn
    FROM embeddings e CROSS JOIN c
),
per AS (
    SELECT cid AS centroid_id, count(*) AS n_vectors
    FROM assigned WHERE rn = 1 GROUP BY 1
)
SELECT CAST(centroid_id AS BIGINT) AS centroid_id,
       CAST(n_vectors AS BIGINT) AS n_vectors,
       CAST(n_vectors * 10000 // (SELECT sum(n_vectors) FROM per)
            AS BIGINT) AS share_bp
FROM per ORDER BY 1
""",
)
def ivf_list_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF inverted-list balance: vectors per centroid list and each
    list's share of the corpus in exact basis points — the ANN twin of
    shuffle-skew diagnosis (salting_balance_audit): a hot list
    dominates every probe that touches it, so probe latency variance
    is bounded by exactly this histogram. The number that justifies
    re-training centroids or splitting hot lists (and, on a cluster,
    sizing the per-list partitions the assignment is written out by).

    Scale shape: one broadcast centroid assignment over one corpus
    scan, an 8-row aggregate, and an unbounded-window total on the
    8-row frame (never a row-level cross join)."""
    emb = table(spark, sf_dir, "embeddings")
    centroids = emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= 8))
    per = (
        assign_centroids(emb, centroids)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )
    tot = Window.partitionBy()
    return (
        per.withColumn("total", F.sum("n_vectors").over(tot))
        .select(
            F.col("centroid_id").cast("bigint").alias("centroid_id"),
            F.col("n_vectors").cast("bigint").alias("n_vectors"),
            # integer div, never float-divide-then-cast: a correctly-
            # rounded double can land ABOVE the exact integer floor
            F.expr("n_vectors * 10000 div total")
            .cast("bigint")
            .alias("share_bp"),
        )
        .orderBy("centroid_id")
    )
