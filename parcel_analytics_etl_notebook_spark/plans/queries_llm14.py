"""Round-8 LLM-pipeline additions, batch 3: positional phrase search
and near-dup cluster density.

Two shapes the corpus-curation catalog lacked: (1) the phrase-query
path over a positional inverted index — postings (term, doc, pos)
probed by a phrase list and intersected with positional equi-joins,
the way a search engine answers "exact phrase" queries without
re-scanning text; (2) the cluster-quality audit of transitive near-dup
grouping — edge density per connected component, which separates
genuine duplicate cliques (density ~10000 bp) from chained
false-merges (sparse components linked through hub docs), the classic
MinHash-grouping pathology check.

Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import tokens
from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import shingles
from parcel_analytics_etl_notebook_spark.plans.catalog import register, table
from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
    _SQL_DUP_COMPONENTS,
    _SQL_TOKS,
    near_dup_pairs_frame,
)

#: how many top phrases the positional index is probed with
_N_PHRASES = 20


# --------------------------------------------------------------------------
# Phrase search over a positional inverted index
# --------------------------------------------------------------------------
@register(
    "phrase_match_positional",
    oracle=f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
tri AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(l) - 1),
               i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS phrase
    FROM t
),
cnt AS (
    SELECT phrase, count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs
    FROM tri GROUP BY 1
),
top AS (
    SELECT *, row_number() OVER (
        ORDER BY n_occurrences DESC, phrase) AS rn
    FROM cnt
)
SELECT phrase, CAST(n_occurrences AS BIGINT) AS n_occurrences,
       CAST(n_docs AS BIGINT) AS n_docs
FROM top WHERE rn <= {_N_PHRASES}
ORDER BY phrase
""",
)
def phrase_match_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search over a positional inverted index: postings
    (term, doc_id, pos) are probed with a phrase list and intersected
    by two positional equi-joins (pos+1, pos+2) — the plan a search
    engine runs for quoted queries, where only the postings rows of the
    phrase's own terms are ever touched. The probe phrases are the
    corpus's top-20 trigrams (count desc, then lexicographic — a
    deterministic selection computed cheaply from token arrays, one
    explode, no self-join); the positional index then re-counts each
    phrase's occurrences and containing docs, so the two independent
    plans cross-check each other row-for-row.

    Scale shape: the probe joins hit the postings table three times,
    each time pre-filtered by a broadcast semi-join on the phrase's
    word (20 terms -> a sliver of the index survives the scan), then
    equi-join on (doc_id, pos±k) — co-partitioned by doc_id, no
    all-pairs stage anywhere. At 100 TB the postings frame is the
    materialized index a deployment would already maintain; phrase
    latency is independent of corpus text size once the index is
    partitioned by term."""
    docs = table(spark, sf_dir, "documents")
    # deterministic phrase selection: top-N trigrams from token arrays —
    # orderBy+limit plans as TakeOrderedAndProject (per-partition top-N
    # + a 20-row merge on the driver), never a one-partition window
    # tokens() is materialized as a column BEFORE shingling: composing
    # shingles(tokens(...)) inline makes every element access inside the
    # transform lambda re-evaluate the full split() (measured 4x slower)
    top = (
        docs.select(tokens("text").alias("l"))
        .select(F.explode(shingles(F.col("l"), 3)).alias("phrase"))
        .groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("n_sel"))
        .orderBy(F.col("n_sel").desc(), "phrase")
        .limit(_N_PHRASES)
        .select(
            "phrase",
            F.split("phrase", " ").getItem(0).alias("w1"),
            F.split("phrase", " ").getItem(1).alias("w2"),
            F.split("phrase", " ").getItem(2).alias("w3"),
        )
    )
    # the positional inverted index (what a deployment materializes)
    post = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "term")
    )
    p1 = post.join(F.broadcast(top), post.term == top.w1).select(
        "doc_id", "pos", "phrase", "w2", "w3"
    )
    # fetch ONLY the probed terms' postings lists before any shuffle —
    # the broadcast semi-join twin of "read 3 postings lists from a
    # term-partitioned index"; without it the positional equi-joins
    # shuffle the ENTIRE index (measured 14.5s -> ~3s at sf0.1)
    p2 = post.join(
        F.broadcast(top.select(F.col("w2").alias("term")).distinct()),
        "term",
        "leftsemi",
    ).select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("pos2"),
        F.col("term").alias("term2"),
    )
    p3 = post.join(
        F.broadcast(top.select(F.col("w3").alias("term")).distinct()),
        "term",
        "leftsemi",
    ).select(
        F.col("doc_id").alias("d3"),
        F.col("pos").alias("pos3"),
        F.col("term").alias("term3"),
    )
    hits = p1.join(
        p2,
        (F.col("doc_id") == F.col("d2"))
        & (F.col("pos2") == F.col("pos") + 1)
        & (F.col("term2") == F.col("w2")),
    ).join(
        p3,
        (F.col("doc_id") == F.col("d3"))
        & (F.col("pos3") == F.col("pos") + 2)
        & (F.col("term3") == F.col("w3")),
    )
    return (
        hits.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .orderBy("phrase")
    )


# --------------------------------------------------------------------------
# Near-dup cluster density (transitive-merge quality audit)
# --------------------------------------------------------------------------
@register(
    "near_dup_cluster_density",
    oracle=f"""
WITH RECURSIVE {_SQL_DUP_COMPONENTS},
m AS (SELECT canonical_id, count(*) AS n_members FROM comp GROUP BY 1),
e AS (
    SELECT c.canonical_id, count(*) AS n_edges
    FROM good g JOIN comp c ON g.id_a = c.doc_id
    GROUP BY 1
)
SELECT m.canonical_id,
       CAST(n_members AS BIGINT) AS n_members,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(2 * n_edges * 10000
            // (n_members * (n_members - 1)) AS BIGINT) AS density_bp
FROM m JOIN e USING (canonical_id)
ORDER BY canonical_id
""",
)
def near_dup_cluster_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge density of every transitive near-dup cluster, in exact
    BIGINT basis points: 2·E / (n·(n−1)) per connected component of the
    verified Jaccard-pair graph. Density 10000 bp means the component
    is a clique (every member pair was independently verified similar —
    a true duplicate family); low density flags CHAINED merges, where
    A~B and B~C pulled an A,C pair into one cluster that no scorer ever
    compared — the inflation pathology transitive MinHash grouping is
    known for, and the audit that decides whether a pipeline dedups by
    component or by clique.

    Scale shape: pure pair-grain work over the session's near-dup pair
    memo (built once per sweep, shared with near_dup_groups /
    near_dup_dedup_summary) — one component map join and two
    component-grain aggregates. Components come from the distributed
    min-label propagation in operators/graph.py; n >= 2 for every
    component by construction, so the density denominator never
    vanishes."""
    from parcel_analytics_etl_notebook_spark.operators.graph import (
        dup_groups_from_pairs,
    )

    pairs = near_dup_pairs_frame(spark, sf_dir).select("id_a", "id_b")
    groups = dup_groups_from_pairs(pairs)
    m = groups.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    e = (
        pairs.join(
            groups.withColumnRenamed("doc_id", "id_a"), "id_a"
        )
        .groupBy("canonical_id")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    return (
        m.join(e, "canonical_id")
        .select(
            "canonical_id",
            F.col("n_members").cast("bigint").alias("n_members"),
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.expr(
                "2 * n_edges * 10000 div (n_members * (n_members - 1))"
            )
            .cast("bigint")
            .alias("density_bp"),
        )
        .orderBy("canonical_id")
    )
