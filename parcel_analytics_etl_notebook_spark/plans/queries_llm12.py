"""Round-8 LLM-pipeline additions: incremental near-dup maintenance
(the fuzzy twin of incremental_corpus_dedup), grid-bucketed DBSCAN core
points, quality-based near-dup survivorship, product-quantization
codes, and OOV-rate split evaluation.

The headliner is ``incremental_lsh_near_dup`` (VERDICT r07 #5): once a
corpus is live, near-dedup runs batch-vs-corpus — new arrivals band
into the SAME LSH buckets as the standing corpus and candidate pairs
come from a batch×all bucket join, never a fresh corpus self-join. The
verified new pairs are exactly the delta a production pipeline appends
to its materialized pair table (the near_dup_pairs memo):

    pairs' = pairs ∪ verified_new_pairs      (corpus-only pairs
                                              untouched by the batch)

Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import tokens
from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
    drop_hot_shingles,
    lsh_banded,
    poly_hash,
    shingle_hashes_from_tokens,
    with_minhash,
)
from parcel_analytics_etl_notebook_spark.operators.graph import (
    dup_groups_from_pairs,
)
from parcel_analytics_etl_notebook_spark.plans.catalog import register, table
from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
    _SQL_DUP_COMPONENTS,
    _SQL_POLY,
    _SQL_TOKS,
    MAX_LSH_BUCKET,
    MAX_SHINGLE_DF,
    _near_dup_pair_ids,
)
from parcel_analytics_etl_notebook_spark.plans.queries_llm11 import (
    _split_case,
    _split_case_sql,
)

#: "today's crawl": docs with doc_id % 10 == 0 play the incoming batch
#: (same arrival convention as incremental_corpus_dedup)
_BATCH_MOD = 10


# --------------------------------------------------------------------------
# Incremental LSH near-dup maintenance (batch-vs-corpus, VERDICT r07 #5)
# --------------------------------------------------------------------------
@register(
    "incremental_lsh_near_dup",
    oracle=f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
h AS (SELECT doc_id, list_transform(l, tok -> {_SQL_POLY.format('tok')}) AS hh FROM t),
s AS (SELECT doc_id,
             list_transform(range(1, len(hh)-1),
                 i -> ((hh[i]*1000003 + hh[i+1]) % 1000000007 * 1000003 + hh[i+2]) % 1000000007) AS sh
      FROM h),
sig AS (SELECT doc_id,
               list_transform(range(0, 16),
                   s -> list_min(list_transform(sh, x -> ((2*s+1)*x + s*7919) % 1000000007))) AS m
        FROM s),
banded0 AS (
    SELECT doc_id, band, list_slice(m, band*4 + 1, band*4 + 4) AS bkey
    FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS band) bands
),
banded AS (
    SELECT * FROM banded0
    QUALIFY count(*) OVER (PARTITION BY band, array_to_string(bkey, '_')) <= {MAX_LSH_BUCKET}
),
cand AS (
    SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
                    greatest(a.doc_id, b.doc_id) AS id_b
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id <> b.doc_id
    WHERE a.doc_id % {_BATCH_MOD} = 0
),
sh0 AS (SELECT doc_id, unnest(list_distinct(sh)) AS shingle FROM s),
shc AS (SELECT * FROM sh0 QUALIFY count(*) OVER (PARTITION BY shingle) <= {MAX_SHINGLE_DF}),
sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
shared AS (
    SELECT c.id_a, c.id_b, count(*) AS shared
    FROM cand c JOIN shc a ON a.doc_id = c.id_a
                JOIN shc b ON b.doc_id = c.id_b AND b.shingle = a.shingle
    GROUP BY 1, 2
)
SELECT sp.id_a, sp.id_b,
       CASE WHEN sp.id_a % {_BATCH_MOD} = 0 AND sp.id_b % {_BATCH_MOD} = 0
            THEN 'batch_batch' ELSE 'batch_corpus' END AS pair_type,
       round(sp.shared / (sa.n + sb.n - sp.shared), 4) AS jaccard
FROM shared sp
JOIN sizes sa ON sp.id_a = sa.doc_id
JOIN sizes sb ON sp.id_b = sb.doc_id
WHERE sp.shared / (sa.n + sb.n - sp.shared) >= 0.2
ORDER BY sp.id_a, sp.id_b
""",
)
def incremental_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup maintenance: LSH candidates of an INCOMING
    batch (doc_id % 10 = 0) against the standing corpus — batch bands
    join ALL bands (so batch×corpus and batch×batch pairs emerge, each
    tagged), verified with exact Jaccard (≥ 0.2) over df-capped distinct
    shingles. The output is precisely the pair-table DELTA: union it
    with the existing memo's corpus-only pairs and the near_dup_pairs
    artifact is up to date WITHOUT re-running the corpus self-join —
    the fuzzy twin of incremental_corpus_dedup's hash-membership probe,
    and the steady-state form of lsh_near_dup_pairs once a corpus is
    live.

    Memo-update semantics (documented contract): pairs touching only
    corpus docs are invariant under an append-only batch, so
    ``pairs' = pairs ∪ this-query's rows``; a RE-crawled doc (same id,
    new text) would additionally delete its old pairs by id first —
    the same id-grain anti-join as the exact-dedup incremental path.

    Scale shape: banding the batch is O(batch); the candidate join
    shuffles on the (band, signature) bucket key against the corpus
    index — at 100 TB the corpus side is a PRE-BUILT bucketed table
    (written once by the backfill, bucket-pruned by the batch's keys),
    so the probe cost is O(batch × bucket occupancy), never O(corpus).
    Signature computation for the corpus is likewise amortized into
    the backfill; this query recomputes it honestly because the
    driver's tables are ephemeral. Verification joins are pair-grain
    (array_intersect on the two docs' capped shingle sets)."""
    docs = table(spark, sf_dir, "documents")
    nparts = spark.sparkContext.defaultParallelism

    sig = with_minhash(docs, num_hashes=16)
    banded = lsh_banded(sig, bands=4, sig_len=16, max_bucket=MAX_LSH_BUCKET)
    batch = banded.filter(F.col("doc_id") % _BATCH_MOD == 0)
    a, b = batch.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig_band") == F.col("b.sig_band"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("id_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("id_b"),
        )
        .dropDuplicates()
    )

    # exact-Jaccard verification on df-capped distinct shingle sets,
    # pair-grain: join each candidate to its two docs' sets, intersect
    tok_hashes = F.transform(tokens("text"), lambda t: poly_hash(t))
    th = docs.select("doc_id", tok_hashes.alias("__th")).repartition(nparts)
    sh = th.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingle_hashes_from_tokens(F.col("__th"), 3))
        ).alias("shingle"),
    )
    shc = drop_hot_shingles(sh, max_df=MAX_SHINGLE_DF)
    # NOT persisted (r12 measured): the two pair sides' copies of this
    # subtree end in identical exchanges, so AQE already shares the
    # shuffle (ReusedExchange); an explicit persist only added a
    # materialization barrier and +2-3 jobs with no wall gain
    sets = shc.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("shingle")).alias("sh_set"),
        F.count(F.lit(1)).alias("n"),
    )
    sa = sets.select(
        F.col("doc_id").alias("id_a"),
        F.col("sh_set").alias("set_a"),
        F.col("n").alias("na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("id_b"),
        F.col("sh_set").alias("set_b"),
        F.col("n").alias("nb"),
    )
    shared = F.size(F.array_intersect("set_a", "set_b")).cast("bigint")
    jac = shared / (F.col("na") + F.col("nb") - shared)
    pair_type = F.when(
        (F.col("id_a") % _BATCH_MOD == 0) & (F.col("id_b") % _BATCH_MOD == 0),
        "batch_batch",
    ).otherwise("batch_corpus")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.2)
        .select(
            "id_a",
            "id_b",
            pair_type.alias("pair_type"),
            F.round(jac, 4).alias("jaccard"),
        )
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------------------
# DBSCAN core points via grid-cell bucketing (density clustering)
# --------------------------------------------------------------------------
_DBSCAN_EPS = 0.03
_DBSCAN_MINPTS = 8  # |N_eps(p)| including p itself
#: eps² computed ONCE in Python and embedded verbatim on both engines:
#: 0.03*0.03 is not the double nearest to the literal 0.0009, and a
#: boundary point would flip between engines if each side squared (or
#: parsed) independently
_DBSCAN_EPS2 = _DBSCAN_EPS * _DBSCAN_EPS


@register(
    "dbscan_core_points",
    oracle=f"""
WITH p AS (
    SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
           CAST(embedding[2] AS DOUBLE) AS y
    FROM embeddings
),
n AS (
    SELECT a.vec_id, count(*) AS cnt
    FROM p a JOIN p b
      ON a.vec_id <> b.vec_id
     AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
         <= CAST('{_DBSCAN_EPS2!r}' AS DOUBLE)
    GROUP BY 1
)
SELECT p.vec_id, CAST(coalesce(n.cnt, 0) AS BIGINT) AS n_neighbors,
       coalesce(n.cnt, 0) >= {_DBSCAN_MINPTS - 1} AS is_core
FROM p LEFT JOIN n USING (vec_id)
ORDER BY p.vec_id
""",
)
def dbscan_core_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN's expensive step — per-point eps-neighborhood counts and
    the core/non-core verdict — over the first two embedding
    dimensions, computed with grid-cell bucketing: hash every point to
    a ⌊coord/eps⌋ cell, probe each point against its 3×3 neighbor
    cells (any point within eps is in one of them), verify with the
    exact squared distance. The oracle states the brute-force O(n²)
    join; the engine's cell join touches only co-located candidates —
    one equi-shuffle on the cell key, the same partition-pruning shape
    as session_incident_overlap's grid join. eps² is computed once in
    Python and embedded verbatim on BOTH engines (see _DBSCAN_EPS2).

    At 100 TB: density clustering over learned 2-D projections (UMAP/
    PCA of embeddings) is a standard corpus-curation step; the grid
    join scales as Σ cell² occupancy, so a density cap per cell (drop
    or subsample boilerplate-dense cells, as the LSH bucket cap does)
    bounds the worst case."""
    emb = table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
    ).withColumns(
        {
            "cx": F.floor(F.col("x") / _DBSCAN_EPS).cast("long"),
            "cy": F.floor(F.col("y") / _DBSCAN_EPS).cast("long"),
        }
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = (
        pts.select("vec_id", "x", "y", "cx", "cy", F.explode(offsets).alias("o"))
        .select(
            F.col("vec_id").alias("ia"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("o.dx")).alias("kx"),
            (F.col("cy") + F.col("o.dy")).alias("ky"),
        )
    )
    base = pts.select(
        F.col("vec_id").alias("ib"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("kx"),
        F.col("cy").alias("ky"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    cnt = (
        probe.join(base, ["kx", "ky"])
        .filter((F.col("ia") != F.col("ib")) & (d2 <= F.lit(_DBSCAN_EPS2)))
        .groupBy(F.col("ia").alias("vec_id"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        pts.select("vec_id")
        .join(cnt, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cnt", F.lit(0)).cast("bigint").alias("n_neighbors"),
            (F.coalesce("cnt", F.lit(0)) >= _DBSCAN_MINPTS - 1).alias("is_core"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# Near-dup survivorship (quality-based canonical selection)
# --------------------------------------------------------------------------
@register(
    "near_dup_survivorship",
    oracle=f"""
WITH RECURSIVE {_SQL_DUP_COMPONENTS},
lab AS (
    SELECT d.doc_id, d.n_chars, coalesce(c.canonical_id, d.doc_id) AS group_id
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
),
r AS (
    SELECT doc_id, group_id,
           first_value(doc_id) OVER (
               PARTITION BY group_id ORDER BY n_chars DESC, doc_id
           ) AS rep_id
    FROM lab
)
SELECT doc_id, group_id, rep_id, doc_id = rep_id AS is_survivor
FROM r ORDER BY doc_id
""",
)
def near_dup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship policy over near-dup groups: within each connected
    component of the verified pair graph, the KEPT representative is
    the highest-quality doc (longest n_chars, ties to the smaller id) —
    not the min-id canonical near_dup_groups reports. Separating the
    GROUP LABEL (stable min-id, good as a join key) from the SURVIVOR
    CHOICE (a policy over doc attributes) is how production dedup keeps
    the best copy while keeping group identity stable across reruns.
    Every doc appears exactly once (singletons are their own group and
    survivor), so `filter(is_survivor)` IS the deduplicated corpus.

    Scale shape: pairs come from the shared memo (bench ledger
    memo:near_dup_pairs), components from iterative min-label
    propagation (operators/graph.py), and the survivor pick is one
    window over groups — group-sized partitions, no global sort."""
    pairs = _near_dup_pair_ids(spark, sf_dir)
    groups = dup_groups_from_pairs(pairs)
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    lab = docs.join(groups, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        F.coalesce("canonical_id", "doc_id").alias("group_id"),
    )
    w = (
        Window.partitionBy("group_id")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return lab.select(
        "doc_id",
        "group_id",
        F.first("doc_id").over(w).alias("rep_id"),
    ).select(
        "doc_id",
        "group_id",
        "rep_id",
        (F.col("doc_id") == F.col("rep_id")).alias("is_survivor"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Product quantization: per-subspace code assignment + distortion
# --------------------------------------------------------------------------
_PQ_M = 4        # subspaces
_PQ_SUBDIM = 16  # dims per subspace (64-dim embeddings)
_PQ_CODES = 8    # codewords per subspace: subvectors of vec_ids 1..8


@register(
    "pq_code_histogram",
    oracle=f"""
WITH sub AS (
    SELECT vec_id, s AS subspace,
           list_slice(embedding, s*{_PQ_SUBDIM} + 1, s*{_PQ_SUBDIM} + {_PQ_SUBDIM}) AS sv
    FROM embeddings CROSS JOIN (SELECT unnest(range(0, {_PQ_M})) AS s) ss
),
cb AS (
    SELECT vec_id AS cid, subspace, sv AS cv
    FROM sub WHERE vec_id BETWEEN 1 AND {_PQ_CODES}
),
d0 AS (
    SELECT v.vec_id, v.subspace, c.cid,
           round(list_sum(list_transform(range(1, {_PQ_SUBDIM} + 1),
               i -> (CAST(v.sv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))
                  * (CAST(v.sv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)))), 9) AS d2
    FROM sub v JOIN cb c ON v.subspace = c.subspace
),
d AS (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id, subspace ORDER BY d2, cid) AS rn
    FROM d0
)
SELECT CAST(subspace AS BIGINT) AS subspace, CAST(cid AS BIGINT) AS code,
       CAST(count(*) AS BIGINT) AS n_vecs, round(avg(d2), 4) AS mean_sqdist
FROM d WHERE rn = 1
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def pq_code_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al. 2011): split every embedding
    into 4 contiguous 16-dim subvectors, assign each to its nearest
    codeword (L2², rounded to 9 before the argmin, ties to the lower
    code id — the IVF convention), report the per-(subspace, code)
    population and mean distortion. The codebook is the subvectors of
    vec_ids 1..8 — fixed, deterministic seeds, same convention as
    ivf_ann_topk's fixed centroids (a trained codebook is the same
    plan with learned constants, as ivf_trained_topk shows for IVF).

    Scale shape: the codebook is model-sized (4×8 rows, broadcast);
    each vector does 4·8 codegen'd subvector distances in one pass —
    this is exactly the compression
    step an ANN index build fans out over the corpus, and the code
    histogram + distortion is its standard quality audit (a skewed
    histogram or fat distortion tail means the codebook misfits the
    data)."""
    emb = table(spark, sf_dir, "embeddings")
    slices = F.array(
        *[
            F.slice("embedding", s * _PQ_SUBDIM + 1, _PQ_SUBDIM)
            for s in range(_PQ_M)
        ]
    )
    sub = emb.select(
        "vec_id", F.posexplode(slices).alias("subspace", "sv")
    )
    cb = sub.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= _PQ_CODES)
    ).select(
        F.col("vec_id").alias("cid"),
        "subspace",
        F.col("sv").alias("cv"),
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col("sv").cast("array<double>"),
                F.col("cv").cast("array<double>"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        9,
    )
    scored = sub.join(F.broadcast(cb), "subspace").select(
        "vec_id", "subspace", "cid", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id", "subspace").orderBy("d2", "cid")
    best = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return (
        best.groupBy(
            F.col("subspace").cast("bigint").alias("subspace"),
            F.col("cid").cast("bigint").alias("code"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(F.avg("d2"), 4).alias("mean_sqdist"),
        )
        .orderBy("subspace", "code")
    )


# --------------------------------------------------------------------------
# OOV rate by split (vocabulary fit of the train split)
# --------------------------------------------------------------------------
_OOV_VOCAB_K = 16


@register(
    "oov_rate_by_split",
    oracle=f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
tk AS (SELECT {_split_case_sql('doc_id')} AS split, unnest(l) AS tok FROM t),
vc AS (SELECT tok, count(*) AS c FROM tk WHERE split = 'train' GROUP BY tok),
v AS (SELECT tok FROM vc ORDER BY c DESC, tok LIMIT {_OOV_VOCAB_K})
SELECT tk.split,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (WHERE v.tok IS NULL) AS BIGINT) AS oov_tokens,
       CAST(count(*) FILTER (WHERE v.tok IS NULL) * 10000 // count(*) AS BIGINT) AS oov_rate_bp
FROM tk LEFT JOIN v ON tk.tok = v.tok
GROUP BY tk.split ORDER BY tk.split
""",
)
def oov_rate_by_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per train/val/test split: the vocabulary
    is the top-16 train-split tokens (count desc, token asc — a total
    order, so the cut is deterministic), and each split
    reports its token total, OOV token count, and the OOV rate in
    exact integer basis points (·10000, integer division — the
    tie-free convention). The eval every tokenizer/vocab decision gets
    before training: a test-split OOV rate far above train's means the
    split hash correlates with content (or the vocab is too small).
    Uses the same engine-portable split hash as group_aware_split
    (queries_llm11._split_case, overflow-safe form).

    Scale shape: one token explode (map-only), one map-combined count
    per (split) and per train token; the vocab cut is orderBy+limit →
    TakeOrderedAndProject (distributed per-partition heaps — never a
    single-partition window over the token vocabulary), then a
    broadcast left join tags OOV tokens."""
    docs = table(spark, sf_dir, "documents")
    tk = docs.select(
        _split_case(F.col("doc_id")).alias("split"),
        F.explode(tokens("text")).alias("tok"),
    )
    vocab = (
        tk.filter(F.col("split") == "train")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(_OOV_VOCAB_K)
        .select("tok", F.lit(1).alias("__v"))
    )
    return (
        tk.join(F.broadcast(vocab), "tok", "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("__v").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("oov_tokens"),
        )
        .select(
            "split",
            "n_tokens",
            "oov_tokens",
            F.expr("CAST(oov_tokens * 10000 DIV n_tokens AS BIGINT)").alias(
                "oov_rate_bp"
            ),
        )
        .orderBy("split")
    )
