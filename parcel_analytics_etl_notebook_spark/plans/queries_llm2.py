"""LLM-data-pipeline catalog, wave 2 (round 2 additions): TF-IDF term
scoring, skew-safe per-group sampling, token-budget batch packing
(sequence packing for pretraining), and k-means training of the IVF
coarse quantizer.

Same oracle-parity conventions as queries_llm.py: identical aliases and
rounding both sides; floats rounded before ranking/filtering; integer
serialization for arrays whose float formatting could diverge across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import normalize_text, tokens
from parcel_analytics_etl_notebook_spark.plans.catalog import register, table
from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
    _SQL_COS,
    _SQL_DUP_COMPONENTS,
    _SQL_TOKS,
)

# --------------------------------------------------------------------------
# TF-IDF top terms per document
# --------------------------------------------------------------------------
@register(
    "tfidf_top_terms",
    oracle=f"""
WITH t AS (SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
idf AS (SELECT tok, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.tok,
           round(tf.tf * (ln((n.n_docs + 1.0) / (idf.df + 1.0)) + 1.0), 4) AS tfidf
    FROM tf JOIN idf USING (tok) CROSS JOIN n
)
SELECT doc_id, tok, tfidf,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= 3
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf:
    ln((N+1)/(df+1))+1) — the classic keyword/feature extractor of a
    text pipeline. Shape: explode tokens once, two hash aggregates (tf
    per (doc, tok); df per tok), a broadcast of the 1-row corpus count,
    one join back on tok, and a rank window partitioned by the
    high-cardinality doc_id — every shuffle key uniform."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    tf = t.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    idf = t.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(idf, on="tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                    + F.lit(1.0)
                ),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
    )


# --------------------------------------------------------------------------
# Skew-safe per-group sampling (salted grouped top-k)
# --------------------------------------------------------------------------
@register(
    "per_lang_sample_k",
    oracle="""
SELECT doc_id, lang FROM (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY (doc_id * 1103515245 + 12345) % 2147483647, doc_id
           ) AS rn
    FROM documents) t
WHERE rn <= 20
""",
)
def per_lang_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20-doc sample per language: rank by an LCG hash of
    doc_id (pseudo-random but engine-reproducible; exact while
    doc_id·1103515245 < 2⁶³, i.e. doc_id < 8.3e9 — re-hash ids above
    that) and keep the first 20 per lang.

    Skew note: lang has ~5 values, so a naive rank window would sort
    the whole corpus in 5 tasks — but Spark ≥3.5 plans row_number+filter
    as WindowGroupLimit with a PARTIAL (map-side, pre-shuffle) phase:
    every task prunes to its local top-20 per lang before the exchange,
    so only 20·tasks rows per lang ever shuffle (plan-asserted in
    test_plans.py). operators/topk.top_k_per_group_salted is the
    manual equivalent for engines/rank-functions the rule doesn't
    cover — here it would only add an extra exchange."""
    from parcel_analytics_etl_notebook_spark.operators.topk import (
        top_k_per_group,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        ((F.col("doc_id") * 1103515245 + 12345) % 2147483647).alias("__h"),
    )
    sampled = top_k_per_group(
        docs, ["lang"], [F.col("__h"), F.col("doc_id")], k=20
    )
    return sampled.select("doc_id", "lang")


# --------------------------------------------------------------------------
# Token-budget batch packing (sequence packing for pretraining)
# --------------------------------------------------------------------------
@register(
    "token_batch_packing",
    oracle=f"""
WITH t AS (SELECT doc_id, len({_SQL_TOKS}) AS n_tokens FROM documents),
r AS (
    SELECT doc_id, n_tokens,
           sum(CAST(n_tokens AS DOUBLE)) OVER (
               ORDER BY n_tokens DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
    FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor((run - n_tokens) / 4096) AS BIGINT) AS batch_id
FROM r
""",
)
def token_batch_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~4096-token training batches: order docs
    (longest first, id tiebreak), take the global running token sum,
    and assign batch_id = (tokens before this doc) DIV budget — the
    contiguous-fill form of sequence packing, fully deterministic.

    The running sum is the SCALABLE two-pass form
    (operators/indexing.global_running_sum: range partition →
    per-partition subtotals → driver prefix-sum → offset + local
    cumsum) — the oracle's ``SUM() OVER (ORDER BY ...)`` would
    single-task at 100 TB; this plan never does."""
    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        global_running_sum,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
    )
    run = global_running_sum(
        docs.withColumn("__neg", -F.col("n_tokens")),
        order_cols=["__neg", "doc_id"], sum_col="n_tokens", out_col="run"
    )
    return run.select(
        "doc_id",
        "n_tokens",
        F.floor((F.col("run") - F.col("n_tokens")) / 4096)
        .cast("bigint")
        .alias("batch_id"),
    )


# --------------------------------------------------------------------------
# k-means training of the IVF coarse quantizer
# --------------------------------------------------------------------------
_KM_K = 4
_KM_DIM = 64
_KM_ITERS = 3


def _kmeans_ctes(k: int, dim: int, iters: int) -> str:
    """The unrolled Lloyd-iteration CTE chain (WITH-body prefix ending
    in ``cent{iters}(cid, cvec)``): cent0 = rounded raw vectors 1..k;
    per iteration an argmax-cosine assignment (rn=1) and a
    per-component AVG rounded to 6 dp, empty clusters keeping the
    previous centroid — the exact rules of operators/clustering.
    Shared by kmeans_centroids and ivf_trained_topk."""
    parts = [
        f"""cent0 AS (
    SELECT vec_id AS cid, list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS cvec
    FROM embeddings WHERE vec_id BETWEEN 1 AND {k})"""
    ]
    for i in range(iters):
        parts.append(
            # the sim IS NOT NULL filter matches clustering.assign_nearest:
            # a zero-norm vector has NULL cosine to every centroid and is
            # EXCLUDED from assignment/means (without it, NULLS-LAST +
            # rn=1 would still hand the row to the lowest cid and shift
            # that cluster's mean — diverging from the Spark fold)
            f"""asg{i} AS (
    SELECT * FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               round({_SQL_COS.format('e.embedding', 'c.cvec')}, 9) AS sim,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY round({_SQL_COS.format('e.embedding', 'c.cvec')}, 9) DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent{i} c) s
    WHERE s.sim IS NOT NULL)"""
        )
        parts.append(
            f"""cent{i + 1} AS (
    SELECT c.cid, coalesce(m.mvec, c.cvec) AS cvec
    FROM cent{i} c LEFT JOIN (
        SELECT cid, list_transform(range(1, {dim + 1}),
            d -> round(list_sum(list_transform(vecs, v -> CAST(v[d] AS DOUBLE))) / len(vecs), 6)) AS mvec
        FROM (SELECT cid, list(embedding) AS vecs FROM asg{i} WHERE rn = 1 GROUP BY cid) g
    ) m USING (cid))"""
        )
    return ",\n".join(parts)


def _kmeans_oracle(k: int, dim: int, iters: int) -> str:
    return f"""
WITH {_kmeans_ctes(k, dim, iters)}
SELECT cid AS centroid_id,
       array_to_string(list_transform(cvec,
           x -> CAST(CAST(round(x * 1000000) AS BIGINT) AS VARCHAR)), '_') AS centroid
FROM cent{iters}
ORDER BY centroid_id
"""


@register("kmeans_centroids", oracle=_kmeans_oracle(_KM_K, _KM_DIM, _KM_ITERS))
def kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 Lloyd iterations training the IVF coarse quantizer, k=4, from
    vectors 1..4 (operators/clustering.kmeans_fit). Per iteration: a
    map-only broadcast-argmax assignment and ONE shuffle of 64 partial
    AVGs — the scale shape of distributed k-means. Components are
    rounded to 6 dp per iteration and serialized as micro-units
    (round(x·10⁶) ints '_'-joined) so the hash can't diverge on float
    formatting; the oracle unrolls the same 3 iterations as CTEs.

    Iterative fixpoint-style compute IS hash-verifiable when the
    iteration count and tie rules are pinned — this query exists to
    prove the trainer, whose output feeds ivf_topk's centroid table."""
    from parcel_analytics_etl_notebook_spark.operators.clustering import kmeans_fit

    emb = table(spark, sf_dir, "embeddings")
    init_rows = (
        emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= _KM_K))
        .select("vec_id", "embedding")
        .collect()
    )
    init = [(r["vec_id"], list(r["embedding"])) for r in init_rows]
    trained = kmeans_fit(emb, init, dim=_KM_DIM, iters=_KM_ITERS)
    rows = [
        (cid, "_".join(str(int(round(x * 1_000_000))) for x in vec))
        for cid, vec in sorted(trained)
    ]
    return spark.createDataFrame(rows, "centroid_id bigint, centroid string")


# --------------------------------------------------------------------------
# End-to-end training-corpus manifest (the "ship it" query)
# --------------------------------------------------------------------------
@register(
    "training_corpus_manifest",
    oracle=f"""
WITH RECURSIVE {_SQL_DUP_COMPONENTS},
q AS (
    SELECT doc_id, lang, {_SQL_TOKS} AS l,
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
    FROM documents
),
feats AS (
    SELECT doc_id, lang, len(l) AS n_tokens,
           CASE WHEN len(l) = 0 THEN NULL
                ELSE len(list_distinct(l)) / CAST(len(l) AS DOUBLE) END AS uniq
    FROM q
),
ex AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY norm) AS ex_canon FROM q),
k AS (
    SELECT f.lang, f.n_tokens,
           (f.n_tokens >= 20 AND coalesce(f.uniq >= 0.3, FALSE)
            AND e.ex_canon = f.doc_id
            AND (c.doc_id IS NULL OR c.canonical_id = f.doc_id)) AS kept
    FROM feats f
    JOIN ex e USING (doc_id)
    LEFT JOIN comp c ON f.doc_id = c.doc_id
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
       CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
       round(sum(CASE WHEN kept THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS kept_ratio
FROM k GROUP BY lang
""",
)
def training_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pipeline a training-data team actually ships:
    quality gate (≥20 tokens, ≥0.3 unique ratio) ∧ exact-dedup survivor
    (lowest id per normalized-text hash) ∧ near-dup survivor (canonical
    of its Jaccard component, or unpaired) → per-language manifest of
    docs / kept docs / kept tokens / keep-ratio.

    One corpus scan computes tokens + quality + the content hash; the
    exact-dedup canonical is a min-window on the (uniform) sha2 hash;
    the near-dup map reuses the capped-shingle pipeline; everything
    meets in one left join and a 5-group aggregate. Every stage is the
    scale shape proven by its standalone query — this entry proves they
    COMPOSE."""
    from parcel_analytics_etl_notebook_spark.operators.graph import (
        dup_groups_from_pairs,
    )
    from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
        near_dup_pairs_frame,
    )

    docs = table(spark, sf_dir, "documents")
    toks = tokens("text")
    base = docs.select(
        "doc_id",
        "lang",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq"),
        F.sha2(normalize_text("text"), 256).alias("__h"),
    )
    w = Window.partitionBy("__h")
    feats = base.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.when(F.col("n_tokens") == 0, F.lit(None))
        .otherwise(F.col("n_uniq") / F.col("n_tokens"))
        .alias("uniq"),
        F.min("doc_id").over(w).alias("ex_canon"),
    )
    # the near-dup map reads the SHARED pair memo (bench ledger line
    # memo:near_dup_pairs) — same artifact handoff as near_dup_groups /
    # minhash_jaccard_error; re-deriving the shingle-index self-join
    # here re-paid the family's most expensive build per sweep
    pairs = near_dup_pairs_frame(spark, sf_dir).select("id_a", "id_b")
    groups = dup_groups_from_pairs(pairs)
    kept = (
        (F.col("n_tokens") >= 20)
        & F.coalesce(F.col("uniq") >= 0.3, F.lit(False))
        & (F.col("ex_canon") == F.col("doc_id"))
        & (F.col("canonical_id").isNull() | (F.col("canonical_id") == F.col("doc_id")))
    )
    return (
        feats.join(groups, on="doc_id", how="left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(kept.cast("bigint")).alias("kept_docs"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(F.lit(0))).alias(
                "kept_tokens"
            ),
            F.round(
                F.sum(kept.cast("bigint")) / F.count(F.lit(1)), 4
            ).alias("kept_ratio"),
        )
    )


# --------------------------------------------------------------------------
# Hyperplane LSH over embeddings (random-projection bucketing)
# --------------------------------------------------------------------------
_LSH_PLANES = 8
_LSH_DIM = 64


def _plane_sign(j: int, d: int) -> int:
    """Deterministic Rademacher (±1) projection entry — an LCG on the
    flattened index, identical constant in the Spark plan and the SQL
    oracle, so both engines use the SAME hyperplanes."""
    x = ((j * _LSH_DIM + d) * 1103515245 + 12345) % 2147483647
    return 1 if x % 2 == 0 else -1


_LSH_SIGNS = [
    [_plane_sign(j, d) for d in range(_LSH_DIM)] for j in range(_LSH_PLANES)
]


def _lsh_bucket_col(vec_col: str):
    """bucket = Σ_j (dot(v, plane_j) > 0) << j — one F.expr parse of
    the shared sign-projection emission (functions/vectors.
    signed_bits_sql; bit-identical doubles per dot, integer bit sum)."""
    from parcel_analytics_etl_notebook_spark.functions.vectors import (
        signed_bits_sql,
    )

    return F.expr(signed_bits_sql(vec_col, _LSH_SIGNS))


def _lsh_bucket_sql(vec_col: str) -> str:
    terms = []
    for j, signs in enumerate(_LSH_SIGNS):
        lst = "[" + ", ".join(f"{s}.0" for s in signs) + "]"
        dot = (
            f"list_sum(list_transform(range(1, {_LSH_DIM + 1}), "
            f"d -> CAST({vec_col}[d] AS DOUBLE) * ({lst})[d]))"
        )
        terms.append(f"CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@register(
    "embedding_lsh_buckets",
    oracle=f"""
SELECT vec_id, {_lsh_bucket_sql('embedding')} AS bucket
FROM embeddings
""",
)
def embedding_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection (hyperplane) LSH bucket per embedding: sign
    bits of 8 fixed ±1 projections — cosine-similar vectors collide
    with probability 1 − θ/π per bit. One linear map-only pass; the
    bucket key is THE blocking key that makes corpus-wide embedding
    dedup sub-quadratic without a label column. Deterministic: the
    planes are a pinned LCG constant shared with the oracle."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", _lsh_bucket_col("embedding").alias("bucket"))


#: candidate budget for the 8-plane bucket join: ~9× the measured
#: sf0.1 bound (55,317 pairs), well under the 10× corpus's ~100×-grown
#: bound — sf ≤ 0.1 results are byte-identical, the quadratic regime
#: fails fast (see docstring).
EMB_LSH_CANDIDATE_BUDGET = 500_000


@register(
    "embedding_lsh_dedup_pairs",
    scale_guard={
        "budget": "EMB_LSH_CANDIDATE_BUDGET = 500,000 bucket-candidate pairs",
        "max_verified_sf": 0.1,
        "raises": "CandidateBudgetExceeded",
        "scale_path": "embedding_lsh_banded_pairs",
    },
    oracle=f"""
WITH bk AS (
    SELECT vec_id, embedding, {_lsh_bucket_sql('embedding')} AS bucket
    FROM embeddings
)
SELECT x.bucket, x.vec_id AS id_a, y.vec_id AS id_b,
       round({_SQL_COS.format('x.embedding', 'y.embedding')}, 6) AS cosine
FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE round({_SQL_COS.format('x.embedding', 'y.embedding')}, 6) >= 0.4
""",
)
def embedding_lsh_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ 0.4) blocked by the LSH
    bucket instead of a label: linear bucketing pass, one shuffle on
    the bucket key, quadratic scoring bounded per bucket. Composes
    operators/similarity.cosine_pairs_blocked with
    embedding_lsh_buckets' key.

    Guardrail (round 9): 8 planes give a FIXED 256-value bucket space,
    so occupancy grows n/256 and intra-bucket scoring n²/256 —
    quadratic in corpus size by construction, the embedding twin of
    the 8-bit SimHash band story; the round-9 10× run measured 54.5×
    wall for 10× data (SCALING.md). As with the prefix-filter join,
    the tradeoff is now enforced, not documented: Σ c·(c−1)/2 over
    bucket occupancy (one cheap aggregate BEFORE the join) must stay
    within EMB_LSH_CANDIDATE_BUDGET, else the query fails fast naming
    the scale path — ``embedding_lsh_banded_pairs`` (4×12-plane bands:
    bucket space grows exponentially with planes, recall preserved by
    OR-over-bands)."""
    from parcel_analytics_etl_notebook_spark.operators.similarity import (
        cosine_pairs_blocked,
    )
    from parcel_analytics_etl_notebook_spark.plans.queries_llm7 import (
        CandidateBudgetExceeded,
    )

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", _lsh_bucket_col("embedding").alias("bucket")
    ).persist()
    row = (
        emb.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(
                (F.col("c") * (F.col("c") - 1)).cast("bigint") / 2
            ).alias("b")
        )
        .collect()[0]
    )
    bound = int(row["b"] or 0)
    if bound > EMB_LSH_CANDIDATE_BUDGET:
        raise CandidateBudgetExceeded(
            f"embedding-LSH bucket-pair bound {bound:,} exceeds budget "
            f"{EMB_LSH_CANDIDATE_BUDGET:,}: a fixed 256-bucket space is "
            "quadratic in corpus size. Use embedding_lsh_banded_pairs "
            "(banded, bucket space scales with planes) — measured at 10x "
            "in SCALING.md."
        )
    # _LSH_DIM, not the k-means quantizer dim: the two are unrelated
    # concepts that merely both equal 64 today
    return cosine_pairs_blocked(emb, block_col="bucket", threshold=0.4, dim=_LSH_DIM)


# --------------------------------------------------------------------------
# IVF search over TRAINED centroids (trainer → index → query, end-to-end)
# --------------------------------------------------------------------------
@register(
    "ivf_trained_topk",
    oracle=f"""
WITH {_kmeans_ctes(_KM_K, _KM_DIM, _KM_ITERS)},
corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0),
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
assigned AS (
    SELECT corpus.vec_id, corpus.embedding, c.cid,
           row_number() OVER (PARTITION BY corpus.vec_id
               ORDER BY round({_SQL_COS.format('corpus.embedding', 'c.cvec')}, 9) DESC, c.cid) AS rn
    FROM corpus CROSS JOIN cent{_KM_ITERS} c
),
probe AS (
    SELECT cid FROM cent{_KM_ITERS} CROSS JOIN q
    ORDER BY round({_SQL_COS.format('cvec', 'qvec')}, 9) DESC, cid
    LIMIT 2
),
pruned AS (SELECT a.vec_id, a.embedding FROM assigned a JOIN probe USING (cid) WHERE a.rn = 1)
SELECT p.vec_id, round({_SQL_COS.format('p.embedding', 'qvec')}, 6) AS cosine
FROM pruned p CROSS JOIN q
ORDER BY cosine DESC, p.vec_id
LIMIT 5
""",
)
def ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ANN lifecycle in one verified query: TRAIN the coarse
    quantizer (3 Lloyd iterations, operators/clustering.kmeans_fit),
    build the index (centroid assignment), and SEARCH (2-probe pruning,
    exact re-scoring, top-5 for vec_id=0). ivf_ann_topk proves search
    over fixed centroids; kmeans_centroids proves the trainer; this
    proves trainer output actually feeds search — the oracle chains the
    same Lloyd CTEs into the same probe/prune/score SQL."""
    from parcel_analytics_etl_notebook_spark.operators.clustering import (
        centroids_frame,
        kmeans_fit,
    )
    from parcel_analytics_etl_notebook_spark.operators.similarity import ivf_topk

    emb = table(spark, sf_dir, "embeddings")
    init_rows = (
        emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= _KM_K))
        .select("vec_id", "embedding")
        .collect()
    )
    init = [(r["vec_id"], list(r["embedding"])) for r in init_rows]
    trained = kmeans_fit(emb, init, dim=_KM_DIM, iters=_KM_ITERS)
    centroids = centroids_frame(spark, trained)
    return ivf_topk(
        emb.filter(F.col("vec_id") != 0),
        centroids,
        emb.filter(F.col("vec_id") == 0),
        k=5,
        n_probe=2,
        # dim=None: compile-dominated at 2k rows — see ann_cosine_topk
    )


# --------------------------------------------------------------------------
# Top principal direction via distributed power iteration
# --------------------------------------------------------------------------
_PC_ITERS = 3


def _pc_oracle(dim: int, iters: int) -> str:
    """Unrolled power iteration on the uncentered second moment:
    w ← normalize(avg_i v_i·(v_i·w)), starting from 1/√dim, components
    rounded to 6 dp after every normalize — operators/clustering rules,
    restated."""
    init = round(1.0 / dim ** 0.5, 6)
    parts = [f"pc0 AS (SELECT list_transform(range(1, {dim + 1}), d -> {init}) AS w)"]
    for i in range(iters):
        parts.append(
            f"""t{i} AS (
    SELECT list(u ORDER BY d) AS u FROM (
        SELECT dims.d, avg(CAST(s.embedding[dims.d] AS DOUBLE) * s.dot) AS u
        FROM (SELECT embedding,
                     list_sum(list_transform(range(1, {dim + 1}),
                         d2 -> CAST(embedding[d2] AS DOUBLE) * w[d2])) AS dot
              FROM embeddings CROSS JOIN pc{i}) s
        CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS d) dims
        GROUP BY dims.d) g)"""
        )
        parts.append(
            f"""pc{i + 1} AS (
    SELECT list_transform(u, x -> round(x / sqrt(list_sum(list_transform(u, y -> y*y))), 6)) AS w
    FROM t{i})"""
        )
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT CAST(d AS BIGINT) AS dim_idx, w[d] AS component
FROM pc{iters} CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS d) dims
ORDER BY dim_idx
"""


@register("embedding_top_pc", oracle=_pc_oracle(_KM_DIM, _PC_ITERS))
def embedding_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by distributed
    POWER ITERATION on the uncentered second moment — covariance-free:
    each iteration is one map pass (per-row dot with the broadcast
    direction) plus ONE shuffle of dim partial averages, never
    materializing the dim×dim matrix. Driver holds dim doubles.
    Deterministic (fixed init 1/√dim, 3 iterations, round-6 after each
    normalize) so the unrolled oracle hash-matches. The embedding-
    diagnostics primitive (dominant-direction removal, whitening,
    anisotropy checks) at corpus scale."""
    from parcel_analytics_etl_notebook_spark.functions.vectors import dot_literal

    emb = table(spark, sf_dir, "embeddings")
    dim, iters = _KM_DIM, _PC_ITERS
    w = [round(1.0 / dim ** 0.5, 6)] * dim
    for _ in range(iters):
        dot = dot_literal("embedding", w)
        scored = emb.select(
            F.col("embedding").alias("emb"), dot.alias("dot")
        )
        row = scored.agg(
            *[
                F.expr(f"avg(CAST(emb[{d}] AS DOUBLE) * dot)").alias(f"u{d}")
                for d in range(dim)
            ]
        ).collect()[0]
        u = [row[f"u{d}"] for d in range(dim)]
        norm = sum(x * x for x in u) ** 0.5
        w = [round(x / norm, 6) for x in u]
    return spark.createDataFrame(
        [(d + 1, w[d]) for d in range(dim)], "dim_idx bigint, component double"
    )


# --------------------------------------------------------------------------
# Approximate percentiles (sketch family, oracle-verified through a
# deterministic rank-error bound — same pattern as the HLL queries)
# --------------------------------------------------------------------------
@register(
    "approx_token_percentiles",
    oracle=f"""
WITH t AS (SELECT lang, len({_SQL_TOKS}) AS n_tokens FROM documents)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(quantile_cont(n_tokens, 0.5), 4) AS p50_exact,
       round(quantile_cont(n_tokens, 0.9), 4) AS p90_exact,
       round(quantile_cont(n_tokens, 0.99), 4) AS p99_exact,
       TRUE AS p50_in_bound, TRUE AS p90_in_bound, TRUE AS p99_in_bound
FROM t GROUP BY lang ORDER BY lang
""",
)
def approx_token_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language p50/p90/p99 of document token counts via
    approx_percentile (KLL-style mergeable sketch, accuracy 1/1000).

    Sketch outputs are engine-specific, so (like the HLL queries) the
    sketch is verified THROUGH the oracle as a deterministic bound:
    each approximate percentile's true rank — counted in-query against
    the actual token counts — must sit within p·n ± max(1, 1% of n)
    (a deliberately weaker claim than the sketch's 1/1000 guarantee so
    the flag is stable at tiny n). The oracle pins the flags TRUE and
    hash-checks exact interpolated percentiles alongside; a drifting
    sketch flips the value hash. At fact scale the sketch replaces
    exact percentile's per-group value buffering with bounded mergeable
    state — the swap SCALING.md prescribes past ~10⁷ rows/group; the
    exact columns exist here only for the external check."""
    docs = table(spark, sf_dir, "documents")
    # tokenize in the scan stage and persist ONLY the (lang, n_tokens)
    # pairs — the narrow frame both the sketch pass and the rank pass
    # read. No repartition: at fact scale the parquet scan already has
    # ≥cores splits, and shuffling the full text column just to spread
    # a cheap tokenize was the round-3 4.7× regression (VERDICT r03 #1).
    t = (
        docs
        # NULL-lang docs are excluded up front: the pre-r4 shape inner-
        # joined on lang (dropping the NULL group); the literal-LUT
        # rewrite must keep that contract — and a NULL key would also
        # break the deterministic sorted() over collected langs below
        .filter(F.col("lang").isNotNull())
        .select(
            "lang", F.size(tokens("text")).cast("bigint").alias("n_tokens")
        )
        .persist()  # read by the sketch pass AND the rank pass —
        # without this, tokenization runs twice
    )
    # pass 1: sketch + exact percentiles per language, COLLECTED — the
    # frame is lang-grain (≤|langs| rows), squarely inside the
    # model-sized-collect budget; folding the sketch outputs back as
    # LITERALS makes the rank-verification pass a plain aggregate over
    # the persisted pairs (no broadcast exchange, no join stage)
    aggrows = {
        r["lang"]: r
        for r in t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("approx_percentile(n_tokens, 0.5, 1000)").alias("a50"),
            F.expr("approx_percentile(n_tokens, 0.9, 1000)").alias("a90"),
            F.expr("approx_percentile(n_tokens, 0.99, 1000)").alias("a99"),
            F.round(F.expr("percentile(n_tokens, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(n_tokens, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(n_tokens, 0.99)"), 4).alias("p99"),
        )
        .collect()
    }

    def lut(field: str):
        return F.create_map(
            *[
                c
                for lang, r in sorted(aggrows.items())
                for c in (F.lit(lang), F.lit(r[field]))
            ]
        )[F.col("lang")]

    # pass 2: true rank of each sketch output, counted against the
    # data itself — one aggregate over the same persisted pairs
    sums = []
    for tag in ("50", "90", "99"):
        thresh = lut(f"a{tag}")
        sums.append(
            F.sum((F.col("n_tokens") <= thresh).cast("long")).alias(
                f"__le{tag}"
            )
        )
        sums.append(
            F.sum((F.col("n_tokens") < thresh).cast("long")).alias(
                f"__lt{tag}"
            )
        )
    ranks = t.groupBy("lang").agg(*sums)

    def in_bound(tag: str, p: float):
        # tie-safe two-sided rank check: some value at the sketch's
        # output must occupy rank p·n within tolerance — i.e. fewer
        # than p·n + tol values lie strictly below it AND at least
        # p·n − tol lie at or below it
        n = lut("n_docs")
        tol = F.greatest(F.lit(1.0), 0.01 * n)
        return (
            (F.col(f"__le{tag}") >= p * n - tol)
            & (F.col(f"__lt{tag}") <= p * n + tol)
        )

    return (
        ranks.select(
            "lang",
            lut("n_docs").alias("n_docs"),
            lut("p50").alias("p50_exact"),
            lut("p90").alias("p90_exact"),
            lut("p99").alias("p99_exact"),
            in_bound("50", 0.5).alias("p50_in_bound"),
            in_bound("90", 0.9).alias("p90_in_bound"),
            in_bound("99", 0.99).alias("p99_in_bound"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Token-budget curation: best docs per language until the budget fills
# --------------------------------------------------------------------------
@register(
    "lang_token_budget_filter",
    oracle=f"""
WITH t AS (
    SELECT doc_id, lang, len({_SQL_TOKS}) AS n_tokens,
           len(list_distinct({_SQL_TOKS})) / CAST(len({_SQL_TOKS}) AS DOUBLE) AS uniq
    FROM documents
    WHERE len({_SQL_TOKS}) > 0
),
r AS (
    SELECT doc_id, lang, n_tokens,
           sum(CAST(n_tokens AS DOUBLE)) OVER (
               PARTITION BY lang
               ORDER BY round(uniq, 6) DESC, n_tokens DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
    FROM t
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
FROM r WHERE run - n_tokens < 2000
""",
)
def lang_token_budget_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-capped curation — the 'fill each language's quota with
    the best documents' step of corpus assembly: rank docs per language
    by uniqueness (then length, then id), take the per-language running
    token sum, keep docs that START under a 2k-token budget (so the
    boundary doc may overflow it — the standard greedy-fill rule,
    deterministic).

    Shape: one scan computes tokens+quality; one cumulative window per
    language. Language is low-cardinality, so at 100 TB this window
    would hot-spot ~5 tasks — there the same query runs per-language
    via the two-pass global running sum (indexing.global_running_sum
    filtered per group, or range-partitioned on (lang, rank)); the
    window form here states the semantics the oracle checks."""
    docs = table(spark, sf_dir, "documents")
    toks = tokens("text")
    t = docs.select(
        "doc_id",
        "lang",
        F.size(toks).cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks).cast("double")).alias("uniq"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("lang")
        .orderBy(F.round(F.col("uniq"), 6).desc(), F.col("n_tokens").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = t.withColumn("run", F.sum(F.col("n_tokens").cast("double")).over(w))
    return r.filter(F.col("run") - F.col("n_tokens") < 2000).select(
        "doc_id", "lang", "n_tokens"
    )


# --------------------------------------------------------------------------
# SimHash near-dup candidate pairs (banded, hamming-verified)
# --------------------------------------------------------------------------
_SIMHASH_SQL_CTE = None  # built lazily below to reuse queries_llm fragments


def _simhash_pairs_oracle() -> str:
    from parcel_analytics_etl_notebook_spark.plans.queries_llm import _SQL_POLY

    from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
        MAX_LSH_BUCKET,
    )

    return f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
h AS (SELECT doc_id, list_transform(l, tok -> {_SQL_POLY.format('tok')}) AS hh FROM t),
f AS (
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 16),
                j -> CASE WHEN list_sum(list_transform(hh,
                               x -> CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                          THEN (1 << j) ELSE 0 END)) AS BIGINT) AS simhash
    FROM h
),
bands AS (SELECT doc_id, simhash, simhash % 256 AS lo, simhash // 256 AS hi FROM f),
blo AS (SELECT * FROM bands QUALIFY count(*) OVER (PARTITION BY lo) <= {MAX_LSH_BUCKET}),
bhi AS (SELECT * FROM bands QUALIFY count(*) OVER (PARTITION BY hi) <= {MAX_LSH_BUCKET}),
cand AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.simhash AS sa, b.simhash AS sb
    FROM blo a JOIN blo b ON a.lo = b.lo AND a.doc_id < b.doc_id
    UNION
    SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
    FROM bhi a JOIN bhi b ON a.hi = b.hi AND a.doc_id < b.doc_id
)
SELECT * FROM (
    SELECT a.id_a AS id_a, a.id_b AS id_b,
           CAST(list_sum(list_transform(range(0, 16),
                j -> CASE WHEN ((a.sa >> j) & 1) <> ((a.sb >> j) & 1)
                     THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
    FROM cand a
) v WHERE hamming <= 3
"""


@register("simhash_near_dup_pairs", oracle=_simhash_pairs_oracle())
def simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash candidate pairs: band the 16-bit fingerprint into two
    8-bit halves, pair docs agreeing on EITHER half (two equi-joins +
    union — never an OR-join, which Spark would plan as a nested
    loop), then keep hamming ≤ 3. Pigeonhole guarantees recall for
    hamming ≤ 1 with 2 bands; wider radii trade recall for join size
    (add bands to widen). Completes the SimHash family:
    simhash_fingerprints → candidates → verified near-dup pairs.

    Band buckets are capped at MAX_LSH_BUCKET docs (same discipline
    and same constant as the MinHash-LSH path, restated in the oracle
    via QUALIFY): an 8-bit band has only 256 values, so bucket
    occupancy grows as n/256 and intra-bucket pairs as n²/256 — the
    r08 10× scale run measured the UNCAPPED join at 20.8× wall for
    10× data (SCALING.md). The cap bounds any bucket's contribution at
    cap²/2 pairs; no bucket reaches it at sf ≤ 0.1, so results are
    unchanged where the oracle checks. The structural fix at corpus
    scale is a wider fingerprint (64-bit SimHash, 4×16-bit bands —
    bucket space 65536, the production shape); the cap is the
    guard-rail that keeps the 16-bit demo from going quadratic."""
    from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
        hamming_distance,
        with_simhash,
    )
    from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
        MAX_LSH_BUCKET,
    )

    f = with_simhash(table(spark, sf_dir, "documents"), bits=16)
    bands = f.select(
        "doc_id",
        "simhash",
        (F.col("simhash") % 256).alias("lo"),
        (F.col("simhash") / 256).cast("bigint").alias("hi"),
    ).persist()

    def half_join(key: str) -> DataFrame:
        hot = (
            bands.groupBy(key)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > MAX_LSH_BUCKET)
            .select(key)
        )
        capped = bands.join(hot, on=key, how="left_anti")
        a, b = capped.alias("a"), capped.alias("b")
        return a.join(
            b,
            (F.col(f"a.{key}") == F.col(f"b.{key}"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )

    cand = half_join("lo").unionByName(half_join("hi")).dropDuplicates()
    return (
        cand.withColumn("hamming", hamming_distance(F.col("sa"), F.col("sb"), 16))
        .filter(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------------------
# Language-ID confusion matrix (labeled lang vs heuristic prediction)
# --------------------------------------------------------------------------
def _lang_confusion_oracle() -> str:
    from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
        _lang_score_sql,
    )

    g = "greatest(s_en, s_de, s_es, s_fr, s_zh)"
    return f"""
WITH t AS (SELECT doc_id, lang, {_SQL_TOKS} AS l FROM documents),
s AS (
    SELECT doc_id, lang,
           {_lang_score_sql('en')} AS s_en,
           {_lang_score_sql('de')} AS s_de,
           {_lang_score_sql('es')} AS s_es,
           {_lang_score_sql('fr')} AS s_fr,
           {_lang_score_sql('zh')} AS s_zh
    FROM t
),
p AS (
    SELECT lang,
           CASE WHEN {g} = 0 THEN 'und'
                WHEN s_en = {g} THEN 'en'
                WHEN s_de = {g} THEN 'de'
                WHEN s_es = {g} THEN 'es'
                WHEN s_fr = {g} THEN 'fr'
                ELSE 'zh' END AS predicted_lang
    FROM s
)
SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM p GROUP BY lang, predicted_lang
"""


@register("lang_confusion_matrix", oracle=_lang_confusion_oracle())
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled language vs heuristic prediction, as a (lang,
    predicted_lang, count) confusion matrix — the evaluation view a
    pipeline publishes when swapping in a new language-ID model. One
    projection + one small aggregate; at 100 TB the groupBy carries at
    most |langs|² rows per partition after map-side combine."""
    from parcel_analytics_etl_notebook_spark.operators.textqa import predict_lang

    docs = table(spark, sf_dir, "documents")
    p = docs.select(
        "lang", predict_lang(tokens("text")).alias("predicted_lang")
    )
    return p.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# --------------------------------------------------------------------------
# Bucketized range join (same semantics as value_band_stats, scale plan)
# --------------------------------------------------------------------------
@register(
    "value_band_stats_bucketized",
    oracle="""
WITH bands(band, lo, hi) AS (
    VALUES ('low', 0.0, 50.0), ('mid', 50.0, 100.0), ('high', 100.0, 1000000.0)
)
SELECT band,
       count(*)              AS n_events,
       round(sum(value), 2)  AS total_value,
       round(avg(value), 4)  AS avg_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band
""",
)
def value_band_stats_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """value_band_stats' EXACT semantics (identical oracle) through the
    scale plan: operators/rangejoin.range_join_bucketized rewrites the
    inequality join as explode-to-buckets + hash equi-join + residual
    filter — no BroadcastNestedLoopJoin (plan-asserted in
    test_plans.py), which is the form that survives a large interval
    table. The catch-all 'high' band (hi = 10⁶) is clamped to the
    observed max value for bucket generation only, so it doesn't
    explode to 20k buckets."""
    from parcel_analytics_etl_notebook_spark.operators.rangejoin import (
        range_join_bucketized,
    )

    events = table(spark, sf_dir, "events").select("value")
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 100.0), ("high", 100.0, 1000000.0)],
        "band string, lo double, hi double",
    )
    joined = range_join_bucketized(events, bands, value_col="value", width=50.0)
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )
