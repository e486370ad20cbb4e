"""Round-8 LLM-pipeline additions, batch 2: weighted (multiset)
Jaccard, SimHash-vs-truth Hamming histogram, PQ asymmetric-distance
recall, near-dup threshold calibration sweep, and Z-order layout
buckets.

These extend the dedup/ANN families with their EVALUATION and
LAYOUT companions: weighted Jaccard scores the verified pair memo
under multiset semantics, the Hamming histogram cross-validates the
SimHash family against n-gram ground truth, ADC recall is the quality
gate of a product-quantized index (what IVFPQ serves at query time),
the threshold sweep is the calibration curve a dedup rollout reads
before picking its cut, and Morton codes are the multi-dimensional
clustering key (Z-ORDER) that makes range scans over two correlated
columns prune at 100 TB.

Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import tokens
from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
    hamming_distance,
    with_simhash,
)
from parcel_analytics_etl_notebook_spark.plans.catalog import register, table
from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
    _SQL_POLY,
    _SQL_TOKS,
    MAX_SHINGLE_DF,
    _near_dup_pair_ids,
    near_dup_pairs_frame,
)

#: CTE chain ending in `good(id_a, id_b)` — the verified near-dup pairs
#: (3-gram Jaccard >= 0.2, df-capped shingle index), i.e. the SQL twin
#: of the near_dup_pairs memo WITHOUT the recursive component closure
#: _SQL_DUP_COMPONENTS appends (reach/comp cost the oracle nothing at
#: sf0.01 but are dead weight for pair-grain queries)
_SQL_GOOD_PAIRS = f"""
t AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
hh AS (SELECT doc_id, list_transform(l, tok -> {_SQL_POLY.format('tok')}) AS th FROM t),
sh0 AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(1, len(th)-1),
               i -> ((th[i]*1000003 + th[i+1]) % 1000000007 * 1000003 + th[i+2]) % 1000000007))) AS shingle
    FROM hh
),
sh AS (SELECT * FROM sh0 QUALIFY count(*) OVER (PARTITION BY shingle) <= {MAX_SHINGLE_DF}),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
cand AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
good AS (
    SELECT id_a, id_b, shared / (sa.n + sb.n - shared) AS jaccard
    FROM cand JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
    WHERE shared / (sa.n + sb.n - shared) >= 0.2
)
"""


# --------------------------------------------------------------------------
# Weighted (multiset) Jaccard over the verified pair memo
# --------------------------------------------------------------------------
@register(
    "weighted_jaccard_pairs",
    oracle=f"""
WITH {_SQL_GOOD_PAIRS},
tok AS (SELECT doc_id, unnest(l) AS tok FROM t),
tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
tot AS (SELECT doc_id, count(*) AS total FROM tok GROUP BY 1),
mins AS (
    SELECT g.id_a, g.id_b, CAST(sum(least(a.c, b.c)) AS BIGINT) AS sum_min
    FROM good g
    JOIN tc a ON a.doc_id = g.id_a
    JOIN tc b ON b.doc_id = g.id_b AND b.tok = a.tok
    GROUP BY 1, 2
)
SELECT m.id_a, m.id_b, m.sum_min,
       round(m.sum_min / (ta.total + tb.total - m.sum_min), 4) AS wjaccard
FROM mins m
JOIN tot ta ON m.id_a = ta.doc_id
JOIN tot tb ON m.id_b = tb.doc_id
ORDER BY m.id_a, m.id_b
""",
)
def weighted_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (multiset) Jaccard over the verified near-dup pairs:
    Σ min(count_a, count_b) / Σ max(count_a, count_b) per token —
    where Σ max = total_a + total_b − Σ min, so only the SHARED-token
    join is needed. Multiset semantics rank boilerplate-heavy repeats
    differently than the set-of-shingles score (a doc that repeats one
    paragraph 10× is near-identical under set Jaccard but not under
    weighted) — real dedup pipelines score candidates under both
    before choosing a cut. All counts are exact BIGINTs; the ratio is
    one int/int division rounded on both engines.

    Scale shape: pair-grain joins against a (doc, token)-grain count
    table — the pair memo (bench ledger memo:near_dup_pairs) bounds
    the quadratic term, token counts are one map-combined groupBy."""
    docs = table(spark, sf_dir, "documents")
    pairs = _near_dup_pair_ids(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    tc = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("total"))
    a = tc.select(
        F.col("doc_id").alias("id_a"), "tok", F.col("c").alias("ca")
    )
    b = tc.select(
        F.col("doc_id").alias("id_b"), "tok", F.col("c").alias("cb")
    )
    mins = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("ca", "cb")).cast("bigint").alias("sum_min"))
    )
    ta = tot.select(F.col("doc_id").alias("id_a"), F.col("total").alias("ta"))
    tb = tot.select(F.col("doc_id").alias("id_b"), F.col("total").alias("tb"))
    wj = F.col("sum_min") / (F.col("ta") + F.col("tb") - F.col("sum_min"))
    return (
        mins.join(ta, "id_a")
        .join(tb, "id_b")
        .select("id_a", "id_b", "sum_min", F.round(wj, 4).alias("wjaccard"))
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------------------
# SimHash Hamming histogram over verified near-dup pairs
# --------------------------------------------------------------------------
@register(
    "near_dup_simhash_hamming",
    oracle=f"""
WITH {_SQL_GOOD_PAIRS},
fp AS (
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 16),
                j -> CASE WHEN list_sum(list_transform(th,
                               x -> CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                          THEN (1 << j) ELSE 0 END)) AS BIGINT) AS simhash
    FROM hh
)
SELECT CAST(bit_count(xor(fa.simhash, fb.simhash)) AS BIGINT) AS hamming,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM good g
JOIN fp fa ON g.id_a = fa.doc_id
JOIN fp fb ON g.id_b = fb.doc_id
GROUP BY 1 ORDER BY 1
""",
)
def near_dup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-validation of the two fingerprint families: the Hamming-
    distance histogram of 16-bit SimHash fingerprints over the pairs
    the n-gram Jaccard pipeline VERIFIED as near-dups. A healthy
    SimHash concentrates true near-dups at small distances; mass in
    the tail tells you the banded-Hamming candidate generator
    (simhash_near_dup_pairs) would miss those pairs — this histogram
    is how you pick its band width before trusting it at corpus scale.

    Scale shape: fingerprints are one map-combined aggregate per doc
    (simhash_fingerprints' plan); the histogram is two pair-grain
    joins against the shared pair memo and a 17-bucket groupBy."""
    docs = table(spark, sf_dir, "documents")
    pairs = _near_dup_pair_ids(spark, sf_dir)
    fp = with_simhash(docs, bits=16)
    fa = fp.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha"))
    fb = fp.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb"))
    return (
        pairs.join(fa, "id_a")
        .join(fb, "id_b")
        .select(
            hamming_distance(F.col("ha"), F.col("hb"), bits=16).alias("hamming")
        )
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("hamming")
    )


# --------------------------------------------------------------------------
# Near-dup threshold calibration sweep
# --------------------------------------------------------------------------
#: Jaccard cut candidates (exact double literals, identical both engines)
_SWEEP_THRESHOLDS = [0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]


@register(
    "near_dup_threshold_sweep",
    oracle=f"""
WITH {_SQL_GOOD_PAIRS},
g4 AS (SELECT round(jaccard, 4) AS j4 FROM good),
th AS (SELECT unnest([{', '.join(repr(t) for t in _SWEEP_THRESHOLDS)}]) AS threshold)
SELECT th.threshold, CAST(count(g4.j4) AS BIGINT) AS n_pairs
FROM th LEFT JOIN g4 ON g4.j4 >= th.threshold
GROUP BY th.threshold ORDER BY th.threshold
""",
)
def near_dup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup calibration curve: how many verified candidate pairs
    survive each Jaccard cut from 0.2 to 0.9. This is the table a
    dedup rollout reads to pick its threshold (pair volume vs
    strictness) before committing a corpus-wide delete — and because
    it reuses the pair memo, the whole sweep costs one 8-way explode
    over pair-grain rows, not eight re-scores.

    Thresholds are compared against the memo's 4dp-rounded Jaccard on
    both engines (exact double literals), so boundary pairs land
    identically."""
    pairs = near_dup_pairs_frame(spark, sf_dir)
    th = F.explode(
        F.array(*[F.lit(t) for t in _SWEEP_THRESHOLDS])
    ).alias("threshold")
    exploded = pairs.select(F.col("jaccard"), th)
    counted = (
        exploded.filter(F.col("jaccard") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
    spine = spark.createDataFrame(
        [(t,) for t in _SWEEP_THRESHOLDS], "threshold double"
    )
    return (
        spine.join(counted, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
        )
        .orderBy("threshold")
    )


# --------------------------------------------------------------------------
# PQ asymmetric-distance (ADC) top-k recall vs exact L2
# --------------------------------------------------------------------------
_ADC_K = 10


@register(
    "pq_adc_recall",
    oracle=f"""
WITH sub AS (
    SELECT vec_id, s AS subspace,
           list_slice(embedding, s*16 + 1, s*16 + 16) AS sv
    FROM embeddings CROSS JOIN (SELECT unnest(range(0, 4)) AS s) ss
),
cb AS (SELECT vec_id AS cid, subspace, sv AS cv FROM sub WHERE vec_id BETWEEN 1 AND 8),
corpus AS (SELECT * FROM sub WHERE vec_id <> 0),
q AS (SELECT subspace, sv AS qv FROM sub WHERE vec_id = 0),
d0 AS (
    SELECT c.vec_id, c.subspace, b.cid,
           round(list_sum(list_transform(range(1, 17),
               i -> (CAST(c.sv[i] AS DOUBLE) - CAST(b.cv[i] AS DOUBLE))
                  * (CAST(c.sv[i] AS DOUBLE) - CAST(b.cv[i] AS DOUBLE)))), 9) AS d2
    FROM corpus c JOIN cb b ON c.subspace = b.subspace
),
codes AS (
    SELECT vec_id, subspace, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, subspace ORDER BY d2, cid) AS rn
        FROM d0
    ) WHERE rn = 1
),
adc AS (
    SELECT b.subspace, b.cid,
           round(list_sum(list_transform(range(1, 17),
               i -> (CAST(q.qv[i] AS DOUBLE) - CAST(b.cv[i] AS DOUBLE))
                  * (CAST(q.qv[i] AS DOUBLE) - CAST(b.cv[i] AS DOUBLE)))), 9) AS qd2
    FROM cb b JOIN q ON b.subspace = q.subspace
),
approx AS (
    SELECT codes.vec_id, round(sum(adc.qd2), 9) AS adist
    FROM codes JOIN adc ON codes.subspace = adc.subspace AND codes.cid = adc.cid
    GROUP BY 1
),
approx_top AS (SELECT vec_id FROM approx ORDER BY adist, vec_id LIMIT {_ADC_K}),
full_emb AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0),
qf AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
exact AS (
    SELECT f.vec_id,
           round(list_sum(list_transform(range(1, len(f.embedding)+1),
               i -> (CAST(f.embedding[i] AS DOUBLE) - CAST(qf.qe[i] AS DOUBLE))
                  * (CAST(f.embedding[i] AS DOUBLE) - CAST(qf.qe[i] AS DOUBLE)))), 9) AS ed2
    FROM full_emb f, qf
),
exact_top AS (SELECT vec_id FROM exact ORDER BY ed2, vec_id LIMIT {_ADC_K})
SELECT CAST({_ADC_K} AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_overlap,
       CAST(count(*) * 10000 // {_ADC_K} AS BIGINT) AS recall_bp
FROM approx_top JOIN exact_top USING (vec_id)
""",
)
def pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric distance computation (ADC) — the query path of an
    IVFPQ index: corpus vectors are represented by their PQ codes, the
    query stays full-precision, and a vector's approximate distance is
    the SUM of precomputed query→codeword subspace distances looked up
    by code. Top-10 by ADC is compared against exact L2² top-10 and
    reported as recall in exact basis points — the quality gate that
    decides whether a codebook is servable.

    Scale shape: the ADC table is 4×8 rows computed once per query and
    broadcast; the corpus-side cost is a code-grain join + one groupBy
    sum per vector — NO full-dimension math on the corpus at query
    time, which is the whole point of PQ at 100 TB (the exact-L2 side
    here is the eval baseline, same role as ann_cosine_topk for IVF).
    Distances round to 9 before every rank; ties break on vec_id."""
    emb = table(spark, sf_dir, "embeddings")
    slices = F.array(
        *[F.slice("embedding", s * 16 + 1, 16) for s in range(4)]
    )
    sub = emb.select("vec_id", F.posexplode(slices).alias("subspace", "sv"))
    cb = sub.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= 8)).select(
        F.col("vec_id").alias("cid"), "subspace", F.col("sv").alias("cv")
    )
    corpus = sub.filter(F.col("vec_id") != 0)
    q = sub.filter(F.col("vec_id") == 0).select(
        "subspace", F.col("sv").alias("qv")
    )

    def sqdist(a, b):
        return F.round(
            F.aggregate(
                F.zip_with(
                    F.col(a).cast("array<double>"),
                    F.col(b).cast("array<double>"),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            9,
        )

    d0 = corpus.join(F.broadcast(cb), "subspace").select(
        "vec_id", "subspace", "cid", sqdist("sv", "cv").alias("d2")
    )
    w = Window.partitionBy("vec_id", "subspace").orderBy("d2", "cid")
    codes = (
        d0.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "subspace", "cid")
    )
    adc = cb.join(F.broadcast(q), "subspace").select(
        "subspace", "cid", sqdist("cv", "qv").alias("qd2")
    )
    approx = (
        codes.join(F.broadcast(adc), ["subspace", "cid"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("qd2"), 9).alias("adist"))
    )
    approx_top = approx.orderBy("adist", "vec_id").limit(_ADC_K).select("vec_id")
    qf = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    exact = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qf))
        .select("vec_id", sqdist("embedding", "qe").alias("ed2"))
    )
    exact_top = exact.orderBy("ed2", "vec_id").limit(_ADC_K).select("vec_id")
    return approx_top.join(exact_top, "vec_id").agg(
        F.lit(_ADC_K).cast("bigint").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n_overlap"),
        F.expr(f"CAST(count(1) * 10000 DIV {_ADC_K} AS BIGINT)").alias(
            "recall_bp"
        ),
    )


# --------------------------------------------------------------------------
# Z-order (Morton) layout buckets over the embedding grid
# --------------------------------------------------------------------------
_MORTON_BITS = 8  # 8 bits per axis -> 16-bit Morton code, 256x256 grid


@register(
    "morton_zorder_buckets",
    oracle=f"""
WITH p AS (
    SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
           CAST(embedding[2] AS DOUBLE) AS y
    FROM embeddings
),
bounds AS (SELECT min(x) AS x0, max(x) AS x1, min(y) AS y0, max(y) AS y1 FROM p),
cells AS (
    SELECT vec_id,
           least(255, CAST(floor((x - x0) / (x1 - x0) * 256) AS BIGINT)) AS cx,
           least(255, CAST(floor((y - y0) / (y1 - y0) * 256) AS BIGINT)) AS cy
    FROM p, bounds
),
m AS (
    SELECT vec_id,
           CAST({' + '.join(f"(((cx >> {j}) & 1) << {2 * j}) + (((cy >> {j}) & 1) << {2 * j + 1})" for j in range(_MORTON_BITS))} AS BIGINT) AS morton
    FROM cells
)
SELECT CAST(morton >> 10 AS BIGINT) AS z_bucket,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(min(morton) AS BIGINT) AS min_code,
       CAST(max(morton) AS BIGINT) AS max_code
FROM m GROUP BY 1 ORDER BY 1
""",
)
def morton_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over the first two embedding
    dimensions: normalize each axis to a 256-cell grid, interleave the
    8 bits of (cx, cy) into a 16-bit Morton code, and report occupancy
    per 64-code Z-range bucket. Morton codes are how a lakehouse
    clusters files on TWO correlated columns at once (Delta/Iceberg
    Z-ORDER): sorting by the interleaved code keeps spatial neighbors
    in the same files, so a 2-D range predicate prunes most of a
    100 TB table instead of one dimension's worth. The bucket
    min/max spans show exactly that locality.

    The 1-row global bounds cross join is the scalar-subquery pattern
    (allowlisted); the interleave is pure codegen bit arithmetic,
    identical expression tree on both engines."""
    emb = table(spark, sf_dir, "embeddings")
    p = emb.select(
        "vec_id",
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
    )
    bounds = p.agg(
        F.min("x").alias("x0"),
        F.max("x").alias("x1"),
        F.min("y").alias("y0"),
        F.max("y").alias("y1"),
    )
    cell = lambda c, lo, hi: F.least(  # noqa: E731
        F.lit(255),
        F.floor((F.col(c) - F.col(lo)) / (F.col(hi) - F.col(lo)) * 256).cast(
            "long"
        ),
    )
    cells = p.crossJoin(F.broadcast(bounds)).select(
        "vec_id",
        cell("x", "x0", "x1").alias("cx"),
        cell("y", "y0", "y1").alias("cy"),
    )
    morton = sum(
        (
            F.shiftleft(F.shiftright("cx", j).bitwiseAND(F.lit(1)), 2 * j)
            + F.shiftleft(
                F.shiftright("cy", j).bitwiseAND(F.lit(1)), 2 * j + 1
            )
        )
        for j in range(_MORTON_BITS)
    )
    m = cells.select("vec_id", morton.cast("bigint").alias("morton"))
    return (
        m.groupBy(F.shiftright("morton", 10).cast("bigint").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.min("morton").cast("bigint").alias("min_code"),
            F.max("morton").cast("bigint").alias("max_code"),
        )
        .orderBy("z_bucket")
    )
