"""LLM batch 9: content-defined chunking (rolling-hash chunk
boundaries — the CDC dedup primitive for large/concatenated documents)
and priority sampling (Duffield-Lund-Thorup weighted sampling WITHOUT
replacement, with the Horvitz-Thompson-style threshold estimator).

Content-defined chunking is what large-file / multi-source dedup
pipelines use when whole-document hashing is too coarse and shingling
too fine: boundaries are a pure function of LOCAL content (a token
hash hitting a modulus), so an insertion only reshapes the chunks it
touches — unlike fixed-width chunking where one shifted token changes
every downstream chunk. Priority sampling is the weighted-WOR scheme
whose estimator needs no transcendentals (priority = weight / uniform,
threshold = the (k+1)-th priority) — chosen over Efraimidis-Sirivasan
exponential keys precisely because `w/u` is a single IEEE division,
bit-identical across engines, where `ln(u)` is not guaranteed to be.

Oracle-parity: token hashes and chunk hashes use the engine's
cross-engine polynomial hash (operators/textqa.FP_MOD convention);
all chunk arithmetic is list algebra over BIGINTs; the sampler's only
floats are one division and one comparison on identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import tokens
from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import poly_hash
from parcel_analytics_etl_notebook_spark.plans.catalog import register, table
from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
    _SQL_POLY,
    _SQL_TOKS,
)

# --------------------------------------------------------------------------
# Content-defined chunking: rolling-hash boundaries, corpus dup stats
# --------------------------------------------------------------------------
_CDC_MOD = 64  # boundary when token_hash % 64 == 0 → ~64-token chunks

_CDC_ORACLE = f"""
WITH t AS (SELECT doc_id, source, {_SQL_TOKS} AS l FROM documents),
h AS (
    SELECT doc_id, source,
           list_transform(l, tok -> {_SQL_POLY.format('tok')}) AS th
    FROM t
),
sp AS (
    SELECT doc_id, source, th,
           list_filter(range(1, len(th) + 1), i -> th[i] % {_CDC_MOD} = 0)
               AS bp
    FROM h
),
ck AS (
    SELECT doc_id, source,
           list_filter(
               list_zip(
                   list_prepend(1, list_transform(bp, x -> x + 1)),
                   list_append(bp, len(th))),
               z -> z[1] <= z[2]) AS spans,
           th
    FROM sp
),
cx AS (
    SELECT source,
           unnest(list_transform(spans, z -> {{
               'h': list_reduce(
                        list_prepend(CAST(0 AS BIGINT),
                                     th[z[1] : z[2]]),
                        (a, x) -> (a * 31 + x) % 1000000007),
               'ln': z[2] - z[1] + 1}})) AS c
    FROM ck
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(DISTINCT c.h) AS BIGINT) AS distinct_chunks,
       round(1.0 - count(DISTINCT c.h) / CAST(count(*) AS DOUBLE), 4)
           AS dup_chunk_fraction,
       round(sum(c.ln) / CAST(count(*) AS DOUBLE), 4) AS avg_chunk_tokens
FROM cx GROUP BY source ORDER BY source
"""


@register("content_defined_chunks", oracle=_CDC_ORACLE)
def content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking over the token stream: a chunk boundary
    falls after every token whose polynomial hash ≡ 0 (mod 64) — the
    rolling-hash/gear-hash CDC idea at token granularity (expected
    chunk ≈ 64 tokens, boundaries decided by LOCAL content so edits
    don't shift downstream chunks). Each chunk gets an order-sensitive
    polynomial hash; per source the query reports chunk counts and the
    duplicated-chunk fraction — the sub-document dedup signal that
    whole-doc hashing (exact_dedup_documents) cannot see and shingle
    pair-joins (ngram_jaccard_pairs) only see pairwise.

    Scale shape: everything up to the explode is per-ROW array algebra
    (transform/filter/zip_with/aggregate higher-order functions —
    no shuffle, arrays bounded by document token counts); the explode
    emits one row per CHUNK (≈ tokens/64 — SMALLER than the shingle
    explode's one-per-token), and the only shuffle is the final
    per-source aggregate with map-side partials. count_distinct over
    chunk hashes shuffles chunk-grain rows once — the same profile as
    exact dedup's hash groupBy."""
    docs = table(spark, sf_dir, "documents")
    th = F.transform(tokens("text"), lambda t: poly_hash(t))
    d = docs.select("doc_id", "source", th.alias("th"))
    n = F.size(F.col("th"))
    # guard: sequence(1, 0) DESCENDS in Spark — empty docs need []
    pos = F.when(n == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), n)
    )
    bp = F.filter(
        pos, lambda i: F.element_at(F.col("th"), i) % _CDC_MOD == 0
    )
    starts = F.concat(
        F.array(F.lit(1)), F.transform(bp, lambda x: x + 1)
    )
    ends = F.concat(bp, F.array(n))
    spans = F.filter(
        F.zip_with(starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))),
        lambda z: z.getField("s") <= z.getField("e"),
    )
    chunk = lambda z: F.struct(  # noqa: E731
        F.aggregate(
            F.slice(
                F.col("th"),
                z.getField("s"),
                z.getField("e") - z.getField("s") + 1,
            ),
            F.lit(0).cast("bigint"),
            lambda a, x: (a * 31 + x) % 1_000_000_007,
        ).alias("h"),
        (z.getField("e") - z.getField("s") + 1).alias("ln"),
    )
    cx = d.select(
        "source", F.explode(F.transform(spans, chunk)).alias("c")
    )
    return (
        cx.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.count_distinct(F.col("c.h")).cast("bigint").alias(
                "distinct_chunks"
            ),
            F.round(
                1.0
                - F.count_distinct(F.col("c.h"))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("dup_chunk_fraction"),
            F.round(
                F.sum(F.col("c.ln")) / F.count(F.lit(1)).cast("double"), 4
            ).alias("avg_chunk_tokens"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Priority sampling: weighted WOR with the threshold estimator
# --------------------------------------------------------------------------
_PRIO_K = 100
_PRIO_M = 1_048_576  # 2^20 uniform-grid resolution


@register(
    "priority_sample_orders",
    oracle=f"""
WITH b AS (
    SELECT o_orderkey, o_totalprice AS w,
           (({_SQL_POLY.format('CAST(o_orderkey AS VARCHAR)')})
            % {_PRIO_M} + 1) / {_PRIO_M}.0 AS u
    FROM orders
),
q AS (SELECT o_orderkey, w, w / u AS q FROM b),
top AS (
    SELECT * FROM q ORDER BY q DESC, o_orderkey LIMIT {_PRIO_K + 1}
),
tau AS (SELECT min(q) AS tau FROM top)
SELECT t.o_orderkey,
       round(t.w, 2) AS weight,
       round(t.q, 4) AS priority,
       round(greatest(t.w, tau.tau), 2) AS ht_weight
FROM (SELECT * FROM top ORDER BY q DESC, o_orderkey LIMIT {_PRIO_K}) t, tau
ORDER BY t.o_orderkey
""",
)
def priority_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup): weighted sampling
    WITHOUT replacement of k=100 orders by o_totalprice. Each row gets
    priority q = w/u with u a DETERMINISTIC hash-uniform in (0, 1]
    (polynomial hash of the key mod 2^20 — reproducible across engines
    and retries, the engine's deterministic_sample convention); the
    sample is the top-k by priority, and the (k+1)-th priority τ gives
    the unbiased per-row weight estimator ŵ = max(w, τ) (Σŵ over the
    sample estimates Σw over the population). Chosen over the
    exponential-keys A-ES scheme because w/u is one IEEE division —
    bit-identical in Spark and DuckDB — while ln(u) is not guaranteed
    to round identically.

    Scale shape: the priority projection is scan-local; top-(k+1) is
    TakeOrderedAndProject (per-partition heaps, no global sort); τ is
    a 1-row aggregate over the 101-row frame, broadcast back via the
    engine's scalar-gate crossJoin. Nothing fact-scale shuffles."""
    orders = table(spark, sf_dir, "orders")
    u = (
        (poly_hash(F.col("o_orderkey").cast("string")) % _PRIO_M + 1)
        / float(_PRIO_M)
    )
    q = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("w"),
        (F.col("o_totalprice") / u).alias("q"),
    )
    top = q.orderBy(F.col("q").desc(), "o_orderkey").limit(_PRIO_K + 1)
    tau = top.agg(F.min("q").alias("tau"))
    sel = top.orderBy(F.col("q").desc(), "o_orderkey").limit(_PRIO_K)
    return (
        sel.crossJoin(F.broadcast(tau))
        .select(
            "o_orderkey",
            F.round("w", 2).alias("weight"),
            F.round("q", 4).alias("priority"),
            F.round(F.greatest(F.col("w"), F.col("tau")), 2).alias(
                "ht_weight"
            ),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Suffix→prefix overlap pairs: concatenation-boundary detection
# --------------------------------------------------------------------------
_SP_K = 3  # boundary-window tokens
_SP_MAX_DF = 50  # hot-hash cap (boilerplate openings/closings)

_SP_ORACLE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
h AS (
    SELECT doc_id, list_transform(l, tok -> {_SQL_POLY.format('tok')}) AS th
    FROM t WHERE len(l) >= {_SP_K}
),
f AS (
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT), th[1:{_SP_K}]),
               (a, x) -> (a * 31 + x) % 1000000007) AS pre,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
                                    th[len(th) - {_SP_K} + 1 : len(th)]),
               (a, x) -> (a * 31 + x) % 1000000007) AS suf
    FROM h
),
pc AS (SELECT pre FROM f GROUP BY pre HAVING count(*) <= {_SP_MAX_DF}),
sc AS (SELECT suf FROM f GROUP BY suf HAVING count(*) <= {_SP_MAX_DF})
SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.suf AS boundary_hash
FROM f a JOIN f b ON a.suf = b.pre AND a.doc_id <> b.doc_id
WHERE a.suf IN (SELECT suf FROM sc) AND b.pre IN (SELECT pre FROM pc)
ORDER BY id_a, id_b
"""


@register("suffix_prefix_overlap_pairs", oracle=_SP_ORACLE)
def suffix_prefix_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenation-boundary detection: document pairs where A's last
    3 tokens hash-equal B's first 3 — the signature of crawl shards
    that split one page across records, or of corpus builds that
    concatenated then re-chunked documents. Neither whole-doc hashing
    nor Jaccard catches these (the overlap is a tiny fraction of
    either doc); the boundary window is the precise signal. Both ends
    collapse to ONE order-sensitive polynomial hash per doc, and the
    pair join is an equi-join suffix_hash = prefix_hash.

    Scale shape: one scan computes (doc, prefix_hash, suffix_hash) —
    map-only, in-row HOF folds; the join is hash-equi on int64 with
    BOTH sides df-capped first (a boilerplate opening shared by 10⁶
    docs would otherwise make the join quadratic — the drop_hot_
    shingles rationale, cap stated in the operator contract). Output
    is pair-grain, bounded by cap² per hot hash."""
    docs = table(spark, sf_dir, "documents")
    th = F.transform(tokens("text"), lambda t: poly_hash(t))
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("bigint"),
        lambda a, x: (a * 31 + x) % 1_000_000_007,
    )
    n = F.size(F.col("th"))
    f = (
        docs.select("doc_id", th.alias("th"))
        .filter(F.size(F.col("th")) >= _SP_K)
        .select(
            "doc_id",
            fold(F.slice(F.col("th"), 1, _SP_K)).alias("pre"),
            fold(F.slice(F.col("th"), n - _SP_K + 1, _SP_K)).alias("suf"),
        )
        .persist()  # read by both cap counts and both join sides
    )
    pc = (
        f.groupBy("pre").agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") <= _SP_MAX_DF).select("pre")
    )
    sc = (
        f.groupBy("suf").agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") <= _SP_MAX_DF).select("suf")
    )
    a = (
        f.join(sc, "suf", "left_semi")
        .select(F.col("doc_id").alias("id_a"), F.col("suf").alias("boundary_hash"))
    )
    b = (
        f.join(pc, "pre", "left_semi")
        .select(F.col("doc_id").alias("id_b"), F.col("pre").alias("bh"))
    )
    return (
        a.join(b, (a.boundary_hash == b.bh) & (F.col("id_a") != F.col("id_b")))
        .select("id_a", "id_b", "boundary_hash")
        .orderBy("id_a", "id_b")
    )
