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
