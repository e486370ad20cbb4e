"""LLM-pipeline operators, round 3b: cross-document duplication
analysis, corpus-law diagnostics, and batched similarity search.

Families added here (extends queries_llm/2/3):
- exact substring-level duplication (Lee et al., "Deduplicating
  Training Data Makes Language Models Better"): per-document fraction
  of 5-gram spans that also occur in ANOTHER document — the signal the
  exact-substring dedup pass thresholds on (distinct from the
  within-doc repeated_ngram_ratio and the pairwise ngram_jaccard);
- template/boilerplate detection by shared document prefixes (the
  cheap web-scrape header detector);
- corpus-law diagnostics: Zipf slope per language (regr_slope over
  log-log rank/frequency) and the Heaps-law vocabulary growth curve at
  corpus checkpoints — both standard sanity gates on synthetic or
  filtered training corpora;
- batched ANN: top-k for a SET of query vectors in one pass (the
  evaluation shape — single-query ann_cosine_topk is the unit form)
  and hard-negative mining (top similar items with a DIFFERENT label,
  the contrastive-training curation step);
- deterministic weighted sampling (Efraimidis–Spirakis keys over a
  hash-uniform — the reproducible "sample ∝ tokens" corpus draw).

All token math is explode + aggregate; similarity math is the HOF
cosine (JVM-side; see ann_cosine_topk for the dim= crossover note).
Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import tokens
from parcel_analytics_etl_notebook_spark.functions.vectors import (
    cosine_similarity,
)
from parcel_analytics_etl_notebook_spark.plans.catalog import register, table
from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
    _SQL_COS,
    _SQL_TOKS,
)

#: 5-token spans of token-list {0} (DuckDB 1-based; Spark twin is
#: 0-based sequence(0, size-5))
_SQL_5GRAMS = (
    "list_transform(range(1, len({0})-3), "
    "i -> {0}[i] || ' ' || {0}[i+1] || ' ' || {0}[i+2] || ' ' || "
    "{0}[i+3] || ' ' || {0}[i+4])"
)


@register(
    "dup_ngram_span_fraction",
    oracle=f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
g AS (SELECT DISTINCT doc_id, unnest({_SQL_5GRAMS.format('l')}) AS gram
      FROM t WHERE len(l) >= 5),
gc AS (SELECT gram, count(*) AS nd FROM g GROUP BY gram)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       round(avg(CASE WHEN gc.nd >= 2 THEN 1.0 ELSE 0.0 END), 4)
           AS dup_frac
FROM g JOIN gc USING (gram)
GROUP BY g.doc_id
ORDER BY g.doc_id
""",
)
def dup_ngram_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level duplication signal: per document, the
    fraction of its DISTINCT word 5-grams that occur in at least one
    OTHER document (a gram seen twice in one doc but nowhere else does
    not count). This is the per-doc score an exact-substring dedup pass
    (Lee et al. 2022) thresholds or trims on.

    Scale shape: docs explode to distinct (doc, gram) once; the gram
    document-frequency is ONE map-side-combinable aggregate (never a
    pair join — unlike LSH candidate generation, df-counting is linear
    in corpus size, so no hot-gram cap is needed); the join back is on
    the same gram partitioning the count produced."""
    docs = table(spark, sf_dir, "documents")
    g = (
        docs.select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks)-5), i -> "
                    "concat_ws(' ', toks[i], toks[i+1], toks[i+2], "
                    "toks[i+3], toks[i+4]))"
                )
            ).alias("gram"),
        )
        # ONE exchange serves the whole query (r12): hash-partitioning
        # by gram satisfies the (doc, gram) distinct (partitioning by a
        # SUBSET of the grouping keys co-locates every duplicate), the
        # df groupBy(gram), and the join back on gram — the previous
        # shape exchanged by (doc, gram) for the distinct and then
        # re-exchanged both join sides by gram (3 shuffles → 1).
        .repartition("gram")
        .distinct()
    )
    gc = g.groupBy("gram").agg(F.count(F.lit(1)).alias("nd"))
    return (
        g.join(gc, on="gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(
                F.avg(F.when(F.col("nd") >= 2, 1.0).otherwise(0.0)), 4
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "template_prefix_stats",
    oracle=f"""
WITH t AS (SELECT doc_id, source, lang, {_SQL_TOKS} AS l FROM documents),
p AS (SELECT doc_id, source, lang,
             l[1] || ' ' || l[2] || ' ' || l[3] || ' ' || l[4] AS prefix
      FROM t WHERE len(l) >= 4)
SELECT prefix,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM p
GROUP BY prefix
HAVING count(*) >= 2
ORDER BY n_docs DESC, prefix
""",
)
def template_prefix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/template detection by shared document openings: the
    4-token prefix of each document, kept where ≥2 documents share it —
    the cheap detector for scraped-template corpora (shared headers,
    nav text, license banners). One tiny projection per doc (no
    explode), one aggregate on the prefix — at 100 TB this is a
    hash-agg over |docs| short strings, map-side combinable."""
    docs = table(spark, sf_dir, "documents")
    p = (
        docs.select(
            "source", "lang", tokens("text").alias("toks")
        )
        .filter(F.size("toks") >= 4)
        .select(
            "source",
            "lang",
            F.concat_ws(
                " ",
                F.col("toks")[0],
                F.col("toks")[1],
                F.col("toks")[2],
                F.col("toks")[3],
            ).alias("prefix"),
        )
    )
    return (
        p.groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
            F.count_distinct("lang").cast("bigint").alias("n_langs"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "prefix")
    )


@register(
    "zipf_slope_by_lang",
    oracle=f"""
WITH tok AS (SELECT lang, unnest({_SQL_TOKS}) AS term FROM documents),
tf AS (SELECT lang, term, count(*) AS freq FROM tok
       WHERE term <> '' GROUP BY lang, term),
ranked AS (SELECT lang, freq,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY freq DESC, term) AS rnk
           FROM tf)
SELECT lang,
       round(regr_slope(ln(freq), ln(rnk)), 4) AS zipf_slope,
       CAST(count(*) AS BIGINT) AS vocab_size,
       CAST(sum(freq) AS BIGINT) AS n_tokens
FROM ranked GROUP BY lang ORDER BY lang
""",
)
def zipf_slope_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law slope per language: regress log(frequency) on
    log(rank) over the term-frequency table. Natural text sits near −1;
    a flat slope flags synthetic/keyword-stuffed corpora, a cliff flags
    truncated vocabularies — a standard corpus sanity gate. Rank is
    deterministic (freq desc, term tiebreak); the regression is the
    built-in regr_slope aggregate on both engines, so the whole query
    is two map-side-combinable aggregates and one |vocab|-row window."""
    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select("lang", F.explode(tokens("text")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("freq").desc(), "term")
    ranked = tf.withColumn("rnk", F.row_number().over(w))
    return (
        ranked.groupBy("lang")
        .agg(
            F.round(
                F.regr_slope(F.log("freq"), F.log("rnk")), 4
            ).alias("zipf_slope"),
            F.count(F.lit(1)).alias("vocab_size"),
            F.sum("freq").cast("bigint").alias("n_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "vocab_growth_curve",
    oracle=f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
firsts AS (
    SELECT term, min(doc_id) AS first_doc
    FROM (SELECT doc_id, unnest(l) AS term FROM t) u
    WHERE term <> '' GROUP BY term
),
dtok AS (SELECT doc_id, len(l) AS n_tok FROM t),
chk AS (
    SELECT f.frac,
           CAST(floor(f.frac * (SELECT max(doc_id) FROM documents))
                AS BIGINT) AS chk_doc
    FROM (VALUES (0.2), (0.4), (0.6), (0.8), (1.0)) AS f(frac)
)
SELECT chk.frac AS frac, chk.chk_doc AS chk_doc,
       (SELECT CAST(count(*) AS BIGINT) FROM firsts
        WHERE first_doc <= chk.chk_doc) AS vocab_size,
       (SELECT CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM dtok
        WHERE doc_id <= chk.chk_doc) AS n_tokens
FROM chk ORDER BY frac
""",
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: distinct-term count vs cumulative
    token count at five corpus checkpoints (20%..100% of the doc-id
    range — id-relative so the same query scales across SFs).
    Sub-linear growth is healthy; a linear curve flags id-heavy or
    noisy text, a flat one an exhausted synthetic vocabulary.

    Scale shape: "cumulative distinct" is NOT computed by re-scanning
    per checkpoint — each term reduces to its FIRST document id (one
    aggregate), then a 5-row broadcast of checkpoints joins against
    term-firsts and per-doc token counts. O(vocab + docs), not
    O(checkpoints × corpus)."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("toks"))
    firsts = (
        t.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    dtok = t.select("doc_id", F.size("toks").alias("n_tok"))
    maxid = docs.agg(F.max("doc_id").alias("__maxid"))
    chk = (
        spark.createDataFrame(
            [(0.2,), (0.4,), (0.6,), (0.8,), (1.0,)], "frac double"
        )
        .crossJoin(F.broadcast(maxid))
        .select(
            "frac",
            F.floor(F.col("frac") * F.col("__maxid"))
            .cast("bigint")
            .alias("chk_doc"),
        )
    )
    vocab = (
        firsts.join(
            F.broadcast(chk), firsts.first_doc <= chk.chk_doc
        )
        .groupBy("frac", "chk_doc")
        .agg(F.count(F.lit(1)).alias("vocab_size"))
    )
    toks = (
        dtok.join(F.broadcast(chk), dtok.doc_id <= chk.chk_doc)
        .groupBy("frac", "chk_doc")
        .agg(F.coalesce(F.sum("n_tok"), F.lit(0)).alias("n_tokens"))
    )
    # LEFT joins from the checkpoint frame: a checkpoint with no docs
    # or terms at-or-below it (possible when floor(frac·maxid) < the
    # smallest doc_id) must still appear with zeros, as the oracle's
    # scalar subqueries do — inner joins would drop the row
    return (
        chk.join(vocab, on=["frac", "chk_doc"], how="left")
        .join(toks, on=["frac", "chk_doc"], how="left")
        .select(
            "frac",
            "chk_doc",
            F.coalesce("vocab_size", F.lit(0)).cast("bigint").alias(
                "vocab_size"
            ),
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias(
                "n_tokens"
            ),
        )
        .orderBy("frac")
    )


@register(
    "ann_multi_query_topk",
    oracle=f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
           WHERE vec_id BETWEEN 0 AND 4),
sims AS (
    SELECT q.qid, e.vec_id,
           round({_SQL_COS.format('e.embedding', 'q.qvec')}, 6) AS cosine
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> q.qid
),
ranked AS (
    SELECT qid, vec_id, cosine,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cosine DESC, vec_id) AS rank
    FROM sims
)
SELECT qid, vec_id, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
ORDER BY qid, rank
""",
)
def ann_multi_query_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact top-k: nearest 3 corpus vectors for EACH of a
    5-vector query batch in one pass — the retrieval-evaluation shape
    (single-query ann_cosine_topk is the unit form). The query batch
    broadcasts (one corpus scan regardless of batch size); the per-query
    top-3 is a rank window partitioned by query id, which Spark prunes
    map-side via WindowGroupLimit — each partition forwards ≤3 rows per
    query, so the shuffle carries O(batch · k), never the scored
    corpus."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") <= 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("__qvec")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                cosine_similarity(F.col("embedding"), F.col("__qvec")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .orderBy("qid", "rank")
    )


@register(
    "hard_negative_mining",
    oracle=f"""
WITH q AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qvec
           FROM embeddings WHERE vec_id BETWEEN 0 AND 4),
sims AS (
    SELECT q.qid, q.qlabel, e.vec_id, e.label AS neg_label,
           round({_SQL_COS.format('e.embedding', 'q.qvec')}, 6) AS cosine
    FROM embeddings e CROSS JOIN q
    WHERE e.label <> q.qlabel
),
ranked AS (
    SELECT qid, qlabel, vec_id, neg_label, cosine,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cosine DESC, vec_id) AS rank
    FROM sims
)
SELECT qid, qlabel, vec_id, neg_label, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 2
ORDER BY qid, rank
""",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    in the query batch, the 2 most-similar vectors with a DIFFERENT
    label — maximally confusing negatives. Same broadcast-batch +
    WindowGroupLimit shape as ann_multi_query_topk with the label
    disequality folded into the scoring filter (evaluated on broadcast
    columns, so it prunes before the cosine is computed). At 100 TB the
    anchor batch shards into broadcast-sized chunks and the corpus is
    scanned once per chunk."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") <= 4).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("__qvec"),
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("qlabel"))
        .select(
            "qid",
            "qlabel",
            "vec_id",
            F.col("label").alias("neg_label"),
            F.round(
                cosine_similarity(F.col("embedding"), F.col("__qvec")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 2)
        .orderBy("qid", "rank")
    )


@register(
    "token_weighted_sample",
    oracle=f"""
WITH t AS (
    SELECT doc_id, lang, len({_SQL_TOKS}) AS n_tokens FROM documents
),
keyed AS (
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(ln(((doc_id * 2654435761 + 97) % 1000003 + 1)
                    / 1000004.0) / n_tokens, 6) AS sample_key
    FROM t WHERE n_tokens > 0
)
SELECT doc_id, lang, n_tokens, sample_key
FROM keyed
ORDER BY sample_key DESC, doc_id
LIMIT 100
""",
)
def token_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis): each document gets key ln(u)/w with u a
    multiplicative-hash uniform from doc_id and w its token count; the
    top-k by key IS a token-weighted sample — the standard
    "sample proportional to tokens" pretraining subset draw, made
    rerunnable and engine-stable by replacing the RNG with a key hash
    (df.sample() is partitioning-dependent, unusable for reproducible
    corpus draws). Keys are rounded before ranking so the boundary is
    float-jitter-proof; top-k is TakeOrderedAndProject — per-partition
    heads, no global sort, no shuffle of the corpus."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang", F.size(tokens("text")).alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    u = (
        (F.col("doc_id") * F.lit(2654435761) + F.lit(97)) % F.lit(1000003)
        + 1
    ) / F.lit(1000004.0)
    keyed = t.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.log(u) / F.col("n_tokens"), 6).alias("sample_key"),
    )
    return keyed.orderBy(F.col("sample_key").desc(), "doc_id").limit(100)


@register(
    "image_meta_profile",
    oracle="""
WITH dims AS (
    SELECT doc_id,
           16 + doc_id % 1905 AS width,
           16 + (doc_id * 7) % 1065 AS height
    FROM documents
),
o AS (
    SELECT CASE WHEN width > height THEN 'landscape'
                WHEN width < height THEN 'portrait'
                ELSE 'square' END AS orientation,
           width, height
    FROM dims
)
SELECT 'png' AS format, orientation,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(min(width) AS BIGINT) AS min_width,
       CAST(max(width) AS BIGINT) AS max_width,
       round(avg(width * height / 1000000.0), 4) AS avg_megapixels
FROM o
GROUP BY orientation
ORDER BY orientation
""",
)
def image_meta_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resolution profiling through REAL bytes: build a
    spec-exact PNG header per document JVM-side (signature + IHDR with
    big-endian dims derived from doc_id), parse it back with the real
    header decoder (operators/multimodal.parse_image_header — magic
    bytes, not a stub), and profile the corpus by orientation. The
    oracle recomputes the dims arithmetically, so the hash check
    verifies the ENTIRE binary round trip: a single mis-laid header
    byte or endianness slip shifts width/height and flips the hash.

    Scale shape: construction and parsing are both map-side (concat of
    literals + one Arrow-batched mapInPandas hop over (doc_id,
    payload)); the only shuffle is the 3-group aggregate of the SMALL
    parsed-metadata projection — the binary column dies before the
    exchange, which is the whole point of harvesting dimensions at
    ingest instead of decoding pixels downstream."""
    from parcel_analytics_etl_notebook_spark.operators.multimodal import (
        extract_image_meta,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    w = (F.lit(16) + F.col("doc_id") % F.lit(1905)).cast("int")
    h = (F.lit(16) + (F.col("doc_id") * F.lit(7)) % F.lit(1065)).cast("int")
    payload = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A")),  # PNG signature
        F.unhex(F.lit("0000000D")),  # IHDR length = 13
        F.encode(F.lit("IHDR"), "UTF-8"),
        F.unhex(F.lpad(F.hex(w), 8, "0")),  # big-endian u32 width
        F.unhex(F.lpad(F.hex(h), 8, "0")),  # big-endian u32 height
        F.unhex(F.lit("0802000000")),  # bit depth 8, truecolor
        F.unhex(F.lit("00000000")),  # CRC placeholder (not validated)
    )
    imgs = docs.select("doc_id", payload.alias("payload"))
    meta = extract_image_meta(imgs)
    orientation = (
        F.when(F.col("width") > F.col("height"), "landscape")
        .when(F.col("width") < F.col("height"), "portrait")
        .otherwise("square")
    )
    return (
        meta.select("format", orientation.alias("orientation"),
                    "width", "height")
        .groupBy("format", "orientation")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("width").cast("bigint").alias("min_width"),
            F.max("width").cast("bigint").alias("max_width"),
            F.round(
                F.avg(F.col("width") * F.col("height") / F.lit(1000000.0)), 4
            ).alias("avg_megapixels"),
        )
        .orderBy("orientation")
    )


@register(
    "filtered_ann_topk",
    oracle=f"""
WITH en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
sims AS (
    SELECT e.vec_id, round({_SQL_COS.format('e.embedding', 'qv')}, 6) AS cosine
    FROM embeddings e JOIN en ON e.vec_id = en.doc_id, q
    WHERE e.vec_id <> 0
)
SELECT vec_id, cosine FROM sims ORDER BY cosine DESC, vec_id LIMIT 5
""",
)
def filtered_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search — the retrieval-system primitive plain
    top-k lacks: restrict candidates by a METADATA predicate (here
    lang='en', resolved through the documents table) before ranking by
    cosine. Pre-filtering is the correct order at scale: post-filtering
    a top-k can return fewer than k rows (or none) when the predicate
    is selective, the classic filtered-ANN failure mode.

    Plan shape: the lang predicate pushes into the documents scan, the
    id equi-join prunes the corpus BEFORE any similarity math runs, and
    the ranking stays TakeOrderedAndProject over the surviving rows —
    the filter costs one key join, never a second pass over scored
    results."""
    from parcel_analytics_etl_notebook_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    en_ids = (
        table(spark, sf_dir, "documents")
        .filter(F.col("lang") == "en")
        .select(F.col("doc_id").alias("vec_id"))
    )
    candidates = emb.filter(F.col("vec_id") != 0).join(
        en_ids, "vec_id", "left_semi"
    )
    return brute_force_topk(
        candidates, emb.filter(F.col("vec_id") == 0), k=5
    )


@register(
    "hybrid_rrf_retrieval",
    oracle=f"""
WITH qt AS (
    SELECT DISTINCT unnest({_SQL_TOKS}) AS tok FROM documents WHERE doc_id = 0
),
dt AS (
    SELECT doc_id, unnest(list_distinct({_SQL_TOKS})) AS tok
    FROM documents WHERE doc_id <> 0
),
lex AS (
    SELECT dt.doc_id, CAST(count(*) AS BIGINT) AS overlap
    FROM dt JOIN qt ON dt.tok = qt.tok GROUP BY dt.doc_id
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cand AS (
    SELECT lex.doc_id, lex.overlap,
           round({_SQL_COS.format('e.embedding', 'qv')}, 6) AS cosine
    FROM lex JOIN embeddings e ON lex.doc_id = e.vec_id, q
),
ranked AS (
    SELECT doc_id, overlap, cosine,
           row_number() OVER (ORDER BY overlap DESC, doc_id) AS lex_rank,
           row_number() OVER (ORDER BY cosine DESC, doc_id) AS vec_rank
    FROM cand
)
SELECT doc_id, CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(vec_rank AS BIGINT) AS vec_rank,
       round(1.0 / (60 + lex_rank) + 1.0 / (60 + vec_rank), 6) AS rrf_score
FROM ranked
ORDER BY rrf_score DESC, doc_id LIMIT 10
""",
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical + vector retrieval fused by Reciprocal Rank
    Fusion (Cormack et al.: score = Σ 1/(k + rank), k=60) — the
    standard way to combine a keyword signal and an embedding signal
    without score calibration, since RRF consumes only RANKS. Candidate
    generation is lexical (docs sharing ≥1 distinct token with query
    doc 0 — the inverted-index step), then each candidate gets a
    deterministic lexical rank (shared-token count) and vector rank
    (cosine to the query embedding), fused and re-ranked.

    Scale shape: the token join is explode + broadcast of the QUERY'S
    token set (query-sized, not corpus-sized); the overlap aggregate
    shuffles on doc_id and the embedding join reuses that key. The two
    rank windows are global but run over the CANDIDATE set (bounded by
    lexical recall), not the corpus — the same containment every
    retrieval system relies on. Ranks round cosine to 6 dp first so
    accumulation jitter cannot reorder the fusion."""
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    qtok = (
        docs.filter(F.col("doc_id") == 0)
        .select(F.explode(F.array_distinct(tokens("text"))).alias("tok"))
        .distinct()
    )
    dtok = docs.filter(F.col("doc_id") != 0).select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("tok")
    )
    lex = (
        dtok.join(F.broadcast(qtok), "tok")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("overlap"))
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__qv")
    )
    cand = (
        lex.join(emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id")
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            "overlap",
            F.round(cosine_similarity("embedding", "__qv"), 6).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    wl = Window.orderBy(F.col("overlap").desc(), "doc_id")
    wv = Window.orderBy(F.col("cosine").desc(), "doc_id")
    ranked = cand.select(
        "doc_id",
        F.row_number().over(wl).cast("bigint").alias("lex_rank"),
        F.row_number().over(wv).cast("bigint").alias("vec_rank"),
    )
    rrf = F.round(
        1.0 / (F.lit(60) + F.col("lex_rank"))
        + 1.0 / (F.lit(60) + F.col("vec_rank")),
        6,
    ).alias("rrf_score")
    return ranked.select("doc_id", "lex_rank", "vec_rank", rrf).orderBy(
        F.col("rrf_score").desc(), "doc_id"
    ).limit(10)


@register(
    "bm25_topk",
    oracle=f"""
WITH base AS (
    SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
),
lens AS (SELECT doc_id, len(toks) AS dl FROM base WHERE len(toks) > 0),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 avg(dl) AS avgdl FROM lens),
tf AS (
    SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
    FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
    GROUP BY doc_id, tok
),
df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
qt AS (SELECT DISTINCT unnest(toks) AS tok FROM base WHERE doc_id = 0),
scored AS (
    SELECT tf.doc_id,
           sum(
             ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
             * tf.tf * (1.2 + 1)
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * lens.dl / stats.avgdl))
           ) AS s
    FROM tf
    JOIN qt ON tf.tok = qt.tok
    JOIN df ON tf.tok = df.tok
    JOIN lens ON tf.doc_id = lens.doc_id, stats
    WHERE tf.doc_id <> 0
    GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 6) AS bm25 FROM scored
ORDER BY bm25 DESC, doc_id LIMIT 10
""",
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) top-10 for query doc 0's token set —
    the production lexical scorer (saturating tf, length-normalized,
    rare-term-weighted), completing the retrieval stack next to
    tfidf_top_terms (per-doc salience) and hybrid_rrf_retrieval (rank
    fusion).

    Scale shape: tf is one explode + (doc, tok) aggregate; df is a
    token-keyed reduce OVER tf (never a second corpus pass); n_docs and
    avgdl ride ONE broadcast 1-row frame; the query's token set joins
    broadcast so only query-term postings flow into scoring — the
    inverted-index access pattern, expressed relationally. Final score
    rounds to 6 dp before the deterministic (score, doc_id) top-k."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens("text").alias("toks"))
    lens = base.filter(F.size("toks") > 0).select(
        "doc_id", F.size("toks").cast("double").alias("dl")
    )
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_ = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    qt = (
        base.filter(F.col("doc_id") == 0)
        .select(F.explode(F.array_distinct("toks")).alias("tok"))
        .distinct()
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    denom = F.col("tf") + 1.2 * (
        1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl")
    )
    # df restricted to QUERY terms before broadcasting: the full-vocab
    # df table is dictionary-sized (huge at corpus scale); the pruned
    # one is query-sized. tf joins the same pruned set, so only
    # query-term postings ever flow into scoring.
    df_q = df_.join(F.broadcast(qt), "tok")
    return (
        tf.filter(F.col("doc_id") != 0)
        .join(F.broadcast(df_q), "tok")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(idf * F.col("tf") * (1.2 + 1) / denom), 6
            ).alias("bm25")
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


@register(
    "diversified_ann_topk",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
sims AS (
    SELECT e.vec_id, d.lang,
           round({_SQL_COS.format('e.embedding', 'qv')}, 6) AS cosine
    FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id, q
    WHERE e.vec_id <> 0
),
quota AS (
    SELECT vec_id, lang, cosine,
           row_number() OVER (PARTITION BY lang
                              ORDER BY cosine DESC, vec_id) AS lang_rank
    FROM sims
)
SELECT vec_id, lang, cosine, CAST(lang_rank AS BIGINT) AS lang_rank
FROM quota WHERE lang_rank <= 2
ORDER BY cosine DESC, vec_id LIMIT 6
""",
)
def diversified_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-quota vector search: global top-6 by cosine subject to
    AT MOST 2 results per language — the quota form of diversified
    retrieval (the cheap, deterministic alternative to greedy MMR: one
    per-group window instead of k sequential re-scoring passes, which
    is also why it scales — the quota prune is a WindowGroupLimit
    per lang partition, then a bounded global top-k).

    Plan shape: metadata join to fetch the group key, one lang-keyed
    window with map-side group-limit pruning, TakeOrderedAndProject for
    the final 6. Deterministic: cosine rounded before both rankings,
    ties break on id."""
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings")
    docs = table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__qv")
    )
    sims = (
        emb.filter(F.col("vec_id") != 0)
        .join(docs, "vec_id")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "lang",
            F.round(cosine_similarity("embedding", "__qv"), 6).alias("cosine"),
        )
    )
    wq = Window.partitionBy("lang").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        sims.withColumn("lang_rank", F.row_number().over(wq).cast("bigint"))
        .filter(F.col("lang_rank") <= 2)
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(6)
    )


@register(
    "retrieval_rank_agreement",
    oracle=f"""
WITH base AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
lens AS (SELECT doc_id, len(toks) AS dl FROM base WHERE len(toks) > 0),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
          FROM lens),
tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
       FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
       GROUP BY doc_id, tok),
df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
qt AS (SELECT DISTINCT unnest(toks) AS tok FROM base WHERE doc_id = 0),
bscore AS (
    SELECT tf.doc_id,
           round(sum(
             ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
             * tf.tf * (1.2 + 1)
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * lens.dl / stats.avgdl))
           ), 6) AS s
    FROM tf JOIN qt ON tf.tok = qt.tok JOIN df ON tf.tok = df.tok
    JOIN lens ON tf.doc_id = lens.doc_id, stats
    WHERE tf.doc_id <> 0 GROUP BY tf.doc_id
),
b AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
      FROM bscore ORDER BY s DESC, doc_id LIMIT 10),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
vscore AS (
    SELECT vec_id AS doc_id,
           round({_SQL_COS.format('embedding', 'qv')}, 6) AS c
    FROM embeddings, q WHERE vec_id <> 0
),
v AS (SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id) AS r
      FROM vscore ORDER BY c DESC, doc_id LIMIT 10),
j AS (SELECT b.doc_id AS bd, v.doc_id AS vd, b.r AS br, v.r AS vr
      FROM b FULL OUTER JOIN v ON b.doc_id = v.doc_id)
SELECT CAST(sum(CASE WHEN bd IS NOT NULL AND vd IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_common_at10,
       round(sum(CASE WHEN bd IS NOT NULL AND vd IS NOT NULL
                      THEN 1 ELSE 0 END)
             / (20.0 - sum(CASE WHEN bd IS NOT NULL AND vd IS NOT NULL
                                THEN 1 ELSE 0 END)), 4) AS jaccard_at10,
       round(avg(CASE WHEN bd IS NOT NULL AND vd IS NOT NULL
                      THEN abs(br - vr) END), 4) AS footrule_avg
FROM j
""",
)
def retrieval_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retriever-agreement evaluation: how much do the lexical (BM25)
    and vector (cosine) top-10 lists agree for the same query doc?
    Reports shared-document count, Jaccard@10, and the average Spearman
    footrule distance |rank_lex − rank_vec| over the shared documents
    (NULL when the lists are disjoint). Low agreement is precisely the
    regime where RRF fusion (hybrid_rrf_retrieval) buys recall — this
    query is the measurement that justifies running hybrid at all.

    Scale shape: composes the two retrievals' plans unchanged (each a
    bounded top-10), then a full-outer join of two 10-row frames and a
    1-row aggregate — the evaluation overhead beyond the retrievals
    themselves is constant."""
    from parcel_analytics_etl_notebook_spark.plans.catalog import queries as _qs

    b = (
        _qs()["bm25_topk"](spark, sf_dir)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
            .alias("br"),
        )
    )
    v = (
        _qs()["ann_cosine_topk"](spark, sf_dir)
        .select(
            F.col("vec_id").alias("vdoc"),
            F.row_number()
            .over(Window.orderBy(F.col("cosine").desc(), "vec_id"))
            .alias("vr"),
        )
    )
    j = b.join(v, b.doc_id == v.vdoc, "full_outer")
    common = F.col("doc_id").isNotNull() & F.col("vdoc").isNotNull()
    n_common = F.sum(common.cast("int"))
    return j.agg(
        n_common.cast("bigint").alias("n_common_at10"),
        F.round(n_common / (20.0 - n_common), 4).alias("jaccard_at10"),
        F.round(
            F.avg(F.when(common, F.abs(F.col("br") - F.col("vr")))), 4
        ).alias("footrule_avg"),
    )


@register(
    "embedding_drift_by_label",
    oracle="""
WITH halves AS (
    SELECT vec_id, label,
           ((vec_id * 2654435761) % 1000003) % 2 AS half, embedding
    FROM embeddings
),
comp AS (
    SELECT label, half,
           struct_extract(u, 2) AS pos,
           round(avg(CAST(struct_extract(u, 1) AS DOUBLE)), 6) AS m,
           count(*) AS c
    FROM (SELECT label, half,
                 unnest(list_zip(embedding,
                                 range(0, len(embedding)))) AS u
          FROM halves)
    GROUP BY label, half, struct_extract(u, 2)
)
SELECT a.label,
       round(sqrt(sum((a.m - b.m) * (a.m - b.m))), 6) AS centroid_drift,
       CAST(max(a.c) AS BIGINT) AS n_a,
       CAST(max(b.c) AS BIGINT) AS n_b
FROM comp a JOIN comp b ON a.label = b.label AND a.pos = b.pos
WHERE a.half = 0 AND b.half = 1
GROUP BY a.label ORDER BY a.label
""",
)
def embedding_drift_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: split each label's vectors into two
    deterministic halves (id-hash parity — in production the halves are
    time windows) and report the L2 distance between the half-centroids
    — the cheap continuous check that an embedding distribution hasn't
    shifted under a retrain/re-ingest, per class.

    Scale shape: posexplode to (label, half, component) rows — 64 rows
    per vector, the same explode budget the component-mean trainer
    uses — then ONE map-side-combinable aggregate and a |labels|·dim
    self-join on the tiny component-mean table. Component means round
    to 6 dp before differencing so the drift statistic is
    engine-stable."""
    emb = table(spark, sf_dir, "embeddings")
    halves = emb.select(
        "label",
        (F.pmod(F.col("vec_id") * 2654435761, F.lit(1000003)) % 2).alias(
            "half"
        ),
        F.posexplode("embedding").alias("pos", "val"),
    )
    comp = halves.groupBy("label", "half", "pos").agg(
        F.round(F.avg(F.col("val").cast("double")), 6).alias("m"),
        F.count(F.lit(1)).alias("c"),
    )
    a = comp.filter(F.col("half") == 0).select(
        "label", "pos", F.col("m").alias("ma"), F.col("c").alias("ca")
    )
    b = comp.filter(F.col("half") == 1).select(
        F.col("label").alias("lb"), F.col("pos").alias("pb"),
        F.col("m").alias("mb"), F.col("c").alias("cb"),
    )
    return (
        a.join(b, (a.label == b.lb) & (a.pos == b.pb))
        .groupBy("label")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("ma") - F.col("mb")) ** 2)), 6
            ).alias("centroid_drift"),
            F.max("ca").cast("bigint").alias("n_a"),
            F.max("cb").cast("bigint").alias("n_b"),
        )
        .orderBy("label")
    )
