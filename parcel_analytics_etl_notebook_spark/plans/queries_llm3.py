"""LLM-pipeline operators, round 3: corpus statistics, quality signals,
and sketch-accuracy evaluation over the documents/embeddings tables.

Families covered here (extends queries_llm/queries_llm2):
- distribution analysis: global token-length deciles;
- boilerplate/quality signals: repeated-ngram ratio, token entropy,
  stopword ratio;
- corpus language modeling: per-language top bigrams and conditional
  bigram surprisal (the cheap perplexity proxy quality filters use);
- language-ID evaluation: per-language contamination rate (the rate
  view of lang_confusion_matrix);
- sketch accuracy: MinHash-estimated vs exact n-gram Jaccard per
  candidate pair;
- embedding hygiene: per-label centroid-distance outliers (mislabeled /
  corrupt vector detection; plain norms are degenerate here because the
  corpus is unit-normalized).

All token math is explode + aggregate (JVM-side, map-side combinable),
never per-seed HOF folds — the round-2 "HOF lessons" (SCALING.md).
Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import tokens
from parcel_analytics_etl_notebook_spark.plans.catalog import register, table
from parcel_analytics_etl_notebook_spark.plans.queries_llm import _SQL_TOKS

# Union of the language marker words (operators/textqa.LANG_MARKERS) —
# the fixed stopword list for ratio features. A literal so the oracle
# can restate it verbatim.
_STOPWORDS = (
    "the", "a", "of", "and",
    "der", "die", "das", "und",
    "el", "la", "los", "y",
    "le", "les", "et",
    "的", "是", "了", "在",
)
_SQL_STOP = "(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"

#: token bigrams of token-list {0} — the ONE definition both engines
#: share (three queries build bigrams; a drift in any copy would break
#: exactly one oracle pair, so there are no copies)
_SQL_BIGRAMS = (
    "list_transform(range(1, len({0})), i -> {0}[i] || ' ' || {0}[i+1])"
)


def _bigrams(col: str = "l"):
    """Spark twin of _SQL_BIGRAMS (0-based sequence)."""
    return F.expr(
        f"transform(sequence(0, size({col})-2), "
        f"i -> concat_ws(' ', {col}[i], {col}[i+1]))"
    )


#: NULL-guarded token trigrams of token-list {0} (docs shorter than 3
#: tokens yield NULL, which downstream ratio math must coalesce)
_SQL_TRIGRAMS_GUARDED = (
    "CASE WHEN len({0}) < 3 THEN NULL "
    "ELSE list_transform(range(1, len({0})-1), "
    "i -> {0}[i] || ' ' || {0}[i+1] || ' ' || {0}[i+2]) END"
)


def _trigrams_guarded(col: str):
    """Spark twin of _SQL_TRIGRAMS_GUARDED."""
    return F.expr(
        f"CASE WHEN size({col}) < 3 THEN NULL "
        f"ELSE transform(sequence(0, size({col})-3), "
        f"i -> concat_ws(' ', {col}[i], {col}[i+1], {col}[i+2])) END"
    )


def _doc_entropy(docs: DataFrame) -> DataFrame:
    """(doc_id, entropy): Shannon entropy of each doc's token
    distribution — the ONE Spark definition shared by
    token_entropy_quality and quality_filter_funnel."""
    c = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = c.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        c.join(n, on="doc_id")
        .groupBy("doc_id")
        .agg((-F.sum(p * F.log2(p))).alias("entropy"))
    )



@register(
    "doc_length_deciles",
    oracle=f"""
WITH t AS (SELECT doc_id, len({_SQL_TOKS}) AS n FROM documents),
d AS (SELECT doc_id, n, ntile(10) OVER (ORDER BY n, doc_id) AS decile FROM t)
SELECT decile,
       CAST(count(*) AS BIGINT)  AS n_docs,
       CAST(min(n) AS BIGINT)    AS min_tokens,
       CAST(max(n) AS BIGINT)    AS max_tokens,
       round(avg(n), 4)          AS avg_tokens
FROM d GROUP BY decile ORDER BY decile
""",
)
def doc_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token-count deciles — the length-distribution audit run
    before choosing truncation/packing budgets. EXACT, and fully
    distributed (VERDICT r03 #4): operators/indexing.exact_ntile —
    two-pass stable_global_index rank plus ntile's bucket arithmetic
    in exact integer math — replaces the single-task global sort
    window and equals ntile(10) row-for-row under the same total
    order (n, doc_id). The total row count is one driver scalar off
    the persisted (doc_id, n) frame — the same model-sized collect
    budget every two-pass operator spends. The 100 TB companion is
    approx_token_percentiles (percentile sketch, no global order);
    this query is its exact twin so sketch drift is measurable."""
    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        exact_ntile,
    )

    docs = table(spark, sf_dir, "documents")
    n = docs.select(
        "doc_id", F.size(tokens("text")).cast("bigint").alias("n")
    ).persist()
    d = exact_ntile(n, ["n", "doc_id"], 10, out_col="decile")
    return (
        d.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
            F.round(F.avg("n"), 4).alias("avg_tokens"),
        )
        .orderBy("decile")
    )


@register(
    "repeated_ngram_ratio",
    oracle=f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
g AS (SELECT doc_id,
             {_SQL_TRIGRAMS_GUARDED.format('l')} AS gr
      FROM t)
SELECT doc_id,
       CAST(coalesce(len(gr), 0) AS BIGINT) AS n_ngrams,
       round(1.0 - len(list_distinct(gr)) * 1.0 / len(gr), 4) AS repeat_ratio
FROM g
""",
)
def repeated_ngram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repeated-3-gram ratio (1 − distinct/total) — the
    standard boilerplate/template detector quality filters threshold
    on. Pure array expressions per row, no shuffle at all; NULL ratio
    for docs too short to have a trigram."""
    docs = table(spark, sf_dir, "documents")
    g = docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id",
        _trigrams_guarded("toks").alias("gr"),
    )
    return g.select(
        "doc_id",
        F.coalesce(F.size("gr"), F.lit(0)).cast("bigint").alias("n_ngrams"),
        F.round(
            1.0 - F.size(F.array_distinct("gr")) / F.size("gr"), 4
        ).alias("repeat_ratio"),
    )


@register(
    "stopword_ratio_by_lang",
    oracle=f"""
WITH t AS (SELECT lang, doc_id, unnest({_SQL_TOKS}) AS tok FROM documents)
SELECT lang,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(sum(CASE WHEN tok IN {_SQL_STOP} THEN 1 ELSE 0 END) * 1.0
             / count(*), 4) AS stopword_ratio
FROM t GROUP BY lang ORDER BY lang
""",
)
def stopword_ratio_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted stopword fraction per language (fixed marker-word
    list) — a one-pass quality/normality signal: too-low means
    keyword-stuffed or non-linguistic text, too-high means empty
    filler. Explode + aggregate: map-side combine reduces to |langs|
    rows per partition."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", "doc_id", F.explode(tokens("text")).alias("tok")
    )
    return (
        tok.groupBy("lang")
        .agg(
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(
                    F.when(F.col("tok").isin(*_STOPWORDS), 1).otherwise(0)
                )
                / F.count(F.lit(1)),
                4,
            ).alias("stopword_ratio"),
        )
        .orderBy("lang")
    )


@register(
    "token_entropy_quality",
    oracle=f"""
WITH t AS (SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents),
c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY 1)
SELECT c.doc_id,
       CAST(any_value(n.n) AS BIGINT) AS n_tokens,
       round(-sum((c.c * 1.0 / n.n) * log2(c.c * 1.0 / n.n)), 4) AS entropy,
       round(-sum((c.c * 1.0 / n.n) * log2(c.c * 1.0 / n.n)), 4) < 4.0
           AS low_entropy
FROM c JOIN n ON c.doc_id = n.doc_id
GROUP BY c.doc_id
""",
)
def token_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution — low
    entropy ⇒ repetitive/templated text (the flag thresholds at 4.0
    bits; corpus range here is ≈2.7–4.8). explode → (doc, token)
    counts → one more aggregate; both shuffles are map-side
    combinable, and no global state is needed — scales linearly."""
    docs = table(spark, sf_dir, "documents")
    c = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = c.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    ent = F.round(-F.sum(p * F.log2(p)), 4)
    return (
        c.join(n, on="doc_id")
        .groupBy("doc_id")
        .agg(
            F.any_value(F.col("n")).cast("bigint").alias("n_tokens"),
            ent.alias("entropy"),
            (ent < 4.0).alias("low_entropy"),
        )
    )


@register(
    "top_bigrams_per_lang",
    oracle=f"""
WITH t AS (SELECT lang, doc_id, {_SQL_TOKS} AS l FROM documents),
b AS (SELECT lang, unnest({_SQL_BIGRAMS.format('l')}) AS bigram
      FROM t WHERE len(l) >= 2),
c AS (SELECT lang, bigram, CAST(count(*) AS BIGINT) AS cnt
      FROM b GROUP BY 1, 2)
SELECT lang, bigram, cnt
FROM c
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram) <= 5
ORDER BY lang, cnt DESC, bigram
""",
)
def top_bigrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 token bigrams per language — the n-gram frequency table
    behind LM statistics and contamination probes. Bigrams are built
    with one array transform per row (no self-join), exploded, counted
    with map-side combine; the per-lang top-5 window is
    WindowGroupLimit-pruned map-side (Spark ≥3.5), so the shuffle
    carries ≤5 rows per (partition, lang)."""
    docs = table(spark, sf_dir, "documents")
    b = (
        docs.select("lang", tokens("text").alias("l"))
        .filter(F.size("l") >= 2)
        .select(
            "lang",
            F.explode(
                _bigrams("l")
            ).alias("bigram"),
        )
    )
    c = b.groupBy("lang", "bigram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "bigram")
    return (
        c.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 5)
        .drop("__rn")
        .orderBy("lang", F.col("cnt").desc(), "bigram")
    )


@register(
    "bigram_surprisal_stats",
    oracle=f"""
WITH t AS (SELECT lang, doc_id, {_SQL_TOKS} AS l FROM documents),
b AS (SELECT lang, unnest({_SQL_BIGRAMS.format('l')}) AS bigram
      FROM t WHERE len(l) >= 2),
c12 AS (SELECT lang, bigram, count(*) AS c12 FROM b GROUP BY 1, 2),
c1 AS (SELECT lang, split_part(bigram, ' ', 1) AS w1, sum(c12) AS c1
       FROM c12 GROUP BY 1, 2),
su AS (
    SELECT b.lang, -log2(c12.c12 * 1.0 / c1.c1) AS s
    FROM b
    JOIN c12 ON b.lang = c12.lang AND b.bigram = c12.bigram
    JOIN c1  ON b.lang = c1.lang AND split_part(b.bigram, ' ', 1) = c1.w1
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(s), 4) AS avg_surprisal
FROM su GROUP BY lang ORDER BY lang
""",
)
def bigram_surprisal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language average conditional bigram surprisal
    −log₂ P(w₂|w₁) under the corpus MLE language model — the cheap
    perplexity proxy used to score fluency/quality without a neural
    LM. Three aggregations over the exploded bigram stream plus two
    shuffle joins back onto it, all on (lang, token-prefix) keys —
    no driver-side model, scales with corpus size."""
    docs = table(spark, sf_dir, "documents")
    b = (
        docs.select("lang", tokens("text").alias("l"))
        .filter(F.size("l") >= 2)
        .select(
            "lang",
            F.explode(
                _bigrams("l")
            ).alias("bigram"),
        )
    )
    c12 = b.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("c12"))
    c1 = (
        c12.withColumn("w1", F.split("bigram", " ")[0])
        .groupBy("lang", "w1")
        .agg(F.sum("c12").alias("c1"))
    )
    su = (
        b.join(c12, on=["lang", "bigram"])
        .withColumn("w1", F.split("bigram", " ")[0])
        .join(c1, on=["lang", "w1"])
        .select("lang", (-F.log2(F.col("c12") / F.col("c1"))).alias("s"))
    )
    return (
        su.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("s"), 4).alias("avg_surprisal"),
        )
        .orderBy("lang")
    )


def _contamination_oracle() -> str:
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
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN predicted_lang <> lang THEN 1 ELSE 0 END) AS BIGINT)
           AS n_mismatched,
       round(sum(CASE WHEN predicted_lang <> lang THEN 1 ELSE 0 END) * 1.0
             / count(*), 4) AS mismatch_rate
FROM p GROUP BY lang ORDER BY lang
"""


@register("cross_lang_contamination", oracle=_contamination_oracle())
def cross_lang_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language label/heuristic disagreement RATE — the rollup of
    lang_confusion_matrix a pipeline alarms on (how much of each
    language bucket is contaminated by other-language text). Same
    single-pass heuristic projection, |langs|-row aggregate."""
    from parcel_analytics_etl_notebook_spark.operators.textqa import predict_lang

    docs = table(spark, sf_dir, "documents")
    p = docs.select(
        "lang", predict_lang(tokens("text")).alias("predicted_lang")
    )
    mism = F.when(F.col("predicted_lang") != F.col("lang"), 1).otherwise(0)
    return (
        p.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(mism).cast("bigint").alias("n_mismatched"),
            F.round(F.sum(mism) / F.count(F.lit(1)), 4).alias("mismatch_rate"),
        )
        .orderBy("lang")
    )


def _minhash_error_oracle() -> str:
    # recompose the ngram_jaccard_pairs + minhash_signatures oracle CTEs
    from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
        MAX_SHINGLE_DF,
        _SQL_POLY,
    )

    return f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
hh AS (SELECT doc_id, list_transform(l, tok -> {_SQL_POLY.format('tok')}) AS th FROM t),
sh_all AS (
    SELECT doc_id,
           list_transform(range(1, len(th)-1),
               i -> ((th[i]*1000003 + th[i+1]) % 1000000007 * 1000003 + th[i+2]) % 1000000007) AS sh
    FROM hh
),
sig AS (SELECT doc_id,
               list_transform(range(0, 16),
                   s -> list_min(list_transform(sh, x -> ((2*s+1)*x + s*7919) % 1000000007))) AS m
        FROM sh_all),
sh0 AS (SELECT doc_id, unnest(list_distinct(sh)) AS shingle FROM sh_all),
sh2 AS (SELECT * FROM sh0 QUALIFY count(*) OVER (PARTITION BY shingle) <= {MAX_SHINGLE_DF}),
sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
    FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
jac AS (
    SELECT id_a, id_b, round(shared / (sa.n + sb.n - shared), 4) AS jaccard
    FROM pairs
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE shared / (sa.n + sb.n - shared) >= 0.2
)
SELECT j.id_a, j.id_b, j.jaccard,
       round(len(list_filter(range(1, 17), i -> ma.m[i] = mb.m[i])) / 16.0, 4)
           AS minhash_est,
       round(abs(j.jaccard
           - len(list_filter(range(1, 17), i -> ma.m[i] = mb.m[i])) / 16.0), 4)
           AS abs_err
FROM jac j
JOIN sig ma ON j.id_a = ma.doc_id
JOIN sig mb ON j.id_b = mb.doc_id
"""


@register("minhash_jaccard_error", oracle=_minhash_error_oracle())
def minhash_jaccard_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy evaluation: MinHash-estimated Jaccard (fraction
    of equal signature slots, 16 hashes) against the EXACT 3-gram
    Jaccard, per near-dup candidate pair — the calibration view run
    before trusting LSH thresholds corpus-wide. Reuses the exact-pair
    query and the signature operator; the pair set is small (output of
    the capped inverted-index join) and the signature table is
    corpus-grain, so the join strategy is left to AQE's runtime size
    measurement — see the note at the join below."""
    from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
        with_minhash,
    )
    from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
        near_dup_pairs_frame,
    )

    docs = table(spark, sf_dir, "documents")
    # session-scoped pair artifact — built once per sweep, shared with
    # near_dup_groups / near_dup_dedup_summary (VERDICT r05 #5)
    pairs = near_dup_pairs_frame(spark, sf_dir).select(
        "id_a", "id_b", "jaccard"
    )
    # persist: BOTH broadcast sides below re-evaluate this frame (the
    # whole tokenize→shingle→explode→16-min pipeline) — cached, the
    # pipeline runs once and each side reads (doc_id, 16 longs).
    # Measured neutral at sf0.1 (the query is fixed-overhead-bound
    # there) but load-bearing at corpus scale, where the signature
    # pipeline is the dominant cost and would run twice.
    # Deliberately not unpersisted (lazy result must outlive the call);
    # long-lived sessions reclaim via clearCache, as in dedup_fuzzy.
    sig = (
        with_minhash(docs, num_hashes=16).select("doc_id", "minhash").persist()
    )
    a = sig.select(
        F.col("doc_id").alias("id_a"), F.col("minhash").alias("__ma")
    )
    b = sig.select(
        F.col("doc_id").alias("id_b"), F.col("minhash").alias("__mb")
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("__ma", "__mb", lambda x, y: x == y),
                lambda v: v,
            )
        )
        / F.lit(16.0)
    )
    # NO broadcast hint on the signature sides: sig is corpus-grain
    # (one row per doc — the same scale as documents itself), so a
    # forced broadcast OOMs at real SF. The SMALL side here is the
    # capped pair set; AQE measures both at runtime and broadcasts
    # whichever actually fits (at test SFs that happens to be sig —
    # fine, because it was measured, not promised).
    return (
        pairs.join(a, on="id_a")
        .join(b, on="id_b")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            F.round(est, 4).alias("minhash_est"),
            F.round(F.abs(F.col("jaccard") - est), 4).alias("abs_err"),
        )
    )


@register(
    "embedding_centroid_outliers",
    oracle="""
WITH dims AS (
    SELECT label, i, avg(CAST(embedding[i] AS DOUBLE)) AS m
    FROM embeddings, range(1, 65) r(i)
    GROUP BY label, i
),
d AS (
    SELECT e.vec_id, e.label,
           round(sqrt(sum((CAST(e.embedding[d.i] AS DOUBLE) - d.m)
                          * (CAST(e.embedding[d.i] AS DOUBLE) - d.m))), 6)
               AS dist
    FROM embeddings e JOIN dims d ON e.label = d.label
    GROUP BY e.vec_id, e.label
),
st AS (SELECT label, avg(dist) AS mu, stddev_pop(dist) AS sd
       FROM d GROUP BY label)
SELECT d.vec_id, d.label, d.dist,
       round((d.dist - st.mu) / st.sd, 3) + 0.0 AS z,
       abs(round((d.dist - st.mu) / st.sd, 3)) > 2.0 AS is_outlier
FROM d JOIN st ON d.label = st.label
""",
)
def embedding_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid-distance z-scores — the mislabeled/corrupt
    vector detector (plain norm outliers are degenerate on this corpus:
    vectors are unit-normalized). Centroids via posexplode +
    (label, dim) average — map-side combinable, never a driver-side
    matrix; distances re-aggregate the same exploded stream; the
    per-label moment table is |labels| rows, broadcast back."""
    emb = table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "i", "x"
        ),
    )
    dims = ex.groupBy("label", "i").agg(F.avg("x").alias("m"))
    d = (
        ex.join(dims, on=["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("x") - F.col("m")) * (F.col("x") - F.col("m")))),
                6,
            ).alias("dist")
        )
    )
    st = d.groupBy("label").agg(
        F.avg("dist").alias("mu"), F.stddev_pop("dist").alias("sd")
    )
    z = F.round((F.col("dist") - F.col("mu")) / F.col("sd"), 3)
    return (
        d.join(F.broadcast(st), on="label")
        .select(
            "vec_id",
            "label",
            "dist",
            # + 0.0 normalizes IEEE negative zero: round() can yield
            # -0.0, whose repr differs across engines and flips the
            # exact value hash even though -0.0 == 0.0
            (z + 0.0).alias("z"),
            (F.abs(z) > 2.0).alias("is_outlier"),
        )
    )


@register(
    "ngram_novelty_rate",
    oracle=f"""
WITH t AS (SELECT doc_id, lang, {_SQL_TOKS} AS l FROM documents),
flags AS (SELECT doc_id, (doc_id * 2654435761) % 10 < 8 AS is_train FROM documents),
b AS (SELECT t.doc_id, t.lang,
             unnest({_SQL_BIGRAMS.format('l')}) AS bigram
      FROM t WHERE len(l) >= 2),
train_b AS (SELECT DISTINCT lang, bigram FROM b JOIN flags USING (doc_id)
            WHERE is_train),
test_b AS (SELECT DISTINCT lang, bigram FROM b JOIN flags USING (doc_id)
           WHERE NOT is_train)
SELECT te.lang,
       CAST(count(*) AS BIGINT) AS n_test_bigrams,
       CAST(sum(CASE WHEN tr.bigram IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel,
       round(sum(CASE WHEN tr.bigram IS NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 4) AS novelty_rate
FROM test_b te
LEFT JOIN train_b tr ON te.lang = tr.lang AND te.bigram = tr.bigram
GROUP BY te.lang ORDER BY te.lang
""",
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-bigram novelty of the eval split vs the train split,
    per language (same deterministic hash split as
    stratified_split_documents / split_contamination_rate) — the LM
    generalization probe: low novelty means the eval set mostly
    re-tests memorized n-grams. Distinct-reduce BEFORE the join, so
    the anti-probe shuffles only unique (lang, bigram) pairs."""
    docs = table(spark, sf_dir, "documents")
    flags = docs.select(
        "doc_id",
        ((F.col("doc_id") * F.lit(2654435761)) % 10 < 8).alias("is_train"),
    )
    b = (
        docs.select("doc_id", "lang", tokens("text").alias("l"))
        .filter(F.size("l") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                _bigrams("l")
            ).alias("bigram"),
        )
        .join(flags, on="doc_id")
    )
    train_b = (
        b.filter(F.col("is_train")).select("lang", "bigram").distinct()
    )
    test_b = (
        b.filter(~F.col("is_train")).select("lang", "bigram").distinct()
    )
    novel = F.when(F.col("__hit").isNull(), 1).otherwise(0)
    return (
        test_b.join(
            train_b.withColumn("__hit", F.lit(1)),
            on=["lang", "bigram"],
            how="left",
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_test_bigrams"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            F.round(F.sum(novel) / F.count(F.lit(1)), 4).alias("novelty_rate"),
        )
        .orderBy("lang")
    )


@register(
    "source_mixture_weights",
    oracle=f"""
WITH t AS (SELECT source, doc_id, len({_SQL_TOKS}) AS n FROM documents),
agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n) AS BIGINT) AS n_tokens
        FROM t GROUP BY source),
tot AS (SELECT sum(n_tokens) AS total FROM agg)
SELECT source, n_docs, n_tokens,
       round(n_tokens / total, 6) AS actual_share,
       round((1.0 / (SELECT count(*) FROM agg)) / (n_tokens / total), 4)
           AS uniform_weight
FROM agg, tot ORDER BY source
""",
)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights that rebalance the corpus to a
    UNIFORM token share across sources — the mixture-reweighting step
    every pretraining data recipe applies (upweight rare domains,
    downweight dominant ones). weight = target_share / actual_share;
    a sampler multiplies per-doc selection probability by it. One
    explode-free token-count pass + a |sources|-row aggregate and a
    scalar total broadcast back."""
    docs = table(spark, sf_dir, "documents")
    agg = docs.select(
        "source", F.size(tokens("text")).cast("bigint").alias("n")
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").cast("bigint").alias("n_tokens"),
    )
    tot = agg.agg(
        F.sum("n_tokens").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("n_sources"),
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("total"), 6).alias("actual_share"),
            F.round(
                (1.0 / F.col("n_sources"))
                / (F.col("n_tokens") / F.col("total")),
                4,
            ).alias("uniform_weight"),
        )
        .orderBy("source")
    )


def _lsh_recall_oracle() -> str:
    from parcel_analytics_etl_notebook_spark.plans.queries_llm import _SQL_COS
    from parcel_analytics_etl_notebook_spark.plans.queries_llm2 import (
        _lsh_bucket_sql,
    )

    return f"""
WITH bk AS (
    SELECT vec_id, label, embedding, {_lsh_bucket_sql('embedding')} AS bucket
    FROM embeddings
),
exact AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           a.bucket AS bucket_a, b.bucket AS bucket_b
    FROM bk a JOIN bk b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round({_SQL_COS.format('a.embedding', 'b.embedding')}, 6) >= 0.4
)
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN bucket_a = bucket_b THEN 1 ELSE 0 END) AS BIGINT)
           AS n_captured,
       round(sum(CASE WHEN bucket_a = bucket_b THEN 1 ELSE 0 END) * 1.0
             / count(*), 4) AS recall
FROM exact
"""


@register("lsh_cosine_recall", oracle=_lsh_recall_oracle())
def lsh_cosine_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH blocking recall against ground-truth cosine pairs
    (label-blocked, cosine ≥ 0.4): what fraction of true near-dup pairs
    land in the same LSH bucket — the embedding analog of
    minhash_jaccard_error, run before trusting bucket-blocked dedup
    corpus-wide. Composes the exact pair query with the bucket map;
    one small aggregate at the end. The bucket map is narrow (id→int)
    but CORPUS-cardinality, so its join strategy is left to AQE rather
    than hint-forced — at test SFs AQE broadcasts it because it
    measures small; at billions of embeddings it correctly won't."""
    from parcel_analytics_etl_notebook_spark.operators.similarity import (
        cosine_pairs_blocked,
    )
    from parcel_analytics_etl_notebook_spark.plans.queries_llm2 import (
        _lsh_bucket_col,
    )

    emb = table(spark, sf_dir, "embeddings")
    pairs = cosine_pairs_blocked(
        emb, block_col="label", threshold=0.4, broadcast_build=True
    ).select("id_a", "id_b")
    bk = emb.select("vec_id", _lsh_bucket_col("embedding").alias("bucket"))
    a = bk.select(F.col("vec_id").alias("id_a"), F.col("bucket").alias("__ba"))
    b = bk.select(F.col("vec_id").alias("id_b"), F.col("bucket").alias("__bb"))
    hit = F.when(F.col("__ba") == F.col("__bb"), 1).otherwise(0)
    return (
        pairs.join(a, on="id_a")
        .join(b, on="id_b")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(hit).cast("bigint").alias("n_captured"),
            F.round(F.sum(hit) / F.count(F.lit(1)), 4).alias("recall"),
        )
    )


def _funnel_oracle() -> str:
    from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
        _lang_score_sql,
    )

    g = "greatest(s_en, s_de, s_es, s_fr, s_zh)"
    return f"""
WITH t AS (SELECT doc_id, lang, {_SQL_TOKS} AS l FROM documents),
base AS (
    SELECT doc_id, lang, len(l) AS n_tokens,
           {_SQL_TRIGRAMS_GUARDED.format('l')} AS gr,
           {_lang_score_sql('en')} AS s_en,
           {_lang_score_sql('de')} AS s_de,
           {_lang_score_sql('es')} AS s_es,
           {_lang_score_sql('fr')} AS s_fr,
           {_lang_score_sql('zh')} AS s_zh
    FROM t
),
ent AS (
    SELECT doc_id,
           -sum((c * 1.0 / n) * log2(c * 1.0 / n)) AS entropy
    FROM (
        SELECT doc_id, tok, count(*) AS c,
               sum(count(*)) OVER (PARTITION BY doc_id) AS n
        FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents)
        GROUP BY doc_id, tok
    ) GROUP BY doc_id
),
flags AS (
    SELECT b.doc_id,
           b.n_tokens >= 15 AS pass_len,
           (b.gr IS NULL OR 1.0 - len(list_distinct(b.gr)) * 1.0 / len(b.gr)
                <= 0.02) AS pass_rep,
           coalesce(e.entropy, 0) >= 3.0 AS pass_ent,
           (CASE WHEN {g} = 0 THEN 'und'
                 WHEN s_en = {g} THEN 'en'
                 WHEN s_de = {g} THEN 'de'
                 WHEN s_es = {g} THEN 'es'
                 WHEN s_fr = {g} THEN 'fr'
                 ELSE 'zh' END) = b.lang AS pass_lang
    FROM base b LEFT JOIN ent e ON b.doc_id = e.doc_id
)
SELECT stage, n_docs FROM (
    SELECT 0 AS ord, '0_all' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM flags
    UNION ALL
    SELECT 1, '1_min_length', CAST(sum(CASE WHEN pass_len THEN 1 ELSE 0 END) AS BIGINT) FROM flags
    UNION ALL
    SELECT 2, '2_low_repetition', CAST(sum(CASE WHEN pass_len AND pass_rep THEN 1 ELSE 0 END) AS BIGINT) FROM flags
    UNION ALL
    SELECT 3, '3_entropy', CAST(sum(CASE WHEN pass_len AND pass_rep AND pass_ent THEN 1 ELSE 0 END) AS BIGINT) FROM flags
    UNION ALL
    SELECT 4, '4_lang_match', CAST(sum(CASE WHEN pass_len AND pass_rep AND pass_ent AND pass_lang THEN 1 ELSE 0 END) AS BIGINT) FROM flags
) ORDER BY ord
"""


@register("quality_filter_funnel", oracle=_funnel_oracle())
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor counts through a staged quality-filter chain (length →
    repetition → entropy → language agreement) — the acceptance funnel
    a curation pipeline reports before committing a corpus build. All
    per-doc flags compute in one projection (+ the entropy aggregate
    joined back); the funnel itself is ONE pass of conditional sums
    unpivoted to rows, not five filtered scans."""
    from parcel_analytics_etl_notebook_spark.operators.textqa import predict_lang

    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        tokens("text").alias("l"),
        predict_lang(tokens("text")).alias("pred"),
    ).select(
        "doc_id",
        "lang",
        "pred",
        F.size("l").alias("n_tokens"),
        _trigrams_guarded("l").alias("gr"),
    )
    ent = _doc_entropy(docs)
    flags = base.join(ent, on="doc_id", how="left").select(
        (F.col("n_tokens") >= 15).alias("pass_len"),
        (
            F.col("gr").isNull()
            | (1.0 - F.size(F.array_distinct("gr")) / F.size("gr") <= 0.02)
        ).alias("pass_rep"),
        (F.coalesce(F.col("entropy"), F.lit(0.0)) >= 3.0).alias("pass_ent"),
        (F.col("pred") == F.col("lang")).alias("pass_lang"),
    )
    cnt = F.count(F.lit(1))

    def surv(*cols):
        cond = cols[0]
        for extra in cols[1:]:
            cond = cond & extra
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    one = flags.agg(
        cnt.alias("s0"),
        surv(F.col("pass_len")).alias("s1"),
        surv(F.col("pass_len"), F.col("pass_rep")).alias("s2"),
        surv(F.col("pass_len"), F.col("pass_rep"), F.col("pass_ent")).alias("s3"),
        surv(
            F.col("pass_len"),
            F.col("pass_rep"),
            F.col("pass_ent"),
            F.col("pass_lang"),
        ).alias("s4"),
    )
    return one.select(
        F.expr(
            "stack(5, '0_all', s0, '1_min_length', s1, "
            "'2_low_repetition', s2, '3_entropy', s3, '4_lang_match', s4) "
            "AS (stage, n_docs)"
        )
    )
