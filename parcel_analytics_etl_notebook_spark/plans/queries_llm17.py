"""Round-8 LLM-pipeline additions, batch 6: tokenizer-vocabulary
sizing and language-ID confidence.

Two pre-training diagnostics: (1) the vocab-size-vs-OOV tradeoff curve
— the coverage every tokenizer vocabulary size buys, computed for four
candidate sizes from ONE frequency pass (oov_rate_by_split evaluates
one fixed size against splits; this is the curve that size was picked
from); (2) the language-ID confidence margin — how decisively the
marker-based classifier separates its top choice from the runner-up,
the calibration view behind lang_id_heuristic /
lang_confusion_matrix's point predictions.

Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import tokens
from parcel_analytics_etl_notebook_spark.operators.textqa import (
    LANG_MARKERS,
    lang_scores,
    predict_lang,
)
from parcel_analytics_etl_notebook_spark.plans.catalog import register, table
from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
    _SQL_TOKS,
    _lang_score_sql,
)

#: candidate vocabulary sizes (the corpus vocabulary is small by
#: construction, so the sweep brackets it)
_VOCAB_SIZES = (4, 8, 16, 32)

#: cap for the exact margin histogram's long tail
_MARGIN_CAP = 10


# --------------------------------------------------------------------------
# Vocabulary-size vs OOV-rate sweep (one frequency pass)
# --------------------------------------------------------------------------
@register(
    "vocab_size_oov_sweep",
    oracle=f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
tk AS (SELECT unnest(l) AS tok FROM t),
freq AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
ranked AS (
    SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rnk FROM freq
),
a AS (
    SELECT sum(c) AS total_tokens,
           count(*) AS n_types,
           {", ".join(
               f"sum(CASE WHEN rnk <= {v} THEN c ELSE 0 END) AS cov{v}"
               for v in _VOCAB_SIZES
           )}
    FROM ranked
)
{" UNION ALL ".join(
    f"SELECT CAST({v} AS BIGINT) AS vocab_size,"
    f" CAST(n_types AS BIGINT) AS n_types,"
    f" CAST(total_tokens AS BIGINT) AS total_tokens,"
    f" CAST(total_tokens - cov{v} AS BIGINT) AS oov_tokens,"
    f" CAST((total_tokens - cov{v}) * 10000 // total_tokens AS BIGINT)"
    f" AS oov_rate_bp FROM a" for v in _VOCAB_SIZES
)}
ORDER BY vocab_size
""",
)
def vocab_size_oov_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vocabulary-sizing curve: corpus OOV rate at four candidate
    vocab sizes (top-V tokens by count, ties broken lexicographically
    so every cut is deterministic), all from ONE token-frequency pass
    with conditional aggregates — the sweep discipline of
    session_timeout_sweep applied to tokenizer sizing. The knee of
    this curve is where a vocab size stops paying; oov_rate_by_split
    then validates the chosen size against the train/val/test splits.

    Scale shape: one token explode + one map-combined frequency
    aggregate; the rank window runs on the TYPE-grain frame (the
    vocabulary), not the token stream. On a web corpus the vocabulary
    is millions of types — still a single machine's window, and the
    two-phase alternative (per-partition top-V merge, as
    oov_rate_by_split's TakeOrderedAndProject does for one V) applies
    when even that is too wide. Exact BIGINT basis points."""
    tk = table(spark, sf_dir, "documents").select(
        F.explode(tokens("text")).alias("tok")
    )
    freq = tk.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    ranked = freq.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.col("c").desc(), "tok"))
    )
    a = ranked.agg(
        F.sum("c").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        *[
            F.sum(F.when(F.col("rnk") <= v, F.col("c")).otherwise(0)).alias(
                f"cov{v}"
            )
            for v in _VOCAB_SIZES
        ],
    )
    stack = (
        f"stack({len(_VOCAB_SIZES)}, "
        + ", ".join(
            f"CAST({v} AS BIGINT), total_tokens - cov{v}"
            for v in _VOCAB_SIZES
        )
        + ") AS (vocab_size, oov_tokens)"
    )
    return (
        a.selectExpr("n_types", "total_tokens", stack)
        .select(
            "vocab_size",
            F.col("n_types").cast("bigint").alias("n_types"),
            F.col("total_tokens").cast("bigint").alias("total_tokens"),
            F.col("oov_tokens").cast("bigint").alias("oov_tokens"),
            F.expr("oov_tokens * 10000 div total_tokens")
            .cast("bigint")
            .alias("oov_rate_bp"),
        )
        .orderBy("vocab_size")
    )


# --------------------------------------------------------------------------
# Language-ID confidence margin histogram
# --------------------------------------------------------------------------
def _sql_second_best() -> str:
    """greatest of each language's score with the WINNER's score masked
    to -1 — on ties the runner-up equals the winner, margin 0."""
    parts = ", ".join(
        f"CASE WHEN predicted_lang = '{lang}' THEN -1 ELSE s_{lang} END"
        for lang in LANG_MARKERS
    )
    return f"greatest({parts})"


@register(
    "lang_id_margin_histogram",
    oracle=f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
s AS (
    SELECT doc_id,
           {", ".join(f"{_lang_score_sql(lang)} AS s_{lang}" for lang in LANG_MARKERS)}
    FROM t
),
p AS (
    SELECT *,
           CASE WHEN greatest({", ".join(f"s_{lg}" for lg in LANG_MARKERS)}) = 0
                THEN 'und'
                {" ".join(
                    f"WHEN s_{lg} = greatest({', '.join(f's_{l2}' for l2 in LANG_MARKERS)}) THEN '{lg}'"
                    for lg in LANG_MARKERS
                )}
           END AS predicted_lang
    FROM s
),
m AS (
    SELECT predicted_lang,
           least(greatest({", ".join(f"s_{lg}" for lg in LANG_MARKERS)})
                 - greatest(0, {_sql_second_best()}), {_MARGIN_CAP}) AS margin
    FROM p
)
SELECT predicted_lang, CAST(margin AS BIGINT) AS margin_capped,
       CAST(count(*) AS BIGINT) AS n_docs
FROM m GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def lang_id_margin_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How decisively does the language classifier decide? Margin =
    winner's marker-hit count minus the runner-up's (winner masked,
    floored at 0 so the 'und' rows and single-language docs read as
    margin over silence), capped at 10 and histogrammed per predicted
    language. Low-margin mass is where lang_confusion_matrix's errors
    live — the calibration view that says WHICH of the point
    predictions to trust, and the threshold chart a pipeline uses to
    route low-margin docs to a heavier classifier.

    Scale shape: scores, winner, and margin are ONE projection per
    document (no shuffle until the ~langs x 11-bucket aggregate) —
    the same zero-shuffle scoring shape as lang_id_heuristic, with the
    margin arithmetic stated identically on both engines (winner by
    the fixed tie order, runner-up by score with the winner masked to
    -1, so a tied runner-up reads margin 0)."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("toks"))
    scores = lang_scores(F.col("toks"))
    s = t.select(
        "doc_id",
        predict_lang(F.col("toks")).alias("predicted_lang"),
        *[scores[lang].alias(f"s_{lang}") for lang in LANG_MARKERS],
    )
    best = F.greatest(*[F.col(f"s_{lg}") for lg in LANG_MARKERS])
    second = F.greatest(
        F.lit(0),
        F.greatest(
            *[
                F.when(F.col("predicted_lang") == lg, F.lit(-1)).otherwise(
                    F.col(f"s_{lg}")
                )
                for lg in LANG_MARKERS
            ]
        ),
    )
    margin = F.least(best - second, F.lit(_MARGIN_CAP))
    return (
        s.select("predicted_lang", margin.cast("bigint").alias("margin_capped"))
        .groupBy("predicted_lang", "margin_capped")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("predicted_lang", "margin_capped")
    )
