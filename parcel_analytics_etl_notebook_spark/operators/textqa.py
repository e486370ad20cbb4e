"""Text-analysis operators (LLM-data-pipeline extension, SURVEY §7.6):
quality scoring, language-ID heuristic, token statistics, document
fingerprinting. All pure built-in-function compositions — JVM-side,
whole-stage-codegen, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import tokens

#: Tiny per-language marker-word lists for the n-gram/stopword heuristic.
#: Real deployments swap in fastText or CLD3 via a pandas UDF; the
#: heuristic keeps the hot path JVM-side and oracle-checkable.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "y"),
    "fr": ("le", "la", "les", "et"),
    "zh": ("的", "是", "了", "在"),
}

#: Large prime modulus for the polynomial rolling hash (fits comfortably
#: in int64 even after *31 + codepoint).
FP_MOD = 1_000_000_007


def marker_score(toks: Column, markers: tuple[str, ...]) -> Column:
    """Count of tokens that are in the marker list."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features: token counts, uniqueness ratio,
    mean token length, stopword ratio, and a boolean keep-flag — the
    standard cheap pre-filters of an LLM training-data pipeline."""
    t = tokens(text_col)
    df = df.select(id_col, t.alias("toks"))
    n = F.size("toks").cast("bigint")  # 0 for NULL/blank (tokens() guards)
    n_uniq = F.size(F.array_distinct("toks")).cast("bigint")
    # ratios are NULL for empty docs (guard the /0), flag false
    safe_n = F.when(n == 0, F.lit(None)).otherwise(n)
    avg_len = F.round(
        F.aggregate("toks", F.lit(0.0), lambda acc, x: acc + F.length(x)) / safe_n, 4
    )
    stop_ratio = F.round(
        marker_score(F.col("toks"), LANG_MARKERS["en"][:2]) / safe_n, 4
    )
    uniq_ratio = F.round(n_uniq / safe_n, 4)
    return df.select(
        id_col,
        n.alias("n_tokens"),
        n_uniq.alias("n_unique_tokens"),
        uniq_ratio.alias("unique_ratio"),
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        ((n >= 20) & F.coalesce(uniq_ratio >= 0.3, F.lit(False))).alias("quality_flag"),
    )


def lang_scores(toks: Column) -> dict[str, Column]:
    """Marker-hit count per language."""
    return {lang: marker_score(toks, m) for lang, m in LANG_MARKERS.items()}


def predict_lang(toks: Column) -> Column:
    """Argmax language with a fixed priority order on ties (en first);
    'und' (undetermined) when no marker hits at all — including a NULL
    token array (whose scores are NULL/negative depending on ANSI
    mode: without the explicit guards a NULL doc would come out NULL
    or, under legacy size(NULL)=-1, tie every score and be labeled
    'en')."""
    scores = lang_scores(toks)
    best = F.greatest(*scores.values())
    pred = F.when(toks.isNull() | best.isNull() | (best <= 0), F.lit("und"))
    for lang in LANG_MARKERS:  # dict order == priority order
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return pred


def doc_fingerprint(toks: Column) -> Column:
    """Order-sensitive polynomial rolling hash over tokens (mod large
    prime): a cheap, deterministic document fingerprint reproducible in
    ANSI SQL (DuckDB ``list_reduce``). Each token contributes its FULL
    codepoint rolling hash (an earlier form hashed only each token's
    first codepoint, so 'cat'/'car' collided); identical token streams
    collide by construction, any reorder or in-token edit shifts it."""
    def _tok_hash(x):
        return F.aggregate(
            F.split(x, ""),
            F.lit(0).cast("long"),
            lambda a, ch: (a * 31 + F.ascii(ch)) % F.lit(FP_MOD),
        )

    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + _tok_hash(x)) % F.lit(FP_MOD),
    )
