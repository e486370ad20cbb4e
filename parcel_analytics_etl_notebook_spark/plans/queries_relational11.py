"""Batch 11: Markov-chain (removal-effect) attribution, Theil–Sen
robust trend, ROC-AUC and calibration-decile model evaluation, and
top clickstream paths.

Markov attribution completes the attribution family (last-touch
click_attribution, linear_attribution, u_shaped_attribution in
queries_relational7) with the data-driven model: build the journey
transition graph, solve each channel's removal effect on conversion
probability, and normalize into credit shares. The chain solve is
MODEL-sized (≤7 states), so the Spark side collects the transition
counts (the kmeans-centroids collect rule) and mirrors the oracle's
fixed-point iteration term-for-term in float64 — the iteration order
is pinned on both sides, so parity is bitwise, not approximate.

Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table

# ---------------------------------------------------------------------------
# Markov attribution: shared chain definition
# ---------------------------------------------------------------------------
_CHANNELS = ["click", "error", "signup", "view"]
_SRCS = ["start"] + _CHANNELS          # states with outgoing transitions
_DSTS = _CHANNELS + ["conv"]           # states that carry iteration value
_MARKOV_K = 100                        # fixed-point iteration count


def _coef_cols() -> str:
    cols = []
    for s in _SRCS:
        for d in _DSTS:
            sl = "START" if s == "start" else s
            dl = "CONV" if d == "conv" else d
            cols.append(
                f"coalesce(sum(p) FILTER (src = '{sl}' AND dst = '{dl}'), 0.0)"
                f" AS p_{s}_{d}"
            )
    return ",\n           ".join(cols)


def _step_expr(src: str) -> str:
    # term order is FIXED (click, error, signup, view, conv constant) and
    # mirrored exactly by the Python iteration below — bitwise parity
    terms = [f"c.p_{src}_{d} * i.v_{d}" for d in _CHANNELS]
    terms.append(f"c.p_{src}_conv")
    return " + ".join(terms)


_MARKOV_ORACLE = f"""
WITH RECURSIVE
seq AS (
    SELECT user_id, event_type, event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
    FROM events
),
marked AS (
    SELECT user_id, rn,
           CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END AS state,
           min(CASE WHEN event_type = 'purchase' THEN rn END)
               OVER (PARTITION BY user_id) AS firstp,
           max(rn) OVER (PARTITION BY user_id) AS maxrn
    FROM seq
),
kept AS (SELECT * FROM marked WHERE firstp IS NULL OR rn <= firstp),
alltrans AS (
    SELECT coalesce(lag(state) OVER (PARTITION BY user_id ORDER BY rn),
                    'START') AS src,
           state AS dst
    FROM kept
    UNION ALL
    SELECT state AS src, 'END' AS dst
    FROM kept WHERE firstp IS NULL AND rn = maxrn
),
variants(variant, rm) AS (
    VALUES ('full', NULL), ('rm_click', 'click'), ('rm_error', 'error'),
           ('rm_signup', 'signup'), ('rm_view', 'view')
),
vtrans AS (
    SELECT v.variant,
           src,
           CASE WHEN dst = v.rm THEN 'END' ELSE dst END AS dst,
           count(*) AS cnt
    FROM alltrans CROSS JOIN variants v
    WHERE src IS DISTINCT FROM v.rm
    GROUP BY 1, 2, 3
),
probs AS (
    SELECT variant, src, dst,
           CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY variant, src) AS p
    FROM vtrans
),
coef AS (
    SELECT variant,
           {_coef_cols()}
    FROM probs GROUP BY variant
),
it AS (
    -- base literals MUST be DOUBLE: a bare 0.0 types as DECIMAL(2,1)
    -- and the recursive union coerces EVERY step back to it, silently
    -- quantizing the fixed point to one decimal place
    SELECT 0 AS k, variant,
           CAST(0.0 AS DOUBLE) AS v_start, CAST(0.0 AS DOUBLE) AS v_click,
           CAST(0.0 AS DOUBLE) AS v_error, CAST(0.0 AS DOUBLE) AS v_signup,
           CAST(0.0 AS DOUBLE) AS v_view
    FROM coef
    UNION ALL
    SELECT i.k + 1, c.variant,
           {_step_expr('start')} AS v_start,
           {_step_expr('click')} AS v_click,
           {_step_expr('error')} AS v_error,
           {_step_expr('signup')} AS v_signup,
           {_step_expr('view')} AS v_view
    FROM it i JOIN coef c ON c.variant = i.variant
    WHERE i.k < {_MARKOV_K}
),
conv AS (SELECT variant, v_start FROM it WHERE k = {_MARKOV_K}),
eff AS (
    SELECT m.channel,
           f.v_start AS pf,
           v.v_start AS pr,
           greatest(f.v_start - v.v_start, 0) / f.v_start AS effect
    FROM conv v
    JOIN (VALUES ('rm_click', 'click'), ('rm_error', 'error'),
                 ('rm_signup', 'signup'), ('rm_view', 'view')) m(variant, channel)
      ON v.variant = m.variant
    JOIN conv f ON f.variant = 'full'
)
SELECT channel,
       round(pf, 6) AS p_conv_full,
       round(pr, 6) AS p_conv_removed,
       round(effect, 6) AS removal_effect,
       round(effect / sum(effect) OVER (), 6) AS attribution_share
FROM eff
ORDER BY channel
"""


@register("markov_attribution", oracle=_MARKOV_ORACLE)
def markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven (Markov removal-effect) attribution: build the
    journey chain START → {click,error,signup,view} → CONV/END from
    per-user event sequences truncated at the first purchase, then for
    each channel compute the conversion probability of the chain with
    that channel REMOVED (its inbound edges redirected to the END
    sink, its outbound edges dropped). A channel's credit share is its
    normalized removal effect (1 − p_removed/p_full) — the standard
    alternative to positional models that rewards channels the
    journeys actually route through.

    Conversion probability is the K=100-step fixed point of
    v ← P·v + r (v0 = 0, CONV constant 1, END constant 0). BOTH sides
    run the SAME iteration with the SAME pinned term order (click,
    error, signup, view, + CONV constant): the oracle as a recursive
    CTE over a 5-row coefficient frame, the engine in driver float64
    over the COLLECTED transition-count matrix — collecting ≤36
    (src, dst, count) rows is the kmeans model-sized-collect rule, so
    parity is bitwise rather than tolerance-based.

    Scale shape: all row-scale work (sequencing, truncation, lag,
    transition counting) is per-user windows over one user-key shuffle
    plus a groupBy on ≤36 transition keys; the chain itself is
    model-sized by construction (|event types| states, not |events|),
    exactly like a k-means model. The output frame is a 4-row local
    table derived from the distributed counts."""
    ev = table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        F.row_number().over(wu).alias("rn"),
    )
    marked = seq.select(
        "user_id",
        "rn",
        F.when(F.col("event_type") == "purchase", "CONV")
        .otherwise(F.col("event_type"))
        .alias("state"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rn"))
        )
        .over(wall)
        .alias("firstp"),
        F.max("rn").over(wall).alias("maxrn"),
    )
    kept = marked.filter(
        F.col("firstp").isNull() | (F.col("rn") <= F.col("firstp"))
    )
    trans = kept.select(
        F.coalesce(
            F.lag("state").over(Window.partitionBy("user_id").orderBy("rn")),
            F.lit("START"),
        ).alias("src"),
        F.col("state").alias("dst"),
    ).unionAll(
        kept.filter(
            F.col("firstp").isNull() & (F.col("rn") == F.col("maxrn"))
        ).select(F.col("state").alias("src"), F.lit("END").alias("dst"))
    )
    counts = {
        (r["src"], r["dst"]): r["cnt"]
        for r in trans.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }

    def solve(rm: str | None) -> float:
        # variant transition counts: drop src=rm, redirect dst=rm → END
        vc: dict[tuple[str, str], int] = {}
        for (s, d), c in counts.items():
            if s == rm:
                continue
            d2 = "END" if d == rm else d
            vc[(s, d2)] = vc.get((s, d2), 0) + c
        tot: dict[str, int] = {}
        for (s, _), c in vc.items():
            tot[s] = tot.get(s, 0) + c
        p = {
            (s, d): c / tot[s] for (s, d), c in vc.items()
        }

        def coef(s: str, d: str) -> float:
            sl = "START" if s == "start" else s
            dl = "CONV" if d == "conv" else d
            return p.get((sl, dl), 0.0)

        v = {s: 0.0 for s in _SRCS}
        for _ in range(_MARKOV_K):
            # EXACT mirror of _step_expr: fixed term order, left-to-right
            nv = {}
            for s in _SRCS:
                acc = coef(s, "click") * v["click"]
                acc = acc + coef(s, "error") * v["error"]
                acc = acc + coef(s, "signup") * v["signup"]
                acc = acc + coef(s, "view") * v["view"]
                acc = acc + coef(s, "conv")
                nv[s] = acc
            v = nv
        return v["start"]

    pf = solve(None)
    removed = {ch: solve(ch) for ch in _CHANNELS}
    effects = {ch: max(pf - removed[ch], 0.0) / pf for ch in _CHANNELS}
    total_eff = sum(effects[ch] for ch in _CHANNELS)
    rows = [
        (
            ch,
            round(pf, 6),
            round(removed[ch], 6),
            round(effects[ch], 6),
            round(effects[ch] / total_eff, 6),
        )
        for ch in _CHANNELS
    ]
    schema = T.StructType(
        [
            T.StructField("channel", T.StringType()),
            T.StructField("p_conv_full", T.DoubleType()),
            T.StructField("p_conv_removed", T.DoubleType()),
            T.StructField("removal_effect", T.DoubleType()),
            T.StructField("attribution_share", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


# --------------------------------------------------------------------------
# Theil–Sen robust trend of the daily revenue series
# --------------------------------------------------------------------------
@register(
    "theil_sen_trend",
    oracle="""
WITH daily AS (
    SELECT datediff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE)) AS x,
           round(sum(o_totalprice), 2) AS v
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
),
slopes AS (
    SELECT (b.v - a.v) / (b.x - a.x) AS s
    FROM daily a JOIN daily b ON b.x > a.x
),
m AS (SELECT quantile_cont(s, 0.5) AS slope, count(*) AS n_pairs FROM slopes),
r AS (
    SELECT quantile_cont(v - m.slope * x, 0.5) AS intercept,
           count(*) AS n_days
    FROM daily CROSS JOIN m
)
SELECT CAST(r.n_days AS BIGINT) AS n_days,
       CAST(m.n_pairs AS BIGINT) AS n_pairs,
       round(m.slope, 6) AS slope,
       round(r.intercept, 6) AS intercept
FROM m CROSS JOIN r
""",
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of 1996 daily revenue: the median of all
    pairwise slopes (breakdown point 29% — one bad ingest day cannot
    bend the trend, unlike the OLS of price_quantity_regression), with
    the standard median-residual intercept. Daily totals rounded to
    2dp before pairing (re-canonicalizes engine float sums); exact
    interpolated medians (Spark percentile ≡ DuckDB quantile_cont,
    both (n−1)·q rank interpolation).

    Scale shape: the pair join is quadratic IN DAYS, not rows — a year
    of days is ~66k pairs, model-sized forever; the big-data stage is
    only the pushed-down one-year scan + groupBy(date). At centuries
    of days, swap the exact pair median for the repeated-median or
    bucketed variant. The slope scalar folds into the residual pass as
    a literal (model-sized collect), so no row-scale crossJoin
    exists in the Spark plan."""
    orders = table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1996-01-01").cast("date")
            ).alias("x")
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("v"))
        .persist()  # pair join both sides + residual pass
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("b.x") > F.col("a.x")).select(
        ((F.col("b.v") - F.col("a.v")) / (F.col("b.x") - F.col("a.x"))).alias(
            "s"
        )
    )
    slope, n_pairs = slopes.agg(
        F.expr("percentile(s, 0.5)"), F.count(F.lit(1))
    ).head()
    res = daily.agg(
        F.expr(f"percentile(v - {slope!r} * x, 0.5)").alias("intercept"),
        F.count(F.lit(1)).alias("n_days"),
    )
    return res.select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.lit(n_pairs).cast("bigint").alias("n_pairs"),
        F.lit(slope).cast("double").alias("slope"),
        F.col("intercept").cast("double").alias("intercept"),
    ).select(
        "n_days",
        "n_pairs",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
    )


# --------------------------------------------------------------------------
# ROC AUC of an embedding dimension as a classifier score
# --------------------------------------------------------------------------
@register(
    "roc_auc_embedding_dim",
    oracle="""
WITH scored AS (
    SELECT round(CAST(embedding[1] AS DOUBLE), 6) AS score,
           CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
    FROM embeddings
),
grouped AS (
    SELECT score,
           CAST(sum(y) AS DOUBLE) AS n_pos,
           CAST(count(*) - sum(y) AS DOUBLE) AS n_neg
    FROM scored GROUP BY score
),
cum AS (
    SELECT n_pos, n_neg,
           coalesce(sum(n_neg) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
    FROM grouped
)
SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
       CAST(sum(n_neg) AS BIGINT) AS n_neg,
       round(sum(n_pos * (neg_below + n_neg / 2))
             / (sum(n_pos) * sum(n_neg)), 6) AS auc
FROM cum
""",
)
def roc_auc_embedding_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC treating embedding dim 0 as a score for label 0 —
    the Mann–Whitney rank formula in its GROUPED form: AUC =
    Σ_s pos(s)·(neg_below(s) + neg(s)/2) / (P·N), which handles score
    ties exactly (each tied group contributes half its negatives).
    The model-eval counterpart of the retrieval metrics
    (lsh_cosine_recall, ivf_recall_at_5).

    Scale shape: grouping by (rounded) score FIRST collapses the data
    to one row per distinct score value, so the ordered cumulative
    window runs over the score-distinct frame, not raw rows — with a
    6dp-rounded score that is ≤2M rows no matter the corpus size
    (bounded-key trick, same as value_band_stats_bucketized); the raw
    scan is one partial-combining groupBy."""
    emb = table(spark, sf_dir, "embeddings")
    scored = emb.select(
        F.round(F.col("embedding")[0].cast("double"), 6).alias("score"),
        F.when(F.col("label") == 0, 1).otherwise(0).alias("y"),
    )
    grouped = scored.groupBy("score").agg(
        F.sum("y").cast("double").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("double").alias("n_neg"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    cum = grouped.select(
        "n_pos",
        "n_neg",
        F.coalesce(F.sum("n_neg").over(w), F.lit(0.0)).alias("neg_below"),
    )
    return cum.agg(
        F.sum("n_pos").cast("bigint").alias("n_pos"),
        F.sum("n_neg").cast("bigint").alias("n_neg"),
        F.round(
            F.sum(F.col("n_pos") * (F.col("neg_below") + F.col("n_neg") / 2))
            / (F.sum("n_pos") * F.sum("n_neg")),
            6,
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# Calibration deciles + Brier score of a sigmoid pseudo-probability
# --------------------------------------------------------------------------
@register(
    "score_calibration_deciles",
    oracle="""
WITH scored AS (
    SELECT 1.0 / (1.0 + exp(-CAST(embedding[1] AS DOUBLE))) AS phat,
           CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y,
           vec_id
    FROM embeddings
),
binned AS (
    SELECT ntile(10) OVER (ORDER BY phat, vec_id) AS decile, phat, y
    FROM scored
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(phat), 6) AS avg_pred,
       round(avg(y), 6) AS pos_rate,
       round(avg((phat - y) * (phat - y)), 6) AS brier
FROM binned
GROUP BY decile
ORDER BY decile
""",
)
def score_calibration_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration table for σ(embedding dim 0) as a pseudo-probability
    of label 0: decile of predicted probability (ntile with vec_id
    tiebreak — deterministic) vs observed positive rate, with the
    per-decile Brier score. The standard reliability diagram data —
    avg_pred far from pos_rate in a decile = miscalibration.

    Scale shape: ntile needs a global order, but NOT a global window —
    operators/indexing.exact_ntile (two-pass rank + exact bucket
    arithmetic) assigns deciles with no single task ever holding the
    embeddings-grain frame. The approximate alternative (decile edges
    from approx_percentile folded into a literal comparison chain, the
    psi_acctbal_drift shape) trades exact ntile semantics for one less
    pass — this query keeps the exact form so the reliability table is
    reproducible bit-for-bit against the oracle."""
    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        exact_ntile,
    )

    emb = table(spark, sf_dir, "embeddings")
    scored = emb.select(
        (1.0 / (1.0 + F.exp(-F.col("embedding")[0].cast("double")))).alias(
            "phat"
        ),
        F.when(F.col("label") == 0, 1.0).otherwise(0.0).alias("y"),
        "vec_id",
    )
    binned = exact_ntile(
        scored, ["phat", "vec_id"], 10, out_col="decile"
    ).select("decile", "phat", "y")
    return (
        binned.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("phat"), 6).alias("avg_pred"),
            F.round(F.avg("y"), 6).alias("pos_rate"),
            F.round(
                F.avg((F.col("phat") - F.col("y")) * (F.col("phat") - F.col("y"))),
                6,
            ).alias("brier"),
        )
        .select(
            F.col("decile").cast("bigint").alias("decile"),
            "n",
            "avg_pred",
            "pos_rate",
            "brier",
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# Top clickstream paths (user-day journeys, first 8 events)
# --------------------------------------------------------------------------
@register(
    "top_session_paths",
    oracle="""
WITH j AS (
    SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           array_to_string(
               list(event_type ORDER BY CAST(ts AS TIMESTAMP), event_id)[1:8],
               '>') AS path
    FROM events
    GROUP BY user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)
)
SELECT path, CAST(count(*) AS BIGINT) AS n_journeys,
       CAST(row_number() OVER (ORDER BY count(*) DESC, path) AS BIGINT) AS rank
FROM j
GROUP BY path
QUALIFY rank <= 20
ORDER BY rank
""",
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user-day journey paths (first 8 event types in (ts,
    event_id) order, joined with '>') — the classic clickstream
    "what do people actually do" report, and the batch twin of the
    sessionization family. Deterministic everywhere: sort key includes
    the unique event_id, rank ties break on the path string.

    Scale shape: journeys build with ONE groupBy((user, day)) using
    collect_list of (ts, event_id, type) structs — sort_array +
    slice(8) makes per-group order explicit instead of relying on
    collect_list's undefined order, and the 8-event truncation bounds
    group payload (a runaway bot session cannot OOM a reducer beyond
    the pre-slice list; cap journeys upstream with a per-key limit if
    single keys reach millions of events). Path counting is a second
    partial-combining groupBy on the path string; top-20 is
    TakeOrderedAndProject."""
    ev = table(spark, sf_dir, "events")
    j = (
        ev.groupBy(
            "user_id", F.col("ts").cast("date").alias("day")
        )
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct("ts", "event_id", "event_type")
                            )
                        ),
                        lambda s: s["event_type"],
                    ),
                    1,
                    8,
                ),
                ">",
            ).alias("path")
        )
    )
    ranked = (
        j.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_journeys"))
        .select(
            "path",
            F.col("n_journeys").cast("bigint").alias("n_journeys"),
            F.row_number()
            .over(Window.orderBy(F.col("n_journeys").desc(), "path"))
            .cast("bigint")
            .alias("rank"),
        )
    )
    return ranked.filter(F.col("rank") <= 20).orderBy("rank")
