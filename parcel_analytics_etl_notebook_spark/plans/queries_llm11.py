"""LLM batch 11 (round-7 additions): three curation shapes the catalog
lacked.

- ``context_window_pmi`` — positional co-occurrence PMI over a ±2
  token context window (the word2vec/GloVe context-matrix statistic),
  built with OFFSET-KEYED equi-joins instead of a per-document
  position inequality join (which would be quadratic per doc).
- ``group_aware_split_leakage`` — train/val/test assignment hashed on
  the near-dup CANONICAL id instead of the doc id, with the leakage
  count a naive per-doc split would have let through. The step every
  serious training pipeline runs after dedup: near-identical docs
  straddling train/test is silent contamination that no test-set
  n-gram firewall (split_contamination_rate) catches once wording
  drifts.
- ``matryoshka_truncation_quality`` — cosine-preservation error of
  prefix-truncated embeddings (8/16/32 of 64 dims), the evaluation
  behind Matryoshka-style dimension-adaptive retrieval: how much
  ranking signal survives at each prefix width.

Oracle-parity conventions as in plans/catalog.py and queries_llm.py:
the shared codepoint poly-hash, identical double fold order for
cosines (Spark ``aggregate`` ↔ DuckDB ``list_sum(list_transform)``),
exact BIGINT hash/counting arithmetic, floats rounded identically on
both sides before hashing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import tokens
from parcel_analytics_etl_notebook_spark.functions.vectors import (
    cosine_similarity,
)
from parcel_analytics_etl_notebook_spark.operators.graph import (
    dup_groups_from_pairs,
)
from parcel_analytics_etl_notebook_spark.plans.catalog import register, table
from parcel_analytics_etl_notebook_spark.plans.queries_llm import (
    _SQL_COS,
    _SQL_DUP_COMPONENTS,
    _SQL_TOKS,
    near_dup_pairs_frame,
)

# --------------------------------------------------------------------------
# Positional context-window PMI
# --------------------------------------------------------------------------
_PMI_MIN_PAIRS = 5
_PMI_TOP_K = 25


@register(
    "context_window_pmi",
    oracle=f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
pos AS (
    SELECT doc_id, u.i AS i, u.tok AS tok
    FROM (SELECT doc_id,
                 unnest(list_transform(range(1, len(l) + 1),
                     i -> struct_pack(i := i, tok := l[i]))) AS u
          FROM t)
),
pairs_raw AS (
    SELECT least(a.tok, b.tok) AS w1, greatest(a.tok, b.tok) AS w2
    FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
    UNION ALL
    SELECT least(a.tok, b.tok), greatest(a.tok, b.tok)
    FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 2
),
pc AS (SELECT w1, w2, count(*) AS pair_n FROM pairs_raw GROUP BY 1, 2),
marg AS (SELECT tok, count(*) AS c FROM pos GROUP BY tok),
tot AS (SELECT (SELECT count(*) FROM pos) AS n_tok,
               (SELECT count(*) FROM pairs_raw) AS n_pairs),
scored AS (
    SELECT w1, w2, pair_n,
           round(ln((CAST(pair_n AS DOUBLE) / n_pairs)
                 / ((CAST(m1.c AS DOUBLE) / n_tok)
                    * (CAST(m2.c AS DOUBLE) / n_tok))), 4) AS pmi
    FROM pc JOIN marg m1 ON pc.w1 = m1.tok
            JOIN marg m2 ON pc.w2 = m2.tok
            CROSS JOIN tot
    WHERE pair_n >= {_PMI_MIN_PAIRS}
)
SELECT w1, w2, CAST(pair_n AS BIGINT) AS pair_n, pmi
FROM scored
QUALIFY row_number() OVER (ORDER BY pmi DESC, w1, w2) <= {_PMI_TOP_K}
ORDER BY pmi DESC, w1, w2
""",
)
def context_window_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top pointwise-mutual-information token pairs within a ±2
    positional context window — the co-occurrence statistic behind
    word2vec/GloVe context matrices and collocation mining, stronger
    than bigram counts (bigram_surprisal_stats) because it scores
    association against the independence baseline and sees one-gap
    pairs.

    Scale shape: the context join is TWO offset-keyed equi-joins
    ((doc_id, i+1) and (doc_id, i+2)) — never an |i−j|≤k inequality
    join, which is quadratic per document. Each offset join moves
    token-grain rows once; pair counting and the token marginals are
    hash aggregates with map-side partials; the corpus totals are a
    1-row broadcast scalar (allowlisted scalar-gate pattern). Ranking
    ties on the 4dp-rounded PMI break on (w1, w2), so top-k is
    deterministic on both engines."""
    pos = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(tokens("text")).alias("i", "tok"))
        .persist()  # both join sides x two offsets + the marginals scan
    )
    a = pos.select("doc_id", F.col("i").alias("ia"), F.col("tok").alias("ta"))
    pairs_raw = None
    for delta in (1, 2):
        b = pos.select(
            "doc_id",
            (F.col("i") - delta).alias("ia"),
            F.col("tok").alias("tb"),
        )
        j = a.join(b, ["doc_id", "ia"]).select(
            F.least("ta", "tb").alias("w1"), F.greatest("ta", "tb").alias("w2")
        )
        pairs_raw = j if pairs_raw is None else pairs_raw.unionAll(j)
    pairs_raw = pairs_raw.persist()  # pair counts + the n_pairs total
    pc = pairs_raw.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_n"))
    marg = pos.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = pos.agg(F.count(F.lit(1)).alias("n_tok")).crossJoin(
        F.broadcast(pairs_raw.agg(F.count(F.lit(1)).alias("n_pairs")))
    )
    m1 = marg.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    m2 = marg.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    pmi = F.round(
        F.log(
            (F.col("pair_n").cast("double") / F.col("n_pairs"))
            / (
                (F.col("c1").cast("double") / F.col("n_tok"))
                * (F.col("c2").cast("double") / F.col("n_tok"))
            )
        ),
        4,
    )
    scored = (
        pc.filter(F.col("pair_n") >= _PMI_MIN_PAIRS)
        .join(m1, "w1")
        .join(m2, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", F.col("pair_n").cast("bigint").alias("pair_n"),
                pmi.alias("pmi"))
    )
    # top-k via orderBy+limit -> TakeOrderedAndProject (distributed
    # per-partition heaps, no single-partition window); the order is
    # total (pmi ties break on w1, w2) so the cut is deterministic and
    # equals the oracle's row_number() <= k over the same ORDER BY
    return scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(_PMI_TOP_K)


# --------------------------------------------------------------------------
# Group-aware train/val/test split with leakage accounting
# --------------------------------------------------------------------------
def _split_case_sql(col: str) -> str:
    # id is reduced mod p BEFORE the multiply so the intermediate stays
    # below 2^63 for any BIGINT id (ADVICE r07 #3: the unreduced form
    # overflows at id ≳ 9.2e12 — Spark non-ANSI wraps silently, DuckDB
    # raises, so the engines would diverge on large ids)
    return (
        f"CASE WHEN ({col} % 1000000007 * 1000003) % 1000000007 % 10 < 8 THEN 'train' "
        f"WHEN ({col} % 1000000007 * 1000003) % 1000000007 % 10 = 8 THEN 'val' "
        "ELSE 'test' END"
    )


def _split_case(col: Column) -> Column:
    b = (col % F.lit(1000000007) * F.lit(1000003)) % F.lit(1000000007) % F.lit(10)
    return (
        F.when(b < 8, F.lit("train"))
        .when(b == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )


@register(
    "group_aware_split_leakage",
    oracle=f"""
WITH RECURSIVE {_SQL_DUP_COMPONENTS},
lab AS (
    SELECT d.doc_id, coalesce(c.canonical_id, d.doc_id) AS canon
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
),
sp AS (
    SELECT doc_id,
           {_split_case_sql('doc_id')} AS s_naive,
           {_split_case_sql('canon')} AS s_grouped
    FROM lab
),
pl AS (
    SELECT sa.s_naive AS na, sb.s_naive AS nb,
           sa.s_grouped AS ga, sb.s_grouped AS gb
    FROM good g
    JOIN sp sa ON g.id_a = sa.doc_id
    JOIN sp sb ON g.id_b = sb.doc_id
),
ln_ AS (SELECT s, count(*) AS n FROM (
            SELECT na AS s FROM pl WHERE na <> nb
            UNION ALL SELECT nb FROM pl WHERE na <> nb) GROUP BY s),
lg AS (SELECT s, count(*) AS n FROM (
            SELECT ga AS s FROM pl WHERE ga <> gb
            UNION ALL SELECT gb FROM pl WHERE ga <> gb) GROUP BY s),
dn AS (SELECT s_naive AS s, count(*) AS n FROM sp GROUP BY 1),
dg AS (SELECT s_grouped AS s, count(*) AS n FROM sp GROUP BY 1)
SELECT sp0.split,
       CAST(coalesce(dn.n, 0) AS BIGINT) AS docs_naive,
       CAST(coalesce(dg.n, 0) AS BIGINT) AS docs_grouped,
       CAST(coalesce(ln_.n, 0) AS BIGINT) AS leaked_pairs_naive,
       CAST(coalesce(lg.n, 0) AS BIGINT) AS leaked_pairs_grouped
FROM (VALUES ('train'), ('val'), ('test')) sp0(split)
LEFT JOIN dn ON dn.s = sp0.split
LEFT JOIN dg ON dg.s = sp0.split
LEFT JOIN ln_ ON ln_.s = sp0.split
LEFT JOIN lg ON lg.s = sp0.split
ORDER BY sp0.split
""",
)
def group_aware_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test splitting that hashes the near-dup CANONICAL id
    (component min) instead of the raw doc id, with the contamination
    ledger: per split, doc counts under both schemes and the near-dup
    pairs that straddle a split boundary (a straddling pair counts in
    both of its splits). Grouped leakage is zero BY CONSTRUCTION —
    both endpoints of every near-dup pair share a canonical id — and
    the query proves it in data next to the naive scheme's nonzero
    count. This is the post-dedup step that test-set n-gram firewalls
    can't replace: near-identical documents split across train/test
    leak even when no exact n-gram survives.

    Scale shape: the pair artifact is the shared memo (bench ledger
    memo:near_dup_pairs); component labels come from the same
    iterative min-label propagation as near_dup_groups; everything
    else is doc-grain hashes (exact BIGINT arithmetic, identical on
    both engines), two pair-grain joins, and split-grain aggregates
    joined onto a 3-row spine. The split hash ((id mod p · 1000003)
    mod p mod 10, p = 1000000007; the inner reduction keeps the
    intermediate under 2^63 for any BIGINT id) is a pure function of
    the id — reproducible across engines, restarts, and backfills,
    which is the operational requirement for split assignment."""
    pairs = near_dup_pairs_frame(spark, sf_dir).select("id_a", "id_b")
    groups = dup_groups_from_pairs(pairs)
    docs = table(spark, sf_dir, "documents").select("doc_id")
    lab = docs.join(groups, "doc_id", "left").select(
        "doc_id", F.coalesce("canonical_id", "doc_id").alias("canon")
    )
    sp = lab.select(
        "doc_id",
        _split_case(F.col("doc_id")).alias("s_naive"),
        _split_case(F.col("canon")).alias("s_grouped"),
    ).persist()  # doc-count aggregates x2 + both pair-endpoint joins
    sa = sp.select(F.col("doc_id").alias("id_a"),
                   F.col("s_naive").alias("na"),
                   F.col("s_grouped").alias("ga"))
    sb = sp.select(F.col("doc_id").alias("id_b"),
                   F.col("s_naive").alias("nb"),
                   F.col("s_grouped").alias("gb"))
    pl = pairs.join(sa, "id_a").join(sb, "id_b").persist()
    ln_ = (
        pl.filter(F.col("na") != F.col("nb"))
        .select(F.col("na").alias("s"))
        .unionAll(
            pl.filter(F.col("na") != F.col("nb")).select(
                F.col("nb").alias("s")
            )
        )
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("ln"))
    )
    lg = (
        pl.filter(F.col("ga") != F.col("gb"))
        .select(F.col("ga").alias("s"))
        .unionAll(
            pl.filter(F.col("ga") != F.col("gb")).select(
                F.col("gb").alias("s")
            )
        )
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("lg"))
    )
    dn = sp.groupBy(F.col("s_naive").alias("s")).agg(
        F.count(F.lit(1)).alias("dn")
    )
    dg = sp.groupBy(F.col("s_grouped").alias("s")).agg(
        F.count(F.lit(1)).alias("dg")
    )
    spine = spark.createDataFrame(
        [("train",), ("val",), ("test",)], "s string"
    )
    out = (
        spine.join(dn, "s", "left")
        .join(dg, "s", "left")
        .join(ln_, "s", "left")
        .join(lg, "s", "left")
        .select(
            F.col("s").alias("split"),
            F.coalesce("dn", F.lit(0)).cast("bigint").alias("docs_naive"),
            F.coalesce("dg", F.lit(0)).cast("bigint").alias("docs_grouped"),
            F.coalesce("ln", F.lit(0)).cast("bigint")
            .alias("leaked_pairs_naive"),
            F.coalesce("lg", F.lit(0)).cast("bigint")
            .alias("leaked_pairs_grouped"),
        )
    )
    return out.orderBy("split")


# --------------------------------------------------------------------------
# Matryoshka-style prefix-truncation quality
# --------------------------------------------------------------------------
_MRL_WIDTHS = (8, 16, 32, 64)


def _mrl_oracle() -> str:
    full = _SQL_COS.format("a.embedding", "b.embedding")
    arms = []
    for w in _MRL_WIDTHS:
        cw = _SQL_COS.format(f"(a.embedding[1:{w}])", f"(b.embedding[1:{w}])")
        arms.append(f"""
SELECT CAST({w} AS BIGINT) AS width,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(avg(abs(({cw}) - ({full}))), 4) AS avg_abs_cos_err,
       round(avg({cw}), 4) AS avg_cos
FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1""")
    return "\nUNION ALL\n".join(arms) + "\nORDER BY width"


@register("matryoshka_truncation_quality", oracle=_mrl_oracle())
def matryoshka_truncation_quality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cosine-preservation error of prefix-truncated embeddings at
    widths 8/16/32/64 of 64 dims over a deterministic pair sample
    (consecutive vec_ids) — the evaluation behind Matryoshka-style
    dimension-adaptive retrieval: serve the short prefix when its
    average cosine error is tolerable, fall back to full vectors for
    re-ranking. The width-64 row is the self-check (error exactly 0 on
    both engines).

    Scale shape: one vec_id+1 equi-join builds the pair sample (at
    production scale: a fixed sampled pair table), then each width is
    a per-row slice + the shared double cosine fold — all widths
    computed in ONE pass over the joined frame (a single aggregate
    with 4×2 parallel expressions would also work; the unioned
    per-width aggregates keep the plan identical to the oracle's
    UNION arms and cost 4 scans of a persisted model-scale frame).
    Fold order matches the oracle exactly (Spark ``aggregate`` ↔
    DuckDB ``list_sum(list_transform)``), so the 4dp rounding only
    absorbs the avg's accumulation-order jitter."""
    emb = table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = emb.select(
        (F.col("vec_id") - 1).alias("ia"), F.col("embedding").alias("eb")
    )
    pairs = a.join(b, "ia").persist()  # 4 width aggregates share it
    full = cosine_similarity("ea", "eb")
    outs = []
    for w in _MRL_WIDTHS:
        cw = cosine_similarity(F.slice("ea", 1, w), F.slice("eb", 1, w))
        outs.append(
            pairs.agg(
                F.lit(w).cast("bigint").alias("width"),
                F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                F.round(F.avg(F.abs(cw - full)), 4).alias("avg_abs_cos_err"),
                F.round(F.avg(cw), 4).alias("avg_cos"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("width")
