"""Round-10 linkage additions (VERDICT r09 #1).

``fellegi_sunter_linkage`` blocks on nation — a CONSTANT 25-block
partition whose candidate volume grows n²/25, so its round-9 budget
guard can only REFUSE to run above ~sf0.1. This module implements the
scale path the guard's error message names: **sorted-neighborhood
blocking** (Hernández & Stolfo 1995, the classic merge/purge method) —
sort the corpus by a canonical key, slide a fixed window of w records,
and score only pairs that co-occur in a window. Candidates are exactly
(w−1)·n − (w−1)·w/2 — LINEAR in corpus size with a constant the
operator controls, while the Fellegi-Sunter agreement weights and link
threshold are unchanged.

``snb_window_recall`` closes the evaluation loop: blocking is a
recall/cost tradeoff, so the companion query measures — exactly, on
the same corpus — how many of the nation-block links the window
recovers, per the standard pairs-completeness metric.

``fellegi_sunter_multipass_snb`` is the production variant the
single-pass docstring names: a record pair that sorts far apart under
ONE key (a typo in the name's first characters) still lands in a
window under ANOTHER (balance-band order), so multi-pass SNB unions
the candidates of several independent sort keys before the identical
scoring stage — still linear (passes × (w−1) × n).

Round-11 additions complete the calibration stack: ``fs_em_mstep``
(the full EM loop, E+M iterated as a bit-stable literal-seeded
recurrence with an unrolled-K oracle), the reversed-name CANONICAL
third multipass arm with ``snb_canonical_pass_recovery`` measuring
what it recovers, ``fs_em_mstep_multipass`` (EM to its measured fixed
point over the de-biased 3-arm candidates, iterated driver-side over
the eight collected sufficient statistics), and
``fs_field_marginal_u`` (the classic marginal-frequency u estimate).
``snb_sampled_recall``'s stratum admission became fully distributed
(cumulative-sum window + broadcast semi-join + row co-budget) in the
same round.

Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.operators.indexing import (
    multi_windowed_adjacent_pairs,
    stable_global_index,
    windowed_adjacent_pairs,
)
from parcel_analytics_etl_notebook_spark.plans.catalog import (
    MEMO_BUILDERS,
    register,
    table,
)
from parcel_analytics_etl_notebook_spark.plans.queries_relational20 import (
    _FS_THRESHOLD,
    _FS_W,
)

#: sorted-neighborhood window size: each record is a candidate against
#: its SNB_WINDOW−1 successors in (c_name, c_custkey) order — candidate
#: count is (w−1)·n − (w−1)·w/2, linear by construction. w=8 is the
#: classic small-window default; production systems multi-pass with
#: several sort keys and union the candidates (same plan per pass).
SNB_WINDOW = 8

#: evaluation budget for the SAMPLED recall metric: strata are
#: admitted greedily (smallest exhaustive-pair bound first) while the
#: cumulative bound stays within this; at least one stratum is always
#: admitted, and since every stratum's bound is ≤ 499,500 by
#: construction (SNB_STRATUM_SIZE below), the denominator work is
#: genuinely ≤ ~budget at ANY corpus size. The 10× corpus's total
#: stratum bound (~2.9M) exceeds it, so the admission logic is
#: exercised by the scaling run.
SNB_SAMPLE_BUDGET = 1_000_000

#: stratum granularity for the sampled recall metric: a stratum is a
#: (nation, custkey DIV 1000) cell, so its exhaustive-pair bound can
#: never exceed 1000*999/2 = 499,500 REGARDLESS of corpus size — the
#: stratum count grows with the data, the stratum size does not. The
#: custkey kiloblock is independent of every linkage attribute, so
#: within-stratum links are an unbiased pair sample.
SNB_STRATUM_SIZE = 1000

#: ROW co-budget for the sampled recall metric (VERDICT r10 what's-
#: wrong #1): the PAIR budget alone admits zero-pair singleton strata
#: for free (0 pairs each), so a corpus shaped as millions of
#: one-customer strata could inflate the broadcast sampled side
#: unboundedly in ROWS while staying at 0 pairs. Admission therefore
#: also requires the cumulative admitted ROW count to fit this budget
#: (~a few MB broadcast at 8 bytes/key ceiling). It never binds at any
#: tested sf (15k customer rows at sf0.1, ~51k admitted rows at 10×)
#: — it exists to bound the broadcast side by construction.
SNB_SAMPLE_ROW_BUDGET = 200_000

_SNB_RANKED = """
    SELECT c_custkey, c_name, c_mktsegment,
           floor(c_acctbal / 500) AS band,
           row_number() OVER (ORDER BY c_name, c_custkey) AS rn
    FROM customer
"""

_SNB_SCORE = (
    f"(CASE WHEN agree_name THEN {_FS_W['name'][0]} ELSE {_FS_W['name'][1]} END)"
    f" + (CASE WHEN agree_segment THEN {_FS_W['segment'][0]} ELSE {_FS_W['segment'][1]} END)"
    f" + (CASE WHEN agree_balance THEN {_FS_W['balance'][0]} ELSE {_FS_W['balance'][1]} END)"
)


def _fs_score_candidates(
    cand: DataFrame, customer: DataFrame, links_only: bool = False
) -> DataFrame:
    """Attach agreement flags + the summed Fellegi-Sunter score to a
    canonical (id_a < id_b) candidate frame: one equi-join per side on
    c_custkey, then the weighted CASE chain. Candidates are generated
    NARROW (ids only) and widened here, so the window explode and the
    rank-key shuffle move 2 longs per row instead of 2 longs + 3
    attribute columns — and every SNB variant (single-pass, multi-pass,
    recall eval) scores through this one code path.

    ``links_only``: keep only rows with score >= _FS_THRESHOLD, applied
    as the EQUIVALENT ``agree_balance AND agree_name`` predicate
    (proven from the weight table at import by queries_relational20.
    _fs_links_are_band_and_name) with the cheap band equality FIRST —
    the bounded levenshtein then runs only on band-agreeing candidates
    (~1/|bands| of them) instead of every candidate (r12 opt). Callers
    that need disagreement patterns (the EM stack) must NOT set it."""
    attrs = customer.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 500).alias("band"),
    )
    xa = attrs.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_mktsegment").alias("seg_a"),
        F.col("band").alias("band_a"),
    )
    xb = attrs.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_mktsegment").alias("seg_b"),
        F.col("band").alias("band_b"),
    )
    agree_name = F.levenshtein("name_a", "name_b", 2) >= 0
    agree_segment = F.col("seg_a") == F.col("seg_b")
    agree_balance = F.col("band_a") == F.col("band_b")
    score = (
        F.when(agree_name, _FS_W["name"][0]).otherwise(_FS_W["name"][1])
        + F.when(agree_segment, _FS_W["segment"][0]).otherwise(
            _FS_W["segment"][1]
        )
        + F.when(agree_balance, _FS_W["balance"][0]).otherwise(
            _FS_W["balance"][1]
        )
    )
    joined = cand.join(xa, "id_a").join(xb, "id_b")
    if links_only:
        # AND short-circuits left-to-right in codegen: band equality
        # prunes before the levenshtein ever runs
        joined = joined.filter(agree_balance & agree_name)
    return joined.select(
        "id_a",
        "id_b",
        agree_name.alias("agree_name"),
        agree_segment.alias("agree_segment"),
        agree_balance.alias("agree_balance"),
        score.cast("bigint").alias("score"),
    )


def _snb_scored_pairs(
    spark: SparkSession, sf_dir: str, links_only: bool = False
) -> DataFrame:
    """All sorted-neighborhood candidate pairs with agreement flags and
    the summed Fellegi-Sunter score (``links_only`` prunes to the
    provable score >= threshold set before scoring — see
    _fs_score_candidates). Candidates read the shared memo's pass-1
    rows (exactly the single-pass generator's output — see
    :func:`_build_snb_cands`; r13 opt)."""
    customer = table(spark, sf_dir, "customer")
    cand = (
        snb_cands_frame(spark, sf_dir)
        .filter(F.col("p1") == 1)
        .select("id_a", "id_b")
    )
    return _fs_score_candidates(cand, customer, links_only=links_only)


@register(
    "fellegi_sunter_snb_linkage",
    oracle=f"""
WITH r AS ({_SNB_RANKED}),
p AS (
    SELECT least(a.c_custkey, b.c_custkey) AS id_a,
           greatest(a.c_custkey, b.c_custkey) AS id_b,
           (levenshtein(a.c_name, b.c_name) <= 2) AS agree_name,
           (a.c_mktsegment = b.c_mktsegment) AS agree_segment,
           (a.band = b.band) AS agree_balance
    FROM r a JOIN r b
      ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNB_WINDOW - 1}
)
SELECT id_a, id_b, agree_name, agree_segment, agree_balance,
       CAST({_SNB_SCORE} AS BIGINT) AS score
FROM p
WHERE {_SNB_SCORE} >= {_FS_THRESHOLD}
ORDER BY id_a, id_b
""",
)
def fellegi_sunter_snb_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter record linkage over SORTED-NEIGHBORHOOD blocking
    (Hernández & Stolfo 1995) — the linear-candidate scale path that
    ``fellegi_sunter_linkage``'s round-9 budget guard refers over-budget
    corpora to. Records sort by the canonical key (c_name, c_custkey);
    each record is scored only against its ``SNB_WINDOW − 1 = 7``
    successors, so candidates are (w−1)·n − O(w²) — linear, no budget
    needed. Agreement evidence, integer weights, and the link threshold
    are identical to the nation-block query (name edit distance ≤ 2
    +25/−15, segment +10/−5, balance band +15/−5, threshold 35); only
    the candidate generator changed, which is exactly the
    Fellegi-Sunter decomposition: blocking controls cost, the decision
    model controls precision.

    Unlike ``sorted_neighborhood_pairs`` (queries_relational8.py),
    which windows WITHIN first-letter blocks and loses cross-block
    boundary pairs, this query ranks over the TOTAL key order, so no
    neighbor pair is ever dropped at a block edge.

    Scale shape: the global rank comes from
    :func:`operators.indexing.stable_global_index` (range repartition +
    per-partition row_number + driver prefix-sum of ONE count per
    partition — never a single-task global window); window expansion is
    one explode of a 7-element sequence; pairing is ONE equi-join on
    the rank key (uniform int64, no skew). Every heavy step is
    embarrassingly parallel, so the plan survives 100× unchanged —
    production multi-pass SNB unions several sort keys' candidates
    before the identical scoring stage, and the EM-estimated m/u
    weights drop in as constants exactly as in the nation-block
    variant."""
    # links_only applies the threshold as its proven (band AND name)
    # equivalent inside the scoring join — no residual score filter
    return _snb_scored_pairs(spark, sf_dir, links_only=True).orderBy(
        "id_a", "id_b"
    )


def _snb_candidate_ids(
    customer: DataFrame,
    order_cols: list[str],
    boundaries: list | None = None,
) -> DataFrame:
    """Canonical (id_a < id_b) candidate pairs from ONE
    sorted-neighborhood pass under ``order_cols`` (must end in
    c_custkey for a total order). Linear: (w−1)·n − O(w²) rows.

    r12 opt: pairs come from ``windowed_adjacent_pairs`` — in-bucket
    ``lead``s over the one bucket-partitioned sort plus a model-grain
    cross-boundary stitch — instead of the old explode-by-rank +
    rank-equi-join, which shuffled (w−1)·n probe rows + n build rows
    by rank and cost two extra exchanges per pass. ``boundaries``
    (optional, bucket-balance-only) lets multipass callers batch the
    three passes' boundary probes into two driver actions (and
    :func:`_multipass_pass_frames` additionally batches the offsets
    collects via ``multi_windowed_adjacent_pairs``)."""
    pairs = windowed_adjacent_pairs(
        customer,
        order_cols,
        SNB_WINDOW,
        "c_custkey",
        boundaries=boundaries,
    )
    return pairs.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
    )


def _multipass_pass_frames(keyed: DataFrame) -> list[DataFrame]:
    """The three per-pass SNB candidate frames (name order, balance
    order, reversed-name order) built with THREE driver actions total
    (r13 opt, VERDICT r12 #1): the batched boundary probe
    (:func:`_multipass_boundaries`, two actions) plus
    ``multi_windowed_adjacent_pairs``'s single union-counts collect,
    which replaces the three per-pass ``groupBy(__pid).count().
    collect()`` blocking actions the r12 shape paid while still
    materializing every pass's tagged persist (the property a
    keyed-frame probe lost — measured 8.3s vs 5.2s warm at sf0.1
    before this shape)."""
    bnd = _multipass_boundaries(keyed)
    passes = [
        (["c_name", "c_custkey"], bnd["c_name"]),
        (["c_acctbal", "c_custkey"], bnd["c_acctbal"]),
        (["rev_name", "c_custkey"], bnd["rev_name"]),
    ]
    frames = multi_windowed_adjacent_pairs(
        keyed, passes, SNB_WINDOW, "c_custkey"
    )
    return [
        f.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        for f in frames
    ]


def _multipass_boundaries(keyed: DataFrame) -> dict[str, list]:
    """Bucket-boundary sets for the three multipass sort keys in TWO
    driver actions instead of five (r12 opt): one aggregate returns
    the c_acctbal percentile cuts AND the row count, one bounded
    sample collect of c_name serves both the name-order cuts and —
    reversed driver-side — the rev_name cuts (UTF-8 byte order equals
    code-point order, so Python's sort of the reversed sample is the
    engine's string order; boundary quality affects bucket BALANCE
    only, never results — see operators/indexing._bucketed)."""
    n = keyed.sparkSession.sparkContext.defaultParallelism
    probs = [i / n for i in range(1, n)]
    row = keyed.agg(
        F.percentile_approx(
            F.col("c_acctbal").cast("double"), probs, max(1000, n)
        ).alias("bs"),
        F.count(F.lit(1)).alias("cnt"),
    ).first()
    bal = [float(b) for b in (row["bs"] or []) if b is not None]
    cnt = row["cnt"] or 0
    out: dict[str, list] = {"c_acctbal": bal, "c_name": [], "rev_name": []}
    if cnt == 0:
        return out
    target = min(200_000, max(25_600, 4 * n))
    frac = min(1.0, (target * 1.25) / cnt)
    vals = sorted(
        r[0]
        for r in keyed.select("c_name")
        .where(F.col("c_name").isNotNull())
        .sample(fraction=frac, seed=42)
        .limit(4 * target)
        .collect()
    )
    if not vals:
        return out
    out["c_name"] = sorted({vals[(len(vals) * i) // n] for i in range(1, n)})
    rev = sorted(v[::-1] for v in vals)
    out["rev_name"] = sorted({rev[(len(rev) * i) // n] for i in range(1, n)})
    return out


def _build_snb_cands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagged multipass SNB candidate table: one row per DISTINCT
    canonical (id_a, id_b) candidate pair with per-pass membership
    flags — p1 = name order, p2 = balance order, p3 = reversed-name
    order. Within one pass each unordered pair occurs at most once
    (ranks are unique and pairs are (rn, rn+d), d >= 1), so the flags
    carry the passes losslessly and every SNB consumer is a filter:
    pass-1 candidates = ``p1 = 1`` (exactly the single-pass generator's
    output), the 3-arm deduped union = all rows, the recovery metric's
    c12/c3 split = ``p1 = 1 OR p2 = 1`` / ``p3 = 1``.

    The groupBy that builds the flags IS the dedup shuffle the union
    consumers paid per query — moved into the one shared build."""
    customer = table(spark, sf_dir, "customer")
    keyed = customer.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.reverse(F.col("c_name")).alias("rev_name"),
    )
    p1, p2, p3 = _multipass_pass_frames(keyed)
    tagged = (
        p1.withColumn("__p", F.lit(1))
        .unionByName(p2.withColumn("__p", F.lit(2)))
        .unionByName(p3.withColumn("__p", F.lit(3)))
    )
    return tagged.groupBy("id_a", "id_b").agg(
        F.max(F.when(F.col("__p") == 1, 1).otherwise(0)).alias("p1"),
        F.max(F.when(F.col("__p") == 2, 1).otherwise(0)).alias("p2"),
        F.max(F.when(F.col("__p") == 3, 1).otherwise(0)).alias("p3"),
    )


def snb_cands_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multipass SNB candidate artifact, computed ONCE per session
    per sf_dir (catalog.memo_frame) and shared by every SNB/FS/EM
    consumer (VERDICT r12 next #1): nine catalog queries each rebuilt
    one-to-three ranked window passes (sort + boundary probe + offsets
    action per pass) to re-derive this exact table every run. In a
    production merge/purge pipeline the candidate table is materialized
    once and every scoring/calibration stage reads it — the same
    contract as ``near_dup_pairs_frame``. ``fellegi_sunter_multipass_
    snb`` itself stays un-memoized so its registered plan (and the
    shuffle-budget ledger entry) keeps describing the real 3-pass
    builder pipeline; a standalone single-pass consumer pays the 3-pass
    build on first touch (bounded: 3 linear window passes), a sweep
    amortizes it to zero."""
    from parcel_analytics_etl_notebook_spark.plans.catalog import memo_frame

    return memo_frame(
        spark,
        sf_dir,
        "snb_multipass_cands",
        lambda: _build_snb_cands(spark, sf_dir),
    )


# bench.py pre-materializes each shared artifact as its own timed
# ledger line so per-query walls are marginal + order-independent
MEMO_BUILDERS["snb_multipass_cands"] = snb_cands_frame


@register(
    "fellegi_sunter_multipass_snb",
    oracle=f"""
WITH r1 AS (
    SELECT c_custkey, row_number() OVER (ORDER BY c_name, c_custkey) AS rn
    FROM customer
),
r2 AS (
    SELECT c_custkey, row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rn
    FROM customer
),
r3 AS (
    SELECT c_custkey,
           row_number() OVER (ORDER BY reverse(c_name), c_custkey) AS rn
    FROM customer
),
cand AS (
    SELECT DISTINCT id_a, id_b FROM (
        SELECT least(a.c_custkey, b.c_custkey) AS id_a,
               greatest(a.c_custkey, b.c_custkey) AS id_b
        FROM r1 a JOIN r1 b
          ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNB_WINDOW - 1}
        UNION ALL
        SELECT least(a.c_custkey, b.c_custkey) AS id_a,
               greatest(a.c_custkey, b.c_custkey) AS id_b
        FROM r2 a JOIN r2 b
          ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNB_WINDOW - 1}
        UNION ALL
        SELECT least(a.c_custkey, b.c_custkey) AS id_a,
               greatest(a.c_custkey, b.c_custkey) AS id_b
        FROM r3 a JOIN r3 b
          ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNB_WINDOW - 1}
    )
),
p AS (
    SELECT c.id_a, c.id_b,
           (levenshtein(x.c_name, y.c_name) <= 2) AS agree_name,
           (x.c_mktsegment = y.c_mktsegment) AS agree_segment,
           (floor(x.c_acctbal / 500) = floor(y.c_acctbal / 500)) AS agree_balance
    FROM cand c
    JOIN customer x ON c.id_a = x.c_custkey
    JOIN customer y ON c.id_b = y.c_custkey
)
SELECT id_a, id_b, agree_name, agree_segment, agree_balance,
       CAST({_SNB_SCORE} AS BIGINT) AS score
FROM p
WHERE {_SNB_SCORE} >= {_FS_THRESHOLD}
ORDER BY id_a, id_b
""",
)
def fellegi_sunter_multipass_snb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-PASS sorted-neighborhood Fellegi-Sunter linkage — the
    production form the single-pass docstring names: one window pass
    per independent canonical key (name order, account-balance order,
    and the REVERSED-name canonical order, each w=8), candidate sets
    unioned and deduped BEFORE the one scoring stage. A pair a typo
    pushes apart under the name sort still lands adjacent under the
    balance sort (and vice versa), which is how merge/purge systems
    recover blocking recall without ever leaving the linear-candidate
    regime: total candidates ≤ passes × (w−1) × n, and each attribute
    join is an equi-join on c_custkey.

    The third key is the typo-robust canonicalized pass (VERDICT r10
    missing #3): for identifier-shaped names (every ``c_name`` here is
    ``Customer#NNNNNNNNN``) a phonetic code degenerates — soundex maps
    every row to the single code C235 (measured: one distinct value
    over all 15,000 sf0.1 names) because the alphabetic prefix is
    shared and digits carry no phonetic signal — so the canonical key
    production merge/purge uses for ID-like fields is the REVERSED
    string: a typo in the LEADING characters (the exact failure mode
    that defeats name-order AND, with an unluckily-close balance,
    balance-order simultaneously) leaves the reversed sort key's long
    prefix intact, so the damaged record stays window-adjacent to its
    twin. ``reverse()`` is a built-in on both engines with identical
    semantics, keeping the oracle shared. What the pass recovers is
    measured by ``snb_canonical_pass_recovery``.

    Scale shape: three independent ranked passes (each the parallel
    global rank of the single-pass query), union + dropDuplicates on
    the canonical (id_a, id_b) key (one shuffle at candidate grain,
    candidates linear), then ONE attribute join per side and the same
    weighted scoring. Adding a pass is one more union arm — cost grows
    additively, never multiplicatively."""
    customer = table(spark, sf_dir, "customer")
    keyed = customer.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.reverse(F.col("c_name")).alias("rev_name"),
    )
    p1, p2, p3 = _multipass_pass_frames(keyed)
    cand = p1.unionByName(p2).unionByName(p3).dropDuplicates()
    # links_only applies the threshold as its proven (band AND name)
    # equivalent inside the scoring join — no residual score filter
    return _fs_score_candidates(cand, customer, links_only=True).orderBy(
        "id_a", "id_b"
    )


@register(
    "snb_window_recall",
    scale_guard={
        "budget": "FS_CANDIDATE_BUDGET = 20,000,000 nation-block pairs "
                  "(the ground-truth denominator side)",
        "max_verified_sf": 0.1,
        "raises": "CandidateBudgetExceeded",
        # contract field: the REGISTERED query a harness runs instead
        # (ADVICE r10 #3 — was prose; the prose moved to `note`)
        "scale_path": "snb_sampled_recall",
        "note": "the exhaustive denominator is the metric's "
                "definition; over budget, evaluate pairs-completeness "
                "on budget-bounded strata via the scale_path query",
    },
    oracle=f"""
WITH r AS ({_SNB_RANKED}),
snb AS (
    SELECT least(a.c_custkey, b.c_custkey) AS id_a,
           greatest(a.c_custkey, b.c_custkey) AS id_b
    FROM r a JOIN r b
      ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNB_WINDOW - 1}
),
blocked AS (
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE (CASE WHEN levenshtein(a.c_name, b.c_name) <= 2
                THEN {_FS_W['name'][0]} ELSE {_FS_W['name'][1]} END)
        + (CASE WHEN a.c_mktsegment = b.c_mktsegment
                THEN {_FS_W['segment'][0]} ELSE {_FS_W['segment'][1]} END)
        + (CASE WHEN floor(a.c_acctbal / 500) = floor(b.c_acctbal / 500)
                THEN {_FS_W['balance'][0]} ELSE {_FS_W['balance'][1]} END)
        >= {_FS_THRESHOLD}
)
SELECT CAST(count(*) AS BIGINT) AS nation_links,
       CAST(count(s.id_a) AS BIGINT) AS snb_found,
       CASE WHEN count(*) > 0
            THEN round(count(s.id_a) * 1.0 / count(*), 4)
       END AS pairs_completeness
FROM blocked k
LEFT JOIN snb s ON k.id_a = s.id_a AND k.id_b = s.id_b
""",
)
def snb_window_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs-completeness of sorted-neighborhood blocking, measured
    against the nation-block links as ground truth: of the pairs the
    exhaustive-within-nation Fellegi-Sunter query links, what fraction
    co-occurs in a w=8 window of the (c_name, c_custkey) sort? This is
    the standard blocking evaluation metric (pairs completeness =
    recall of the candidate generator) — the number a pipeline owner
    reads before trading the O(n²/25) block for the O(w·n) window, and
    the measurement VERDICT r09 #1 asked the scale path to come with.

    Scale shape: the SNB side is the linear candidate generator above
    (dedup-free by construction — one orientation per ranked pair); the
    ground-truth side reuses the nation-block join, so the metric query
    inherits that side's n²/25 term BY DEFINITION (the denominator is
    the exhaustive answer). The round-10 10× run measured exactly that
    — 94× wall — so the tradeoff is enforced like its ground-truth
    twin's: the same FS_CANDIDATE_BUDGET probe runs BEFORE the blocked
    join, and over budget the metric fails fast naming the production
    move (evaluate pairs-completeness on a stratified sample of
    blocks). One left join on the canonical pair key + one global
    aggregate after the probe."""
    from parcel_analytics_etl_notebook_spark.plans.queries_llm7 import (
        CandidateBudgetExceeded,
    )
    from parcel_analytics_etl_notebook_spark.plans.queries_relational20 import (
        FS_CANDIDATE_BUDGET,
    )

    customer = table(spark, sf_dir, "customer")
    row = (
        customer.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(
                (F.col("c") * (F.col("c") - 1)).cast("bigint") / 2
            ).alias("b")
        )
        .collect()[0]
    )
    bound = int(row["b"] or 0)
    if bound > FS_CANDIDATE_BUDGET:
        raise CandidateBudgetExceeded(
            f"snb_window_recall ground-truth bound {bound:,} exceeds "
            f"budget {FS_CANDIDATE_BUDGET:,}: the pairs-completeness "
            "denominator is the exhaustive nation-block join by "
            "definition (n^2/25). Evaluate blocking recall on a "
            "stratified sample of blocks at corpus scale; the SNB "
            "candidate side itself is linear "
            "(fellegi_sunter_snb_linkage)."
        )
    # SNB side: the left-join probe needs only the candidate-pair IDS —
    # the scoring joins _snb_scored_pairs adds are cardinality-
    # preserving (inner equi-joins on the unique c_custkey) and every
    # added column is dropped by the select, so building them spent two
    # joins plus ~105k levenshteins on columns nobody read (r12 opt).
    # r13: the ids come from the shared memo's pass-1 rows instead of a
    # fresh ranked pass (see _build_snb_cands).
    snb = (
        snb_cands_frame(spark, sf_dir)
        .filter(F.col("p1") == 1)
        .select("id_a", "id_b")
    )
    band = lambda c: F.floor(F.col(c) / 500)  # noqa: E731
    # Ground-truth side: score >= threshold <=> band AND name agreement
    # (proven at import by queries_relational20._fs_links_are_band_and_
    # name — segment never decides), so the balance band joins as a
    # second equi-key and the bounded levenshtein runs on ~1/|bands| of
    # the nation block instead of all n²/25 pairs. The DENOMINATOR is
    # still the exhaustive metric — only pairs that provably score
    # below threshold are skipped, exactly what the oracle's WHERE
    # clause discards.
    a = customer.select(
        F.col("c_nationkey").alias("nk"),
        band("c_acctbal").alias("band"),
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
    )
    b = customer.select(
        F.col("c_nationkey").alias("nk"),
        band("c_acctbal").alias("band"),
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
    )
    blocked = (
        a.join(F.broadcast(b), ["nk", "band"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.levenshtein("name_a", "name_b", 2) >= 0)
        )
        .select("id_a", "id_b")
    )
    hit = blocked.join(
        snb.withColumn("__hit", F.lit(1)), ["id_a", "id_b"], "left"
    )
    return hit.agg(
        F.count(F.lit(1)).cast("bigint").alias("nation_links"),
        F.count("__hit").cast("bigint").alias("snb_found"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.round(F.count("__hit") / F.count(F.lit(1)), 4),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("pairs_completeness"),
    )


@register(
    "snb_sampled_recall",
    oracle=f"""
WITH st AS (
    SELECT c_nationkey AS nk, c_custkey // {SNB_STRATUM_SIZE} AS kb,
           count(*) AS c,
           CAST((count(*) * (count(*) - 1)) // 2 AS BIGINT) AS pairs
    FROM customer GROUP BY 1, 2
),
sel AS (
    SELECT nk, kb FROM (
        SELECT nk, kb, pairs,
               sum(pairs) OVER (ORDER BY pairs, nk, kb) AS cum,
               sum(c) OVER (ORDER BY pairs, nk, kb) AS cum_rows,
               row_number() OVER (ORDER BY pairs, nk, kb) AS rn
        FROM st
    ) WHERE (cum <= {SNB_SAMPLE_BUDGET}
             AND cum_rows <= {SNB_SAMPLE_ROW_BUDGET})
         OR rn = 1
),
r AS ({_SNB_RANKED}),
snb AS (
    SELECT least(a.c_custkey, b.c_custkey) AS id_a,
           greatest(a.c_custkey, b.c_custkey) AS id_b
    FROM r a JOIN r b
      ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNB_WINDOW - 1}
),
blocked AS (
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_custkey // {SNB_STRATUM_SIZE} = b.c_custkey // {SNB_STRATUM_SIZE}
     AND a.c_custkey < b.c_custkey
    JOIN sel s
      ON s.nk = a.c_nationkey AND s.kb = a.c_custkey // {SNB_STRATUM_SIZE}
    WHERE (CASE WHEN levenshtein(a.c_name, b.c_name) <= 2
                THEN {_FS_W['name'][0]} ELSE {_FS_W['name'][1]} END)
        + (CASE WHEN a.c_mktsegment = b.c_mktsegment
                THEN {_FS_W['segment'][0]} ELSE {_FS_W['segment'][1]} END)
        + (CASE WHEN floor(a.c_acctbal / 500) = floor(b.c_acctbal / 500)
                THEN {_FS_W['balance'][0]} ELSE {_FS_W['balance'][1]} END)
        >= {_FS_THRESHOLD}
)
SELECT CAST((SELECT count(*) FROM sel) AS BIGINT) AS sampled_strata,
       CAST(count(*) AS BIGINT) AS nation_links,
       CAST(count(s.id_a) AS BIGINT) AS snb_found,
       CASE WHEN count(*) > 0
            THEN round(count(s.id_a) * 1.0 / count(*), 4)
       END AS pairs_completeness
FROM blocked k
LEFT JOIN snb s ON k.id_a = s.id_a AND k.id_b = s.id_b
""",
)
def snb_sampled_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs-completeness of sorted-neighborhood blocking on a
    BUDGET-BOUNDED stratified sample — the scale path
    ``snb_window_recall``'s guard names, implemented with strata that
    are size-bounded BY CONSTRUCTION: a stratum is a (nation,
    ``SNB_STRATUM_SIZE``-customer kiloblock) cell, so no stratum can
    ever bound more than k·(k−1)/2 ≈ 500k pairs regardless of corpus
    size, and the stratum COUNT grows with the data instead of the
    stratum size (the flaw a first nation-grain design had: its
    admit-the-smallest-block fallback silently re-grew n²/625 — the
    round-10 10× run measured it at 39s before this fix). Strata are
    admitted greedily (smallest exhaustive-pair bound first, (nk, kb)
    tiebreak) while the cumulative bound fits ``SNB_SAMPLE_BUDGET``;
    at least one always fits, so the metric never refuses and its
    denominator work is ≤ budget at ANY corpus size — no fail-fast
    guard needed, unlike the full-population metric
    (``snb_window_recall``, guarded). The custkey kiloblock is
    independent of every linkage attribute (a synthetic id), so
    within-stratum links are an unbiased pair sample of within-nation
    links and per-stratum completeness estimates the population
    metric — the standard evaluation protocol for blocking at corpus
    scale.

    Admission is additionally ROW-co-budgeted (VERDICT r10 what's-
    wrong #1): the pair budget admits zero-pair singleton strata for
    free, so without a row cap a pathologically fragmented corpus
    could inflate the broadcast sampled side unboundedly in rows while
    staying at 0 cumulative pairs. Both cumulative bounds ride the
    same window pass.

    Scale shape: stratum admission is fully DISTRIBUTED (VERDICT r10
    #1 — the former driver-side collect+sort of the corpus-growing
    stratum frame is gone): the greedy prefix is one cumulative-sum
    window over the aggregated stratum frame — exactly the
    ``sum(pairs) OVER (ORDER BY pairs, nk, kb)`` its DuckDB oracle
    runs. That window is single-task by construction, which is
    acceptable because its input is the post-aggregation stratum frame
    (n/1000 rows — three orders of magnitude below the corpus, ~10⁷
    rows of 4 longs at 100 TB) and it never touches the driver. The
    admitted keys then broadcast into a semi-join, bounded ≤
    ``SNB_SAMPLE_ROW_BUDGET`` customer rows by the co-budget; the
    denominator join runs only inside admitted strata (keyed on
    (nation, kiloblock) — never a whole nation); the SNB candidate
    side is the linear window generator over the full corpus,
    unchanged."""
    customer = table(spark, sf_dir, "customer")
    kb = F.expr(f"c_custkey DIV {SNB_STRATUM_SIZE}")
    st = (
        customer.groupBy(
            F.col("c_nationkey").alias("nk"), kb.alias("kb")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "nk",
            "kb",
            "c",
            F.expr("CAST((c * (c - 1)) DIV 2 AS BIGINT)").alias("pairs"),
        )
    )
    # greedy prefix admission as ONE cumulative-sum window over the
    # model-sized stratum frame — the identical expression the oracle
    # runs (default RANGE frame == ROWS here: (pairs, nk, kb) is a
    # total order). rn = 1 guarantees at least one stratum always fits.
    adm = Window.orderBy("pairs", "nk", "kb")
    sel_df = (
        st.select(
            F.col("nk").alias("sel_nk"),
            F.col("kb").alias("sel_kb"),
            F.sum("pairs").over(adm).alias("cum"),
            F.sum("c").over(adm).alias("cum_rows"),
            F.row_number().over(adm).alias("rn"),
        )
        .filter(
            (
                (F.col("cum") <= SNB_SAMPLE_BUDGET)
                & (F.col("cum_rows") <= SNB_SAMPLE_ROW_BUDGET)
            )
            | (F.col("rn") == 1)
        )
        .select("sel_nk", "sel_kb")
    )
    # candidate IDS only — see snb_window_recall (the scoring joins are
    # cardinality-preserving and their columns dropped; r12 opt).
    # r13: pass-1 rows of the shared memo (see _build_snb_cands).
    snb = (
        snb_cands_frame(spark, sf_dir)
        .filter(F.col("p1") == 1)
        .select("id_a", "id_b")
    )
    band = lambda c: F.floor(F.col(c) / 500)  # noqa: E731
    sampled = customer.withColumn("kb", kb).join(
        F.broadcast(sel_df),
        (F.col("c_nationkey") == F.col("sel_nk"))
        & (F.col("kb") == F.col("sel_kb")),
        "left_semi",
    )
    # score >= threshold <=> band AND name agreement (proven at import
    # by queries_relational20._fs_links_are_band_and_name): the band
    # joins as an extra equi-key, levenshtein only on band survivors
    a = sampled.select(
        F.col("c_nationkey").alias("nk"),
        F.col("kb"),
        band("c_acctbal").alias("band"),
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
    )
    b = sampled.select(
        F.col("c_nationkey").alias("nk"),
        F.col("kb"),
        band("c_acctbal").alias("band"),
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
    )
    blocked = (
        a.join(F.broadcast(b), ["nk", "kb", "band"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.levenshtein("name_a", "name_b", 2) >= 0)
        )
        .select("id_a", "id_b")
    )
    hit = blocked.join(
        snb.withColumn("__hit", F.lit(1)), ["id_a", "id_b"], "left"
    )
    # sampled_strata stays distributed too: a 1-row count of the
    # admitted-key frame cross-joined onto the 1-row metric aggregate
    # (the oracle's scalar subquery, Spark-side).
    n_sel = sel_df.agg(
        F.count(F.lit(1)).cast("bigint").alias("sampled_strata")
    )
    return n_sel.crossJoin(
        hit.agg(
            F.count(F.lit(1)).cast("bigint").alias("nation_links"),
            F.count("__hit").cast("bigint").alias("snb_found"),
            F.when(
                F.count(F.lit(1)) > 0,
                F.round(F.count("__hit") / F.count(F.lit(1)), 4),
            )
            .otherwise(F.lit(None).cast("double"))
            .alias("pairs_completeness"),
        )
    ).select(
        "sampled_strata", "nation_links", "snb_found", "pairs_completeness"
    )


#: initial Fellegi-Sunter EM parameters (published starting point for
#: the E-step): per-field match probabilities m (P(agree | true match)),
#: non-match probabilities u (P(agree | non-match), set near each
#: field's random-agreement rate), and the match prior p. Literals on
#: both engines, so the posterior arithmetic is a fixed expression
#: tree over BIGINT pattern counts — bit-identical across engines.
FS_EM_M = {"name": 0.95, "segment": 0.7, "balance": 0.8}
FS_EM_U = {"name": 0.02, "segment": 0.25, "balance": 0.05}
FS_EM_P = 0.05


def _fs_em_posterior_sql(gn: str, gs: str, gb: str) -> str:
    """E-step posterior P(match | pattern) as ANSI SQL over three
    boolean agreement columns — the SAME string feeds DuckDB and
    Spark's F.expr, so both engines fold the identical IEEE tree.
    Every literal is CAST to DOUBLE: DuckDB otherwise parses 0.95 as
    DECIMAL and the six-factor product overflows scale 38."""

    def d(x: float) -> str:
        return f"CAST({x} AS DOUBLE)"

    a = (
        f"(CASE WHEN {gn} THEN {d(FS_EM_M['name'])} ELSE {d(1 - FS_EM_M['name'])} END)"
        f" * (CASE WHEN {gs} THEN {d(FS_EM_M['segment'])} ELSE {d(1 - FS_EM_M['segment'])} END)"
        f" * (CASE WHEN {gb} THEN {d(FS_EM_M['balance'])} ELSE {d(1 - FS_EM_M['balance'])} END)"
    )
    b = (
        f"(CASE WHEN {gn} THEN {d(FS_EM_U['name'])} ELSE {d(1 - FS_EM_U['name'])} END)"
        f" * (CASE WHEN {gs} THEN {d(FS_EM_U['segment'])} ELSE {d(1 - FS_EM_U['segment'])} END)"
        f" * (CASE WHEN {gb} THEN {d(FS_EM_U['balance'])} ELSE {d(1 - FS_EM_U['balance'])} END)"
    )
    return (
        f"round(({d(FS_EM_P)} * {a}) / "
        f"(({d(FS_EM_P)} * {a}) + ({d(1 - FS_EM_P)} * {b})), 6)"
    )


@register(
    "fs_em_posteriors",
    oracle=f"""
WITH r AS ({_SNB_RANKED}),
p AS (
    SELECT (levenshtein(a.c_name, b.c_name) <= 2) AS agree_name,
           (a.c_mktsegment = b.c_mktsegment) AS agree_segment,
           (a.band = b.band) AS agree_balance
    FROM r a JOIN r b
      ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNB_WINDOW - 1}
)
SELECT agree_name, agree_segment, agree_balance,
       CAST(count(*) AS BIGINT) AS n_pairs,
       {_fs_em_posterior_sql('agree_name', 'agree_segment', 'agree_balance')}
           AS match_posterior
FROM p
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
)
def fs_em_posteriors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter EM calibration table: the E-step posterior
    P(match | agreement pattern) for every observed pattern of the
    three evidence fields, with the pattern's candidate count — the
    decision table probabilistic linkage actually thresholds, and the
    quantity EM iterates to learn the m/u weights the integer-weight
    queries hard-code (their docstrings' "EM-estimated m/u
    probabilities" now has its computation in the catalog). Candidates
    come from the LINEAR sorted-neighborhood generator, so the
    calibration pass inherits the scale path, not the nation block's
    n²/25.

    Determinism contract: the posterior is a fixed scalar expression
    over the boolean pattern (published literal m/u/p initials folded
    in the SAME tree shape on both engines — no float aggregation
    anywhere), and counts are exact BIGINTs, so the 8-row table is
    bit-stable. The M-step (re-estimating m/u from these posteriors ×
    counts) is 8-row model-grain arithmetic done driver-side in
    production, exactly like centroid updates — one multiply-sum over
    this table.

    Scale shape: the one aggregation is a 3-boolean groupBy (8 groups,
    map-side combined); everything upstream is the SNB candidate
    pipeline measured linear in SCALING.md round-10."""
    pairs = _snb_scored_pairs(spark, sf_dir)
    post = F.expr(
        _fs_em_posterior_sql("agree_name", "agree_segment", "agree_balance")
    )
    return (
        pairs.groupBy("agree_name", "agree_segment", "agree_balance")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .withColumn("match_posterior", post)
        .orderBy("agree_name", "agree_segment", "agree_balance")
    )


# ---------------------------------------------------------------------------
# Round-11 additions (VERDICT r10 #2/#3): the EM loop's M-step, iterated
# to a fixed depth with a full DuckDB oracle, and the recall measurement
# for the canonicalized (reversed-key) third SNB pass.
# ---------------------------------------------------------------------------

#: fixed EM iteration depth for ``fs_em_mstep``: deep enough that the
#: trajectory visibly converges on every tested corpus (successive
#: parameter deltas shrink monotonically), small enough that the
#: unrolled oracle stays readable. Deterministic by construction — a
#: literal-seeded recurrence, never a data-dependent stopping rule.
FS_EM_ITERS = 5

#: all 8 agreement patterns in one FIXED written order — every
#: generated sum below iterates this list, so the float expression
#: TREES are identical character-for-character on both engines (the
#: bit-stability contract of ``fs_em_posteriors`` extended to sums:
#: no engine ever aggregates floats in its own order, the "sum" is a
#: written-out 8-term addition over conditional-count columns).
_EM_PATTERNS = [
    (n, s, b) for n in (0, 1) for s in (0, 1) for b in (0, 1)
]


def _em_col(n: int, s: int, b: int) -> str:
    return f"n{n}{s}{b}"


def _em_count_exprs() -> list[str]:
    """Conditional-count select list: one exact BIGINT per agreement
    pattern (integer sums are accumulation-order-independent, so this
    is the only aggregation the EM loop ever runs over data)."""
    out = []
    for n, s, b in _EM_PATTERNS:
        cn = "agree_name" if n else "NOT agree_name"
        cs = "agree_segment" if s else "NOT agree_segment"
        cb = "agree_balance" if b else "NOT agree_balance"
        out.append(
            f"CAST(sum(CASE WHEN {cn} AND {cs} AND {cb} THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS {_em_col(n, s, b)}"
        )
    return out


def _em_post_expr(n: int, s: int, b: int, isuf: str = "") -> str:
    """E-step posterior for one pattern, in terms of the CURRENT
    parameter columns (p, m_*, u_*) — same guarded-ratio shape as
    ``_fs_em_posterior_sql`` but over columns instead of literals.
    ``isuf`` suffixes the input parameter column names (the Spark plan
    keeps every iteration's parameters side-by-side in ONE projection
    chain — see ``fs_em_mstep`` — while the oracle's CTE chain shadows
    unsuffixed names; pure renaming, the IEEE tree is identical)."""

    def t(col: str, bit: int) -> str:
        col = f"{col}{isuf}"
        return col if bit else f"(CAST(1.0 AS DOUBLE) - {col})"

    a = f"({t('m_name', n)} * {t('m_segment', s)} * {t('m_balance', b)})"
    u = f"({t('u_name', n)} * {t('u_segment', s)} * {t('u_balance', b)})"
    den = f"((p{isuf} * {a}) + ((CAST(1.0 AS DOUBLE) - p{isuf}) * {u}))"
    return f"(CASE WHEN {den} > 0 THEN (p{isuf} * {a}) / {den} END)"


def _em_s_expr(psuf: str = "") -> str:
    """Expected match mass: Σ n_pattern · posterior, written out in
    the fixed pattern order (8 explicit terms, no float aggregate)."""
    return " + ".join(
        f"({_em_col(n, s, b)} * post{n}{s}{b}{psuf})"
        for n, s, b in _EM_PATTERNS
    )


def _em_n_expr() -> str:
    return (
        "CAST("
        + " + ".join(_em_col(n, s, b) for n, s, b in _EM_PATTERNS)
        + " AS DOUBLE)"
    )


def _em_step_exprs(
    psuf: str = "", s_col: str = "s", osuf: str = ""
) -> list[str]:
    """M-step re-estimation select list, in terms of the posterior
    columns (post###, suffixed ``psuf``), the pattern counts (n###),
    the expected match mass ``s_col`` and the double total ``ntot``;
    outputs aliased with ``osuf``. Every data-dependent denominator is
    CASE-guarded (both engines, identical tree)."""

    def mass(field: int, agree_bit: int, matched: bool) -> str:
        terms = []
        for n, s, b in _EM_PATTERNS:
            if (n, s, b)[field] != agree_bit:
                continue
            w = (
                f"post{n}{s}{b}{psuf}"
                if matched
                else f"(CAST(1.0 AS DOUBLE) - post{n}{s}{b}{psuf})"
            )
            terms.append(f"({_em_col(n, s, b)} * {w})")
        return " + ".join(terms)

    out = [
        f"CASE WHEN ntot > 0 THEN {s_col} / ntot END AS p{osuf}"
    ]
    for field, fname in ((0, "name"), (1, "segment"), (2, "balance")):
        out.append(
            f"CASE WHEN {s_col} > 0 THEN ({mass(field, 1, True)})"
            f" / {s_col} END AS m_{fname}{osuf}"
        )
    for field, fname in ((0, "name"), (1, "segment"), (2, "balance")):
        out.append(
            f"CASE WHEN (ntot - {s_col}) > 0 THEN ({mass(field, 1, False)})"
            f" / (ntot - {s_col}) END AS u_{fname}{osuf}"
        )
    return out


_EM_PARAM_COLS = [
    "p", "m_name", "m_segment", "m_balance",
    "u_name", "u_segment", "u_balance",
]

def _em_init_exprs(osuf: str = "") -> list[str]:
    return [
        f"CAST({FS_EM_P} AS DOUBLE) AS p{osuf}",
        f"CAST({FS_EM_M['name']} AS DOUBLE) AS m_name{osuf}",
        f"CAST({FS_EM_M['segment']} AS DOUBLE) AS m_segment{osuf}",
        f"CAST({FS_EM_M['balance']} AS DOUBLE) AS m_balance{osuf}",
        f"CAST({FS_EM_U['name']} AS DOUBLE) AS u_name{osuf}",
        f"CAST({FS_EM_U['segment']} AS DOUBLE) AS u_segment{osuf}",
        f"CAST({FS_EM_U['balance']} AS DOUBLE) AS u_balance{osuf}",
    ]


_EM_INIT_EXPRS = _em_init_exprs()


_EM_SINGLEPASS_PR = f"""WITH r AS ({_SNB_RANKED}),
pr AS (
    SELECT (levenshtein(a.c_name, b.c_name) <= 2) AS agree_name,
           (a.c_mktsegment = b.c_mktsegment) AS agree_segment,
           (a.band = b.band) AS agree_balance
    FROM r a JOIN r b
      ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNB_WINDOW - 1}
)"""

_EM_MULTIPASS_PR = f"""WITH r1 AS (
    SELECT c_custkey, row_number() OVER (ORDER BY c_name, c_custkey) AS rn
    FROM customer
),
r2 AS (
    SELECT c_custkey, row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rn
    FROM customer
),
r3 AS (
    SELECT c_custkey,
           row_number() OVER (ORDER BY reverse(c_name), c_custkey) AS rn
    FROM customer
),
cand AS (
    SELECT DISTINCT id_a, id_b FROM (
        SELECT least(a.c_custkey, b.c_custkey) AS id_a,
               greatest(a.c_custkey, b.c_custkey) AS id_b
        FROM r1 a JOIN r1 b
          ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNB_WINDOW - 1}
        UNION ALL
        SELECT least(a.c_custkey, b.c_custkey) AS id_a,
               greatest(a.c_custkey, b.c_custkey) AS id_b
        FROM r2 a JOIN r2 b
          ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNB_WINDOW - 1}
        UNION ALL
        SELECT least(a.c_custkey, b.c_custkey) AS id_a,
               greatest(a.c_custkey, b.c_custkey) AS id_b
        FROM r3 a JOIN r3 b
          ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNB_WINDOW - 1}
    )
),
pr AS (
    SELECT (levenshtein(x.c_name, y.c_name) <= 2) AS agree_name,
           (x.c_mktsegment = y.c_mktsegment) AS agree_segment,
           (floor(x.c_acctbal / 500) = floor(y.c_acctbal / 500)) AS agree_balance
    FROM cand c
    JOIN customer x ON c.id_a = x.c_custkey
    JOIN customer y ON c.id_b = y.c_custkey
)"""


def _fs_em_mstep_oracle(
    pr_sql: str = _EM_SINGLEPASS_PR, iters: int | None = None
) -> str:
    """Unrolled-K EM oracle: the same generated expression strings the
    Spark plan feeds to F.expr, chained through CTEs i0 → iK.
    ``pr_sql`` supplies the candidate CTE chain ending in ``pr`` (the
    3-boolean agreement frame) — single-pass SNB by default, the
    multipass union for ``fs_em_mstep_multipass``; ``iters`` overrides
    the unroll depth (default FS_EM_ITERS)."""
    iters = FS_EM_ITERS if iters is None else iters
    count_cols = ", ".join(_em_col(n, s, b) for n, s, b in _EM_PATTERNS)
    counts = ",\n           ".join(_em_count_exprs())
    inits = ",\n           ".join(_EM_INIT_EXPRS)
    parts = [
        f"""{pr_sql},
em_counts AS (
    SELECT {counts}
    FROM pr
),
i0 AS (
    SELECT CAST(0 AS BIGINT) AS iter,
           {inits},
           {count_cols}
    FROM em_counts
),""",
    ]
    posts = ",\n           ".join(
        f"{_em_post_expr(n, s, b)} AS post{n}{s}{b}"
        for n, s, b in _EM_PATTERNS
    )
    steps = ",\n           ".join(_em_step_exprs())
    for k in range(1, iters + 1):
        parts.append(
            f"""p{k} AS (
    SELECT *, {posts}
    FROM i{k - 1}
),
s{k} AS (
    SELECT *, {_em_s_expr()} AS s, {_em_n_expr()} AS ntot FROM p{k}
),
i{k} AS (
    SELECT CAST({k} AS BIGINT) AS iter,
           {steps},
           {count_cols}
    FROM s{k}
),"""
        )
    sel = ", ".join(_EM_PARAM_COLS)
    union = "\n    UNION ALL\n    ".join(
        f"SELECT iter, {sel} FROM i{k}" for k in range(iters + 1)
    )
    rounded = ", ".join(f"round({c}, 6) AS {c}" for c in _EM_PARAM_COLS)
    parts.append(
        f"""t AS (
    {union}
)
SELECT iter, {rounded}
FROM t
ORDER BY iter"""
    )
    return "\n".join(parts)


#: shared delta/flag expression STRINGS (fed verbatim to F.expr AND the
#: DuckDB oracle, the established bit-stability pattern): the deltas
#: subtract UNROUNDED binary64 trajectory values in a fixed argument
#: order, and the convergence flag compares the 6-decimal ROUNDED
#: parameters — the exact sense in which "6-decimal fixed point at iter
#: K" is claimed in fs_em_mstep_multipass's depth note.
_EM_CONV_DELTA = "greatest(" + ", ".join(
    f"abs({c} - {c}_prev)" for c in _EM_PARAM_COLS
) + ")"
_EM_CONV_FLAG = (
    "CASE WHEN "
    + " AND ".join(
        f"round({c}, 6) = round({c}_prev, 6)" for c in _EM_PARAM_COLS
    )
    + " THEN TRUE ELSE FALSE END"
)


def _fs_em_convergence_oracle(pr_sql: str, iters: int) -> str:
    """Convergence-diagnostic oracle: the SAME unrolled trajectory
    CTEs as :func:`_fs_em_mstep_oracle`, then a one-step self-join
    (iter vs iter−1) computing the per-iteration max absolute
    parameter delta and the rounded-fixed-point flag — both via the
    shared expression strings above."""
    traj = _fs_em_mstep_oracle(pr_sql, iters)
    # reuse the full mstep oracle's CTE chain; swap only its final
    # SELECT (the rounded presentation projection) for the delta join
    ctes, _, _ = traj.rpartition("SELECT iter,")
    prev_cols = ", ".join(f"{c} AS {c}_prev" for c in _EM_PARAM_COLS)
    cols = ", ".join(_EM_PARAM_COLS)
    return f"""{ctes}SELECT cur.iter AS iter,
       round({_EM_CONV_DELTA}, 6) AS max_abs_delta_6dp,
       {_EM_CONV_FLAG} AS converged_6dp
FROM (SELECT iter, {cols} FROM t) cur
JOIN (SELECT iter + 1 AS iter, {prev_cols} FROM t) prv
  ON cur.iter = prv.iter
ORDER BY iter"""


@register("fs_em_mstep", oracle=_fs_em_mstep_oracle())
def fs_em_mstep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Fellegi-Sunter EM loop — E-step AND M-step, iterated
    ``FS_EM_ITERS`` times from the published initials, one output row
    per iteration (iter 0 = the initials themselves). This closes
    VERDICT r10 missing #2: ``fs_em_posteriors`` computes only the
    E-step table, and the "EM-estimated m/u weights" every integer-
    weight linkage docstring cites now has its end-to-end computation
    in the catalog. Per iteration: posterior P(match | pattern) for
    each of the 8 agreement patterns under the CURRENT (m, u, p), then
    the standard re-estimates — p' = Σ n·post / N, m_f' = Σ_{agree_f}
    n·post / Σ n·post, u_f' = Σ_{agree_f} n·(1−post) / Σ n·(1−post) —
    a literal-seeded deterministic recurrence (Winkler 1988's EM for
    the FS model over pattern counts).

    Read the learned weights against their population: EM estimates
    the mixture over the CANDIDATE distribution it is fed — here the
    name-order SNB pairs, whose non-match class still mostly agrees on
    name because window neighbors are name-adjacent by construction
    (hence the learned u_name ≈ 0.95, versus the ~0.02 a random-pair
    sample would give). That is the standard caveat for EM over
    blocked candidates, not an artifact: production systems either
    feed multi-pass candidates (less single-key bias) or frequency-
    adjust u from corpus marginals; the computation below is identical
    in either case — only the count table changes.

    Determinism contract (the ``fs_em_posteriors`` contract extended
    to the loop): the ONLY aggregation over data is the exact BIGINT
    conditional count per pattern (integer addition — order-free);
    every float "sum" downstream is a written-out 8-term addition over
    those one-row columns, generated from the same Python string fed
    to BOTH engines (Spark via ``F.expr``, DuckDB via the unrolled-CTE
    oracle), so the IEEE trees are identical character-for-character
    and the trajectory is bit-stable. Every data-dependent denominator
    is CASE-guarded on both engines.

    Scale shape: one linear SNB candidate pass + one 8-group
    conditional aggregate (map-side combined) touches the data ONCE;
    the K iterations are pure expression chains over a 1-row frame —
    Catalyst folds them into a handful of projections, no joins, no
    shuffles, no driver round-trips, cost independent of corpus size.
    This is the right cluster shape for EM over pattern counts: the
    sufficient statistics are 8 integers, so iteration happens at
    model grain, exactly like centroid updates."""
    return _em_trajectory(_snb_scored_pairs(spark, sf_dir))


def _em_trajectory(pairs: DataFrame, iters: int | None = None) -> DataFrame:
    """The EM iteration chain over any 3-boolean agreement frame: ONE
    aggregation over data (the 8 exact pattern counts), then every
    iteration lives side-by-side (suffixed columns) in a single
    widening projection chain over the 1-row frame. A per-iteration
    unionByName would instead plant K+1 copies of the whole candidate
    pipeline in the physical plan (the plan-budget ledger caught
    exactly that: 42 shuffles); this shape re-reads nothing — same
    shuffle count as fs_em_posteriors. Shared by ``fs_em_mstep``
    (single-pass candidates) and ``fs_em_mstep_multipass`` (3-arm
    union candidates); ``iters`` overrides the depth.

    Depth bound: CollapseProject folds the whole chain into one
    Project whose expression tree grows EXPONENTIALLY with depth
    (posteriors feed s feeds seven ratios feed eight posteriors...),
    and past ~6 iterations janino hits the JVM's 64 KB method limit —
    Spark then burns ~20s on the failed compile before falling back to
    interpreted eval (measured on the K=18 multipass draft: 25s flat
    at BOTH 1× and 10×, pure fixed cost; persist-barrier segmentation
    only traded compile cost for per-segment materialization jobs,
    12–17s). Keep in-plan unrolls at FS_EM_ITERS-scale; deeper loops
    belong on the driver over the collected sufficient statistics —
    see :func:`_em_trajectory_driver`."""
    iters = FS_EM_ITERS if iters is None else iters
    cur = pairs.agg(*[F.expr(e) for e in _em_count_exprs()]).select(
        "*",
        *[F.expr(e) for e in _em_init_exprs("_0")],
        F.expr(_em_n_expr()).alias("ntot"),
    )
    for k in range(1, iters + 1):
        cur = cur.select(
            "*",
            *[
                F.expr(_em_post_expr(n, s, b, isuf=f"_{k - 1}")).alias(
                    f"post{n}{s}{b}_{k}"
                )
                for n, s, b in _EM_PATTERNS
            ],
        )
        cur = cur.select(
            "*", F.expr(_em_s_expr(psuf=f"_{k}")).alias(f"s_{k}")
        )
        cur = cur.select(
            "*",
            *[
                F.expr(e)
                for e in _em_step_exprs(
                    psuf=f"_{k}", s_col=f"s_{k}", osuf=f"_{k}"
                )
            ],
        )
    rows = F.inline(
        F.array(
            *[
                F.struct(
                    F.expr(f"CAST({k} AS BIGINT)").alias("iter"),
                    *[
                        F.col(f"{c}_{k}").alias(c)
                        for c in _EM_PARAM_COLS
                    ],
                )
                for k in range(iters + 1)
            ]
        )
    )
    return (
        cur.select(rows)
        .select(
            "iter",
            *[F.expr(f"round({c}, 6)").alias(c) for c in _EM_PARAM_COLS],
        )
        .orderBy("iter")
    )


def _em_trajectory_driver(
    spark: SparkSession, pairs: DataFrame, iters: int
) -> DataFrame:
    """The EM recurrence iterated on the DRIVER over the collected
    sufficient statistics — the production shape the E-step docstring
    names ("8-row model-grain arithmetic done driver-side, exactly
    like centroid updates"), and the right one for deep unrolls: the
    in-plan chain hits janino's 64 KB method limit past ~6 iterations
    (see :func:`_em_trajectory`), while here Spark does the ONE data
    pass (the exact BIGINT pattern counts) and the iteration is eight
    integers × K — zero additional jobs, zero compile cost, identical
    at any depth.

    Bit-faithfulness contract: every float operation below mirrors the
    generated SQL expression tree NODE FOR NODE in the same
    left-associative order (Python floats and JVM/DuckDB doubles are
    all IEEE-754 binary64 with round-to-nearest-even per op, and the
    counts are < 2^53 so int→double conversions are exact), so the
    trajectory is bit-identical to the unrolled-CTE oracle — the same
    guarantee the in-plan chain gives, verified by the same
    hash-compare harness. Rounding stays IN SPARK (the final
    ``round(x, 6)`` projection), so presentation semantics are the
    engine's, not Python's."""
    out = _em_trajectory_rows(pairs, iters)
    traj = spark.createDataFrame(
        out,
        "iter bigint, p double, m_name double, m_segment double, "
        "m_balance double, u_name double, u_segment double, "
        "u_balance double",
    )
    return traj.select(
        "iter",
        *[F.expr(f"round({c}, 6)").alias(c) for c in _EM_PARAM_COLS],
    ).orderBy("iter")


def _em_trajectory_rows(pairs: DataFrame, iters: int) -> list[tuple]:
    """The driver-side EM recurrence shared by the trajectory queries
    and the convergence diagnostic: ONE exact-BIGINT count aggregate
    over ``pairs`` (the only data pass), then the iteration over eight
    integers × K on the driver. Returns the UNROUNDED binary64
    trajectory as (iter, p, m_name, m_segment, m_balance, u_name,
    u_segment, u_balance) tuples — presentation rounding stays with
    the callers, in Spark (see the bit-faithfulness contract in
    :func:`_em_trajectory_driver`)."""
    row = pairs.agg(*[F.expr(e) for e in _em_count_exprs()]).collect()[0]
    cnt = {pat: row[_em_col(*pat)] for pat in _EM_PATTERNS}

    def pick(m: dict, field_bit: int, bit: int) -> float:
        # mirrors _em_post_expr's t(): col if bit else (1.0 - col)
        keys = ["name", "segment", "balance"]
        v = m[keys[field_bit]]
        return v if bit else 1.0 - v

    p = FS_EM_P
    m = dict(FS_EM_M)
    u = dict(FS_EM_U)
    out = [(0, p, m["name"], m["segment"], m["balance"],
            u["name"], u["segment"], u["balance"])]
    # sum() over ZERO rows is SQL NULL, so an empty candidate frame
    # yields None counts — fold that into the same degenerate path as a
    # zero denominator (ADVICE r11 #1) instead of crashing on float(None)
    null_counts = any(cnt[pat] is None for pat in _EM_PATTERNS)
    ntot = (
        None if null_counts
        else float(sum(cnt[pat] for pat in _EM_PATTERNS))
    )
    for k in range(1, iters + 1):
        # NULL-propagation mirror (ADVICE r11 #1): the CASE-guarded SQL
        # oracle turns a zero denominator (or ntot==0 on a degenerate
        # corpus) into NULL, and NULL then absorbs every downstream
        # product/sum/CASE — `s > 0` is NULL, so every later iteration
        # is all-NULL. Mirror that fixpoint by short-circuiting instead
        # of letting None reach float arithmetic (TypeError).
        degenerate = (
            null_counts
            or p is None
            or any(v is None for v in m.values())
            or any(v is None for v in u.values())
        )
        if not degenerate:
            posts = {}
            for n_, s_, b_ in _EM_PATTERNS:
                a = pick(m, 0, n_) * pick(m, 1, s_) * pick(m, 2, b_)
                uu = pick(u, 0, n_) * pick(u, 1, s_) * pick(u, 2, b_)
                den = (p * a) + ((1.0 - p) * uu)
                posts[(n_, s_, b_)] = (p * a) / den if den > 0 else None
            # in SQL even 0 * NULL is NULL, so ONE NULL posterior nulls
            # the fixed-order sums regardless of its count weight
            degenerate = any(v is None for v in posts.values())
        if degenerate:
            p = None
            m = {f: None for f in ("name", "segment", "balance")}
            u = {f: None for f in ("name", "segment", "balance")}
            out.append((k, None, None, None, None, None, None, None))
            continue
        s = 0.0
        for pat in _EM_PATTERNS:  # fixed written order, left-assoc
            s = s + (cnt[pat] * posts[pat])
        p = s / ntot if ntot > 0 else None
        new_m, new_u = {}, {}
        for field_bit, fname in ((0, "name"), (1, "segment"), (2, "balance")):
            mm = 0.0
            for pat in _EM_PATTERNS:
                if pat[field_bit] == 1:
                    mm = mm + (cnt[pat] * posts[pat])
            new_m[fname] = mm / s if s > 0 else None
            um = 0.0
            for pat in _EM_PATTERNS:
                if pat[field_bit] == 1:
                    um = um + (cnt[pat] * (1.0 - posts[pat]))
            new_u[fname] = um / (ntot - s) if (ntot - s) > 0 else None
        m, u = new_m, new_u
        out.append((k, p, m["name"], m["segment"], m["balance"],
                    u["name"], u["segment"], u["balance"]))
    return out


def _multipass_cand_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-arm multipass candidate union (name, balance,
    reversed-name orders), deduped — shared by the recovery metric and
    the multipass EM calibration. r13: reads the shared flagged memo
    (every row is a distinct union member by construction — the memo's
    groupBy IS the dedup; see :func:`_build_snb_cands`) instead of
    rebuilding three ranked passes per caller."""
    return snb_cands_frame(spark, sf_dir).select("id_a", "id_b")


#: unroll depth for the MULTIPASS EM variant: its candidate mixture
#: is farther from the initials (three heterogeneous arms), so the
#: recurrence converges slower than the single-pass table. Measured
#: 6-decimal fixed points: iter 17 at sf0.1 (the bench corpus — 18
#: lands the final rows ON it), iter 24 at sf0.01, not yet by 30 at
#: the 150-row sf0.001 (tiny mixtures mix slowly; the trajectory is
#: still monotone-converging there). Iterations are 1-row projection
#: chains, so depth costs plan size, never data passes.
FS_EM_ITERS_MULTIPASS = 18


@register(
    "fs_em_mstep_multipass",
    oracle=_fs_em_mstep_oracle(_EM_MULTIPASS_PR, FS_EM_ITERS_MULTIPASS),
)
def fs_em_mstep_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EM loop of ``fs_em_mstep`` over the MULTIPASS (3-arm union)
    candidate distribution — the less-single-key-biased sample that
    query's docstring caveat names. Under name-order candidates alone,
    the learned u_name saturates near 0.95 (window neighbors are
    name-adjacent by construction, so even non-matches mostly agree on
    name); the balance- and reversed-key arms contribute candidate
    pairs whose names genuinely differ, pulling the learned u_name
    toward its population value and giving the name field back its
    discriminating weight. Same recurrence, same bit-stability
    contract (one exact-BIGINT count aggregate, shared expression
    strings, unrolled-K oracle) — only the count table changes, which
    is exactly the point the caveat makes. The unroll is deeper
    (``FS_EM_ITERS_MULTIPASS`` = 18): this mixture converges slower,
    and 18 iterations land the trajectory on its measured 6-decimal
    fixed point at the sf0.1 bench corpus (stable from iter 17 on),
    so there the final row IS the converged weight set; smaller
    corpora mix slower (sf0.01 fixes at iter 24) and read the tail as
    near-converged.

    Scale shape: the multipass candidate union (3 linear generators +
    one candidate-grain dedup shuffle) + one 8-group conditional
    aggregate — that is the ONLY data pass. The 18 iterations run on
    the driver over the eight collected BIGINTs
    (:func:`_em_trajectory_driver` — the centroid-update shape): the
    in-plan expression chain is the right tool at FS_EM_ITERS depth
    but hits janino's 64 KB method limit at this one (measured 25s of
    pure failed-compile cost), while eight integers × 18 iterations is
    microseconds anywhere. Bit-stability is preserved because the
    driver loop mirrors the oracle's expression tree node for node
    (IEEE-754 binary64 on every engine) and rounding stays in Spark."""
    customer = table(spark, sf_dir, "customer")
    pairs = _fs_score_candidates(
        _multipass_cand_ids(spark, sf_dir), customer
    )
    return _em_trajectory_driver(spark, pairs, FS_EM_ITERS_MULTIPASS)


#: depth for the convergence DIAGNOSTIC: deliberately past every
#: measured multipass fixed point (iter 17 at sf0.1, 24 at sf0.01) so
#: the query EXHIBITS the fixed point — converged_6dp flips to true and
#: stays true — rather than assuming it; at sf0.001 the same rows show
#: the not-yet-converged tail the FS_EM_ITERS_MULTIPASS note documents.
#: Depth is driver-side (eight integers × K), so 30 costs nothing.
FS_EM_CONV_ITERS = 30


@register(
    "fs_em_convergence",
    oracle=_fs_em_convergence_oracle(_EM_MULTIPASS_PR, FS_EM_CONV_ITERS),
)
def fs_em_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convergence diagnostic for the multipass EM recurrence (VERDICT
    r11 next #8): one row per iteration 1..K with the max absolute
    UNROUNDED parameter delta vs the previous iteration and a
    ``converged_6dp`` flag — true iff every 6-decimal ROUNDED parameter
    equals its predecessor, i.e. the exact sense in which
    ``fs_em_mstep_multipass`` claims "6-decimal fixed point at iter K".
    This makes the fixed-point claim oracle-checkable at ANY sf instead
    of resting on a hand-measured constant.

    Shape: the same single data pass as the trajectory queries (3-arm
    candidate union + one 8-group exact-BIGINT aggregate); the K=30
    recurrence runs driver-side over the eight collected counts
    (:func:`_em_trajectory_rows` — janino's 64 KB method limit rules
    out the in-plan unroll at this depth, measured in round 11). The
    delta/flag arithmetic then runs IN SPARK on the driver-built
    31-row trajectory frame via the shared expression strings
    ``_EM_CONV_DELTA`` / ``_EM_CONV_FLAG`` — identical text feeds the
    DuckDB oracle's unrolled-CTE self-join, so both engines fold the
    same IEEE tree over bit-identical inputs. The iter-vs-iter−1 join
    is model-grain (31 rows), broadcast by hint (LocalTableScan carries
    no size stats, so unhinted it planned a two-exchange SMJ)."""
    customer = table(spark, sf_dir, "customer")
    pairs = _fs_score_candidates(
        _multipass_cand_ids(spark, sf_dir), customer
    )
    out = _em_trajectory_rows(pairs, FS_EM_CONV_ITERS)
    traj = spark.createDataFrame(
        out,
        "iter bigint, p double, m_name double, m_segment double, "
        "m_balance double, u_name double, u_segment double, "
        "u_balance double",
    )
    prv = traj.select(
        (F.col("iter") + F.lit(1)).cast("bigint").alias("iter"),
        *[F.col(c).alias(f"{c}_prev") for c in _EM_PARAM_COLS],
    )
    return (
        traj.join(F.broadcast(prv), "iter")
        .select(
            "iter",
            F.expr(f"round({_EM_CONV_DELTA}, 6)").alias(
                "max_abs_delta_6dp"
            ),
            F.expr(_EM_CONV_FLAG).alias("converged_6dp"),
        )
        .orderBy("iter")
    )


@register(
    "fs_field_marginal_u",
    oracle=f"""
WITH m AS (
    SELECT 'balance' AS field,
           CAST(sum(c * (c - 1)) AS BIGINT) AS num,
           CAST(sum(c) AS BIGINT) AS n
    FROM (SELECT count(*) AS c FROM customer
          GROUP BY floor(c_acctbal / 500))
    UNION ALL
    SELECT 'name' AS field,
           CAST(sum(c * (c - 1)) AS BIGINT) AS num,
           CAST(sum(c) AS BIGINT) AS n
    FROM (SELECT count(*) AS c FROM customer GROUP BY c_name)
    UNION ALL
    SELECT 'segment' AS field,
           CAST(sum(c * (c - 1)) AS BIGINT) AS num,
           CAST(sum(c) AS BIGINT) AS n
    FROM (SELECT count(*) AS c FROM customer GROUP BY c_mktsegment)
)
SELECT field,
       CASE WHEN n > 1
            THEN round(CAST(num AS DOUBLE)
                       / CAST(n * (n - 1) AS DOUBLE), 6)
       END AS u_marginal
FROM m
ORDER BY field
""",
)
def fs_field_marginal_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter u-probabilities from corpus MARGINALS: for each
    evidence field, the probability that two RANDOM records agree
    exactly — Σ_v n_v·(n_v−1) / (N·(N−1)) over the field's value
    counts. This is the classic frequency-based alternative to EM for
    estimating u (the random-agreement rate; Fellegi & Sunter 1969
    §3.3 compute u from value frequencies exactly this way), and the
    companion the EM docstrings name for de-biasing u when the
    candidate distribution is blocked. On this corpus: u_segment ≈
    1/5 (five segments near-uniform), u_balance ≈ the band-collision
    rate, u_name = 0 at the exact-match grain (identifier names are
    unique) — which is WHY the integer-weight queries define name
    agreement at edit-distance ≤ 2 and estimate its u at pair grain
    (``fs_em_mstep``): a marginal can price exact collision only.

    Determinism: numerator and denominator are exact BIGINTs (integer
    sums — order-free); ONE division per field, rounded to 6, guarded
    for degenerate single-row corpora. Scale shape: three value-grain
    aggregates (map-side combined; value cardinality ≪ corpus), no
    joins, no windows — marginal statistics are the cheapest number in
    the linkage stack, which is why production systems compute them
    corpus-wide even when EM runs on a sample."""
    customer = table(spark, sf_dir, "customer")
    fields = [
        ("balance", F.floor(F.col("c_acctbal") / 500)),
        ("name", F.col("c_name")),
        ("segment", F.col("c_mktsegment")),
    ]
    parts = []
    for fname, expr in fields:
        vc = customer.groupBy(expr.alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        parts.append(
            vc.agg(
                F.expr("CAST(sum(c * (c - 1)) AS BIGINT)").alias("num"),
                F.expr("CAST(sum(c) AS BIGINT)").alias("n"),
            ).select(F.lit(fname).alias("field"), "num", "n")
        )
    m = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return m.select(
        "field",
        F.expr(
            "CASE WHEN n > 1 THEN round(CAST(num AS DOUBLE)"
            " / CAST(n * (n - 1) AS DOUBLE), 6) END"
        ).alias("u_marginal"),
    ).orderBy("field")


def _fs_link_where(x: str, y: str) -> str:
    """Inline Fellegi-Sunter link predicate over two customer aliases
    (shared oracle fragment — same integer weights as _SNB_SCORE)."""
    return (
        f"(CASE WHEN levenshtein({x}.c_name, {y}.c_name) <= 2"
        f" THEN {_FS_W['name'][0]} ELSE {_FS_W['name'][1]} END)"
        f" + (CASE WHEN {x}.c_mktsegment = {y}.c_mktsegment"
        f" THEN {_FS_W['segment'][0]} ELSE {_FS_W['segment'][1]} END)"
        f" + (CASE WHEN floor({x}.c_acctbal / 500) = floor({y}.c_acctbal / 500)"
        f" THEN {_FS_W['balance'][0]} ELSE {_FS_W['balance'][1]} END)"
        f" >= {_FS_THRESHOLD}"
    )


@register(
    "snb_canonical_pass_recovery",
    oracle=f"""
WITH r1 AS (
    SELECT c_custkey, row_number() OVER (ORDER BY c_name, c_custkey) AS rn
    FROM customer
),
r2 AS (
    SELECT c_custkey, row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rn
    FROM customer
),
r3 AS (
    SELECT c_custkey,
           row_number() OVER (ORDER BY reverse(c_name), c_custkey) AS rn
    FROM customer
),
c12 AS (
    SELECT DISTINCT id_a, id_b FROM (
        SELECT least(a.c_custkey, b.c_custkey) AS id_a,
               greatest(a.c_custkey, b.c_custkey) AS id_b
        FROM r1 a JOIN r1 b
          ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNB_WINDOW - 1}
        UNION ALL
        SELECT least(a.c_custkey, b.c_custkey) AS id_a,
               greatest(a.c_custkey, b.c_custkey) AS id_b
        FROM r2 a JOIN r2 b
          ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNB_WINDOW - 1}
    )
),
c3 AS (
    SELECT least(a.c_custkey, b.c_custkey) AS id_a,
           greatest(a.c_custkey, b.c_custkey) AS id_b
    FROM r3 a JOIN r3 b
      ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNB_WINDOW - 1}
),
l12 AS (
    SELECT c.id_a, c.id_b
    FROM c12 c
    JOIN customer x ON c.id_a = x.c_custkey
    JOIN customer y ON c.id_b = y.c_custkey
    WHERE {_fs_link_where('x', 'y')}
),
l3 AS (
    SELECT c.id_a, c.id_b
    FROM c3 c
    JOIN customer x ON c.id_a = x.c_custkey
    JOIN customer y ON c.id_b = y.c_custkey
    WHERE {_fs_link_where('x', 'y')}
)
SELECT CAST((SELECT count(*) FROM l12) AS BIGINT) AS base_links,
       CAST((SELECT count(*) FROM l3) AS BIGINT) AS canonical_links,
       CAST((SELECT count(*) FROM
             (SELECT id_a, id_b FROM l3
              EXCEPT
              SELECT id_a, id_b FROM l12)) AS BIGINT) AS recovered_links,
       CAST((SELECT count(*) FROM
             (SELECT id_a, id_b FROM l12
              UNION
              SELECT id_a, id_b FROM l3)) AS BIGINT) AS multipass_links
""",
)
def snb_canonical_pass_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the canonicalized (reversed-key) third SNB pass RECOVERS —
    the recall measurement VERDICT r10 #3 asked to ship with the pass:
    links found under the reversed-name window that BOTH the name-order
    and balance-order passes miss (``recovered_links``), next to each
    candidate family's own link count and the three-pass union total.
    A leading-character typo moves a record arbitrarily far in the
    name sort and — when the balance is coincidentally close to an
    unrelated record's — survives the balance pass too; the reversed
    key leaves its long suffix-prefix intact, so the pair stays
    window-adjacent. ``recovered_links > 0`` is the empirical
    justification for paying the third pass's additive cost.

    Scale shape: three linear SNB candidate generators (the multipass
    query's exact arms), the shared narrow-candidates-then-attribute-
    join scoring path ONCE per family, then each family's links tagged
    and unioned so ALL FOUR counts fall out of a single groupBy at
    LINK grain (links ≪ candidates) + one 1-row aggregate — set
    difference and union as boolean flags, never a second pass over
    either pipeline (a crossJoin-of-four-aggregates draft planted six
    copies of the scoring pipeline in the physical plan: 63 shuffles
    on the plan-budget ledger; this shape scores each family exactly
    once). Everything is linear in the corpus with the same constants
    as ``fellegi_sunter_multipass_snb``."""
    customer = table(spark, sf_dir, "customer")
    # r13: both candidate families are filters over the shared flagged
    # memo (see _build_snb_cands) — c12 = pass-1 OR pass-2 members
    # (distinct by construction, exactly the old union+dropDuplicates),
    # c3 = pass-3 members (a within-pass set already).
    cands = snb_cands_frame(spark, sf_dir)
    c12 = cands.filter(
        (F.col("p1") == 1) | (F.col("p2") == 1)
    ).select("id_a", "id_b")
    c3 = cands.filter(F.col("p3") == 1).select("id_a", "id_b")
    # links_only applies the threshold as its proven (band AND name)
    # equivalent inside the scoring join — levenshtein only on
    # band-agreeing candidates (see _fs_score_candidates; r12 opt)
    l12 = _fs_score_candidates(c12, customer, links_only=True).select(
        "id_a", "id_b", F.lit(1).alias("src")
    )
    l3 = _fs_score_candidates(c3, customer, links_only=True).select(
        "id_a", "id_b", F.lit(2).alias("src")
    )
    per_pair = (
        l12.unionByName(l3)
        .groupBy("id_a", "id_b")
        .agg(
            F.max(F.when(F.col("src") == 1, 1).otherwise(0)).alias("in12"),
            F.max(F.when(F.col("src") == 2, 1).otherwise(0)).alias("in3"),
        )
    )
    return per_pair.agg(
        F.sum("in12").cast("bigint").alias("base_links"),
        F.sum("in3").cast("bigint").alias("canonical_links"),
        F.sum(
            F.when((F.col("in3") == 1) & (F.col("in12") == 0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("recovered_links"),
        F.count(F.lit(1)).cast("bigint").alias("multipass_links"),
    )
