"""Round-8 relational/operator additions: per-group skyline (Pareto
frontier), nearest-in-time as-of join, exact rolling median, Fellegi-
Sunter probabilistic record linkage, and degree assortativity moments
over the co-purchase graph.

Five operator families the catalog lacked: (1) the SKYLINE operator
(multi-objective non-dominated set) computed with a sort + running-max
window instead of the O(n²) dominance join the naive SQL states; (2)
the NEAREST as-of variant (both directions, tie → earlier) that
completes the backward/forward as-of family; (3) exact windowed MEDIAN,
which Spark does not support natively as a window aggregate
(INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC) — re-expressed as a bounded
collect_list + array_sort over a 5-row frame; (4) multi-evidence
probabilistic record linkage (Fellegi & Sunter 1969) with integer
log-odds-style weights over blocked candidate pairs; (5) the graph-
level degree-assortativity statistic as exact BIGINT moment sums over
the shared co-purchase edge memo.

Oracle-parity conventions as in plans/catalog.py; every ratio/mean
here is either exact integer arithmetic or a single deterministic
double expression, per the r07 tie-free discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table
from parcel_analytics_etl_notebook_spark.plans.queries_relational17 import (
    _SQL_COPURCHASE_EDGES,
    copurchase_edges_frame,
)


# --------------------------------------------------------------------------
# Skyline (Pareto frontier) per brand: minimize price, maximize size
# --------------------------------------------------------------------------
@register(
    "skyline_parts",
    oracle="""
SELECT p_brand, p_partkey, CAST(p_size AS BIGINT) AS p_size,
       round(p_retailprice, 2) AS retail_price
FROM part p
WHERE NOT EXISTS (
    SELECT 1 FROM part q
    WHERE q.p_brand = p.p_brand
      AND q.p_retailprice <= p.p_retailprice
      AND q.p_size >= p.p_size
      AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
ORDER BY p_brand, p_partkey
""",
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand skyline: parts not dominated by any same-brand part
    that is cheaper-or-equal AND larger-or-equal (strict in at least
    one). The oracle states the O(n²) NOT EXISTS dominance test; the
    engine computes the same set in O(n log n) per brand — sort by
    price, then a part survives iff (a) it has the max size at its
    price point and (b) every strictly-cheaper price point's best size
    is strictly smaller (a running max over the ordered per-price
    frame). Equal (price, size) twins are mutually non-dominating and
    both survive, matching the strictness clause.

    Scale shape: one groupBy (brand, price) — fact-scale but
    map-combinable — then a window over the per-price frame (orders of
    magnitude smaller), then a broadcast-able join back. No pairwise
    term anywhere; the naive dominance join the oracle runs is
    quadratic per brand and would be the scale-killer."""
    part = table(spark, sf_dir, "part")
    per_price = part.groupBy("p_brand", "p_retailprice").agg(
        F.max("p_size").alias("__mx")
    )
    w_prev = (
        Window.partitionBy("p_brand")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pp = per_price.withColumn("__prev_best", F.max("__mx").over(w_prev))
    return (
        part.join(pp, ["p_brand", "p_retailprice"])
        .filter(
            (F.col("p_size") == F.col("__mx"))
            & (
                F.col("__prev_best").isNull()
                | (F.col("__prev_best") < F.col("p_size"))
            )
        )
        .select(
            "p_brand",
            "p_partkey",
            F.col("p_size").cast("bigint").alias("p_size"),
            F.round("p_retailprice", 2).alias("retail_price"),
        )
        .orderBy("p_brand", "p_partkey")
    )


# --------------------------------------------------------------------------
# Nearest-in-time as-of join (both directions, tie -> earlier)
# --------------------------------------------------------------------------
@register(
    "asof_nearest_event_join",
    oracle="""
WITH p AS (
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
    FROM events WHERE event_type = 'purchase'
), v AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
    FROM events WHERE event_type = 'view'
), b AS (
    SELECT p.event_id, v.ts AS tb
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
), f AS (
    SELECT p.event_id, min(v.ts) AS ta
    FROM p LEFT JOIN v ON p.user_id = v.user_id AND v.ts > p.ts
    GROUP BY p.event_id
), pick AS (
    SELECT p.event_id, p.user_id, p.ts, b.tb, f.ta,
           CASE
             WHEN tb IS NULL AND ta IS NULL THEN NULL
             WHEN ta IS NULL THEN 'before'
             WHEN tb IS NULL THEN 'after'
             WHEN epoch_us(p.ts) - epoch_us(tb)
                  <= epoch_us(ta) - epoch_us(p.ts) THEN 'before'
             ELSE 'after'
           END AS direction
    FROM p JOIN b USING (event_id) JOIN f USING (event_id)
)
SELECT event_id, user_id, ts,
       CASE direction WHEN 'before' THEN tb WHEN 'after' THEN ta END AS ts_nearest,
       CASE direction
           WHEN 'before' THEN epoch_us(ts) - epoch_us(tb)
           WHEN 'after' THEN epoch_us(ta) - epoch_us(ts)
       END AS gap_us,
       direction
FROM pick
""",
)
def asof_nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event as-of join: for every purchase, the view by the
    same user CLOSEST in time — before or after — with ties going to
    the earlier (backward) side, and a view at the exact purchase
    timestamp counting as backward with gap 0. Completes the as-of
    family (purchase_asof_view is backward-only): attribution windows,
    sensor alignment, and point-in-time feature joins all need the
    two-sided variant.

    The engine computes both directions in ONE shuffle
    (operators/asof.asof_join_nearest: union + two window fills over
    the same sorted partition); the oracle states backward as DuckDB's
    native ASOF JOIN and forward as a min-over-inequality-join (DuckDB
    ASOF is single-direction). Gaps are exact BIGINT microseconds —
    no float time math."""
    from parcel_analytics_etl_notebook_spark.operators.asof import (
        asof_join_nearest,
    )

    events = table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = asof_join_nearest(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts"
    )
    # events.ts reads as TIMESTAMP_NTZ; the session timezone is pinned
    # UTC (session.py) so the ltz cast is an exact epoch mapping and
    # unix_micros differences are exact BIGINT microseconds
    _us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    gb = _us("ts") - _us("ts_before")
    ga = _us("ts_after") - _us("ts")
    direction = (
        F.when(F.col("ts_before").isNull() & F.col("ts_after").isNull(), None)
        .when(F.col("ts_after").isNull(), "before")
        .when(F.col("ts_before").isNull(), "after")
        .when(gb <= ga, "before")
        .otherwise("after")
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_before"),
        F.col("ts_after"),
        direction.alias("direction"),
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("direction") == "before", F.col("ts_before"))
        .when(F.col("direction") == "after", F.col("ts_after"))
        .alias("ts_nearest"),
        F.when(F.col("direction") == "before", _us("ts") - _us("ts_before"))
        .when(F.col("direction") == "after", _us("ts_after") - _us("ts"))
        .cast("bigint")
        .alias("gap_us"),
        "direction",
    )


# --------------------------------------------------------------------------
# Exact rolling median (5-row frame) — Spark has no windowed median
# --------------------------------------------------------------------------
@register(
    "rolling_median_value",
    oracle="""
SELECT event_id, user_id,
       round(median(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5
FROM events
""",
)
def rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median of event value over a trailing 5-row frame
    per user — the robust-smoothing twin of the moving average
    (running_revenue's moving_avg3). Spark rejects median as a framed
    window aggregate (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the
    engine re-expresses it: collect_list over the bounded frame →
    array_sort → middle element (odd n) or lower + (upper-lower)·0.5
    (even n — the exact interpolation DuckDB's quantile_cont(0.5)
    computes, term-for-term, so the doubles match bit-for-bit before
    rounding). The frame is O(1) rows, so the list materialization is
    constant work per row — this shape is NOT for unbounded frames,
    where a running two-heap or an approx sketch is the scale path
    (approx_token_percentiles covers that family)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, (n / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    med = F.when(
        n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int"))
    ).otherwise(lo + (hi - lo) * F.lit(0.5))
    return table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.round(med, 6).alias("med5")
    )


# --------------------------------------------------------------------------
# Fellegi-Sunter probabilistic record linkage (blocked, integer weights)
# --------------------------------------------------------------------------
#: agreement/disagreement weights (integer log-odds-style scores) and
#: the link threshold; name agreement = bounded edit distance <= 2,
#: balance agreement = same floor(acctbal/500) band
_FS_W = {"name": (25, -15), "segment": (10, -5), "balance": (15, -5)}
_FS_THRESHOLD = 35
#: nation-block candidate budget: ~4.4× the measured sf0.1 bound
#: (~4.5M pairs over 25 nation blocks), well under the 10× corpus's
#: ~100×-grown bound — sf ≤ 0.1 results byte-identical, the quadratic
#: regime fails fast (see docstring).
FS_CANDIDATE_BUDGET = 20_000_000


def _fs_links_are_band_and_name() -> bool:
    """Prove, from the weight table itself, the algebra the blocked
    joins exploit: enumerate all 2³ agreement patterns and check that
    ``score >= _FS_THRESHOLD`` is EQUIVALENT to ``agree_name AND
    agree_balance`` (segment never decides). This is what lets
    ``fellegi_sunter_linkage`` and ``snb_window_recall`` push the
    balance band into the equi-join key (the broadcast join then emits
    ~1/|bands| of each nation block) and run the levenshtein only on
    band-agreeing pairs — the optimizer cannot derive this from the
    CASE arithmetic, but the weight table can (guide §8: use what you
    know that the optimizer does not)."""
    ok = True
    for an in (True, False):
        for asg in (True, False):
            for ab in (True, False):
                score = (
                    _FS_W["name"][0 if an else 1]
                    + _FS_W["segment"][0 if asg else 1]
                    + _FS_W["balance"][0 if ab else 1]
                )
                ok = ok and ((score >= _FS_THRESHOLD) == (an and ab))
    return ok


# import-time check so a future weight/threshold change fails LOUDLY
# here instead of silently changing what the rewritten joins compute
assert _fs_links_are_band_and_name(), (
    "the FS weight table changed: score >= threshold is no longer "
    "equivalent to (name AND balance) agreement — remove the band "
    "join-key rewrite in fellegi_sunter_linkage / snb_window_recall "
    "before shipping"
)


@register(
    "fellegi_sunter_linkage",
    scale_guard={
        "budget": "FS_CANDIDATE_BUDGET = 20,000,000 nation-block pairs",
        "max_verified_sf": 0.1,
        "raises": "CandidateBudgetExceeded",
        "scale_path": "fellegi_sunter_snb_linkage",
    },
    oracle=f"""
WITH p AS (
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           (levenshtein(a.c_name, b.c_name) <= 2) AS agree_name,
           (a.c_mktsegment = b.c_mktsegment) AS agree_segment,
           (floor(a.c_acctbal / 500) = floor(b.c_acctbal / 500)) AS agree_balance
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
)
SELECT id_a, id_b, agree_name, agree_segment, agree_balance,
       CAST((CASE WHEN agree_name THEN {_FS_W['name'][0]} ELSE {_FS_W['name'][1]} END)
          + (CASE WHEN agree_segment THEN {_FS_W['segment'][0]} ELSE {_FS_W['segment'][1]} END)
          + (CASE WHEN agree_balance THEN {_FS_W['balance'][0]} ELSE {_FS_W['balance'][1]} END)
         AS BIGINT) AS score
FROM p
WHERE (CASE WHEN agree_name THEN {_FS_W['name'][0]} ELSE {_FS_W['name'][1]} END)
    + (CASE WHEN agree_segment THEN {_FS_W['segment'][0]} ELSE {_FS_W['segment'][1]} END)
    + (CASE WHEN agree_balance THEN {_FS_W['balance'][0]} ELSE {_FS_W['balance'][1]} END)
    >= {_FS_THRESHOLD}
ORDER BY id_a, id_b
""",
)
def fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (Fellegi & Sunter 1969): blocked
    candidate pairs scored by summed per-field agreement weights, linked
    above a threshold. Evidence fields: name edit distance ≤ 2
    (+25/-15), market segment equality (+10/-5), account-balance band
    equality (+15/-5); threshold 35 requires name agreement plus
    balance-band corroboration. Extends similar_customer_names (single
    metric) to the multi-evidence scoring real entity resolution runs —
    weights are integers so scores are exact BIGINTs on both engines.

    Same blocking scale shape as similar_customer_names: the nation
    block bounds the quadratic term, the probe side round-robins across
    all cores, the build side broadcasts; the bounded levenshtein(,2)
    early-exits the DP. At 100 TB, blocking must be linear — that path
    is IMPLEMENTED as ``fellegi_sunter_snb_linkage``
    (queries_relational27.py: sorted-neighborhood window, (w−1)·n
    candidates, identical weights/threshold), with
    ``snb_window_recall`` measuring its pairs-completeness against
    this query's links; production weights come from the EM-estimated
    m/u probabilities — same plan, learned constants.

    Guardrail (round 9): 25 nations is a CONSTANT block count, so
    candidate pairs grow n²/25 — quadratic in corpus size by
    construction; the r09 10× run measured 38.8× wall for 10× data
    (SCALING.md). As with the prefix-filter and embedding-LSH joins
    the tradeoff is enforced: Σ c·(c−1)/2 over block occupancy (one
    25-row aggregate BEFORE the join) must stay within
    FS_CANDIDATE_BUDGET, else the query fails fast naming the
    implemented linear scale path (``fellegi_sunter_snb_linkage``)."""
    from parcel_analytics_etl_notebook_spark.plans.queries_llm7 import (
        CandidateBudgetExceeded,
    )

    customer = table(spark, sf_dir, "customer")
    nparts = spark.sparkContext.defaultParallelism
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
            f"nation-block pair bound {bound:,} exceeds budget "
            f"{FS_CANDIDATE_BUDGET:,}: a constant block count is "
            "quadratic in corpus size. Use fellegi_sunter_snb_linkage "
            "(sorted-neighborhood blocking, queries_relational27.py): "
            "linear (w-1)*n candidates, same Fellegi-Sunter weights and "
            "threshold; snb_window_recall measures the blocking recall."
        )
    band = lambda c: F.floor(F.col(c) / 500)  # noqa: E731
    # score >= threshold  <=>  band AND name agreement (proven at
    # import by _fs_links_are_band_and_name), so the band joins as a
    # second equi-key: the broadcast join emits ~1/|bands| of each
    # nation block, and the bounded levenshtein — the expensive term —
    # runs only on those rows instead of the whole n²/25 block.
    a = customer.select(
        F.col("c_nationkey").alias("nk"),
        band("c_acctbal").alias("band"),
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_mktsegment").alias("seg_a"),
    ).repartition(nparts)
    b = customer.select(
        F.col("c_nationkey").alias("nk"),
        band("c_acctbal").alias("band"),
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_mktsegment").alias("seg_b"),
    )
    agree_name = F.levenshtein("name_a", "name_b", 2) >= 0
    agree_segment = F.col("seg_a") == F.col("seg_b")
    # true by construction of the (nk, band) join key
    agree_balance = F.lit(True)
    score = (
        F.when(agree_name, _FS_W["name"][0]).otherwise(_FS_W["name"][1])
        + F.when(agree_segment, _FS_W["segment"][0]).otherwise(
            _FS_W["segment"][1]
        )
        + F.when(agree_balance, _FS_W["balance"][0]).otherwise(
            _FS_W["balance"][1]
        )
    )
    return (
        a.join(F.broadcast(b), on=["nk", "band"])
        # name agreement in the FILTER is the whole threshold test:
        # survivors provably score >= _FS_THRESHOLD (segment can only
        # add), so no score filter remains
        .filter((F.col("id_a") < F.col("id_b")) & agree_name)
        .select(
            "id_a",
            "id_b",
            agree_name.alias("agree_name"),
            agree_segment.alias("agree_segment"),
            agree_balance.alias("agree_balance"),
            score.cast("bigint").alias("score"),
        )
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------------------
# Degree assortativity (exact BIGINT moment sums over the edge memo)
# --------------------------------------------------------------------------
@register(
    "degree_assortativity_moments",
    oracle=f"""
WITH {_SQL_COPURCHASE_EDGES.format(name='edges')},
deg AS (
    SELECT v, count(*) AS c FROM (
        SELECT a AS v FROM edges UNION ALL SELECT b FROM edges
    ) GROUP BY v
),
j AS (
    SELECT da.c AS da, db.c AS db
    FROM edges e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v
),
m AS (
    SELECT count(*) AS m,
           CAST(sum(da + db) AS BIGINT) AS s1,
           CAST(sum(da*da + db*db) AS BIGINT) AS s2,
           CAST(sum(da*db) AS BIGINT) AS sxy
    FROM j
)
SELECT CAST(m AS BIGINT) AS n_edges, s1 AS sum_deg, s2 AS sum_deg_sq,
       sxy AS sum_deg_prod,
       CASE WHEN 2*m*s2 - s1*s1 = 0 THEN NULL
            ELSE round(CAST(4*m*sxy - s1*s1 AS DOUBLE)
                       / CAST(2*m*s2 - s1*s1 AS DOUBLE), 6)
       END AS assortativity
FROM m
""",
)
def degree_assortativity_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph — do high-degree
    parts co-purchase with other high-degree parts? — computed as exact
    BIGINT moment sums over edge-endpoint degree pairs (symmetrized:
    each undirected edge contributes both orientations, folded into
    s1/s2/sxy algebraically), with Pearson r derived from the moments
    in ONE deterministic double division: r = (4m·Sxy − S1²) /
    (2m·S2 − S1²). Emitting the integer moments alongside r keeps the
    value tie-free (r07 discipline) and lets a reader re-derive r at
    any precision.

    Scale shape: degrees come from one groupBy over the exploded
    endpoint stream of the shared edge memo (bench ledger
    memo:copurchase_edges); the per-edge degree attach is two
    equi-joins on vertex id; the moment agg is a single map-combined
    pass. BIGINT moments hold to deg·√m ≈ 3·10⁹ edge-degree products —
    beyond that (web-scale graphs) promote the sums to DECIMAL(38,0)
    on both engines, same plan."""
    edges = copurchase_edges_frame(spark, sf_dir)
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("c").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("c").alias("db"))
    j = edges.join(da, "a").join(db, "b")
    m = j.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("da") + F.col("db")).alias("s1"),
        F.sum(F.col("da") * F.col("da") + F.col("db") * F.col("db")).alias("s2"),
        F.sum(F.col("da") * F.col("db")).alias("sxy"),
    )
    num = 4 * F.col("m") * F.col("sxy") - F.col("s1") * F.col("s1")
    den = 2 * F.col("m") * F.col("s2") - F.col("s1") * F.col("s1")
    return m.select(
        F.col("m").cast("bigint").alias("n_edges"),
        F.col("s1").cast("bigint").alias("sum_deg"),
        F.col("s2").cast("bigint").alias("sum_deg_sq"),
        F.col("sxy").cast("bigint").alias("sum_deg_prod"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(F.round(num.cast("double") / den.cast("double"), 6))
        .alias("assortativity"),
    )
