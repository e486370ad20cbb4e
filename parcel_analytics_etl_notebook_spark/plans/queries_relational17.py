"""Batch 17 (relational/events): round-6 capability — bounded k-core
peeling (iterative graph-shrink), a two-table interval-OVERLAP join via
time-bucket blocking, the ClickHouse-style window funnel (ordered step
matching inside a time budget), DAU/WAU stickiness, and the per-node
local clustering coefficient (triangle density over the shared
co-purchase graph).

Each is a distinct engine shape the catalog lacked: k-core is the
*mutating-graph* iteration (unlike pagerank's fixed-topology value
iteration or connected components' label passing, every round deletes
vertices and re-derives degrees); the overlap join turns the classic
inequality join `s.start < i.end AND s.end >= i.start` into an
equi-join on exploded time buckets (the genomic/observability interval
-join pattern — a raw inequality join is a nested-loop cartesian at
scale); the window funnel is ORDERED sequence matching under a time
budget (strictly stronger than the unordered step-set funnels of
session_conversion_funnel); stickiness is the product-analytics
DAU/WAU ratio on epoch-anchored weeks.

Oracle-parity conventions as in plans/catalog.py: interval arithmetic
in exact BIGINT epoch micros / day indexes; the k-core unroll runs the
SAME fixed 5 rounds on both engines (bounded-round contract, like
recursive_bom_rollup's depth bound); floats only in final rounded
divisions of identical integers.

TIE-HANDLING CONVENTION (funnel / session / interval family —
VERDICT r06 #8, after the rounding-tie bug fixed in commit b7184f4).
Future funnel variants MUST follow these rules; they are pinned by
tests/test_properties.py::test_funnel_equal_timestamp_ties:

- Step ordering is STRICT in time: step k+1 requires ``t > t_k``, so
  an equal-timestamp event never advances the funnel (a click at the
  exact instant of the first view is NOT "after" it). This matches
  ClickHouse windowFunnel's default mode.
- Window deadlines are INCLUSIVE: ``t <= t_anchor + W`` — an event
  landing exactly on the deadline counts.
- Within a step, "earliest qualifying event" is ``min(t)`` — a pure
  aggregate, never a row_number over a possibly-tied ordering.
- Sessionization classifies an equal-timestamp event into the SAME
  session (gap 0 ≤ threshold); session bounds are min/max aggregates,
  so intra-tie row order never matters.
- Interval arithmetic stays in exact BIGINT micros end to end; the
  only division is final presentation rounding done in INTEGER space
  (``(us + 50) // 100 / 10000.0``) so the engines cannot disagree on
  a half-way decimal tie.

The invariant behind all five rules: every comparison consults only
``(t, query constants)`` — never the relative order of two
equal-timestamp rows — so results are independent of sort tiebreaks
both within an engine (Spark partition order) and across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table

# --------------------------------------------------------------------------
# Bounded k-core peeling on the support-2 co-purchase graph
# --------------------------------------------------------------------------
_KCORE_K = 4
_KCORE_ROUNDS = 5
_KCORE_SUPPORT = 2

#: SQL twin of _copurchase_edges — shared by the k-core and clustering
#: coefficient oracles ({name} is the CTE name)
_SQL_COPURCHASE_EDGES = f"""
{{name}} AS MATERIALIZED (
    SELECT a, b FROM (
        SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS sup
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) x
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) y
          ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2
    ) WHERE sup >= {_KCORE_SUPPORT}
)"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-≥2 part co-purchase edge list (a < b), shared by the
    graph-analytics queries (kcore_bounded_peel,
    local_clustering_coefficient). Dedup to (order, part) BEFORE
    pairing: pairs are then unique per order by construction, so
    support is a plain count(*) with map-side partials —
    count_distinct(order) per pair forces per-group hash sets over the
    ~20x-fanned pair stream (measured ~2x slower at sf0.1)."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    x, y = li.alias("x"), li.alias("y")
    return (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("sup"))
        .filter(F.col("sup") >= _KCORE_SUPPORT)
        .select("a", "b")
    )


def copurchase_edges_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped memo of :func:`_copurchase_edges`
    (catalog.memo_frame): the edge build is the fact-scale stage of
    BOTH graph queries in this module, and in a production graph
    pipeline the edge list is materialized once and every analytic
    (core decomposition, clustering coefficient) reads it. Same
    handoff contract as the near-dup pair memo (queries_llm
    near_dup_pairs_frame): checkpoint-backed so it survives per-query
    cache isolation, released by ``release_caches``."""
    from parcel_analytics_etl_notebook_spark.plans.catalog import memo_frame

    return memo_frame(
        spark,
        sf_dir,
        "copurchase_edges",
        lambda: _copurchase_edges(spark, sf_dir),
    )


# bench.py pre-materializes each shared artifact as its own timed
# ledger line so per-query walls are marginal + order-independent
from parcel_analytics_etl_notebook_spark.plans.catalog import MEMO_BUILDERS  # noqa: E402

MEMO_BUILDERS["copurchase_edges"] = copurchase_edges_frame


def _kcore_oracle() -> str:
    edges = _SQL_COPURCHASE_EDGES.format(name="e0")
    rounds = []
    for r in range(1, _KCORE_ROUNDS + 1):
        p = f"e{r - 1}"
        rounds.append(f"""
d{r} AS MATERIALIZED (
    SELECT v FROM (SELECT a AS v FROM {p} UNION ALL SELECT b FROM {p})
    GROUP BY v HAVING count(*) >= {_KCORE_K}
),
e{r} AS MATERIALIZED (
    SELECT a, b FROM {p}
    WHERE a IN (SELECT v FROM d{r}) AND b IN (SELECT v FROM d{r})
)""")
    stats = "\nUNION ALL\n".join(
        f"""SELECT CAST({r} AS BIGINT) AS round,
       CAST((SELECT count(*) FROM (SELECT DISTINCT v FROM
             (SELECT a AS v FROM e{r} UNION ALL SELECT b FROM e{r}))) AS BIGINT)
           AS n_vertices,
       CAST((SELECT count(*) FROM e{r}) AS BIGINT) AS n_edges"""
        for r in range(1, _KCORE_ROUNDS + 1)
    )
    return (
        "WITH " + edges + "," + ",".join(rounds) + "\n"
        + stats + "\nORDER BY round"
    )


@register("kcore_bounded_peel", oracle=_kcore_oracle())
def kcore_bounded_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core decomposition (k=4, 5 peel rounds) of the
    support-≥2 part co-purchase graph: each round recomputes degrees
    and deletes every vertex below k plus its incident edges — the
    classic iterative peel, run a FIXED number of rounds on both
    engines (full k-core iterates to fixpoint; the bounded form is the
    production shape when the round budget must be explicit — compare
    recursive_bom_rollup's depth bound). Emits (round, n_vertices,
    n_edges) so the cascade is visible: at sf0.01 the graph collapses
    860 → 0 vertices across the 5 rounds.

    Scale shape: edge generation is the bounded per-order self-join
    (order line-counts are schema-bounded, so pairs grow linearly with
    orders), aggregated once on (a, b) with map-side partials. Each
    peel round is one degree aggregate over the current edge frame plus
    two semi-joins (left_semi — never widens rows); the edge frame
    SHRINKS monotonically, so the 5-round loop is 5 bounded shuffles of
    decreasing size on a 1000-executor cluster. Each round's edge frame
    is localCheckpoint-ed (eager), truncating lineage — WITHOUT it the
    round-r plan nests ~3^r copies of the edge-build subtree (each
    round references its predecessor three times) and the optimizer
    chokes before a single task runs; the same plan-depth bound
    event_type_pagerank applies (queries_relational9). On a cluster
    where executor loss matters, swap reliable ``checkpoint()`` in.
    The per-round stats are 1-row aggregates over the already-
    materialized frames."""
    edges = copurchase_edges_frame(spark, sf_dir)
    stats = []
    for r in range(1, _KCORE_ROUNDS + 1):
        deg = (
            edges.select(F.col("a").alias("v"))
            .unionAll(edges.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select("v")
        )
        edges = (
            edges.join(deg, edges.a == deg.v, "left_semi")
            .join(deg, edges.b == deg.v, "left_semi")
            # eager=False (r12): lineage bound without a blocking job
            # per peel round — materializes in the final action
            .localCheckpoint(eager=False)
        )
        verts = (
            edges.select(F.col("a").alias("v"))
            .unionAll(edges.select(F.col("b").alias("v")))
            .distinct()
        )
        stats.append(
            verts.agg(
                F.lit(r).cast("bigint").alias("round"),
                F.count(F.lit(1)).cast("bigint").alias("n_vertices"),
            ).crossJoin(
                F.broadcast(
                    edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
                )
            )
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out.orderBy("round")


# --------------------------------------------------------------------------
# Interval-overlap join: user sessions × error incidents, bucket-blocked
# --------------------------------------------------------------------------
_INCIDENT_CELL_US = 600 * 1_000_000  # 10-minute grid
_INCIDENT_MIN_ERRORS = 3


@register(
    "session_incident_overlap",
    oracle=f"""
WITH e AS (
    SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_type
    FROM events
),
m AS (
    SELECT user_id, t,
           CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
),
s AS (
    SELECT user_id,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
           t
    FROM m
),
sess AS (
    SELECT user_id, sid, min(t) AS ss, max(t) AS se
    FROM s GROUP BY 1, 2
),
inc AS (
    SELECT t // {_INCIDENT_CELL_US} AS cell
    FROM e WHERE event_type = 'error'
    GROUP BY 1 HAVING count(*) >= {_INCIDENT_MIN_ERRORS}
),
hit AS (
    SELECT sess.user_id, sess.sid,
           min(sess.ss) AS ss, min(sess.se) AS se,
           count(*) AS n_inc,
           sum(least(sess.se, (inc.cell + 1) * {_INCIDENT_CELL_US})
               - greatest(sess.ss, inc.cell * {_INCIDENT_CELL_US}))
               AS ov_us
    FROM sess JOIN inc
      ON sess.ss < (inc.cell + 1) * {_INCIDENT_CELL_US}
     AND sess.se >= inc.cell * {_INCIDENT_CELL_US}
    GROUP BY 1, 2
)
SELECT s2.user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN h.sid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS sessions_hit,
       CAST(coalesce(sum(h.n_inc), 0) AS BIGINT) AS incident_overlaps,
       ((coalesce(sum(h.ov_us), 0) + 50) // 100) / 10000.0 AS overlap_seconds
FROM sess s2 LEFT JOIN hit h ON s2.user_id = h.user_id AND s2.sid = h.sid
GROUP BY 1 ORDER BY s2.user_id
""",
)
def session_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join: 30-min-gap user sessions against global
    'error incident' intervals (10-minute grid cells holding ≥3 error
    events), reporting per user how many sessions were touched and the
    total overlap duration. The engine never evaluates the inequality
    pair predicate `ss < ie AND se >= is` as a join condition — that
    plans a nested-loop cartesian at scale. Instead each session
    EXPLODES to the 10-minute cells it covers (`sequence` — bounded by
    session length over cell width) and equi-joins incidents on the
    cell id; a covered cell IS an overlapping incident, so the
    blocking join is exact, not candidate generation. All interval
    arithmetic is BIGINT epoch micros.

    Scale shape: sessionization is one partitioned window (user
    grain); incidents are a time-grain aggregate (map-side partials,
    tiny result — broadcast); the explode fans out by
    ceil(session/10min) — bounded fan-out, and the join is
    broadcast-hash on the cell id, so the fact-scale side never
    shuffles. The per-user rollup is one key-grain aggregate."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        # ts is TIMESTAMP_NTZ; pin_session fixes the session tz to UTC so
        # the cast is a pure reinterpretation — identical to DuckDB's
        # naive epoch_us (the queries_relational8 convention)
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        "event_type",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("t")
    s = (
        ev.withColumn(
            "is_new",
            F.when(
                F.lag("t").over(w).isNull()
                | (F.col("t") - F.lag("t").over(w) > 1_800_000_000),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "sid",
            F.sum("is_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("t").alias("ss"), F.max("t").alias("se"))
    )
    cell = _INCIDENT_CELL_US
    inc = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.expr(f"t div {cell}").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n_err"))
        .filter(F.col("n_err") >= _INCIDENT_MIN_ERRORS)
        .select("cell")
    )
    covered = s.withColumn(
        "cell",
        F.explode(
            F.sequence(F.expr(f"ss div {cell}"), F.expr(f"se div {cell}"))
        ),
    )
    hit = (
        covered.join(F.broadcast(inc), "cell")
        .groupBy("user_id", "sid")
        .agg(
            F.count(F.lit(1)).alias("n_inc"),
            F.sum(
                F.least(F.col("se"), (F.col("cell") + 1) * cell)
                - F.greatest(F.col("ss"), F.col("cell") * cell)
            ).alias("ov_us"),
        )
    )
    return (
        s.join(hit, ["user_id", "sid"], "left")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum(F.col("n_inc").isNotNull().cast("int"))
            .cast("bigint")
            .alias("sessions_hit"),
            F.coalesce(F.sum("n_inc"), F.lit(0))
            .cast("bigint")
            .alias("incident_overlaps"),
            # HALF_UP to 4dp in exact BIGINT micros BEFORE the float
            # division: Spark round() (BigDecimal HALF_UP on the
            # shortest decimal repr) and DuckDB round() (scaled
            # nearbyint) disagree when ov_us/1e6 lands exactly on a 5
            # at the 5th decimal (hit once at sf0.1); integer
            # (x+50) div 100 is tie-free and identical on both engines
            (
                F.expr("(coalesce(sum(ov_us), 0L) + 50) div 100") / 10_000.0
            ).alias("overlap_seconds"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Window funnel: ordered view → click → purchase within a time budget
# --------------------------------------------------------------------------
_FUNNEL_WINDOW_US = 6 * 3600 * 1_000_000  # 6 hours from the first view


@register(
    "window_funnel_max_step",
    oracle=f"""
WITH e AS (
    SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t
    FROM events
),
u AS (SELECT DISTINCT user_id FROM e),
s1 AS (
    SELECT user_id, min(t) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
    SELECT e.user_id, min(e.t) AS t2
    FROM e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.t > s1.t1
      AND e.t <= s1.t1 + {_FUNNEL_WINDOW_US}
    GROUP BY 1
),
s3 AS (
    SELECT e.user_id, min(e.t) AS t3
    FROM e
    JOIN s1 ON e.user_id = s1.user_id
    JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.t > s2.t2
      AND e.t <= s1.t1 + {_FUNNEL_WINDOW_US}
    GROUP BY 1
),
steps AS (
    SELECT u.user_id,
           CASE WHEN s3.user_id IS NOT NULL THEN 3
                WHEN s2.user_id IS NOT NULL THEN 2
                WHEN s1.user_id IS NOT NULL THEN 1
                ELSE 0 END AS max_step
    FROM u
    LEFT JOIN s1 ON u.user_id = s1.user_id
    LEFT JOIN s2 ON u.user_id = s2.user_id
    LEFT JOIN s3 ON u.user_id = s3.user_id
)
SELECT CAST(max_step AS BIGINT) AS max_step,
       CAST(count(*) AS BIGINT) AS n_users
FROM steps GROUP BY 1 ORDER BY max_step
""",
)
def window_funnel_max_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-style ``windowFunnel``: the deepest ORDERED prefix of
    view → click → purchase each user completes within 6 hours of
    their FIRST view (each step strictly after the previous one,
    deadline anchored at step 1). Strictly stronger than an unordered
    step-set funnel (session_conversion_funnel): a purchase BEFORE the
    click does not count. Deterministic anchor semantics (first view,
    earliest qualifying event per step) make the result unique; all
    time math is BIGINT epoch micros.

    Scale shape: each step frame is a USER-GRAIN aggregate (one row
    per user) built with one filtered scan + broadcast join against
    the previous step's frame — fact-scale events shuffle only in the
    per-step min aggregates (map-side partials); step frames are
    user-cardinality, broadcast into the next filter. Step count is a
    query constant, so the chain length is fixed, not data-driven."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        # NTZ→TIMESTAMP cast is a pure reinterpretation under the
        # pinned UTC session tz (queries_relational8 convention)
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    users = ev.select("user_id").distinct()
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(s1), "user_id")
        .filter(
            (F.col("t") > F.col("t1"))
            & (F.col("t") <= F.col("t1") + _FUNNEL_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("t").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(s1), "user_id")
        .join(F.broadcast(s2), "user_id")
        .filter(
            (F.col("t") > F.col("t2"))
            & (F.col("t") <= F.col("t1") + _FUNNEL_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("t").alias("t3"))
    )
    steps = (
        users.join(s1.select("user_id", F.lit(1).alias("h1")), "user_id", "left")
        .join(s2.select("user_id", F.lit(1).alias("h2")), "user_id", "left")
        .join(s3.select("user_id", F.lit(1).alias("h3")), "user_id", "left")
        .select(
            F.when(F.col("h3").isNotNull(), 3)
            .when(F.col("h2").isNotNull(), 2)
            .when(F.col("h1").isNotNull(), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("max_step")
        )
    )
    return (
        steps.groupBy("max_step")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("max_step")
    )


# --------------------------------------------------------------------------
# DAU/WAU stickiness on epoch-anchored weeks
# --------------------------------------------------------------------------
@register(
    "dau_wau_stickiness",
    oracle="""
WITH ud AS (
    SELECT DISTINCT user_id,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
    FROM events
),
w AS (SELECT user_id, d, d // 7 AS wk FROM ud),
daily AS (
    SELECT wk, d, CAST(count(*) AS BIGINT) AS dau FROM w GROUP BY 1, 2
),
weekly AS (
    SELECT wk,
           CAST(count(DISTINCT user_id) AS BIGINT) AS wau,
           CAST(count(DISTINCT d) AS BIGINT) AS days_observed
    FROM w GROUP BY 1
)
SELECT CAST(weekly.wk AS BIGINT) AS week_idx,
       CAST(weekly.wk * 7 AS BIGINT) AS week_start_day,
       weekly.days_observed,
       weekly.wau,
       round(sum(daily.dau) / CAST(weekly.days_observed AS DOUBLE), 4)
           AS avg_dau,
       round(sum(daily.dau)
             / CAST(weekly.days_observed AS DOUBLE) / weekly.wau, 4)
           AS stickiness
FROM weekly JOIN daily ON weekly.wk = daily.wk
GROUP BY 1, 2, 3, 4 ORDER BY week_idx
""",
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly engagement stickiness: avg daily active users / weekly
    active users per epoch-anchored week (day_epoch div 7 — no
    data-dependent anchor, no calendar-zone ambiguity), normalized by
    the days actually observed in the data so partial weeks aren't
    diluted. The DAU/MAU 'stickiness' product metric at week grain.

    Scale shape: one dedup to (user, day) grain with map-side
    partials, then two key-grain aggregates (week-day, week) and a
    broadcast-sized join on the week id. Nothing fact-scale past the
    first aggregate."""
    ev = table(spark, sf_dir, "events")
    epoch = F.lit("1970-01-01").cast("date")
    ud = (
        ev.select(
            "user_id",
            F.datediff(F.col("ts").cast("date"), epoch).alias("d"),
        )
        .distinct()
        .withColumn("wk", F.expr("d div 7"))
    )
    daily = ud.groupBy("wk", "d").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    weekly = ud.groupBy("wk").agg(
        F.count_distinct("user_id").cast("bigint").alias("wau"),
        F.count_distinct("d").cast("bigint").alias("days_observed"),
    )
    return (
        weekly.join(daily, "wk")
        .groupBy(
            F.col("wk").cast("bigint").alias("week_idx"),
            (F.col("wk") * 7).cast("bigint").alias("week_start_day"),
            "days_observed",
            "wau",
        )
        .agg(
            F.round(
                F.sum("dau") / F.col("days_observed").cast("double"), 4
            ).alias("avg_dau"),
            F.round(
                F.sum("dau")
                / F.col("days_observed").cast("double")
                / F.col("wau"),
                4,
            ).alias("stickiness"),
        )
        .orderBy("week_idx")
    )


# --------------------------------------------------------------------------
# Local clustering coefficient: per-node triangle density, bucketed
# --------------------------------------------------------------------------
@register(
    "local_clustering_coefficient",
    oracle="WITH " + _SQL_COPURCHASE_EDGES.format(name="e") + """,
deg AS (
    SELECT v, CAST(count(*) AS BIGINT) AS d
    FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v
),
tri AS (
    SELECT v, CAST(count(*) AS BIGINT) AS t
    FROM (
        SELECT unnest([ab.a, ab.b, bc.b]) AS v
        FROM e ab JOIN e bc ON ab.b = bc.a
        JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
    ) GROUP BY v
),
node AS (
    SELECT deg.v, deg.d, coalesce(tri.t, 0) AS t
    FROM deg LEFT JOIN tri ON deg.v = tri.v
    WHERE deg.d >= 2
)
SELECT CAST(least(9, (20 * t) // (d * (d - 1))) AS BIGINT) AS coeff_bucket,
       CAST(count(*) AS BIGINT) AS n_nodes,
       round(avg(2.0 * t / (d * (d - 1))), 4) AS avg_coeff
FROM node GROUP BY 1 ORDER BY coeff_bucket
""",
)
def local_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient 2·tri(v)/(deg(v)·(deg(v)−1))
    on the support-≥2 co-purchase graph, bucketed into deciles with
    EXACT integer arithmetic (bucket = min(9, 20t div d(d−1)) — no
    float at the bucket boundary, so engines can't disagree on a
    boundary node). Extends the global triangle census
    (copurchase_triangle_census) to the node-local graph-health
    signal: a node whose neighbors all know each other (coeff → 1) is
    community-internal; hub nodes bridging communities score low.

    Scale shape: the fact-scale work is the shared edge build
    (_copurchase_edges — one dedup + one pair aggregate); the support
    filter collapses the graph to model scale, so the ordered two-hop
    triangle join (ab⋈bc⋈ac, each triangle counted once at a<b<c) and
    the degree aggregate run on the small edge frame. On a hub-heavy
    graph the production guard is the same degree-cutoff orientation
    copurchase_triangle_census documents; support-filtering already
    bounds degrees here. The ≤10-row bucket rollup ends it."""
    # memo replaces the per-query persist(): the checkpoint-backed edge
    # frame is shared with kcore_bounded_peel across the sweep
    e = copurchase_edges_frame(spark, sf_dir)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.b") == F.col("bc.a"))
        .join(
            ac,
            (F.col("ac.a") == F.col("ab.a")) & (F.col("ac.b") == F.col("bc.b")),
        )
        .select(
            F.explode(
                F.array(F.col("ab.a"), F.col("ab.b"), F.col("bc.b"))
            ).alias("v")
        )
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    node = (
        deg.filter(F.col("d") >= 2)
        .join(tri, "v", "left")
        .withColumn("t", F.coalesce(F.col("t"), F.lit(0).cast("bigint")))
    )
    dd1 = F.col("d") * (F.col("d") - 1)
    return (
        node.groupBy(
            # SQL `div` = exact integer division (Spark's `/` is float)
            F.least(F.lit(9).cast("bigint"), F.expr("(20 * t) div (d * (d - 1))"))
            .cast("bigint")
            .alias("coeff_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.round(F.avg(2.0 * F.col("t") / dd1), 4).alias("avg_coeff"),
        )
        .orderBy("coeff_bucket")
    )
