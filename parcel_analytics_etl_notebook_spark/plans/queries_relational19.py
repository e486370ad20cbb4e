"""Batch 19 (round-7 additions): six engine shapes the catalog lacked
(the four below, plus temporal k-hop reachability and the
functional-dependency audit further down).

- ``connected_components_star`` — bounded connected components via the
  alternating LARGE-STAR / SMALL-STAR algorithm (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14) over the
  shared co-purchase edge memo. The catalog already has min-label
  propagation (operators/graph.py — label values flow along a FIXED
  topology); the star algorithm instead REWRITES the edge set each
  round and converges in O(log n) alternations on skewed graphs, which
  is why it is the published choice for web-scale graphs. Fixed-round
  unroll gives a DuckDB oracle exactly like kcore_bounded_peel's.
- ``event_value_interpolate`` — LINEAR time-interpolation of missing
  values between bracketing observations. The catalog's
  ``event_value_locf`` carries the last value forward (step
  function); interpolation is the other standard densification
  primitive (sensor gap-fill), needing BOTH running-frame directions
  plus exact integer time arithmetic.
- ``snapshot_table_diff`` — row-level data-diff between two table
  snapshots (full-outer on the key, classify insert/delete/update/
  unchanged, aggregate per class) — the CDC-validation primitive every
  warehouse migration runs. Both snapshots derive deterministically
  from the driver's orders table.
- ``measure_correlation_matrix`` — grouped pairwise Pearson
  correlation MATRIX in one aggregation pass (all C(4,2) co-moments as
  parallel agg expressions over a single scan), unpivoted to tidy
  (group, x, y, corr) rows. The single-pass-many-statistics shape;
  compare price_quantity_regression's single pair.

Oracle-parity conventions as in plans/catalog.py: time arithmetic in
exact BIGINT epoch micros (``unix_micros`` / ``epoch_us``); the star
unroll runs the SAME fixed 3 large/small alternations on both engines
(bounded-round contract, like kcore_bounded_peel / recursive_bom_
rollup); update deltas use an exact double increment (+10.0) so the
diff never rounds; floats rounded identically on both sides before
hashing.

Reference parity: the reference pipeline (etl/main.py) has no graph /
imputation / diff stage — these extend the engine for the
training-data-pipeline mandate (grouping with the k-core and
clustering-coefficient family of queries_relational17).
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
# Bounded connected components: alternating large-star / small-star
# --------------------------------------------------------------------------
#: large/small alternations. 3 pairs (6 edge rewrites) converges the
#: sf-data co-purchase graph (verified against the min-label-propagation
#: fixpoint in tests); the bounded-round contract keeps the oracle an
#: exact unroll — see kcore_bounded_peel.
_CC_PAIRS = 3


def _cc_star_oracle() -> str:
    ctes = [_SQL_COPURCHASE_EDGES.format(name="e0")]
    idx = 0
    for _ in range(_CC_PAIRS):
        for kind in ("large", "small"):
            prev, idx = f"e{idx}", idx + 1
            sym, mn, nxt = f"s{idx}", f"m{idx}", f"e{idx}"
            ctes.append(
                f"{sym} AS (SELECT a AS u, b AS v FROM {prev} "
                f"UNION ALL SELECT b, a FROM {prev})"
            )
            ctes.append(
                f"{mn} AS (SELECT u, least(min(v), u) AS m "
                f"FROM {sym} GROUP BY u)"
            )
            if kind == "large":
                ctes.append(f"""
{nxt} AS MATERIALIZED (
    SELECT DISTINCT s.v AS a, m.m AS b
    FROM {sym} s JOIN {mn} m ON s.u = m.u
    WHERE s.v > s.u
)""")
            else:
                ctes.append(f"""
{nxt} AS MATERIALIZED (
    SELECT DISTINCT a, b FROM (
        SELECT s.v AS a, m.m AS b
        FROM {sym} s JOIN {mn} m ON s.u = m.u
        WHERE s.v <= s.u
        UNION ALL
        SELECT u AS a, m AS b FROM {mn}
    ) WHERE a <> b
)""")
    return (
        "WITH "
        + ",".join(ctes)
        + f""",
verts AS (SELECT DISTINCT v FROM
          (SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0)),
fin AS (SELECT a, min(b) AS root FROM e{idx} GROUP BY a)
SELECT CAST(coalesce(f.root, w.v) AS BIGINT) AS component,
       CAST(count(*) AS BIGINT) AS n_vertices
FROM verts w LEFT JOIN fin f ON w.v = f.a
GROUP BY 1
ORDER BY n_vertices DESC, component"""
    )


def _star_round(edges: DataFrame, kind: str) -> DataFrame:
    """One large-star or small-star edge rewrite.

    large-star: every node u sends each LARGER neighbor v to u's
    minimum m = min(N(u) ∪ {u}) — emit (v, m) for v > u. Detaches the
    high-degree tails of skewed stars in one round without ever
    grouping the whole component on one key.
    small-star: every node u points itself and each neighbor v ≤ u at
    m — emit (v, m) for v ≤ u plus (u, m), self-loops dropped.
    Both are pure set algebra over the symmetrized edge list: one
    union, one (u → min) aggregate with map-side partials, one
    shuffle join back on u, one distinct. No driver-side state."""
    sym = edges.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
    mn = (
        sym.groupBy("u")
        .agg(F.min("v").alias("__mv"))
        .select("u", F.least("__mv", "u").alias("m"))
    )
    joined = sym.join(mn, "u")
    if kind == "large":
        # v > u ≥ m, so self-loops are impossible by construction
        return (
            joined.where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct()
        )
    return (
        joined.where(F.col("v") <= F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .unionAll(mn.select(F.col("u").alias("a"), F.col("m").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


@register("connected_components_star", oracle=_cc_star_oracle())
def connected_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the support-≥2 co-purchase graph via 3
    alternating large-star/small-star rounds, reported as per-component
    vertex counts (largest first). After convergence the edge set is a
    star forest (v → component root = component min); a vertex's label
    is min over its outgoing edges, itself if it is a root. The
    FIXED-round unroll is deterministic identical algebra on both
    engines whether or not the graph has converged; convergence to the
    true components at the shipped round budget is separately pinned
    against the min-label-propagation fixpoint
    (tests/test_plans.py::test_cc_star_matches_label_propagation).

    Scale shape: each round is two shuffles (the u-keyed min aggregate
    and the join back) plus a distinct, all on the CURRENT edge set —
    which the algorithm geometrically flattens toward a star forest, so
    round cost is non-increasing; O(log n) alternations suffice on
    skewed graphs (Kiveris et al., SoCC'14) vs label propagation's
    O(diameter). Per-round ``localCheckpoint`` truncates lineage
    exactly as kcore_bounded_peel (each round references its
    predecessor twice; unchecked, the round-r plan holds 2^r copies of
    the edge-build subtree). The edge build itself is paid once by the
    shared co-purchase memo (memo:copurchase_edges)."""
    orig = copurchase_edges_frame(spark, sf_dir)
    cur = orig
    for _ in range(_CC_PAIRS):
        # eager=False (r12): lineage still truncates (the plan-size
        # bound the checkpoint exists for) but materialization folds
        # into the final action's pipeline instead of one blocking
        # driver job per half-round — 6 fewer jobs, same rows
        cur = _star_round(cur, "large").localCheckpoint(eager=False)
        cur = _star_round(cur, "small").localCheckpoint(eager=False)
    verts = (
        orig.select(F.col("a").alias("v"))
        .unionAll(orig.select(F.col("b").alias("v")))
        .distinct()
    )
    fin = cur.groupBy("a").agg(F.min("b").alias("root"))
    lab = verts.join(fin, verts["v"] == fin["a"], "left").select(
        "v", F.coalesce("root", "v").alias("component")
    )
    return (
        lab.groupBy("component")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vertices"))
        .select(F.col("component").cast("bigint").alias("component"),
                "n_vertices")
        .orderBy(F.desc("n_vertices"), "component")
    )


# --------------------------------------------------------------------------
# Linear time-interpolation of sparse values
# --------------------------------------------------------------------------
@register(
    "event_value_interpolate",
    oracle="""
WITH sparse AS (
  SELECT event_id, user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
         CASE WHEN event_type = 'purchase' THEN value END AS pv
  FROM events
), br AS (
  SELECT event_id, user_id, tus, pv,
    last_value(pv IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY tus, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v0,
    last_value(CASE WHEN pv IS NOT NULL THEN tus END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY tus, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t0,
    first_value(pv IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY tus, event_id
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1,
    first_value(CASE WHEN pv IS NOT NULL THEN tus END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY tus, event_id
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t1
  FROM sparse
)
SELECT event_id, user_id,
       round(CASE
         WHEN pv IS NOT NULL THEN pv
         WHEN v0 IS NOT NULL AND v1 IS NOT NULL AND t1 > t0
           THEN v0 + (v1 - v0)
                     * ((tus - t0) / CAST(t1 - t0 AS DOUBLE))
         WHEN v0 IS NOT NULL THEN v0
         ELSE v1 END, 4) AS interp_value
FROM br
""",
)
def event_value_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of the sparse purchase-value signal: each
    non-purchase event gets the time-weighted blend of the user's
    bracketing purchase values, v0 + (v1−v0)·(t−t0)/(t1−t0); before
    the first observation it back-fills v1, after the last it carries
    v0 (and a purchase keeps its own value). The other half of the
    densification pair with event_value_locf's step function.

    Cross-engine determinism: timestamps become exact BIGINT epoch
    micros (unix_micros / epoch_us — the queries_relational8
    convention) so the interpolation fraction is the same
    bigint-difference ratio on both engines, blended in double with
    identical operation order and rounded once at the end.

    Scale: ONE shuffle (partitionBy user_id) and one per-user sort —
    the backward frame (last non-null) and forward frame (first
    non-null) share the same window ordering, so Spark computes both
    in a single sorted pass per partition; no self-join, no spine
    table, nothing collects."""
    sparse = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pv"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    tz = F.when(F.col("pv").isNotNull(), F.col("tus"))
    v0 = F.last("pv", ignorenulls=True).over(wb)
    t0 = F.last(tz, ignorenulls=True).over(wb)
    v1 = F.first("pv", ignorenulls=True).over(wf)
    t1 = F.first(tz, ignorenulls=True).over(wf)
    interp = (
        F.when(F.col("pv").isNotNull(), F.col("pv"))
        .when(
            v0.isNotNull() & v1.isNotNull() & (t1 > t0),
            v0 + (v1 - v0) * ((F.col("tus") - t0) / (t1 - t0).cast("double")),
        )
        .when(v0.isNotNull(), v0)
        .otherwise(v1)
    )
    return sparse.select(
        "event_id", "user_id", F.round(interp, 4).alias("interp_value")
    )


# --------------------------------------------------------------------------
# Snapshot data-diff (CDC validation)
# --------------------------------------------------------------------------
@register(
    "snapshot_table_diff",
    oracle="""
WITH snap_a AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 97 <> 3
), snap_b AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderstatus = 'O' AND o_orderkey % 13 = 0
              THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 97 <> 5
), d AS (
  SELECT CASE WHEN a.o_orderkey IS NULL THEN 'insert'
              WHEN b.o_orderkey IS NULL THEN 'delete'
              WHEN a.o_totalprice <> b.o_totalprice
                   OR a.o_orderstatus <> b.o_orderstatus THEN 'update'
              ELSE 'unchanged' END AS change_type,
         coalesce(b.o_totalprice, 0) - coalesce(a.o_totalprice, 0) AS delta
  FROM snap_a a FULL JOIN snap_b b ON a.o_orderkey = b.o_orderkey
)
SELECT change_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(delta), 2) AS price_delta
FROM d GROUP BY change_type
ORDER BY change_type
""",
)
def snapshot_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff between two snapshots of a keyed table,
    classified insert / delete / update / unchanged with per-class row
    counts and net value drift — the validation primitive behind every
    CDC pipeline and warehouse migration ("did replication drop,
    duplicate, or corrupt rows?"). Snapshots derive deterministically
    from orders: A drops keys ≡3 (mod 97) (rows that arrive later →
    inserts), B drops keys ≡5 (mod 97) (rows deleted since) and bumps
    open orders on keys ≡0 (mod 13) by exactly +10.0 (updates — an
    exact double increment, so no rounding enters the comparison).

    Scale: one full-outer shuffle join on the snapshot key — the one
    unavoidable data movement of a diff; classification and the delta
    are per-row expressions inside codegen, and the per-class rollup
    has 4 groups with map-side partials. At 100 TB both sides would be
    bucketed on the key and the join co-located (see SCALING.md)."""
    orders = table(spark, sf_dir, "orders")
    snap_a = orders.where(F.col("o_orderkey") % 97 != 3).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    snap_b = orders.where(F.col("o_orderkey") % 97 != 5).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            (F.col("o_orderstatus") == "O") & (F.col("o_orderkey") % 13 == 0),
            F.col("o_totalprice") + F.lit(10.0),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    a, b = snap_a.alias("a"), snap_b.alias("b")
    d = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full").select(
        F.when(F.col("a.o_orderkey").isNull(), F.lit("insert"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("delete"))
        .when(
            (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
            | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus")),
            F.lit("update"),
        )
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        (
            F.coalesce(F.col("b.o_totalprice"), F.lit(0.0))
            - F.coalesce(F.col("a.o_totalprice"), F.lit(0.0))
        ).alias("delta"),
    )
    return (
        d.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.sum("delta"), 2).alias("price_delta"),
        )
        .orderBy("change_type")
    )


# --------------------------------------------------------------------------
# Grouped pairwise correlation matrix, single aggregation pass
# --------------------------------------------------------------------------
_CORR_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_CORR_PAIRS = [
    (x, y)
    for i, x in enumerate(_CORR_MEASURES)
    for y in _CORR_MEASURES[i + 1 :]
]


def _corr_matrix_oracle() -> str:
    aggs = ",\n       ".join(
        f"corr({x}, {y}) AS c{i}" for i, (x, y) in enumerate(_CORR_PAIRS)
    )
    arms = "\nUNION ALL\n".join(
        f"SELECT l_returnflag, '{x}' AS measure_x, '{y}' AS measure_y, "
        f"round(c{i}, 4) AS corr_xy FROM base"
        for i, (x, y) in enumerate(_CORR_PAIRS)
    )
    return (
        f"WITH base AS (\n  SELECT l_returnflag,\n       {aggs}\n"
        "  FROM lineitem GROUP BY l_returnflag\n)\n"
        + arms
        + "\nORDER BY l_returnflag, measure_x, measure_y"
    )


@register("measure_correlation_matrix", oracle=_corr_matrix_oracle())
def measure_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the four lineitem
    measures, per return flag, unpivoted to tidy (group, x, y, corr)
    rows — the feature-screening pass a training pipeline runs before
    model fitting (drop near-collinear features, sanity-check expected
    relationships like the price≁discount independence in TPC-H-ish
    data).

    Shape: all C(4,2)=6 correlations are parallel aggregate
    expressions in ONE groupBy pass — a single scan and a single
    3-group shuffle with map-side partial co-moments, however many
    measure pairs there are (compare price_quantity_regression, which
    fits one pair). The unpivot is a ``stack`` projection over the
    3-row aggregate output — model-sized, no second pass over the
    fact table. Both engines round the double correlation to 4dp
    before hashing (accumulation-order jitter between Spark's
    partitioned and DuckDB's vectorized co-moment merges sits at
    ~1e-12)."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        *[
            F.round(F.corr(x, y), 4).alias(f"c{i}")
            for i, (x, y) in enumerate(_CORR_PAIRS)
        ]
    )
    stack_expr = (
        f"stack({len(_CORR_PAIRS)}, "
        + ", ".join(
            f"'{x}', '{y}', c{i}" for i, (x, y) in enumerate(_CORR_PAIRS)
        )
        + ") AS (measure_x, measure_y, corr_xy)"
    )
    return agg.selectExpr("l_returnflag", stack_expr).orderBy(
        "l_returnflag", "measure_x", "measure_y"
    )


# --------------------------------------------------------------------------
# Temporal (time-respecting) k-hop reachability
# --------------------------------------------------------------------------
_TKH_HOPS = 3
_TKH_SEED_MOD = 199

#: dated co-purchase edges: same support-≥2 pairing as the shared
#: co-purchase graph, plus each edge's FIRST co-purchase day index
_SQL_DATED_EDGES = f"""
ed AS MATERIALIZED (
    SELECT a, b, d FROM (
        SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS sup,
               min(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01') AS d
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) x
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) y
          ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        JOIN orders o ON o.o_orderkey = x.l_orderkey
        GROUP BY 1, 2
    ) WHERE sup >= 2
)"""


def _tkh_oracle() -> str:
    ctes = [
        _SQL_DATED_EDGES,
        "esym AS (SELECT a AS u, b AS v, d FROM ed "
        "UNION ALL SELECT b, a, d FROM ed)",
        "verts AS (SELECT DISTINCT u AS p FROM esym)",
        f"f0 AS (SELECT p, 0 AS ad FROM verts WHERE p % {_TKH_SEED_MOD} = 0)",
    ]
    for k in range(1, _TKH_HOPS + 1):
        prev = f"f{k - 1}"
        ctes.append(f"""
f{k} AS MATERIALIZED (
    SELECT p, min(ad) AS ad FROM (
        SELECT p, ad FROM {prev}
        UNION ALL
        SELECT e.v AS p, e.d AS ad
        FROM {prev} JOIN esym e ON {prev}.p = e.u AND e.d >= {prev}.ad
    ) GROUP BY p
)""")
    arms = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS hop, "
        f"CAST((SELECT count(*) FROM f{k}) AS BIGINT) AS n_reached"
        for k in range(_TKH_HOPS + 1)
    )
    return "WITH " + ",".join(ctes) + "\n" + arms + "\nORDER BY hop"


@register("temporal_reachability_khop", oracle=_tkh_oracle())
def temporal_reachability_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-respecting k-hop reachability (temporal BFS): starting from
    a deterministic seed set (co-purchase vertices ≡0 mod 199), expand
    3 hops over DATED co-purchase edges where each hop's edge date must
    be ≥ the arrival date at the previous vertex — the
    information-flow / contagion primitive (how far can a trend
    propagate FORWARD in time), which static reachability
    (connected_components_star) cannot express: a path that goes
    through an older edge than it arrived on is not a valid temporal
    path. Emits (hop, n_reached) per round.

    Min-arrival is the correct frontier state: an earlier arrival at a
    vertex admits a superset of the later arrival's continuations
    (edge date ≥ arrival is monotone in arrival), so keeping min(ad)
    per vertex preserves exactly the temporally-reachable set —
    Dijkstra's argument on the arrival-time ordering.

    Scale shape: the dated edge build is the bounded per-order
    self-join plus one orders equi-join (fact-scale work, one pass);
    each hop is one frontier⋈edges equi-join on the vertex key with
    the date condition as a post-join filter (never a join-planning
    inequality) plus one min-aggregate, on frames bounded by the
    vertex set; per-hop localCheckpoint bounds plan depth exactly as
    the other bounded-round graph queries. 3 hops = 3 bounded shuffles
    of vertex-grain rows."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    ords = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.unix_date(F.to_date("o_orderdate")).alias("dd")
    )
    # attach the order date BEFORE the pair fan-out: the (order, part)
    # frame is ~20x smaller than the fanned pair stream it feeds
    lid = li.join(ords, li["l_orderkey"] == ords["o_orderkey"]).select(
        "l_orderkey", "l_partkey", "dd"
    )
    x, y = lid.alias("x"), li.alias("y")
    ed = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("sup"), F.min("dd").alias("d"))
        .filter(F.col("sup") >= 2)
        .select("a", "b", "d")
    )
    esym = (
        ed.select(F.col("a").alias("u"), F.col("b").alias("v"), "d")
        .unionAll(ed.select(F.col("b").alias("u"), F.col("a").alias("v"), "d"))
        # referenced by every hop join plus the seed derivation — without
        # materialization each of the 3 hops re-executes the fact-scale
        # edge build (measured 6.5s -> ~2.5s at sf0.1)
        .persist()
    )
    verts = esym.select(F.col("u").alias("p")).distinct()
    frontier = verts.filter(F.col("p") % _TKH_SEED_MOD == 0).select(
        "p", F.lit(0).alias("ad")
    ).localCheckpoint(eager=False)  # lazy: see connected_components_star
    stats = [
        frontier.agg(
            F.lit(0).cast("bigint").alias("hop"),
            F.count(F.lit(1)).cast("bigint").alias("n_reached"),
        )
    ]
    for k in range(1, _TKH_HOPS + 1):
        step = (
            frontier.join(esym, frontier["p"] == esym["u"])
            .where(F.col("d") >= F.col("ad"))
            .select(F.col("v").alias("p"), F.col("d").alias("ad"))
        )
        frontier = (
            frontier.select("p", "ad")
            .unionAll(step)
            .groupBy("p")
            .agg(F.min("ad").alias("ad"))
            .localCheckpoint(eager=False)  # lazy: see above
        )
        stats.append(
            frontier.agg(
                F.lit(k).cast("bigint").alias("hop"),
                F.count(F.lit(1)).cast("bigint").alias("n_reached"),
            )
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionAll(s)
    return out.orderBy("hop")


# --------------------------------------------------------------------------
# Functional-dependency audit (schema-quality DQ)
# --------------------------------------------------------------------------
#: candidate FDs: (name, determinant SQL group-key, dependent, relation SQL)
_FD_CANDIDATES = [
    ("l_orderkey->o_custkey",
     "l.l_orderkey", "o.o_custkey",
     "lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"),
    ("l_partkey->l_extendedprice",
     "l.l_partkey", "l.l_extendedprice", "lineitem l"),
    ("l_orderkey,l_linenumber->l_partkey",
     "l.l_orderkey || '#' || l.l_linenumber", "l.l_partkey", "lineitem l"),
    ("o_custkey->o_orderpriority",
     "o.o_custkey", "o.o_orderpriority", "orders o"),
]


def _fd_oracle() -> str:
    arms = []
    for name, det, dep, rel in _FD_CANDIDATES:
        arms.append(f"""
SELECT '{name}' AS fd,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS violating_keys,
       round(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS violation_rate
FROM (SELECT {det} AS k, count(DISTINCT {dep}) AS nd
      FROM {rel} GROUP BY 1)""")
    return "\nUNION ALL\n".join(arms) + "\nORDER BY fd"


@register("functional_dependency_audit", oracle=_fd_oracle())
def functional_dependency_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Functional-dependency validation over candidate key→attribute
    rules: for each FD, how many determinant keys exist and how many
    map to MORE than one dependent value (with the violation rate) —
    the schema-quality audit run before trusting a column as a join
    key or dimension attribute. The four candidates deliberately mix
    outcomes: order→customer holds (each order has one customer),
    part→price and customer→priority are violated by design, and
    (orderkey, linenumber)→partkey exposes the synthetic data's known
    duplicate line numbers (FIXTURES.md — the reason every dedup/top-k
    in this engine tiebreaks through l_partkey).

    Scale shape: each FD is one grouped exact count-distinct
    (determinant-keyed shuffle with partial aggregation; the distinct
    count is per-key bounded, never a global distinct) followed by a
    1-row rollup; the FD list is a query constant so the union width
    is fixed. Violation rate divides two exact BIGINTs, rounded
    identically on both engines."""
    li = table(spark, sf_dir, "lineitem")
    ords = table(spark, sf_dir, "orders")
    lo = li.join(ords, li["l_orderkey"] == ords["o_orderkey"])
    frames = [
        ("l_orderkey->o_custkey", lo, F.col("l_orderkey"),
         F.col("o_custkey")),
        ("l_partkey->l_extendedprice", li, F.col("l_partkey"),
         F.col("l_extendedprice")),
        ("l_orderkey,l_linenumber->l_partkey", li,
         F.concat_ws("#", F.col("l_orderkey"), F.col("l_linenumber")),
         F.col("l_partkey")),
        ("o_custkey->o_orderpriority", ords, F.col("o_custkey"),
         F.col("o_orderpriority")),
    ]
    outs = []
    for name, rel, det, dep in frames:
        per_key = rel.groupBy(det.alias("k")).agg(
            F.countDistinct(dep).alias("nd")
        )
        viol = F.sum((F.col("nd") > 1).cast("bigint"))
        outs.append(
            per_key.agg(
                F.lit(name).alias("fd"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                viol.cast("bigint").alias("violating_keys"),
                F.round(
                    viol / F.count(F.lit(1)).cast("double"), 6
                ).alias("violation_rate"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("fd")
