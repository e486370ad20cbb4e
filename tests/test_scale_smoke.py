"""Order-of-magnitude scale smoke: core operators on 10M synthesized
rows (17× the sf0.1 bench table) — proves the shapes hold past the
test fixtures, not just on 60k rows. Synthetic data from spark.range
(generated distributed, never on the driver)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.operators.dedup import dedup_first_row
from parcel_analytics_etl_notebook_spark.operators.sessionize import session_stats

N = 10_000_000


@pytest.fixture(scope="module")
def big_events(spark):
    """10M events: 100k users × 100 events each (rank r = id div 100k).

    Per-user timestamps are built so session boundaries actually occur:
    ranks 0..50 are 1000s apart (single session), ranks 51..99 are
    2000s apart (each opens a new session) → exactly 50 sessions/user.
    """
    r = F.expr("id div 100000")
    offset_s = F.when(r <= 50, r * 1000).otherwise(50_000 + (r - 50) * 2000)
    return (
        spark.range(N)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 100_000).alias("user_id"),
            F.timestamp_micros(
                F.lit(1704067200000000)
                + offset_s.cast("long") * 1_000_000
                + (F.col("id") % 100_000) * 7  # stagger users by µs
            ).alias("ts"),
            F.element_at(
                F.array(*[F.lit(x) for x in ("view", "view", "view", "click", "signup", "purchase")]),
                (F.col("id") % 6 + 1).cast("int"),
            ).alias("event_type"),
            ((F.col("id") * 7919) % 1000 / 10.0).alias("value"),
        )
    )


def test_lifecycle_pivot_10m(big_events):
    t0 = time.perf_counter()
    pivoted = (
        big_events.filter(F.col("event_type").isin("signup", "view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s"),
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"),
        )
    )
    n = pivoted.count()
    dt = time.perf_counter() - t0
    assert n == 100_000
    assert dt < 120, f"lifecycle pivot took {dt:.1f}s on 10M rows"


def test_keyed_dedup_10m(big_events):
    t0 = time.perf_counter()
    out = dedup_first_row(
        big_events.select("user_id", "event_id", "ts"),
        keys=["user_id"],
        order_by=[F.col("ts"), F.col("event_id")],
    )
    assert out.count() == 100_000
    assert time.perf_counter() - t0 < 120


def test_sessionize_10m(big_events):
    t0 = time.perf_counter()
    stats = session_stats(
        big_events.select("user_id", "ts"), key="user_id", ts_col="ts", gap_seconds=1800
    )
    agg = stats.agg(
        F.sum("n_events").alias("total"), F.count(F.lit(1)).alias("n_sessions")
    ).collect()[0]
    assert agg["total"] == N  # every event in exactly one session
    # gaps ≤1800s for ranks 0..50, >1800s after → exactly 50 sessions/user
    assert agg["n_sessions"] == 100_000 * 50
    assert time.perf_counter() - t0 < 180


@pytest.fixture(scope="module")
def big_docs(spark):
    """1M synthetic docs × 12 tokens (12M tokens), generated distributed
    from spark.range — exercises the explode-heavy text operators an
    order of magnitude past the parquet fixtures."""
    words = F.array(*[F.lit(f"w{i}") for i in range(50)])
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(11)),
        lambda i: F.element_at(
            words, ((F.col("id") * 31 + i * 7919) % 50 + 1).cast("int")
        ),
    )
    return spark.range(1_000_000).select(
        F.col("id").alias("doc_id"), F.array_join(toks, " ").alias("text")
    )


def test_token_entropy_12m_tokens(big_docs):
    """Two map-side-combinable aggregates over 12M exploded tokens —
    the token_entropy_quality shape at 2000x the sf0.001 fixture."""
    from parcel_analytics_etl_notebook_spark.functions.textfns import tokens

    t0 = time.perf_counter()
    c = (
        big_docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = c.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    ent = (
        c.join(n, on="doc_id")
        .groupBy("doc_id")
        .agg((-F.sum(p * F.log2(p))).alias("entropy"))
    )
    assert ent.count() == 1_000_000
    assert time.perf_counter() - t0 < 180


def test_transition_matrix_10m(big_events):
    """lead-window transition counts on 10M events / 100k users: one
    user_id shuffle, |types|^2-row output."""
    from pyspark.sql import Window

    t0 = time.perf_counter()
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = big_events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy("event_type", "next_type").count()
    rows = counts.collect()
    # 6-value cycle of event types -> every observed transition count
    # sums to N minus one per user
    assert sum(r["count"] for r in rows) == N - 100_000
    assert time.perf_counter() - t0 < 180


def test_cdc_snapshot_10m(big_events):
    """CDC latest-state on 10M changes / 100k keys: the top-1 window +
    count share one key shuffle; output is O(keys). Every user's
    highest-(ts, event_id) row has rank 99 (ranks 51..99 strictly
    increase in ts), whose event_type cycles with id — keys whose last
    change is a tombstone-equivalent drop out."""
    import time as _t

    from pyspark.sql import Window

    t0 = _t.perf_counter()
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("user_id")
    snap = (
        big_events.withColumn("rn", F.row_number().over(w))
        .withColumn("n_changes", F.count(F.lit(1)).over(wc))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select("user_id", "value", "n_changes")
    )
    n = snap.count()
    assert n == 100_000  # no 'error' type in the synthetic cycle
    assert _t.perf_counter() - t0 < 180


def test_funnel_10m(big_events):
    """Ordered signup→view→purchase funnel over 10M events: the
    sessionizer and both step windows must complete on one user_id
    exchange; output is one row."""
    import time as _t

    from pyspark.sql import Window

    from parcel_analytics_etl_notebook_spark.operators.sessionize import (
        sessionize,
    )

    t0 = _t.perf_counter()
    s = sessionize(
        big_events.select("user_id", "ts", "event_type"),
        key="user_id",
        ts_col="ts",
        gap_seconds=1800,
    )
    ws = Window.partitionBy("user_id", "session_idx")
    s1 = s.withColumn(
        "t_signup",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(ws),
    )
    s2 = s1.withColumn(
        "t_view",
        F.min(
            F.when(
                (F.col("event_type") == "view")
                & (F.col("ts") >= F.col("t_signup")),
                F.col("ts"),
            )
        ).over(ws),
    )
    sess = s2.groupBy("user_id", "session_idx").agg(
        F.max(F.col("t_signup").isNotNull()).alias("has_signup"),
        F.max(F.col("t_view").isNotNull()).alias("has_view"),
    )
    row = sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("has_signup") & F.col("has_view")).cast("long")).alias(
            "qualified"
        ),
    ).collect()[0]
    assert row["n_sessions"] == 100_000 * 50
    assert row["qualified"] > 0
    assert _t.perf_counter() - t0 < 240


def test_curation_funnel_150k_docs(spark, tmp_path):
    """The full curation runner (quality → exact dedup → LSH near-dedup
    → decontamination → publish) over 150k distributed-generated docs
    with PLANTED duplicate structure: 20% byte-copy their cluster head
    (exact dedup must remove exactly that mass) and a further 10% share
    the head's 30-token body under a different lead token (near-dups —
    LSH + connected components must catch most of them, probabilistic
    by construction). ~4M shingles, no all-pairs blowup, bounded time."""
    import os

    from parcel_analytics_etl_notebook_spark.plans.curation_run import (
        run_curation,
    )

    n = 150_000
    words = F.array(*[F.lit(f"tok{i}") for i in range(211)])
    # ids ending 8,9 byte-copy head (id - id%10); ids ending 7 reuse the
    # head BODY under their own lead token (near-dup, survives exact
    # dedup); everyone else is their own head
    tail = F.col("id") % 10
    head = F.when(tail >= 7, F.col("id") - tail).otherwise(F.col("id"))
    # token choice must be a NON-LINEAR hash of (head, position): any
    # affine formula (head*a + i*b) mod m aliases shifted sequences —
    # doc families sharing 27/29 shingles — which packs LSH buckets and
    # OOMs the pair join on a 1g test heap (observed with %211 and
    # %1000003 variants both); xxhash64 kills the shift structure
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.element_at(
            words, (F.pmod(F.xxhash64(head, i), F.lit(211)) + 1).cast("int")
        ),
    )
    lead = F.when(tail.isin(8, 9), head).otherwise(F.col("id"))
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("u"), lead.cast("string"), F.lit(" "),
            F.array_join(toks, " "),
        ).alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("fr"), F.lit("de")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
        F.element_at(
            F.array(F.lit("web"), F.lit("wiki")),
            (F.col("id") % 2 + 1).cast("int"),
        ).alias("source"),
    )

    t0 = time.perf_counter()
    out = str(tmp_path / "cur150k")
    os.makedirs(out)
    result = run_curation(spark, docs, out, holdout_pct=2)
    funnel = {s["stage"]: s["docs"] for s in result["funnel"]}

    assert funnel["raw"] == n
    # quality heuristics pass the synthetic texts (31 tokens, high
    # uniqueness) — nothing should be dropped there
    assert funnel["quality"] == n
    # exact dedup removes exactly the planted byte-copies: 2 of every 10
    assert funnel["exact_dedup"] == n - (n // 10) * 2
    # near-dedup catches MOST of the planted body-sharers (each ~0.8
    # Jaccard to its head; 4x4 LSH banding catches ~90% in expectation)
    # — at least half, and at most the planted mass plus a small
    # allowance for chance band collisions among 120k random docs
    # (observed ~0.4%: collisions chain into components and drop extra
    # members — recall/precision tuning is the LSH parameter trade, not
    # a pipeline defect)
    near_removed = funnel["exact_dedup"] - funnel["near_dedup"]
    assert (n // 10) // 2 <= near_removed <= (n // 10) + n // 100
    assert funnel["near_dedup"] >= funnel["decontaminated"] > 0
    published = spark.read.parquet(os.path.join(out, "curated")).count()
    assert published == funnel["budgeted"]
    assert time.perf_counter() - t0 < 300


def test_sketches_10m(spark, big_events):
    """All four relational sketches over the 10M-row stream: each
    collapses to a model-sized frame (d·W grid / ≤m bits / ≤m registers
    / ≤k values) with estimates in the right neighborhood — the shapes
    hold past the 60k-row fixtures."""
    from parcel_analytics_etl_notebook_spark.operators.sketches import (
        HLL_M,
        KMV_K,
        bloom_build,
        cms_build,
        hll_estimate_expr,
        hll_registers,
        kmv_sketch,
    )

    items = big_events.select(F.col("event_type").alias("w"))
    t0 = time.perf_counter()
    grid = cms_build(items, "w", depth=4, width=256).collect()
    assert len(grid) <= 4 * 256
    assert sum(r["cnt"] for r in grid) == 4 * N

    users = big_events.select(F.col("user_id").cast("string").alias("u"))
    regs = hll_registers(users, "u")
    assert regs.count() <= HLL_M
    est = hll_estimate_expr(regs).head()[0]
    assert abs(est - 100_000) / 100_000 < 0.5, est  # 64 registers ≈ 13% σ

    sample_users = users.distinct().limit(1000)
    bits = bloom_build(sample_users, "u", k=3, m=65536)
    assert bits.count() <= 65536

    kmv = kmv_sketch(
        users.select(F.lit("a").alias("side"), F.col("u").alias("gv")),
        "gv",
        "side",
    )
    assert kmv.count() <= KMV_K
    elapsed = time.perf_counter() - t0
    assert elapsed < 240, f"sketch smoke too slow: {elapsed:.0f}s"


def test_global_indexing_family_10m(big_events):
    """The literal-boundary indexing family at 10M rows: a global index
    over (value, event_id) — continuous leading key, heavy machinery —
    and a fractional rank over the 100-distinct-value column (every
    bucket one giant tie group, the skew extreme). Endpoint identities
    pin correctness without a driver-side sort: max index == row count,
    and the mean fractional rank of ANY frame is exactly (n + 1) / 2."""
    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        global_frac_rank,
        stable_global_index,
    )

    t0 = time.perf_counter()
    idx = stable_global_index(
        big_events.select("event_id", "value"),
        ["value", "event_id"],
        num_partitions=64,
    )
    row = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("global_idx").alias("mx"),
        F.count_distinct("global_idx").alias("nd"),
    ).head()
    assert row["n"] == row["mx"] == row["nd"] == N

    fr = global_frac_rank(
        big_events.select("event_id", "value"), "value", out_col="fr"
    )
    mean_fr = fr.agg(F.avg("fr")).head()[0]
    assert abs(mean_fr - (N + 1) / 2) < 1e-3, mean_fr
    elapsed = time.perf_counter() - t0
    assert elapsed < 240, f"indexing smoke too slow: {elapsed:.0f}s"
