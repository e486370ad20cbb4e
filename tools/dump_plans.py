"""Regenerate PLANS.md: annotated physical-plan snapshots for the
engine's representative queries at sf0.001 (plan SHAPE is what the
snapshot pins; shapes are scale-invariant for these queries — the
size-driven choices are asserted separately in tests/test_plans.py and
tests/test_scale_hygiene.py).

Usage:  python tools/dump_plans.py   (rewrites PLANS.md at the repo root)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF = "/root/testdata/sf0.001"

# (query, what the plan demonstrates)
SHOWCASE: list[tuple[str, str]] = [
    (
        "snb_sampled_recall",
        "Distributed budget admission (r11): the greedy stratum prefix is "
        "a cumulative-sum Window over the POST-AGGREGATION stratum frame "
        "(model-sized — the only single-partition window, annotated), the "
        "admitted keys broadcast into a left-semi join BEFORE the "
        "within-stratum self-join, and the admitted-strata count rides a "
        "1-row BroadcastNestedLoopJoin (the scalar-subquery shape) — no "
        "driver-side collect anywhere in the admission path.",
    ),
    (
        "fs_em_mstep",
        "Iterative EM fully inside one plan: ONE data pass (SNB candidate "
        "generation + an 8-group conditional count aggregate), then all "
        "K iterations fold into projections over the 1-row frame — no "
        "joins, no shuffles, no driver round-trips; the trajectory "
        "materializes via a single Generate (inline) node.",
    ),
    (
        "pricing_summary",
        "Scan-level filter pushdown + column pruning: the shipdate predicate "
        "lands in PushedFilters, ReadSchema carries only the aggregated "
        "columns, and the whole aggregate is one partial/final hash-agg pair.",
    ),
    (
        "star_fact_orders",
        "Star-schema fact build: all four dimension joins are "
        "BroadcastHashJoin (no SortMergeJoin, no shuffle of the fact side).",
    ),
    (
        "top_orders_per_customer",
        "Per-key top-k: WindowGroupLimit prunes map-side before the single "
        "key exchange — no global sort, no full-history shuffle.",
    ),
    (
        "ann_cosine_topk",
        "Brute-force ANN: the query vector is a broadcast 1-row side "
        "(the allowlisted BroadcastNestedLoopJoin), cosine runs in "
        "whole-stage codegen, and TakeOrderedAndProject returns top-k with "
        "per-partition heads instead of a global sort.",
    ),
    (
        "lsh_near_dup_pairs",
        "LSH near-dup candidates: banded signatures meet in an equi-join on "
        "the bucket key — pair generation is bucket-bounded, never a "
        "cartesian.",
    ),
    (
        "cdc_latest_state",
        "Changelog snapshot: the latest-row window and the change-count "
        "window share ONE hash exchange on the key (a single Sort+Window "
        "chain, no second shuffle).",
    ),
    (
        "session_conversion_funnel",
        "Sessionized funnel: gap sessionizer, both step windows, and the "
        "per-session reduce all ride the same user_id exchange.",
    ),
    (
        "orders_global_index",
        "Scalable global row index: two-pass (per-partition count + offset "
        "join) — no single-partition window, the classic zipWithIndex "
        "scale trap avoided.",
    ),
    (
        "value_band_stats_bucketized",
        "Bucketized range join: the interval containment predicate is "
        "rewritten to an equi-join on bucket ids + residual filter — "
        "hash join instead of the nested-loop baseline.",
    ),
    (
        "image_meta_profile",
        "Multimodal ingest: PNG headers are built and parsed map-side "
        "(one ArrowEvalPython/mapInPandas hop); the binary column is gone "
        "before the only exchange, which moves 3 groups of metadata.",
    ),
    (
        "suppliers_kept_orders_waiting",
        "TPC-H Q21 EXISTS/NOT-EXISTS: decorrelated to ONE per-order "
        "aggregate — a single shuffle on the order key, no correlated "
        "re-scans of lineitem.",
    ),
    (
        "token_counts_salted",
        "Skew-safe aggregation: the hot-token groupBy runs as (key, salt) "
        "partials then a final (key) combine — two small exchanges instead "
        "of one skewed one.",
    ),
    (
        "bm25_topk",
        "Inverted-index access relationally: df is computed over tf (no "
        "second corpus pass) and pruned to the QUERY's terms before the "
        "broadcast joins, so only query-term postings reach scoring; the "
        "1-row (n_docs, avgdl) stats ride one broadcast cross join.",
    ),
    (
        "filtered_ann_topk",
        "Filtered vector search: the lang predicate pushes into the "
        "documents scan and the id semi-join prunes the corpus BEFORE any "
        "cosine runs; ranking stays TakeOrderedAndProject.",
    ),
    (
        "diversified_ann_topk",
        "Diversity quotas: per-lang WindowGroupLimit prunes to each "
        "group's top-2 map-side, then a bounded global top-k — one window "
        "instead of greedy MMR's k re-scoring passes.",
    ),
    (
        "pareto_customers",
        "2-D skyline without the quadratic self-join: collapse to per-x "
        "max (one hash exchange), running strictly-preceding max over the "
        "COLLAPSED frame, equi-join back — the NOT EXISTS dominance "
        "definition is the DuckDB oracle only.",
    ),
    (
        "psi_acctbal_drift",
        "PSI drift: decile edges are model-sized driver literals, so bin "
        "assignment is a pure codegen projection — two scans collapse to "
        "a 10-row frame and every normalizer is a window over it (no "
        "1-row cross joins anywhere).",
    ),
    (
        "rolling_7d_active_users",
        "Sliding DISTINCT: not frame-decomposable, so the plan is "
        "collapse-to-day-grain + bounded x7 explode + calendar-bounded "
        "broadcast day grid + one distinct-count exchange — no per-day "
        "re-scan of events.",
    ),
    (
        "semdedup_cluster_pairs",
        "SemDeDup: model-sized centroid broadcast (allowlisted BNLJ), "
        "argmax assignment, then candidate pairs exist only between "
        "ADJACENT rows of each cluster's centroid-similarity sort — one "
        "window, zero pairwise joins.",
    ),
    (
        "spearman_spend_balance",
        "Distributed fractional rank (global_frac_rank): each dimension "
        "is ONE exchange on the literal-boundary bucket with in-bucket "
        "rank/tie-count windows sharing that partitioning plus a "
        "broadcast explode-prefix offsets subtree — no Exchange "
        "SinglePartition anywhere, no value-grain join-back.",
    ),
    (
        "pps_systematic_sample",
        "Weight-proportional systematic sampling: exact BIGINT prefix "
        "sums over the literal-boundary buckets (global_running_sums), "
        "selection as a pure integer-arithmetic projection — the whole "
        "sampler is one shuffle plus a broadcast.",
    ),
    (
        "parts_never_ordered_notin",
        "NOT IN rewritten scalably: shuffled hash LEFT ANTI join (never "
        "the null-aware BroadcastNestedLoopJoin) with the 1-row has-null "
        "scalar gating the bounded brand frame.",
    ),
    (
        "fifo_layer_matching",
        "FIFO queue as relational algebra: two partkey-partitioned window "
        "cumsums, then the layer match is an EQUI-join on partkey (hash "
        "join, never an inequality nested loop) with the cumulative-"
        "quantity interval intersection as a post-join filter; per-key "
        "fan-out is bounded by TPC-H's ~30 lines/part at every SF.",
    ),
    (
        "phrase_match_positional",
        "Positional phrase search: the postings index meets the 20-phrase "
        "probe in a BroadcastHashJoin, the p2/p3 index sides are "
        "broadcast-SEMI-pruned to the probed terms BEFORE any exchange "
        "(only the phrases' own postings lists ever shuffle), and the "
        "phrase selection itself is TakeOrderedAndProject — no "
        "one-partition window, no unpruned self-join.",
    ),
    (
        "zone_map_skip_rates",
        "Lakehouse zone-map pruning as a query: both synthetic layouts "
        "aggregate to a manifest-sized min/max frame (one row per FILE) "
        "in a single map-combined pass over one scan; the non-equi "
        "predicate-overlap probe is the allowlisted "
        "BroadcastNestedLoopJoin of 12 predicate rows against that "
        "manifest frame — nothing data-sized crosses anything.",
    ),
]


def tree_of(spark, name: str) -> str:
    from parcel_analytics_etl_notebook_spark.plans.catalog import queries

    df = queries()[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    # keep the tree section; of the verbose per-node details keep only
    # the parquet-scan blocks (they carry PushedFilters / ReadSchema —
    # the pushdown evidence)
    blocks = text.split("\n\n")
    tree = blocks[0].strip()
    scans = [
        b.strip()
        for b in (blk.strip() for blk in blocks[1:])
        if b and "Scan parquet" in b.splitlines()[0]
    ]
    if scans:
        tree += "\n\n" + "\n\n".join(scans)
    return tree


def main() -> int:
    from parcel_analytics_etl_notebook_spark.session import get_spark

    spark = get_spark(app_name="plan-dump", master="local[4]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical-plan evidence for the headline shapes",
        "",
        "Generated by `python tools/dump_plans.py` (sf0.001; shapes are",
        "scale-invariant — size-driven choices are covered by",
        "tests/test_plans.py and tests/test_scale_hygiene.py asserts).",
        "Each snapshot pins the plan property the query exists to",
        "demonstrate; regenerate after touching any of these queries.",
        "",
    ]
    for name, why in SHOWCASE:
        out += [f"## {name}", "", why, "", "```", tree_of(spark, name), "```", ""]
    path = os.path.join(ROOT, "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
