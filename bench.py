"""Benchmark harness (driver contract): run the catalog's headline
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line with per-query and
total wall-clock seconds.

Each query is forced with a noop sink (full distributed execution, no
driver collect) — the number measures the plan, not Arrow transfer.

The printed line carries only the HEADLINE subset (2-decimal), kept
well under the driver's stdout-tail capture limit — round 1's full
92-query line was truncated to unparseable (BENCH_r01.json
"parsed": null). The full per-query map for all catalog queries is
written to BENCH_DETAIL.json beside this file.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# One per operator family — relational core, star/joins, windows, dedup
# (exact, minhash/LSH/simhash/ngram, near-dup groups), ANN, text QA,
# sessionization, global index, contamination. Keep ≤ ~25 entries so the
# printed JSON line stays < 1 KB.
HEADLINE_QUERIES = frozenset(
    {
        "lifecycle_kpis",
        "pricing_summary",
        "star_fact_orders",
        "enriched_orders",
        "market_segment_stats",
        "top_orders_per_customer",
        "running_revenue",
        "purchase_asof_view",
        "exact_dedup_documents",
        "minhash_signatures",
        "lsh_near_dup_pairs",
        "ngram_jaccard_pairs",
        "simhash_fingerprints",
        "near_dup_groups",
        "cosine_dedup_pairs",
        "ann_cosine_topk",
        "ivf_ann_topk",
        "text_quality_scores",
        "token_stats_by_source",
        "split_contamination_rate",
        "user_sessions_30min",
        "orders_global_index",
    }
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    from parcel_analytics_etl_notebook_spark.plans import catalog
    from parcel_analytics_etl_notebook_spark.session import get_spark

    spark = get_spark(
        app_name="engine-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            # bench hygiene: no UI/listener bookkeeping across ~55 jobs
            "spark.ui.enabled": "false",
            "spark.sql.ui.retainedExecutions": "10",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = catalog.queries()
    # JVM/codegen warmup + first-touch of every table (footer reads, nanos
    # conversion) so per-query numbers measure the plan, not cold scans
    qs["lifecycle_kpis"](spark, sf_dir).collect()
    from parcel_analytics_etl_notebook_spark.sources.readers import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        catalog.table(spark, sf_dir, t).count()

    # Host calibration: per-action scheduling overhead (median of 20
    # trivial jobs). Short-query walls at small SF are dominated by this
    # fixed cost, and it varies SEVERALFOLD across rounds on shared
    # hosts — cross-round per-query comparisons should normalize by it
    # before calling a ratio a regression.
    cal = []
    for _ in range(20):
        c0 = time.perf_counter()
        spark.range(1).count()
        cal.append(time.perf_counter() - c0)
    action_overhead_ms = round(sorted(cal)[len(cal) // 2] * 1000, 1)

    # Repeat policy (VERDICT r04 #5, widened r06 per VERDICT r05 #4):
    # short-query walls are dominated by per-job scheduling overhead that
    # drifts severalfold across rounds on shared hosts, so sub-second
    # "regressions" were pure noise. Each query runs once; it gets extra
    # runs when (a) its first wall is under REPEAT_T1 (second run; third
    # under REPEAT_T2), (b) it is in the always-repeat adjudication set,
    # or (c) — the r06 addition, closing the >1s blind spot that left
    # ngram_jaccard_pairs' 2.07× drift a single sample — its first wall
    # exceeds REGRESS_RATIO × its prior-round recorded wall (read from
    # the previous BENCH_DETAIL_r*.json). The recorded wall is the MIN
    # of its runs — scheduling noise is strictly additive, so min is the
    # best estimator of true plan cost — and every run is kept in
    # BENCH_DETAIL's "query_runs" so a reader can reconstruct variance.
    # Forced repeats are skipped above REPEAT_CEIL_S (a 10s+ wall is not
    # noise) and each repeat is launched only if the first-run wall fits
    # the remaining budget, so the cap cannot overshoot by a full run.
    REPEAT_T1, REPEAT_T2, REPEAT_BUDGET_S = 1.0, 0.4, 160.0
    REGRESS_RATIO, REPEAT_CEIL_S = 1.5, 10.0
    FORCE_3RUNS = {
        # cross-round adjudication set (VERDICT r04 #3/#8, r05 #4, r06 #1:
        # winnowing rode the prior-round lookup blind spot at 6.34s single-
        # sample — adjudicate it with forced repeats this round)
        "token_counts_salted", "approx_token_percentiles",
        "ewma_value_bands", "pareto_customers",
        "multimodal_features", "expression_key_join",
        "ngram_jaccard_pairs", "near_dup_groups", "near_dup_dedup_summary",
        "winnowing_fingerprint_pairs",
    }

    import glob
    import re as _re

    here = os.path.dirname(os.path.abspath(__file__))

    # Round number FIRST: the per-round snapshot name AND the prior-round
    # baseline both key off it. rnd = 1 + highest driver-recorded
    # BENCH_r{N}.json, overridable via SPARK_GRAFT_ROUND.
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := _re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    rnd = int(os.environ.get("SPARK_GRAFT_ROUND", max(rounds, default=0) + 1))

    # Prior-round baseline for the >REGRESS_RATIO repeat trigger: the
    # newest BENCH_DETAIL_r*.json with round STRICTLY BELOW the round
    # being written (VERDICT r06 #1 — the old "latest file on disk" rule
    # picked the builder's own same-round snapshot during driver runs,
    # so the trigger compared a round to itself and never fired; that is
    # exactly how winnowing's 1.55x drift got zero repeat runs). Glob
    # hits are regex-filtered before sorting so a stray non-numeric
    # BENCH_DETAIL_r*.json can never crash the sort (ADVICE r06).
    prior: dict[str, float] = {}
    prior_files = sorted(
        (
            (int(m.group(1)), p)
            for p in glob.glob(os.path.join(here, "BENCH_DETAIL_r*.json"))
            if (m := _re.search(r"_r(\d+)\.json$", p))
        ),
    )
    prior_files = [p for (k, p) in prior_files if k < rnd]
    if prior_files:
        try:
            with open(prior_files[-1]) as f:
                prior = json.load(f).get("queries", {})
        except (OSError, ValueError):
            prior = {}

    sc = spark.sparkContext
    n_jobs: dict[str, int] = {}

    def _timed_noop(df_factory, group: str) -> float:
        """Run one noop-sink action under a unique job group, record the
        group's job count (deterministic per plan — the noise-free cost
        signal walls can't give; see tools/job_profile.py), return wall."""
        sc.setJobGroup(group, group)
        t0 = time.perf_counter()
        df_factory().write.format("noop").mode("overwrite").save()
        w = time.perf_counter() - t0
        sc.setJobGroup("", "")
        jids = sc.statusTracker().getJobIdsForGroup(group)
        base = group.split("#", 1)[0]
        # job count is per-plan deterministic; keep the max across runs
        # (a memoized artifact being warm can only REMOVE jobs)
        n_jobs[base] = max(n_jobs.get(base, 0), len(jids))
        return w

    _memo_block_ids: set[int] = set()

    def _drop_stray_checkpoints() -> None:
        """Unpersist checkpoint blocks that are NOT the sweep memos'.
        ``clearCache`` only reaches the SQL cache manager; queries that
        localCheckpoint per-iteration frames (kcore_bounded_peel's 5
        peel rounds) would otherwise accumulate blocks across their
        repeats (ADVICE r06). Targeted by RDD id so the memo artifacts
        stay warm."""
        try:
            for rid, jrdd in spark.sparkContext._jsc.getPersistentRDDs().items():
                if int(rid) not in _memo_block_ids:
                    jrdd.unpersist(False)
        except Exception:
            pass

    def run_once(name: str, run_idx: int) -> float:
        w = _timed_noop(
            lambda: qs[name](spark, sf_dir), f"{name}#{run_idx}"
        )
        # queries that persist intermediates would otherwise hold executor
        # memory into later timings — isolate each measurement
        spark.catalog.clearCache()
        _drop_stray_checkpoints()
        return w

    runs: dict[str, list[float]] = {}
    extra_spent = 0.0

    # ---- memo ledger phase (VERDICT r06 #5 / ADVICE r06) ----
    # Shared sweep artifacts (near-dup pair table, co-purchase edge list)
    # are materialized and timed as their OWN ledger lines (memo:<key>)
    # BEFORE the query sweep, so every query's recorded wall is its
    # MARGINAL cost and per-query walls are order-independent — the r06
    # numbers charged the full build to whichever query ran first
    # (kcore_bounded_peel paid the edge build local_clustering_coefficient
    # free-rode). Each repeat drops the memo reference first so the
    # rebuild runs the full job; stale checkpoint blocks from dropped
    # repeats are reclaimed by release_caches below, after which every
    # memo is rebuilt once (untimed) so the sweep starts warm.
    memo_built_by: dict[str, str] = {}
    for key, builder in sorted(catalog.MEMO_BUILDERS.items()):
        line = f"memo:{key}"
        memo_built_by[key] = line

        def memo_once(run_idx: int, *, _k=key, _b=builder, _l=line) -> float:
            catalog.drop_memo(spark, sf_dir, _k)
            w = _timed_noop(
                lambda: _b(spark, sf_dir), f"{_l}#{run_idx}"
            )
            spark.catalog.clearCache()
            return w

        runs[line] = [memo_once(i) for i in range(3)]
        extra_spent += sum(runs[line][1:])
    catalog.release_caches(spark)
    for key, builder in sorted(catalog.MEMO_BUILDERS.items()):
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    try:
        _memo_block_ids.update(
            int(rid)
            for rid in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        )
    except Exception:
        pass

    for name in sorted(qs):
        w = run_once(name, 0)
        runs[name] = [w]
        want = 1
        # needs adjudication when this round's wall jumped >1.5x the
        # prior round — or when the query is NEW this round (no prior
        # entry): its first-ever recorded wall should not be a single
        # cold sample (r06: kcore_bounded_peel read 8.4s cold, ~3s warm)
        regressed = (
            bool(prior)
            and (name not in prior or w > REGRESS_RATIO * prior[name])
        )
        if name in FORCE_3RUNS:
            want = 3
        elif w < REPEAT_T2:
            want = 3
        elif w < REPEAT_T1 or regressed:
            want = 2
        if w > REPEAT_CEIL_S and not regressed:
            # multi-second walls are not scheduling noise — EXCEPT when
            # this round's wall jumped >1.5x the prior round: that is
            # exactly the case the repeat exists to adjudicate (r06:
            # kmeans_centroids read 10.97s cold, 4.3/3.7 on repeats)
            want = 1
        while (
            len(runs[name]) < want
            and extra_spent + w < REPEAT_BUDGET_S
        ):
            w2 = run_once(name, len(runs[name]))
            runs[name].append(w2)
            extra_spent += w2
    timings = {n: round(min(ws), 4) for n, ws in runs.items()}
    first_runs = {n: ws[0] for n, ws in runs.items()}
    # Overhead-corrected walls (VERDICT r06 #4): wall − n_jobs × the
    # round's median per-action overhead. Job counts are per-plan
    # deterministic, so cross-round ratios of wall_corrected measure the
    # PLAN — r06's entire "regression" cloud (token_stats_by_source
    # +129%, zipf +147%, each ~8 short jobs under 2.1× host overhead)
    # self-resolves to ~1.0× under this correction.
    _oh_s = action_overhead_ms / 1000.0
    corrected = {
        n: round(max(0.0, t - n_jobs.get(n, 0) * _oh_s), 4)
        for n, t in timings.items()
    }

    total = round(sum(timings.values()), 4)
    # first_run_total: the sum of every query's FIRST wall — the number
    # that is like-for-like comparable with rounds 1-4's single-run
    # policy (ADVICE r05 #1). `value` stays min-of-runs.
    first_run_total = round(sum(first_runs.values()), 4)
    # `total` spans queries PLUS memo lines — the full honest sweep cost
    # (the build seconds moved out of query walls into memo lines, the
    # sum stays round-over-round comparable)
    detail = {"metric": "catalog_total_wall", "value": total, "unit": "sec",
              "queries": timings, "sf": sf, "n_queries": len(qs),
              "n_memo_lines": len(catalog.MEMO_BUILDERS),
              "action_overhead_ms": action_overhead_ms,
              # full calibration series (VERDICT r05 #8): lets cross-round
              # ratio analysis subtract jobs × overhead per query instead
              # of eyeballing the median
              "overhead_samples_ms": [round(c * 1000, 2) for c in cal],
              # per-plan deterministic job counts + overhead-corrected
              # walls (VERDICT r06 #4) — compare THESE across rounds
              "n_jobs": dict(sorted(n_jobs.items())),
              "queries_corrected": corrected,
              # which ledger line paid each shared-artifact build
              # (ADVICE r06): always the memo's own line since the
              # memo-timing phase runs before the sweep
              "memo_built_by": memo_built_by,
              "first_run_total": first_run_total,
              "bench_policy": "best-of-n (min of runs); repeats under "
              f"{REPEAT_T1}s walls or >{REGRESS_RATIO}x prior-round wall "
              f"(prior = newest BENCH_DETAIL round < r{rnd:02d}), "
              f"skipped above {REPEAT_CEIL_S}s, "
              f"capped at {REPEAT_BUDGET_S}s extra; memo:<key> lines are "
              "3-run timed builds of shared artifacts, queries pay "
              "marginal cost",
              "query_runs": {n: [round(w, 4) for w in ws]
                             for n, ws in runs.items() if len(ws) > 1}}
    # stable name (latest) PLUS a per-round snapshot so per-query
    # regressions diff across rounds without git archaeology (ADVICE
    # r03 #8); rnd computed above, before the prior-round lookup.
    for fname in ("BENCH_DETAIL.json", f"BENCH_DETAIL_r{rnd:02d}.json"):
        with open(os.path.join(here, fname), "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
    headline = {
        n: round(t, 2) for n, t in timings.items() if n in HEADLINE_QUERIES
    }
    # `value` is the FULL catalog total so round-over-round comparisons
    # of this line measure performance, never a reporting change (the
    # r01→r02 `value` mixed metrics; see ADVICE.md). The per-query map
    # still carries only the headline subset to keep the line < 1 KB for
    # the driver's stdout-tail capture — full map in BENCH_DETAIL.json.
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": round(total, 2),
                "unit": "sec",
                "queries": headline,
                "sf": sf,
                "headline_total_sec": round(sum(headline.values()), 2),
                "catalog_n": len(qs),
                "action_overhead_ms": action_overhead_ms,
                "first_run_total": round(first_run_total, 2),
                "n_runs_max": max(len(ws) for ws in runs.values()),
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
