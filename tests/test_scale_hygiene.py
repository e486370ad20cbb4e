"""Scale-hygiene verification: bucketed co-located joins (no Exchange),
salted join equivalence, AQE coalescing — the knobs SURVEY §4.2/§7.7
promises for the 100 TB path, proven on the physical plan."""

from __future__ import annotations

import contextlib
import io
import shutil

import pytest
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.operators.skew import (
    salted_join_small,
    with_salt,
)
from parcel_analytics_etl_notebook_spark.plans.catalog import table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key join WITHOUT any shuffle —
    the co-located join layout for repeated big-big joins at scale."""
    orders = table(spark, SF, "orders")
    customer = table(spark, SF, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (
        orders.write.bucketBy(4, "o_custkey")
        .sortBy("o_custkey")
        .option("path", str(tmp_path / "b_orders"))
        .saveAsTable("b_orders")
    )
    (
        customer.write.bucketBy(4, "c_custkey")
        .sortBy("c_custkey")
        .option("path", str(tmp_path / "b_customer"))
        .saveAsTable("b_customer")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        p = _plan(joined)
        # the invariant is the LAYOUT, not the join algorithm: bucketed
        # tables join with no exchange. The assertion is algorithm-
        # agnostic BY DESIGN (either shuffle-free join strategy
        # satisfies it) — the session keeps Spark's default
        # preferSortMergeJoin=true (the r12 SHJ experiment was reverted
        # after an interleaved A/B; see session.py)
        assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p)
        assert "Exchange" not in p  # bucket layout replaces the shuffle
        assert joined.count() == orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_join_matches_plain_join(spark):
    """Salting is a pure layout change: row-identical to the plain join."""
    orders = table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_orderstatus")
    status_dim = spark.createDataFrame(
        [("O", "open"), ("F", "finished"), ("P", "pending")],
        "o_orderstatus string, status_name string",
    )
    salted = salted_join_small(
        orders, status_dim, on="o_orderstatus", unique_col="o_orderkey", buckets=8
    )
    plain = orders.join(status_dim, on="o_orderstatus")
    assert salted.count() == plain.count()
    assert (
        salted.select("o_orderkey", "status_name")
        .subtract(plain.select("o_orderkey", "status_name"))
        .count()
        == 0
    )


def test_salt_is_deterministic_and_bounded(spark):
    df = with_salt(table(spark, SF, "orders"), "o_orderkey", 16)
    stats = df.agg(
        F.min("__salt"), F.max("__salt"), F.count_distinct("__salt")
    ).collect()[0]
    assert stats[0] >= 0 and stats[1] <= 15 and stats[2] > 8
    a = df.select("o_orderkey", "__salt").collect()
    b = df.select("o_orderkey", "__salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_aqe_coalesces_small_shuffle(spark):
    """With AQE on, a tiny aggregation doesn't keep 8 configured shuffle
    partitions — runtime coalescing collapses them."""
    df = table(spark, SF, "orders").groupBy("o_orderstatus").count()
    df.collect()
    # AQE rewrites the final plan; the executed plan shows coalesced reads
    assert "AQEShuffleRead" in df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitionBy(day) sink + day-filtered scan: the filter
    must land in PartitionFilters (directory pruning — at 100 TB this is
    the difference between scanning one day and scanning the lake)."""
    from parcel_analytics_etl_notebook_spark.plans.catalog import table
    from parcel_analytics_etl_notebook_spark.plans.diagnostics import formatted_plan
    from parcel_analytics_etl_notebook_spark.sources.writers import write_parquet

    path = str(tmp_path / "events_by_day")
    ev = table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts")
    )
    write_parquet(ev, path, partition_by=["day"])

    one_day = ev.select(F.min("day")).collect()[0][0]
    scan = spark.read.parquet(path).filter(F.col("day") == F.lit(one_day))
    plan = formatted_plan(scan)
    assert "PartitionFilters" in plan
    # the day predicate must appear in PartitionFilters, not as a row filter
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "day" in pf_line
    # pruned scan reads exactly the one day's rows
    assert scan.count() == ev.filter(F.col("day") == F.lit(one_day)).count() > 0


def test_global_index_avoids_single_partition_window(spark):
    """stable_global_index must never plan the global-Window shape
    (Exchange SinglePartition) — the one-task bottleneck it exists to
    avoid — and must agree with the naive form row-for-row."""
    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        stable_global_index,
    )
    from parcel_analytics_etl_notebook_spark.plans.diagnostics import formatted_plan
    from pyspark.sql import Window

    orders = table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_orderdate"
    )
    idx = stable_global_index(orders, ["o_orderdate", "o_orderkey"])
    plan = formatted_plan(idx)
    # the range exchange happens before the internal localCheckpoint
    # (lineage-truncated), so the visible plan is the window stage: it
    # must partition by __pid, never collapse to a single partition
    assert "SinglePartition" not in plan
    assert "__pid" in plan

    naive = orders.withColumn(
        "global_idx",
        F.row_number()
        .over(Window.orderBy("o_orderdate", "o_orderkey"))
        .cast("bigint"),
    )
    assert sorted(idx.collect()) == sorted(naive.collect())


def test_zorder_layout_narrows_file_stats(spark, tmp_path):
    """Writing files clustered by a 2-D Z-order key must shrink the
    per-file min/max span of BOTH dimensions vs a round-robin layout —
    that span is exactly the statistic parquet readers prune on. A
    single-dimension sort can only narrow its own column; Z-order
    narrows both at once."""
    import glob

    import pyarrow.parquet as pq

    from parcel_analytics_etl_notebook_spark.functions.zorder import zorder_key_2d

    ev = table(spark, SF, "events").select(
        "user_id", F.dayofyear("ts").alias("day")
    )
    n_files = 8

    def total_spans(path: str) -> tuple[int, int]:
        su = sd = 0
        for f in glob.glob(f"{path}/*.parquet"):
            t = pq.read_table(f, columns=["user_id", "day"])
            u, d = t["user_id"].to_pylist(), t["day"].to_pylist()
            if u:
                su += max(u) - min(u)
                sd += max(d) - min(d)
        return su, sd

    rr = str(tmp_path / "roundrobin")
    ev.repartition(n_files).write.mode("overwrite").parquet(rr)

    zo = str(tmp_path / "zordered")
    key = zorder_key_2d(F.col("user_id"), F.col("day"), bits=10)
    (
        ev.withColumn("__z", key)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(zo)
    )

    rr_u, rr_d = total_spans(rr)
    zo_u, zo_d = total_spans(zo)
    # both dimensions must get materially tighter (each file covers a
    # rectangle of the (user, day) grid instead of the whole range)
    assert zo_u < rr_u * 0.8
    assert zo_d < rr_d * 0.8


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """Spark's runtime bloom filter (on by default) semi-join-reduces a
    shuffle join: the selective dim side builds a bloom filter that
    prunes fact rows BEFORE the exchange. Size thresholds gate it
    (application side must scan > applicationSideScanSizeThreshold, 10GB
    by default — exactly the 100-TB regime); lowered here to prove the
    injection fires, since sf-test scans are far below the gate."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
        sel = orders.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_totalprice"
        )
        j = lineitem.join(sel, lineitem.l_orderkey == sel.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan.lower()  # bloom probe on fact side
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


#: Catalog queries allowed to plan a Window over an Exchange
#: SinglePartition, each with the reason its input frame is BOUNDED
#: (does not scale with the fact tables). Every other catalog query
#: must plan zero single-partition windows — the two row-grain
#: offenders VERDICT r03 named (spearman_spend_balance,
#: doc_length_deciles) were rewritten onto the two-pass operators in
#: operators/indexing, as were score_calibration_deciles,
#: rfm_segmentation, ks_drift_acctbal and the pareto skyline.
BOUNDED_WINDOW_OK = {
    "acf_daily_revenue": "lag windows over the day-grain revenue series (calendar-bounded)",
    "benford_first_digit": "window-fold over the 9-digit frame",
    "bootstrap_mean_ci": "rank window over the 50 replicate means (bounded by test design)",
    "chi2_priority_status": "window-fold over the priority×status contingency cells",
    "cuped_adjusted_lift": "window-fold over the 2-arm summary frame",
    "cusum_changepoint": "cumulative window over day-grain sums (calendar-bounded)",
    "daily_value_anomalies": "rolling frames over the day-grain series (calendar-bounded)",
    "hybrid_rrf_retrieval": "rank windows over per-query top-k candidate sets (k-capped)",
    "kaplan_meier_signup_purchase": "cumulative log-sum over distinct durations (≤ days of history)",
    "largest_remainder_quota": "remainder-rank window over the quota category frame",
    "mixture_temperature_rebalance": "window-fold over the source-grain weight frame",
    "mom_revenue_growth": "lag window over month-grain revenue (calendar-bounded)",
    "mutual_information_type_dow": "window-fold over the type×dow contingency cells",
    "peak_concurrent_orders": "sweep-line cumulative window over day-grain endpoint deltas (calendar-bounded)",
    "psi_acctbal_drift": "window-fold over the 10-bin counts frame",
    "randomization_test_acctbal": "extremity window over the 200 permutation means (bounded by K)",
    "rfm_segmentation": "exact_ntile_bounded value-grain folds: recency is calendar-bounded, frequency order-count-bounded (monetary takes the full distributed exact_ntile)",
    "roc_auc_embedding_dim": "cumulative window over 6dp-rounded distinct scores (≤2M values)",
    "session_entry_exit_stats": "window-fold over the event-type-grain rollup",
    "weighted_sliding_regression": "sliding RANGE window over the day-grain order partials (calendar-bounded)",
    "compaction_task_plan": "cumulative window over the file-manifest frame (one row per FILE — manifest-grain, like real table-maintenance planners)",
    "ivf_list_balance": "unbounded-window total over the 8-row centroid-list frame (model-sized)",
    "ivf_nprobe_recall_curve": "centroid query-rank window over the 8-row centroid frame (model-sized)",
    "vocab_size_oov_sweep": "rank window over the TYPE-grain vocabulary frame; docstring names the per-partition top-V merge as the wider-vocab path",
    "token_budget_waterfill": "sorted-prefix and water-level windows over the SOURCE-grain demand frame (tens of rows — a catalog constant, never data volume)",
    "snb_sampled_recall": "cumulative-sum admission window over the POST-AGGREGATION stratum frame (n/1000 rows, never the corpus) — the r11 distributed rewrite of the former driver-side collect+sort; bounded three orders of magnitude below the data by the kiloblock grain",
}


def test_no_row_grain_single_partition_window(spark):
    """Plan fence (VERDICT r03 #5): no catalog query may plan a Window
    over Exchange SinglePartition unless its input frame is bounded —
    annotated in BOUNDED_WINDOW_OK with the reason. A new query that
    sneaks a global-sort window over a fact-scaling frame fails here;
    so does a stale annotation after a rewrite (the fence is exact in
    both directions, like the shuffle budget)."""
    from parcel_analytics_etl_notebook_spark.plans.catalog import queries
    from tools.window_audit import single_partition_windows

    qs = queries()
    hits = {}
    for name in sorted(qs):
        spark.catalog.clearCache()
        n = single_partition_windows(qs[name](spark, SF))
        if n:
            hits[name] = n
    unexplained = sorted(set(hits) - set(BOUNDED_WINDOW_OK))
    stale = sorted(set(BOUNDED_WINDOW_OK) - set(hits))
    assert not unexplained, (
        "single-partition window over a potentially fact-scaling frame "
        f"(rewrite via operators/indexing or annotate): {unexplained}"
    )
    assert not stale, f"stale BOUNDED_WINDOW_OK annotations: {stale}"
