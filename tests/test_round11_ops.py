"""Round-11 linkage additions: the full EM loop (E+M iterated), the
canonicalized reversed-key third SNB pass and its recall measurement,
and the distributed (window-based, row-co-budgeted) stratum admission
that replaced snb_sampled_recall's driver-side collect (VERDICT r10
#1/#2/#3)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans import queries_relational27

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_fs_em_mstep_trajectory_shape_and_convergence(spark):
    """Iter 0 is exactly the published initials; every parameter stays
    strictly interior across the trajectory (both agree and disagree
    patterns are observed, so no M-step ratio can saturate); and the
    per-iteration p-step shrinks toward the tail — the converging-
    recurrence shape the fixed-K unroll relies on."""
    rows = (
        queries_relational27.fs_em_mstep(spark, SF)
        .orderBy("iter")
        .collect()
    )
    assert [r["iter"] for r in rows] == list(
        range(queries_relational27.FS_EM_ITERS + 1)
    )
    r0 = rows[0]
    assert r0["p"] == queries_relational27.FS_EM_P
    assert r0["m_name"] == queries_relational27.FS_EM_M["name"]
    assert r0["u_balance"] == queries_relational27.FS_EM_U["balance"]
    cols = [
        "p", "m_name", "m_segment", "m_balance",
        "u_name", "u_segment", "u_balance",
    ]
    for r in rows:
        for c in cols:
            assert 0.0 < r[c] < 1.0, (r["iter"], c, r[c])
    deltas = [
        abs(rows[k + 1]["p"] - rows[k]["p"]) for k in range(len(rows) - 1)
    ]
    # EM's big move is the first step off the initials; the tail step
    # must be far smaller or K=5 isn't deep enough to call "converged"
    assert deltas[-1] < deltas[0] / 10


def test_fs_em_mstep_mass_identity(spark):
    """The M-step conserves posterior mass: at every iteration,
    m-weighted and u-weighted per-field masses reconstruct from the
    8-row E-step table — checked via p', which must equal
    Σ n·post / N recomputed from fs_em_posteriors when both use the
    same (initial) parameters. Guards the generated-SQL plumbing
    against a silent pattern/column misalignment."""
    post = {
        (r["agree_name"], r["agree_segment"], r["agree_balance"]): (
            r["n_pairs"],
            r["match_posterior"],
        )
        for r in queries_relational27.fs_em_posteriors(spark, SF).collect()
    }
    n_tot = sum(n for n, _ in post.values())
    s = sum(n * p for n, p in post.values())
    want_p1 = s / n_tot
    got_p1 = (
        queries_relational27.fs_em_mstep(spark, SF)
        .filter(F.col("iter") == 1)
        .collect()[0]["p"]
    )
    # fs_em_posteriors rounds its posterior to 6dp, the mstep chain
    # does not — agreement to ~1e-5 proves alignment without demanding
    # bit equality across the two published tables
    assert abs(got_p1 - want_p1) < 1e-4


def test_canonical_pass_recovery_invariants(spark):
    """recovered ⊆ canonical; multipass = base ∪ canonical =
    base + recovered (disjoint union identity); and the pass genuinely
    recovers links on real data — the claim that justifies its cost."""
    row = queries_relational27.snb_canonical_pass_recovery(
        spark, SF01
    ).collect()[0]
    assert row["recovered_links"] <= row["canonical_links"]
    assert (
        row["multipass_links"]
        == row["base_links"] + row["recovered_links"]
    )
    assert row["recovered_links"] > 0


def test_multipass_third_arm_is_superset_of_two_pass(spark):
    """Adding the reversed-key arm can only grow the candidate union,
    so the three-pass link set contains every two-pass link (recall
    monotonicity, now across the r11 plan change)."""
    customer_links = queries_relational27.fellegi_sunter_multipass_snb(
        spark, SF
    ).select("id_a", "id_b")
    single = queries_relational27.fellegi_sunter_snb_linkage(
        spark, SF
    ).select("id_a", "id_b")
    assert single.exceptAll(customer_links).count() == 0


def test_sampled_recall_row_cobudget_bounds_admission(
    spark, tmp_path, monkeypatch
):
    """The r11 row co-budget: a corpus of PURE singleton strata (every
    stratum 0 pairs — free under the pair budget) must still have its
    admission bounded by cumulative ROWS. With the row budget clamped
    to 10, exactly 10 of the 40 singleton strata admit (rn=1 floor
    included); unclamped, all 40 admit (pair budget never binds at 0
    cumulative pairs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 40
    tbl = pa.table(
        {
            # one customer per kiloblock -> every (nation, kb) stratum
            # is a singleton with 0 intra-stratum pairs
            "c_custkey": pa.array(
                [i * queries_relational27.SNB_STRATUM_SIZE for i in range(n)],
                pa.int64(),
            ),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
            "c_nationkey": pa.array([i % 5 for i in range(n)], pa.int32()),
            "c_acctbal": pa.array([100.0 * i for i in range(n)]),
            "c_mktsegment": pa.array(["BUILDING"] * n),
        }
    )
    sf_dir = str(tmp_path / "singletons")
    os.makedirs(sf_dir)
    pq.write_table(tbl, os.path.join(sf_dir, "customer.parquet"))

    unclamped = queries_relational27.snb_sampled_recall(
        spark, sf_dir
    ).collect()[0]
    assert unclamped["sampled_strata"] == n  # row budget far above 40

    monkeypatch.setattr(
        queries_relational27, "SNB_SAMPLE_ROW_BUDGET", 10
    )
    clamped = queries_relational27.snb_sampled_recall(
        spark, sf_dir
    ).collect()[0]
    assert clamped["sampled_strata"] == 10


def test_sampled_recall_matches_full_metric_when_all_admitted(spark):
    """At sf0.001 every stratum fits the budget, so the sampled metric
    must equal the full-population metric exactly — the identity that
    makes the sampled path a drop-in above the guard (re-pinned across
    the r11 distributed-admission rewrite)."""
    sampled = queries_relational27.snb_sampled_recall(spark, SF).collect()[0]
    full = queries_relational27.snb_window_recall(spark, SF).collect()[0]
    assert sampled["nation_links"] == full["nation_links"]
    assert sampled["snb_found"] == full["snb_found"]
    assert sampled["pairs_completeness"] == full["pairs_completeness"]


def test_multipass_em_reaches_fixed_point_and_debiases_u_name(spark):
    """The deeper unroll's promise, at the corpus where it is claimed
    (sf0.1, the bench corpus): the final two rows are identical at the
    6-decimal output grain — the recurrence has genuinely converged
    and the last row IS the fixed point. At the 150-row sf0.001 the
    mixture mixes slower (documented), so there the test asserts
    monotone tail convergence plus the de-biasing claim: the multipass
    candidate mixture pulls learned u_name far below the single-pass
    value."""
    SF1 = "/root/testdata/sf0.1"
    cols = [
        "p", "m_name", "m_segment", "m_balance",
        "u_name", "u_segment", "u_balance",
    ]
    multi_big = (
        queries_relational27.fs_em_mstep_multipass(spark, SF1)
        .orderBy("iter")
        .collect()
    )
    assert (
        len(multi_big) == queries_relational27.FS_EM_ITERS_MULTIPASS + 1
    )
    last, prev = multi_big[-1], multi_big[-2]
    for c in cols:
        assert last[c] == prev[c], (c, prev[c], last[c])

    multi = (
        queries_relational27.fs_em_mstep_multipass(spark, SF)
        .orderBy("iter")
        .collect()
    )
    deltas = [
        abs(multi[k + 1]["p"] - multi[k]["p"])
        for k in range(len(multi) - 1)
    ]
    assert deltas[-1] < max(deltas) / 5  # tail is settling
    single = (
        queries_relational27.fs_em_mstep(spark, SF)
        .orderBy("iter")
        .collect()[-1]
    )
    assert multi[-1]["u_name"] < single["u_name"]


def test_marginal_u_matches_exact_pair_probability(spark):
    """u_marginal is the EXACT random-pair agreement probability —
    recomputed independently per field from value counts in Python
    (Σ n_v(n_v−1) / (N(N−1))); name collisions are zero on the
    identifier-shaped corpus (why name agreement is priced at pair
    grain instead)."""
    from collections import Counter
    from math import floor

    rows = {
        r["field"]: r["u_marginal"]
        for r in queries_relational27.fs_field_marginal_u(
            spark, SF
        ).collect()
    }
    from parcel_analytics_etl_notebook_spark.plans.catalog import table

    pdf = table(spark, SF, "customer").select(
        "c_name", "c_mktsegment", "c_acctbal"
    ).toPandas()
    n = len(pdf)
    for field, values in (
        ("name", pdf["c_name"]),
        ("segment", pdf["c_mktsegment"]),
        ("balance", pdf["c_acctbal"].map(lambda x: floor(x / 500))),
    ):
        cnt = Counter(values)
        want = round(
            sum(c * (c - 1) for c in cnt.values()) / (n * (n - 1)), 6
        )
        assert rows[field] == want, (field, rows[field], want)
    assert rows["name"] == 0.0


def test_em_trajectory_driver_degenerate_corpus_nulls(spark):
    """ADVICE r11 #1: on a degenerate corpus (zero candidate pairs —
    the collected conditional counts are SQL-NULL, or any posterior
    denominator hits 0) the driver-side recurrence must mirror the
    CASE-guarded oracle's NULL fixpoint — iter 0 stays the literal
    initials, every later iteration is all-NULL — instead of raising
    TypeError on None arithmetic."""
    empty = spark.createDataFrame(
        [],
        "agree_name boolean, agree_segment boolean, agree_balance boolean",
    )
    rows = (
        queries_relational27._em_trajectory_driver(spark, empty, 3)
        .orderBy("iter")
        .collect()
    )
    assert [r["iter"] for r in rows] == [0, 1, 2, 3]
    r0 = rows[0]
    assert r0["p"] == round(queries_relational27.FS_EM_P, 6)
    for r in rows[1:]:
        assert all(
            r[c] is None
            for c in queries_relational27._EM_PARAM_COLS
        ), f"iter {r['iter']} should be all-NULL on a degenerate corpus"
