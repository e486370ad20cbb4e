"""Per-operator unit tests on tiny literal DataFrames (SURVEY §5.2)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.keys import surrogate_key
from parcel_analytics_etl_notebook_spark.functions.vectors import (
    cosine_similarity,
    dot,
)
from parcel_analytics_etl_notebook_spark.operators.asof import asof_join_backward
from parcel_analytics_etl_notebook_spark.operators.dedup import dedup_first_row
from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
    hamming_distance,
    with_minhash,
    with_simhash,
)
from parcel_analytics_etl_notebook_spark.operators.flatten import flatten_structs
from parcel_analytics_etl_notebook_spark.operators.multimodal import (
    decode_stub,
    extract_features,
    to_binary_payload,
)
from parcel_analytics_etl_notebook_spark.operators.sessionize import sessionize
from parcel_analytics_etl_notebook_spark.operators.topk import top_k, top_k_per_group


def test_flatten_nested_depths(spark):
    df = spark.createDataFrame(
        [Row(a=Row(b=Row(c=1, d="x"), e=2.0), f="top")]
    )
    flat = flatten_structs(df)
    assert set(flat.columns) == {"a_b_c", "a_b_d", "a_e", "f"}
    row = flat.collect()[0]
    assert (row["a_b_c"], row["a_b_d"], row["a_e"], row["f"]) == (1, "x", 2.0, "top")


def test_flatten_include_prunes(spark):
    df = spark.createDataFrame([Row(a=Row(b=1, c=2), d=3)])
    flat = flatten_structs(df, include=["a.b"])
    assert flat.columns == ["a_b"]


def test_surrogate_key_null_discrimination(spark):
    # ("a", NULL) must differ from (NULL, "a") and from ("a", "a")
    df = spark.createDataFrame(
        [("a", None), (None, "a"), ("a", "a")], "x string, y string"
    )
    keys = [r[0] for r in df.select(surrogate_key("x", "y")).collect()]
    assert len(set(keys)) == 3


def test_dedup_first_row_deterministic(spark):
    df = spark.createDataFrame(
        [("k", 2, "b"), ("k", 1, "a"), ("k", 1, "z"), ("j", 5, "q")],
        "key string, ord int, val string",
    )
    out = dedup_first_row(df, ["key"], [F.col("ord"), F.col("val")])
    got = {r["key"]: (r["ord"], r["val"]) for r in out.collect()}
    assert got == {"k": (1, "a"), "j": (5, "q")}


def test_asof_backward_inclusive_and_unmatched(spark):
    t = dt.datetime
    left = spark.createDataFrame(
        [
            (1, t(2024, 1, 1, 10, 0, 0), "p1"),
            (1, t(2024, 1, 1, 12, 0, 0), "p2"),
            (2, t(2024, 1, 1, 9, 0, 0), "p3"),  # no right rows for key 2
        ],
        "k bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, t(2024, 1, 1, 10, 0, 0)),  # equal ts → matches p1 (inclusive)
            (1, t(2024, 1, 1, 11, 0, 0)),
        ],
        "k bigint, ts timestamp",
    )
    out = asof_join_backward(left, right, on="k", left_ts="ts", right_ts="ts", right_values=[])
    got = {r["tag"]: r["ts_asof"] for r in out.collect()}
    assert got["p1"] == t(2024, 1, 1, 10, 0, 0)
    assert got["p2"] == t(2024, 1, 1, 11, 0, 0)
    assert got["p3"] is None


def test_topk_global_and_grouped(spark):
    df = spark.createDataFrame(
        [(g, v) for g in ("a", "b") for v in range(5)], "g string, v int"
    )
    top = top_k(df, [F.col("v").desc(), F.col("g")], 3).collect()
    assert [(r["g"], r["v"]) for r in top] == [("a", 4), ("b", 4), ("a", 3)]
    per = top_k_per_group(df, ["g"], [F.col("v").desc()], 2)
    assert per.count() == 4
    assert per.filter("g = 'a'").agg(F.min("v")).collect()[0][0] == 3


def test_sessionize_gap_boundaries(spark):
    t = dt.datetime
    df = spark.createDataFrame(
        [
            (1, t(2024, 1, 1, 10, 0, 0)),
            (1, t(2024, 1, 1, 10, 20, 0)),   # same session (gap 20m)
            (1, t(2024, 1, 1, 11, 0, 0)),    # new session (gap 40m)
            (2, t(2024, 1, 1, 10, 0, 0)),
        ],
        "user bigint, ts timestamp",
    )
    out = sessionize(df, "user", "ts", gap_seconds=1800)
    got = sorted(
        (r["user"], r["ts"].hour, r["ts"].minute, r["session_idx"])
        for r in out.collect()
    )
    assert got == [(1, 10, 0, 0), (1, 10, 20, 0), (1, 11, 0, 1), (2, 10, 0, 0)]


def test_vector_math(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([0.0, 0.0], [1.0, 0.0])],
        "a array<float>, b array<float>",
    )
    rows = df.select(
        dot("a", "b").alias("d"), cosine_similarity("a", "b").alias("c")
    ).collect()
    assert rows[0]["d"] == 1.0 and rows[0]["c"] == 1.0
    assert rows[1]["d"] == 0.0 and rows[1]["c"] == 0.0
    assert rows[2]["c"] is None  # zero-norm guard


def test_minhash_similar_docs_collide_more(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "completely different words entirely here now")],
        "doc_id bigint, text string",
    )
    sigs = {r["doc_id"]: r["minhash"] for r in with_minhash(df).collect()}
    overlap_near = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    overlap_far = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert overlap_near > overlap_far
    assert len(sigs[1]) == 16


def test_simhash_hamming_ordering(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, base), (2, base + " iota"), (3, "nothing shared at all whatsoever kappa")],
        "doc_id bigint, text string",
    )
    fp = {r["doc_id"]: r["simhash"] for r in with_simhash(df).collect()}
    pairs = spark.createDataFrame(
        [(fp[1], fp[2]), (fp[1], fp[3])], "x bigint, y bigint"
    )
    d_near, d_far = [
        r[0]
        for r in pairs.select(hamming_distance(F.col("x"), F.col("y"))).collect()
    ]
    assert d_near <= d_far


def test_multimodal_stub(spark):
    df = spark.createDataFrame([(1, "hello")], "doc_id bigint, text string")
    out = extract_features(to_binary_payload(df)).collect()[0]
    assert out["n_bytes"] == 5
    assert len(out["features"]) == 8
    assert all(0.0 <= f <= 1.0 for f in out["features"])
    with pytest.raises(NotImplementedError):
        decode_stub(b"...", "image/png")


def test_multimodal_resize_and_frame_sampling(spark):
    from parcel_analytics_etl_notebook_spark.operators.multimodal import (
        resize_stub,
        sample_frames,
    )

    assert resize_stub(b"0123456789", 4) == b"0369"  # step=ceil(10/4)=3
    assert resize_stub(b"ab", 4) == b"ab"

    df = spark.createDataFrame(
        [(1, "x" * 100), (2, "tiny")], "doc_id bigint, text string"
    )
    frames = sample_frames(to_binary_payload(df), n_frames=4)
    rows = frames.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert len(per_doc[1]) == 4  # 100 bytes → 4 chunks of 25
    assert all(r["frame_bytes"] == 25 for r in per_doc[1])
    assert len(per_doc[2]) == 4  # 4 bytes → chunk=1 → 4 single-byte frames
    # deterministic: rerun produces identical frame hashes
    again = {(r["doc_id"], r["frame_idx"]): r["frame_sha"] for r in sample_frames(to_binary_payload(df), 4).collect()}
    for r in rows:
        assert again[(r["doc_id"], r["frame_idx"])] == r["frame_sha"]


def test_pii_redaction_literals(spark):
    from parcel_analytics_etl_notebook_spark.operators.redact import redact_documents

    df = spark.createDataFrame(
        [
            (1, "contact john.doe+x@example.co.uk or 555-123-4567 at 10.0.0.1"),
            (2, "no pii here at all"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in redact_documents(df).collect()}
    assert out[1]["redacted_text"] == "contact <EMAIL> or <PHONE> at <IP>"
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ip"]) == (1, 1, 1)
    assert out[2]["redacted_text"] == "no pii here at all"
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ip"]) == (0, 0, 0)


def test_cosine_pairs_vectorized_matches_hof(spark):
    """The numpy pandas-UDF scale path returns the same pairs/values as
    the fold-order-exact HOF form (rounded at 1e-6)."""
    from parcel_analytics_etl_notebook_spark.operators.similarity import (
        cosine_pairs_blocked,
    )
    from parcel_analytics_etl_notebook_spark.plans.catalog import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    hof = cosine_pairs_blocked(emb, "label", 0.3).collect()
    vec = cosine_pairs_blocked(emb, "label", 0.3, vectorized=True).collect()
    key = lambda r: (r["label"], r["id_a"], r["id_b"])  # noqa: E731
    assert {key(r): r["cosine"] for r in hof} == {key(r): r["cosine"] for r in vec}
    assert len(hof) > 0


def test_connected_components_known_graph(spark):
    from parcel_analytics_etl_notebook_spark.operators.graph import (
        connected_components,
    )

    # components: {1,2,3,4} (chain), {10,11}, vertex 20 isolated (absent)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src bigint, dst bigint"
    )
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    from parcel_analytics_etl_notebook_spark.operators.graph import (
        connected_components,
    )

    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src bigint, dst bigint"
    )
    got = {r["vertex"]: r["component"] for r in connected_components(edges).collect()}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_connected_components_raises_on_non_convergence(spark):
    from parcel_analytics_etl_notebook_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=5)


def test_salted_join_rejects_outer(spark):
    from parcel_analytics_etl_notebook_spark.operators.skew import salted_join_small

    df = spark.createDataFrame([(1, "a")], "k bigint, v string")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join_small(df, df, on="k", unique_col="v", how="full")


def test_tokens_null_and_blank(spark):
    from parcel_analytics_etl_notebook_spark.functions.textfns import (
        token_count,
        tokens,
    )
    from parcel_analytics_etl_notebook_spark.operators.textqa import quality_features

    df = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "one two")], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: (r["t"], r["n"]) for r in df.select(
        "doc_id", tokens("text").alias("t"), token_count("text").alias("n")
    ).collect()}
    assert got[1] == ([], 0) and got[2] == ([], 0) and got[3] == (["one", "two"], 2)
    q = {r["doc_id"]: r for r in quality_features(df).collect()}
    assert q[1]["n_tokens"] == 0 and q[1]["unique_ratio"] is None
    assert q[1]["quality_flag"] is False
    assert q[3]["n_tokens"] == 2


def test_hll_sketch_estimate_close_to_exact(spark, sf_dir):
    """daily_users_hll_sketch folds the cross-engine-uncomparable HLL
    estimate into an oracle-pinned bound flag (lgConfigK=12 → rse
    ~1.6%, 5% ≈ 3 sigma) next to hash-checked exact columns."""
    from parcel_analytics_etl_notebook_spark.plans import catalog

    est = catalog.queries()["daily_users_hll_sketch"](spark, sf_dir).collect()[0]
    exact = (
        catalog.table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert est["n_days"] >= 1
    assert est["exact_users"] == exact
    assert est["union_within_5pct"] is True


def test_map_in_arrow_matches_map_in_pandas(spark):
    """extract_features_arrow (mapInArrow) must agree row-for-row with
    the mapInPandas path — same decode stub, zero-copy batches."""
    from parcel_analytics_etl_notebook_spark.operators.multimodal import (
        extract_features_arrow,
        to_binary_payload,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "spark arrow"), (3, "")],
        "doc_id bigint, text string",
    )
    payload = to_binary_payload(df)
    a = {r["doc_id"]: r for r in extract_features_arrow(payload).collect()}
    p = {r["doc_id"]: r for r in extract_features(payload).collect()}
    assert set(a) == set(p) == {1, 2, 3}
    for k in a:
        assert a[k]["content_sha"] == p[k]["content_sha"]
        assert a[k]["n_bytes"] == p[k]["n_bytes"]
        assert a[k]["features"] == p[k]["features"]


def test_chunking_edge_cases(spark):
    """chunk_tokens boundary behavior: empty/short/exact/overflow docs,
    full token coverage, and correct overlap between neighbors."""
    from parcel_analytics_etl_notebook_spark.operators.chunking import chunk_tokens

    C, S = 4, 3
    docs = [
        (0, []),                               # empty -> 1 empty chunk
        (1, ["a"]),                            # shorter than window
        (2, [f"t{i}" for i in range(4)]),      # exactly one window
        (3, [f"t{i}" for i in range(5)]),      # one token past -> 2 chunks
        (4, [f"t{i}" for i in range(10)]),     # ceil((10-4)/3)+1 = 3 chunks
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, toks array<string>")
    out = chunk_tokens(df, "toks", chunk_size=C, stride=S)
    got: dict = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk"]

    assert got[0] == {0: []}
    assert got[1] == {0: ["a"]}
    assert got[2] == {0: ["t0", "t1", "t2", "t3"]}
    assert got[3] == {0: ["t0", "t1", "t2", "t3"], 1: ["t3", "t4"]}
    assert len(got[4]) == 3
    for doc_id, toks in docs:
        covered = [t for i in sorted(got[doc_id]) for t in got[doc_id][i]]
        # every token appears, in order, with exactly C-S overlapping
        # tokens duplicated at each interior boundary
        n_bounds = len(got[doc_id]) - 1
        assert len(covered) >= len(toks)
        assert set(covered) == set(toks)
        for i in range(n_bounds):
            a, b = got[doc_id][i], got[doc_id][i + 1]
            if len(a) == C:
                assert a[S:] == b[: C - S]

    with pytest.raises(ValueError, match="positive"):
        chunk_tokens(df, "toks", chunk_size=0, stride=3)


def test_zorder_key_bit_interleave(spark):
    """Morton code ground truth: key(a,b) interleaves bits with a in
    even positions, b in odd — spot-checked against hand-computed
    values, plus the mask guard."""
    import pytest as _pytest

    from parcel_analytics_etl_notebook_spark.functions.zorder import zorder_key_2d

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 3), (5, 2)], "a bigint, b bigint"
    )
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zorder_key_2d(F.col("a"), F.col("b"), bits=4).alias("z")
        ).collect()
    }
    # interleave(a,b): bits a0 b0 a1 b1 ... -> (0,0)=0 (1,0)=1 (0,1)=2
    # (1,1)=3 (3,3)=15 (5,2)=0b011001=25? a=101,b=010 -> z = a0(1)+b0(0)<<1
    # + a1(0)<<2 + b1(1)<<3 + a2(1)<<4 + b2(0)<<5 = 1+0+0+8+16 = 25
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3, (3, 3): 15, (5, 2): 25}

    with _pytest.raises(ValueError, match="bits"):
        zorder_key_2d(F.col("a"), F.col("b"), bits=0)


def test_drop_hot_shingles_bounds_boilerplate_pairs(spark):
    """A corpus-wide boilerplate shingle must NOT explode the
    inverted-index self-join quadratically: with the df cap it
    contributes zero pairs, while genuinely-shared rare shingles still
    pair. Mirrors the QUALIFY restatement in the catalog oracles."""
    from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
        drop_hot_shingles,
    )

    n_docs = 40
    rows = [(d, 999) for d in range(n_docs)]  # shingle 999 in EVERY doc
    rows += [(0, 1), (1, 1)]  # rare shingle 1 shared by docs 0,1
    sh = spark.createDataFrame(rows, "doc_id bigint, shingle bigint")

    capped = drop_hot_shingles(sh, max_df=8)
    assert capped.filter(F.col("shingle") == 999).count() == 0
    assert capped.filter(F.col("shingle") == 1).count() == 2

    def n_pairs(frame):
        a, b = frame.alias("a"), frame.alias("b")
        return (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .count()
        )

    # uncapped: the hot shingle alone yields 40·39/2 = 780 pairs;
    # capped: only the rare-shingle pair survives
    assert n_pairs(sh) == n_docs * (n_docs - 1) // 2 + 1
    assert n_pairs(capped) == 1


def test_lsh_max_bucket_drops_hot_bucket_only(spark):
    """Identical-signature docs beyond max_bucket are dropped from that
    bucket's pairing; a small distinct cluster still pairs."""
    from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
        lsh_candidate_pairs,
    )

    boiler = list(range(100, 116))  # one 16-hash signature, 20 docs
    small = list(range(200, 216))  # another signature, 2 docs
    rows = [(d, boiler) for d in range(20)] + [(50, small), (51, small)]
    sig = spark.createDataFrame(rows, "doc_id bigint, minhash array<bigint>")

    uncapped = lsh_candidate_pairs(sig, bands=4, max_bucket=None)
    assert uncapped.count() == 20 * 19 // 2 + 1

    capped = lsh_candidate_pairs(sig, bands=4, max_bucket=8)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {(50, 51)}


def test_dup_groups_all_ids_total_coverage(spark):
    """With all_ids, every document id appears exactly once in the
    group map; docs outside any pair are their own canonical."""
    from parcel_analytics_etl_notebook_spark.operators.graph import (
        dup_groups_from_pairs,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a bigint, id_b bigint"
    )
    all_ids = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id bigint"
    )
    got = dup_groups_from_pairs(pairs, all_ids=all_ids).collect()
    by_doc = {r["doc_id"]: r["canonical_id"] for r in got}
    assert len(got) == 10 and len(by_doc) == 10  # exactly once each
    assert by_doc[1] == by_doc[2] == by_doc[3] == 1
    assert by_doc[7] == by_doc[8] == 7
    for singleton in (0, 4, 5, 6, 9):
        assert by_doc[singleton] == singleton


def test_top_k_per_group_salted_equals_plain(spark):
    """The salted two-phase grouped top-k must equal the plain window
    form row-for-row (total order → salt-independent result)."""
    from parcel_analytics_etl_notebook_spark.operators.topk import (
        top_k_per_group,
        top_k_per_group_salted,
    )

    rows = [(i % 3, (i * 37) % 101, i) for i in range(200)]
    df = spark.createDataFrame(rows, "grp int, score int, id int")
    order = [F.col("score").desc(), F.col("id")]
    plain = top_k_per_group(df, ["grp"], order, k=7)
    salted = top_k_per_group_salted(df, ["grp"], order, k=7, salts=5)
    key = lambda r: (r["grp"], r["rnk"])  # noqa: E731
    assert sorted(map(key, plain.collect())) == sorted(map(key, salted.collect()))
    assert {(r["grp"], r["id"]) for r in plain.collect()} == {
        (r["grp"], r["id"]) for r in salted.collect()
    }


def test_global_running_sum_equals_window(spark):
    """Two-pass running sum equals SUM() OVER (ORDER BY ...) exactly."""
    from pyspark.sql import Window

    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        global_running_sum,
    )

    rows = [(i, (i * 13) % 29 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    got = {
        r["id"]: r["run"]
        for r in global_running_sum(
            df, order_cols=["id"], sum_col="v", out_col="run", num_partitions=7
        ).collect()
    }
    w = (
        Window.orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["id"]: float(r["run"])
        for r in df.withColumn("run", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_global_frac_rank_equals_window_form(spark):
    """global_frac_rank equals the tie-averaged window form
    (rank + (rank + ties - 1)) / 2 row-for-row — heavy ties, nulls
    (rank first), and caller-supplied boundaries included."""
    from pyspark.sql import Window

    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        global_frac_rank,
    )

    rows = [(i, float((i * 7) % 13) if i % 11 else None) for i in range(400)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    w = Window.orderBy(F.col("v").asc_nulls_first())
    want = {
        r["id"]: float(r["fr"])
        for r in df.withColumn(
            "fr",
            (
                F.rank().over(w) * 2
                + F.count(F.lit(1)).over(Window.partitionBy("v"))
                - 1
            )
            / 2.0,
        ).collect()
    }
    for bounds in (None, [2.0, 5.0, 9.0]):
        got = {
            r["id"]: float(r["fr"])
            for r in global_frac_rank(
                df, "v", out_col="fr", num_partitions=5, boundaries=bounds
            ).collect()
        }
        assert got == want

    # arrays remain ineligible for literal-boundary ranking
    with pytest.raises(ValueError):
        global_frac_rank(df.withColumn("s", F.array(F.lit(1))), "s")


def test_string_keys_take_lazy_bucketing_path(spark):
    """String leading order columns must use literal-boundary bucketing
    (VERDICT r04 #6): correct 1..n assignment in UTF-8 order — heavy
    shared prefixes and duplicate values included — and NO
    localCheckpoint in the lineage (the retired fallback's tell)."""
    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        global_frac_rank,
        stable_global_index,
    )

    words = ["https://a", "https://b", "apple", "apply", "b", "ab", ""]
    rows = [(i, words[i % len(words)]) for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, s string")
    out = stable_global_index(df, ["s", "id"], num_partitions=6)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" not in plan  # localCheckpoint would inject one
    got = [(r["s"], r["id"]) for r in sorted(
        out.collect(), key=lambda r: r["global_idx"]
    )]
    assert got == sorted((w, i) for i, w in rows)

    # frac rank on strings: equals the tie-averaged window form
    want = {}
    svals = sorted(w for _, w in rows)
    import bisect
    for i, w in rows:
        lo = bisect.bisect_left(svals, w)
        cnt = bisect.bisect_right(svals, w) - lo
        want[i] = lo + (cnt + 1) / 2.0
    fr = {
        r["id"]: float(r["fr"])
        for r in global_frac_rank(df, "s", out_col="fr", num_partitions=6).collect()
    }
    assert fr == want


def test_two_level_bucketing_large_partition_counts(spark):
    """num_partitions > 256 must take the coarse→fine two-level path
    (VERDICT r05 #6) — exact 1..n assignment on numeric AND string
    leading keys, no localCheckpoint (fallback tell) in the lineage,
    and the two-level offsets fold must agree with the flat one.
    Duplicate key values (ties broken by the second order column) and
    NULL keys (bucket -1, NULLS FIRST) included."""
    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        global_running_sum,
        stable_global_index,
    )

    rows = [
        (i, ((i * 7919) % 997) if i % 97 else None, f"w{(i * 37) % 500:04d}")
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "id bigint, v int, s string")

    out = stable_global_index(df, ["v", "id"], num_partitions=1000)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" not in plan
    got = [r["id"] for r in sorted(out.collect(), key=lambda r: r["global_idx"])]
    want = [i for i, v, s in sorted(rows, key=lambda t: (t[1] is not None, t[1] or 0, t[0]))]
    assert got == want

    # string leading key through the two-level path
    out_s = stable_global_index(df, ["s", "id"], num_partitions=400)
    got_s = [r["id"] for r in sorted(out_s.collect(), key=lambda r: r["global_idx"])]
    want_s = [i for i, v, s in sorted(rows, key=lambda t: (t[2], t[0]))]
    assert got_s == want_s

    # two-level offsets fold: running sum equals the window form
    from pyspark.sql import Window

    nn = df.where(F.col("v").isNotNull())
    rs = {
        r["id"]: r["run"]
        for r in global_running_sum(
            nn, ["v", "id"], "v", out_col="run", num_partitions=1000
        ).collect()
    }
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    want_rs = {
        r["id"]: float(r["run"])
        for r in nn.withColumn("run", F.sum("v").over(w)).collect()
    }
    assert rs == want_rs

    # mismatched boundary element types fail loudly (ADVICE r05)
    with pytest.raises(TypeError):
        stable_global_index(df, ["s", "id"], num_partitions=8,
                            boundaries=[1.0, 2.0])
    with pytest.raises(TypeError):
        stable_global_index(df, ["v", "id"], num_partitions=8,
                            boundaries=["a", "b"])


def test_offset_join_fallback_matches_literal_map(spark, monkeypatch):
    """stable_global_index with the broadcast-join offset path (forced
    by shrinking the literal-map threshold) equals the literal-map
    path — the 10⁵-partition fallback is semantics-preserving."""
    from parcel_analytics_etl_notebook_spark.operators import indexing

    rows = [((i * 7) % 100, i) for i in range(300)]
    df = spark.createDataFrame(rows, "k bigint, id bigint")
    lit = indexing.stable_global_index(
        df, ["k", "id"], num_partitions=6
    ).collect()
    monkeypatch.setattr(indexing, "_MAX_LITERAL_OFFSETS", 2)
    joined = indexing.stable_global_index(
        df, ["k", "id"], num_partitions=6
    ).collect()
    assert sorted((r["k"], r["id"], r["global_idx"]) for r in lit) == sorted(
        (r["k"], r["id"], r["global_idx"]) for r in joined
    )


def test_global_index_timestamp_monotone_across_dst(spark):
    """Regression (ADVICE r04): the literal-boundary bucket key for
    plain (LTZ) timestamps must be the epoch, not session-zone field
    decomposition — wall-clock fields repeat across a DST fall-back
    (America/New_York 2021-11-07: 01:30 EDT and 01:30 EST are distinct
    instants with identical fields), which misbucketed rows and made
    stable_global_index return 1,3,5,... instead of 1..n."""
    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        stable_global_index,
    )

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        # instants every 30 min across the fall-back (05:00–07:00 UTC
        # = 01:00 EDT .. 02:00 EST; local wall clock repeats 01:00–02:00)
        df = spark.sql(
            "SELECT id, timestamp_micros(CAST(1636255800000000"
            " + id * 1800000000 AS BIGINT)) AS ts"
            " FROM range(8)"
        )
        got = {
            r["id"]: r["global_idx"]
            for r in stable_global_index(
                df, ["ts", "id"], num_partitions=4
            ).collect()
        }
        assert got == {i: i + 1 for i in range(8)}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_kmeans_fit_tiny_known_clusters(spark):
    """Two well-separated 2-d clusters: one iteration lands each
    centroid on its cluster mean; an empty cluster keeps its previous
    centroid; assignment is stable under re-fit."""
    from parcel_analytics_etl_notebook_spark.operators.clustering import (
        assign_nearest,
        kmeans_fit,
    )

    pts = [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]),   # cluster along +x
        (3, [0.0, 1.0]), (4, [0.1, 0.9]),   # cluster along +y
    ]
    df = spark.createDataFrame(pts, "vec_id bigint, embedding array<double>")
    init = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-1.0, -0.5])]
    trained = dict(kmeans_fit(df, init, dim=2, iters=2))
    assert trained[1] == [0.95, 0.05]
    assert trained[2] == [0.05, 0.95]
    assert trained[3] == [-1.0, -0.5]  # empty cluster: unchanged
    assigned = {
        r["vec_id"]: r["centroid_id"]
        for r in assign_nearest(df, list(trained.items())).collect()
    }
    assert assigned == {1: 1, 2: 1, 3: 2, 4: 2}


def test_power_iteration_matches_numpy_eigenvector(spark):
    """embedding_top_pc's math on a tiny corpus: 3 power iterations
    must align (up to sign) with numpy's dominant eigenvector of the
    uncentered second-moment matrix."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(4)
    pts = [base * s + rng.randn(4) * 0.05 for s in (1.0, 2.0, -1.5, 0.5, 3.0)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
        "vec_id bigint, embedding array<double>",
    )
    dim, iters = 4, 3
    w = [round(1.0 / dim ** 0.5, 6)] * dim
    for _ in range(iters):
        w_lit = F.array(*[F.lit(float(x)) for x in w])
        dot = F.aggregate(
            F.zip_with(F.col("embedding"), w_lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        row = (
            df.select(F.col("embedding").alias("emb"), dot.alias("dot"))
            .agg(*[F.avg(F.col("emb")[d] * F.col("dot")).alias(f"u{d}") for d in range(dim)])
            .collect()[0]
        )
        u = [row[f"u{d}"] for d in range(dim)]
        norm = sum(x * x for x in u) ** 0.5
        w = [round(x / norm, 6) for x in u]

    V = np.stack(pts)
    M = V.T @ V / len(pts)
    vals, vecs = np.linalg.eigh(M)
    top = vecs[:, np.argmax(vals)]
    cos = abs(float(np.dot(np.array(w), top)))
    assert cos > 0.999  # aligned up to sign


def test_cosine_cols_bitwise_equals_hof(spark):
    """The unrolled cosine (cosine_cols) must be BIT-identical to the
    HOF cosine_similarity — same left-associative fold order — or the
    DuckDB oracle hashes would drift. Checked unrounded, on raw floats."""
    from parcel_analytics_etl_notebook_spark.functions.vectors import (
        cosine_cols,
        cosine_similarity,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pair = emb.alias("x").crossJoin(emb.alias("y").limit(3)).select(
        F.col("x.embedding").alias("a"), F.col("y.embedding").alias("b")
    )
    both = pair.select(
        cosine_similarity("a", "b").alias("hof"),
        cosine_cols("a", "b", 64).alias("unrolled"),
    )
    diff = both.filter(
        ~(F.col("hof").eqNullSafe(F.col("unrolled")))
    ).count()
    assert diff == 0


def test_cosine_prenormed_bitwise_equals_hof(spark):
    """The split-norm hot-path cosine (cosine_prenormed over projected
    __na/__nb columns) must also be BIT-identical to the HOF form —
    same fold per chain, same division order — so swapping it onto the
    ANN hot path can't move any oracle hash."""
    from parcel_analytics_etl_notebook_spark.functions.vectors import (
        cosine_prenormed,
        cosine_similarity,
        norm_literal_sq,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pair = (
        emb.alias("x")
        .crossJoin(emb.alias("y").limit(3))
        .select(
            F.col("x.embedding").alias("a"), F.col("y.embedding").alias("b")
        )
        .withColumn("na", F.sqrt(norm_literal_sq("a", 64)))
        .withColumn("nb", F.sqrt(norm_literal_sq("b", 64)))
    )
    both = pair.select(
        cosine_similarity("a", "b").alias("hof"),
        cosine_prenormed("a", "b", "na", "nb", 64).alias("split"),
    )
    diff = both.filter(~(F.col("hof").eqNullSafe(F.col("split")))).count()
    assert diff == 0


def test_approx_percentile_within_bound(spark, sf_dir):
    """approx_token_percentiles now verifies the sketch IN-QUERY: the
    tie-safe two-sided rank check must come back TRUE for every
    language and percentile, and the exact interpolated percentiles
    must be ordered p50 <= p90 <= p99."""
    from parcel_analytics_etl_notebook_spark.plans.catalog import queries

    rows = queries()["approx_token_percentiles"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p50_in_bound"] and r["p90_in_bound"] and r["p99_in_bound"], r
        assert r["p50_exact"] <= r["p90_exact"] <= r["p99_exact"], r
        assert r["n_docs"] > 0


def test_token_batch_packing_invariants(spark, sf_dir):
    """Sequence-packing invariants: batch ids are dense from 0;
    every batch's token total stays under budget + the largest doc it
    holds (contiguous-fill allows only the boundary doc to overflow);
    every doc appears exactly once."""
    from parcel_analytics_etl_notebook_spark.plans.catalog import queries

    rows = queries()["token_batch_packing"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r["batch_id"], []).append(r["n_tokens"])
    assert min(by_batch) == 0
    assert sorted(by_batch) == list(range(len(by_batch)))  # dense ids
    for bid, toks in by_batch.items():
        if bid < max(by_batch):  # last batch may be underfull
            assert sum(toks) >= 1  # non-empty
        assert sum(toks) < 4096 + max(toks)  # boundary-doc overflow only


def test_prenormed_dim_branch_matches_hof(spark, sf_dir):
    """The dim= (codegen'd prenormed) branches of brute_force_topk and
    assign_centroids must return bit-identical results to the HOF
    branch — they are the documented path past ~10^5 rows and no
    catalog query exercises them (catalog stays HOF: compile-dominated
    at small SF)."""
    from parcel_analytics_etl_notebook_spark.operators.similarity import (
        assign_centroids,
        brute_force_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") == 0)

    hof = brute_force_topk(emb, q, k=10).collect()
    pre = brute_force_topk(emb, q, k=10, dim=dim).collect()
    assert [tuple(r) for r in hof] == [tuple(r) for r in pre]

    cents = emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= 4))
    a_hof = assign_centroids(emb, cents).select("vec_id", "centroid_id")
    a_pre = assign_centroids(emb, cents, dim=dim).select(
        "vec_id", "centroid_id"
    )
    assert sorted(map(tuple, a_hof.collect())) == sorted(
        map(tuple, a_pre.collect())
    )


def test_asof_carries_null_from_matched_row(spark):
    """The matched right row's NULL value must stay NULL — not be
    back-filled from an older right row (value-stitching bug)."""
    from parcel_analytics_etl_notebook_spark.operators.asof import (
        asof_join_backward,
    )

    left = spark.createDataFrame([(1, 3)], "k int, lt int")
    right = spark.createDataFrame(
        [(1, 1, 100.0), (1, 2, None)], "k int, rt int, price double"
    )
    row = asof_join_backward(
        left, right, on="k", left_ts="lt", right_ts="rt",
        right_values=["price"],
    ).collect()[0]
    assert row["rt_asof"] == 2
    assert row["price_asof"] is None  # NOT 100.0 from the older row


def test_doc_fingerprint_full_token_sensitivity(spark):
    """Fingerprints must differ for tokens sharing a first character
    ('cat' vs 'car' — the first-codepoint-only bug)."""
    from parcel_analytics_etl_notebook_spark.operators.textqa import (
        doc_fingerprint,
    )

    df = spark.createDataFrame(
        [(1, ["cat"]), (2, ["car"])], "id int, toks array<string>"
    )
    fps = {r["id"]: r["fp"] for r in df.select(
        "id", doc_fingerprint(F.col("toks")).alias("fp")
    ).collect()}
    assert fps[1] != fps[2]


def test_pii_counts_no_double_count(spark):
    """A phone-shaped substring inside an email must not count as a
    phone: counts are sequential on the progressively-redacted text."""
    from parcel_analytics_etl_notebook_spark.operators.redact import (
        redact_documents,
    )

    df = spark.createDataFrame(
        [(1, "reach me at 555-123-4567@corp.com")], "doc_id int, text string"
    )
    row = redact_documents(df).collect()[0]
    assert row["n_email"] == 1
    assert row["n_phone"] == 0
    assert "<EMAIL>" in row["redacted_text"]


def test_chunk_tokens_rejects_gapping_stride(spark):
    from parcel_analytics_etl_notebook_spark.operators.chunking import (
        chunk_tokens,
    )

    df = spark.createDataFrame([(1, ["a"] * 10)], "id int, toks array<string>")
    with pytest.raises(ValueError, match="stride"):
        chunk_tokens(df, "toks", chunk_size=4, stride=5)


def test_lsh_rejects_wrong_signature_length(spark):
    """A signature whose actual length differs from sig_len must raise
    at runtime, not silently drop trailing positions."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
        lsh_candidate_pairs,
    )

    sig = spark.createDataFrame(
        [(1, list(range(18))), (2, list(range(18)))],
        "doc_id int, minhash array<int>",
    )
    with pytest.raises(Exception) as exc:
        lsh_candidate_pairs(sig, bands=4, sig_len=16).collect()
    assert "sig_len" in str(exc.value)


def test_predict_lang_null_tokens_is_und(spark):
    from parcel_analytics_etl_notebook_spark.operators.textqa import (
        predict_lang,
    )

    df = spark.createDataFrame([(1,)], "id int").select(
        predict_lang(F.lit(None).cast("array<string>")).alias("lang")
    )
    assert df.collect()[0]["lang"] == "und"


def test_assign_nearest_zero_vector_gets_null_centroid(spark):
    """A zero-norm vector has no defined nearest centroid: cid must be
    NULL, never silently the last centroid in the list."""
    from parcel_analytics_etl_notebook_spark.operators.clustering import (
        assign_nearest,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0])], "vec_id int, embedding array<double>"
    )
    cents = [(10, [1.0, 0.0]), (20, [0.0, 1.0])]
    got = {r["vec_id"]: r["centroid_id"] for r in assign_nearest(
        df, cents
    ).collect()}
    assert got[1] == 10
    assert got[2] is None


def test_image_header_parse_real_containers(spark):
    """parse_image_header does REAL container decode: dimensions come
    out of hand-constructed PNG/GIF/BMP/JPEG byte layouts (per spec),
    corrupt payloads classify as unknown, and the Spark-side
    extract_image_meta (mapInPandas) carries the same answers with
    nullable dims intact."""
    import struct
    import zlib

    from parcel_analytics_etl_notebook_spark.operators.multimodal import (
        extract_image_meta,
        parse_image_header,
    )

    # PNG: signature + IHDR chunk (len, type, w, h, bit depth, ...)
    ihdr = struct.pack(">II5B", 640, 480, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    # GIF89a: logical screen descriptor is little-endian u16 w, h
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\xf7\x00\x00"
    # BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER; height
    # negative = top-down, magnitude is the real dimension
    bmp = b"BM" + b"\x00" * 12 + struct.pack("<IiiHH", 40, 800, -600, 1, 24)
    # JPEG: SOI, APP0 (JFIF), DHT (must be SKIPPED: C4 is not a SOF),
    # then SOF0 carrying u16 height, width
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 1080, 1920, 3)
    jpeg = b"\xff\xd8" + app0 + dht + sof0
    assert parse_image_header(png) == ("png", 640, 480)
    assert parse_image_header(gif) == ("gif", 320, 200)
    assert parse_image_header(bmp) == ("bmp", 800, 600)
    assert parse_image_header(jpeg) == ("jpeg", 1920, 1080)
    assert parse_image_header(b"\x00garbage") == (None, None, None)
    # JPEG with no SOF before truncation: known format, unknown dims
    assert parse_image_header(b"\xff\xd8" + app0) == ("jpeg", None, None)

    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(jpeg)), (3, bytearray(b"nope"))],
        "doc_id bigint, payload binary",
    )
    rows = {r["doc_id"]: r for r in extract_image_meta(df).collect()}
    assert (rows[1]["format"], rows[1]["width"], rows[1]["height"]) == ("png", 640, 480)
    assert (rows[2]["format"], rows[2]["width"], rows[2]["height"]) == ("jpeg", 1920, 1080)
    assert rows[3]["format"] is None and rows[3]["width"] is None
    assert rows[1]["n_bytes"] == len(png)


def test_apply_in_arrow_matches_pandas_twin(spark):
    """applyInArrow grouped map must agree row-for-row (NaN-aware) with
    the applyInPandas twin on real embeddings — including the
    degenerate singleton-group NaN rule."""
    import math

    from parcel_analytics_etl_notebook_spark.operators.multimodal import (
        zscore_first_component,
        zscore_first_component_arrow,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {
        r["vec_id"]: (r["label"], r["z_first"])
        for r in zscore_first_component_arrow(emb).collect()
    }
    p = {
        r["vec_id"]: (r["label"], r["z_first"])
        for r in zscore_first_component(emb).collect()
    }
    assert a.keys() == p.keys() and len(a) == emb.count()
    for k in a:
        assert a[k][0] == p[k][0]
        za, zp = a[k][1], p[k][1]
        if za is None or (isinstance(za, float) and math.isnan(za)):
            assert zp is None or math.isnan(zp)
        else:
            assert abs(za - zp) < 1e-6


def test_mg_absorb_bound_property():
    """Misra-Gries merge invariant: after absorbing any stream in any
    batch split, every key's true count is undercounted by at most
    n/(k+1), so keys with true count > n/k always survive."""
    import random

    from parcel_analytics_etl_notebook_spark.operators.heavyhitters import (
        _mg_absorb,
    )

    rng = random.Random(7)
    # Zipf-ish stream: key i has weight ~ 1/(i+1)
    stream = [i for i in range(80) for _ in range(200 // (i + 1))]
    rng.shuffle(stream)
    k = 10
    n = len(stream)
    true = {}
    for v in stream:
        true[v] = true.get(v, 0) + 1
    for n_batches in (1, 3, 7):
        sz = (n + n_batches - 1) // n_batches
        counters = {}
        for b in range(n_batches):
            batch = stream[b * sz : (b + 1) * sz]
            local = {}
            for v in batch:
                local[v] = local.get(v, 0) + 1
            counters = _mg_absorb(counters, local, k)
        assert len(counters) <= k
        for key, c in true.items():
            est = counters.get(key, 0)
            assert est <= c
            assert c - est <= n / (k + 1)
        for key, c in true.items():
            if c > n / k:
                assert key in counters


def test_exact_heavy_hitters_matches_full_groupby(spark):
    """The two-pass sketch path must return the IDENTICAL rows the
    naive full groupBy yields, on a skewed key column."""
    from pyspark.sql import functions as F

    from parcel_analytics_etl_notebook_spark.operators.heavyhitters import (
        exact_heavy_hitters,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    words = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    k = 50
    got = {
        (r["word"], r["cnt"]) for r in exact_heavy_hitters(words, "word", k).collect()
    }
    n = words.count()
    want = {
        (r["word"], r["cnt"])
        for r in words.groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.col("cnt") > F.lit(n) / k)
        .collect()
    }
    assert want, "fixture produced no heavy hitters — threshold too high"
    assert got == want


def test_cms_grid_merges_and_dominates_truth(spark):
    """CMS invariants: (a) the grid built on the full stream equals the
    bucket-wise SUM of grids built on disjoint halves (sum-monoid
    mergeability — the property that makes it a sketch); (b) every
    point estimate >= the true count."""
    from parcel_analytics_etl_notebook_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    rows = [(f"w{i % 7}",) for i in range(200)] + [("rare",)] * 3
    df = spark.createDataFrame(rows, "w string").withColumn(
        "idx", F.monotonically_increasing_id()
    )
    full = cms_build(df, "w", depth=3, width=16)
    h1 = cms_build(df.filter(F.col("idx") % 2 == 0), "w", depth=3, width=16)
    h2 = cms_build(df.filter(F.col("idx") % 2 == 1), "w", depth=3, width=16)
    merged = (
        h1.unionByName(h2)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, merged.collect())
    )

    truth = {r[0]: r[1] for r in df.groupBy("w").count().collect()}
    qs = spark.createDataFrame([(w,) for w in truth], "w string")
    est = {
        r["w"]: r["cms_estimate"]
        for r in cms_estimate(qs, full, "w", depth=3, width=16).collect()
    }
    for w, n in truth.items():
        assert est[w] >= n


def test_bloom_no_false_negatives_and_merges(spark):
    """Bloom invariants: every inserted item probes positive (no false
    negatives), and the filter of the full set equals the union of the
    halves' filters (bit-set union mergeability)."""
    from parcel_analytics_etl_notebook_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    rows = [(f"item{i}",) for i in range(80)]
    df = spark.createDataFrame(rows, "w string")
    bits = bloom_build(df, "w", k=3, m=512)
    probed = bloom_probe(df, bits, "w", k=3, m=512)
    assert all(r["bloom_positive"] for r in probed.collect())

    h1 = bloom_build(df.limit(40), "w", k=3, m=512)
    h2 = bloom_build(df.subtract(df.limit(40)), "w", k=3, m=512)
    merged = h1.unionByName(h2).distinct()
    assert sorted(r[0] for r in bits.collect()) == sorted(
        r[0] for r in merged.collect()
    )


def test_hll_registers_merge_and_estimate_bounds(spark):
    """HLL invariants: register frames merge by max-per-register
    (full == merge of halves), and the estimate lands within 3σ of the
    truth for a synthetic high-cardinality stream (σ ≈ 1.04/√m)."""
    from parcel_analytics_etl_notebook_spark.operators.sketches import (
        HLL_M,
        hll_estimate_expr,
        hll_registers,
    )

    n = 5000
    df = spark.range(n).select(F.concat(F.lit("user-"), F.col("id")).alias("u"))
    full = hll_registers(df, "u")
    h1 = hll_registers(df.filter(F.col("u").substr(-1, 1).isin("0", "1", "2", "3", "4")), "u")
    h2 = hll_registers(df.filter(~F.col("u").substr(-1, 1).isin("0", "1", "2", "3", "4")), "u")
    merged = (
        h1.unionByName(h2).groupBy("register").agg(F.max("max_rho").alias("max_rho"))
    )
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, merged.collect())
    )

    est = hll_estimate_expr(full).head()[0]
    sigma = 1.04 / (HLL_M ** 0.5)
    assert abs(est - n) / n < 3 * sigma, f"estimate {est} vs {n}"


def test_global_running_sums_multi_measure(spark):
    """Multi-measure two-pass prefix sums equal the window form for
    each measure, and integral inputs stay exact BIGINTs."""
    from pyspark.sql import Window

    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        global_running_sums,
    )

    rows = [(i, (i * 13) % 29 + 1, (i * 7) % 11) for i in range(400)]
    df = spark.createDataFrame(rows, "id bigint, a bigint, b bigint")
    out = global_running_sums(
        df, ["id"], ["a", "b"], out_cols=["ca", "cb"], num_partitions=6
    )
    assert dict(out.dtypes)["ca"] == "bigint"
    got = {r["id"]: (r["ca"], r["cb"]) for r in out.collect()}
    w = Window.orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["id"]: (r["ca"], r["cb"])
        for r in df.withColumn("ca", F.sum("a").over(w))
        .withColumn("cb", F.sum("b").over(w))
        .collect()
    }
    assert got == want


def test_exact_ntile_equals_window_ntile(spark):
    """exact_ntile equals F.ntile row-for-row — including the uneven
    split (total % n != 0), descending orders, and total < n."""
    from pyspark.sql import Window

    from parcel_analytics_etl_notebook_spark.operators.indexing import (
        exact_ntile,
    )

    for total, n in [(503, 10), (500, 7), (4, 10), (10, 10)]:
        rows = [(i, (i * 37) % 97) for i in range(total)]
        df = spark.createDataFrame(rows, "id bigint, v bigint")
        for order in (
            [F.col("v").asc(), F.col("id").asc()],
            [F.col("v").desc(), F.col("id").asc()],
        ):
            got = {
                r["id"]: r["b"]
                for r in exact_ntile(
                    df, list(order), n, out_col="b", num_partitions=5
                ).collect()
            }
            want = {
                r["id"]: r["b"]
                for r in df.withColumn(
                    "b", F.ntile(n).over(Window.orderBy(*order))
                ).collect()
            }
            assert got == want, (total, n)


def test_pps_selection_decimal_switch_near_bigint_overflow(spark):
    """pps_selection must auto-switch to DECIMAL(38,0) when total*K
    nears 2^63 (VERDICT r04 #4): with ~5e18 of total weight the cum*K
    intermediate product overflows BIGINT, so the narrow path would
    return garbage — the wide path must match exact Python integers."""
    from parcel_analytics_etl_notebook_spark.plans.queries_relational15 import (
        _PPS_BIGINT_HEADROOM,
        pps_selection,
    )

    cents = [3_000_000_000_000_000_000, 1_500_000_000_000_000_000,
             400_000_000_000_000_000, 99_000_000_000_000_000,
             1_000_000_000_000_000_000]
    k = 100
    total = sum(cents)
    assert total * k >= _PPS_BIGINT_HEADROOM  # exercises the wide path
    cums = []
    c = 0
    for w in cents:
        c += w
        cums.append(c)
    expect = {}
    for i, (w, cu) in enumerate(zip(cents, cums)):
        hi = (cu - 1) * k // total
        lo = (cu - w - 1) * k // total
        if hi > lo or cu == w:
            expect[i] = hi
    df = spark.createDataFrame(
        [(i, w, cu) for i, (w, cu) in enumerate(zip(cents, cums))],
        "id long, cents long, cum long",
    )
    bucket, keep = pps_selection(total, k)
    got = {
        r["id"]: r["bucket"]
        for r in df.withColumn("bucket", bucket).filter(keep).collect()
    }
    assert got == expect
