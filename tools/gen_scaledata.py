"""Generate /root/repo/scaledata/x10 — a 10× scale-up of the bench
corpus (/root/testdata/sf0.1) for the heavy-pair-family scaling runs
recorded in SCALING.md (VERDICT r06 #3). NOT driver data; git-ignored.

Scaling must preserve per-row STRUCTURE, not just row count, or the
measurement lies:

- ``lineitem``: 10 replicas with l_orderkey / l_partkey / l_suppkey
  shifted into disjoint key universes per replica — the co-purchase
  graph becomes 10 disjoint copies of the sf0.1 graph, so vertices,
  edges, and k-core work all scale exactly 10×. (Replicating with the
  SAME part keys would instead multiply per-pair support 10× and
  densify the support-threshold graph superlinearly — a different
  workload, not a scale-up.)
- ``documents``: 10 replicas, each under its own seeded PERMUTATION of
  the 31-token vocabulary. Jaccard over shingles is invariant under a
  token bijection, so every planted near-dup pair is preserved exactly
  within its replica (pair count scales 10×, matching the measured
  linear 25→256 pair growth from sf0.01→sf0.1), while cross-replica
  docs collide no more than random same-vocab docs (measured ≈0).
- ``embeddings``: 10 replicas with vec_id shifted and a per-replica
  deterministic sign-flip pattern over dimensions (norms preserved,
  vectors distinct across replicas).

Run: ``python tools/gen_scaledata.py`` (~min; writes single parquet
files so both Spark and DuckDB read them directly).
"""

import os
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
#: replica count — the tier name. Default 10 (scaledata/x10, the
#: SCALING.md measured-curve corpus); VERDICT r10 #4 asks for one more
#: decade on the flagship linear claims, so SPARK_GRAFT_REPLICAS=100
#: writes scaledata/x100 with the identical structure-preserving
#: construction (disjoint key universes per replica; per-replica vocab
#: permutations / sign-flips — all replica-count-agnostic).
REPLICAS = int(os.environ.get("SPARK_GRAFT_REPLICAS", "10"))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "scaledata", f"x{REPLICAS}")
SEED = 20260815


def gen_lineitem(con: duckdb.DuckDBPyConnection) -> None:
    off = con.execute(
        f"SELECT max(l_orderkey) + 1, max(l_partkey) + 1, max(l_suppkey) + 1 "
        f"FROM '{SRC}/lineitem.parquet'"
    ).fetchone()
    okoff, pkoff, skoff = off
    con.execute(f"""
COPY (
  SELECT l_orderkey + r * {okoff} AS l_orderkey,
         l_partkey + r * {pkoff} AS l_partkey,
         l_suppkey + r * {skoff} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet', range({REPLICAS}) t(r)
) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)
""")


def gen_orders(con: duckdb.DuckDBPyConnection) -> None:
    """Orders replicas with o_orderkey shifted by the SAME offset as
    lineitem's, so dated-edge queries (temporal_reachability_khop)
    join consistently; o_custkey shifts into disjoint universes too."""
    off = con.execute(
        f"SELECT max(l_orderkey) + 1 FROM '{SRC}/lineitem.parquet'"
    ).fetchone()[0]
    ckoff = con.execute(
        f"SELECT max(o_custkey) + 1 FROM '{SRC}/orders.parquet'"
    ).fetchone()[0]
    con.execute(f"""
COPY (
  SELECT o_orderkey + r * {off} AS o_orderkey,
         o_custkey + r * {ckoff} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet', range({REPLICAS}) t(r)
) TO '{OUT}/orders.parquet' (FORMAT PARQUET)
""")


def gen_part(con: duckdb.DuckDBPyConnection) -> None:
    """Part replicas with p_partkey shifted by the SAME offset as
    lineitem's l_partkey, so part-lineitem joins stay consistent:
    every replica's fact rows join exactly their own replica's parts —
    brand/type/size distributions (and so per-brand medians, skylines)
    are preserved verbatim per replica."""
    pkoff = con.execute(
        f"SELECT max(l_partkey) + 1 FROM '{SRC}/lineitem.parquet'"
    ).fetchone()[0]
    con.execute(f"""
COPY (
  SELECT p_partkey + r * {pkoff} AS p_partkey,
         p_name, p_brand, p_type, p_size, p_retailprice
  FROM '{SRC}/part.parquet', range({REPLICAS}) t(r)
) TO '{OUT}/part.parquet' (FORMAT PARQUET)
""")


def gen_customer(con: duckdb.DuckDBPyConnection) -> None:
    """Customer replicas with c_custkey shifted by the SAME offset
    gen_orders used for o_custkey (max(o_custkey)+1 == max(c_custkey)+1
    on this data, verified), so each replica's orders join exactly its
    own replica's customers. Names/segments repeat verbatim per
    replica — for record-linkage queries that IS the workload (the
    same identities appearing in 10 sources)."""
    ckoff = con.execute(
        f"SELECT max(o_custkey) + 1 FROM '{SRC}/orders.parquet'"
    ).fetchone()[0]
    con.execute(f"""
COPY (
  SELECT c_custkey + r * {ckoff} AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet', range({REPLICAS}) t(r)
) TO '{OUT}/customer.parquet' (FORMAT PARQUET)
""")


def gen_supplier(con: duckdb.DuckDBPyConnection) -> None:
    """Supplier replicas on lineitem's l_suppkey offset (aligned the
    same way as customer/orders)."""
    skoff = con.execute(
        f"SELECT max(l_suppkey) + 1 FROM '{SRC}/lineitem.parquet'"
    ).fetchone()[0]
    con.execute(f"""
COPY (
  SELECT s_suppkey + r * {skoff} AS s_suppkey,
         s_name, s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet', range({REPLICAS}) t(r)
) TO '{OUT}/supplier.parquet' (FORMAT PARQUET)
""")


def gen_dims(con: duckdb.DuckDBPyConnection) -> None:
    """nation/region are copied VERBATIM: they are fixed dimensions
    (25 nations, 5 regions) that every replica's foreign keys point
    into — replicating them would change join semantics, not scale."""
    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )


def gen_documents(con: duckdb.DuckDBPyConnection) -> None:
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()
    n = len(rows)
    vocab = sorted(
        {w for (_, text, _, _) in rows for w in text.split(" ") if w}
    )
    rng = random.Random(SEED)
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for r in range(REPLICAS):
        perm = vocab[:]
        if r > 0:  # replica 0 keeps the original corpus verbatim
            rng.shuffle(perm)
        mapping = dict(zip(vocab, perm))
        for doc_id, text, lang, source in rows:
            t = " ".join(mapping.get(w, w) for w in text.split(" "))
            out["doc_id"].append(r * n + doc_id)
            out["text"].append(t)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(t))
    tbl = pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "text": pa.array(out["text"], pa.string()),
            "lang": pa.array(out["lang"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "n_chars": pa.array(out["n_chars"], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{OUT}/documents.parquet")


def gen_embeddings(con: duckdb.DuckDBPyConnection) -> None:
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    n = len(rows)
    dim = len(rows[0][1])
    rng = random.Random(SEED + 1)
    out_id, out_emb, out_lab = [], [], []
    for r in range(REPLICAS):
        flips = [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]
        if r == 0:
            flips = [1.0] * dim
        for vec_id, emb, label in rows:
            out_id.append(r * n + vec_id)
            out_emb.append([v * f for v, f in zip(emb, flips)])
            out_lab.append(label)
    tbl = pa.table(
        {
            "vec_id": pa.array(out_id, pa.int64()),
            "embedding": pa.array(out_emb, pa.list_(pa.float32())),
            "label": pa.array(out_lab, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{OUT}/embeddings.parquet")


def gen_events(con: duckdb.DuckDBPyConnection) -> None:
    """Events replicas with user_id and event_id shifted into disjoint
    universes; ts, type, value, props unchanged — each user's ordered
    event SEQUENCE is preserved verbatim, so per-key sequential work
    (clamped_running_balance's token-bucket walk, sessionization, lag
    windows) scales to exactly 10x the keys with identical per-key
    state, which is the honest scale-up for keyed-state operators.
    ts stays TIMESTAMP through the copy (DuckDB writes microseconds;
    the engine's table() reader handles both nanos-as-long and plain
    timestamp parquet encodings)."""
    uoff = con.execute(
        f"SELECT max(user_id) + 1 FROM '{SRC}/events.parquet'"
    ).fetchone()[0]
    eoff = con.execute(
        f"SELECT max(event_id) + 1 FROM '{SRC}/events.parquet'"
    ).fetchone()[0]
    con.execute(f"""
COPY (
  SELECT event_id + r * {eoff} AS event_id,
         ts,
         user_id + r * {uoff} AS user_id,
         event_type, value, props
  FROM '{SRC}/events.parquet', range({REPLICAS}) t(r)
) TO '{OUT}/events.parquet' (FORMAT PARQUET)
""")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    gen_lineitem(con)
    gen_orders(con)
    gen_part(con)
    gen_customer(con)
    gen_supplier(con)
    gen_dims(con)
    gen_documents(con)
    gen_embeddings(con)
    gen_events(con)
    for f in sorted(os.listdir(OUT)):
        p = os.path.join(OUT, f)
        print(f, f"{os.path.getsize(p) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
