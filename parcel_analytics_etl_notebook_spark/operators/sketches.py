"""Count-Min sketch (Cormode & Muthukrishnan 2005), relationally.

The CMS is a d×W counter grid: each item increments one bucket per
hash row; an item's estimate is the MIN of its d bucket counters —
always ≥ the true count, and ≤ true + εN with probability 1−δ for
W = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. The grid is a pure sum-monoid, so it
map-side combines and merges across partitions/streams/days for free —
the point of sketching at 100 TB: the full corpus frequency table is
unbounded, the sketch is d·W integers.

Implementation is deliberately RELATIONAL: the grid is a (row, bucket,
count) DataFrame built by one explode(×d) + groupBy — no UDF, no
driver-side state — and estimation is a broadcast join of the
model-sized grid. Hashes are the cross-engine polynomial hash
(operators/dedup_fuzzy.poly_hash) with per-row seed prefixes, so a SQL
oracle can restate the ENTIRE sketch bucket-for-bucket — the estimate
column is hash-checked against DuckDB, not just bounded
(plans/queries_llm6.countmin_word_frequencies); the ≥-true guarantee is
additionally asserted in-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
    FP_MOD,
    poly_hash,
)


#: affine row-function constants (a_s, b_s): the textbook 2-universal
#: family h_s(x) = (a_s·H(x) + b_s) mod p mod W over ONE shared base
#: hash — the expensive char-level poly hash runs once per occurrence
#: instead of depth times (4.1s → ~1.5s on the sf0.1 token stream).
#: Odd multipliers, fixed forever: they're part of the sketch identity
#: (changing them invalidates every stored grid).
CMS_ROWS = [(1, 0), (31_337, 271_828), (999_983, 141_421), (7_919, 577_215)]


def cms_bucket(item, seed: int, width: int):
    """Bucket of ``item`` (string column) in hash row ``seed``: the
    affine row function over the shared poly base hash —
    (a_s·H(item) + b_s) mod p mod width, engine-portable."""
    a, b = CMS_ROWS[seed]
    return ((poly_hash(item) * a + b) % F.lit(FP_MOD)) % F.lit(width)


def cms_build(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch grid from an item stream (one row per
    occurrence): returns (row, bucket, cnt), d·W rows max.

    The base hash is computed ONCE per occurrence; the depth buckets
    are cheap affine transforms of it, emitted as a depth-length array
    and exploded with their row index. One explode(×depth constant) +
    one groupBy; grids from disjoint slices merge by summing cnt on
    (row, bucket)."""
    h = items.select(poly_hash(F.col(item_col)).alias("__h"))
    buckets = F.array(
        *[
            ((F.col("__h") * a + b) % F.lit(FP_MOD)) % F.lit(width)
            for a, b in CMS_ROWS[:depth]
        ]
    )
    return (
        h.select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _bucket_by_row(item_col: str, depth: int, width: int):
    """Bucket expression dispatching on the exploded `row` value: a
    when-chain over the ``depth`` affine row functions (depth is a
    small constant, so the chain stays codegen-friendly)."""
    expr = None
    for s in range(depth):
        cond = F.col("row") == s
        b = cms_bucket(F.col(item_col), s, width)
        expr = F.when(cond, b) if expr is None else expr.when(cond, b)
    return expr


def cms_estimate(
    queries: DataFrame,
    grid: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    out_col: str = "cms_estimate",
) -> DataFrame:
    """Point-query the sketch for each row of ``queries``: min over the
    d bucket counters. The grid is model-sized (d·W) — broadcast; a
    bucket an item never hashed into simply doesn't appear, and the
    missing counter means estimate 0 (only possible for items absent
    from the build stream, where 0 is exact)."""
    probes = queries.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).withColumn("bucket", _bucket_by_row(item_col, depth, width))
    others = [c for c in queries.columns]
    return (
        probes.join(F.broadcast(grid), ["row", "bucket"], "left")
        .groupBy(*others)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias(out_col)
        )
    )


def bloom_build(
    items: DataFrame, item_col: str, k: int = 3, m: int = 4096
) -> DataFrame:
    """Relational Bloom filter: the SET-BIT list as a 1-column frame of
    distinct bit indices (≤ m rows; the dense bitmap is its trivial
    encoding). k poly-hash rows per item via one explode(×k) +
    distinct. Merging filters = union+distinct; bits never unset —
    deletions need a counting filter (this build trades them away for
    the classic space bound m ≈ -n·ln(fpp)/ln²2)."""
    ex = items.select(
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("row"),
        F.col(item_col).alias("__item"),
    )
    return (
        ex.select(
            (
                poly_hash(F.concat(F.col("row").cast("string"),
                                   F.lit(":"), F.col("__item")))
                % F.lit(m)
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    queries: DataFrame,
    bits: DataFrame,
    item_col: str,
    k: int = 3,
    m: int = 4096,
    out_col: str = "bloom_positive",
) -> DataFrame:
    """Probe: an item is bloom-positive iff ALL k of its bits are set.
    No false negatives by construction; false-positive rate ≈
    (1 - e^{-kn/m})^k. The bit list is model-sized — broadcast; the
    all-bits-set test is count(matched) == k after a left join."""
    probes = queries.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("row"),
    ).withColumn(
        "bit",
        poly_hash(
            F.concat(F.col("row").cast("string"), F.lit(":"), F.col(item_col))
        )
        % F.lit(m),
    )
    marked = bits.withColumn("__set", F.lit(1))
    others = list(queries.columns)
    return (
        probes.join(F.broadcast(marked), "bit", "left")
        .groupBy(*others)
        .agg((F.count(F.col("__set")) == k).alias(out_col))
    )


#: HLL geometry: m = 64 registers; the poly hash yields < 2^30, so the
#: sub-register word has WBITS = 24 usable bits (FP_MOD // 64 < 2^24)
HLL_M = 64
HLL_WBITS = 24
#: alpha_64 from Flajolet et al. 2007 (m >= 64 branch: 0.7213/(1+1.079/m))
HLL_ALPHA = 0.7213 / (1 + 1.079 / 64)


def hll_rho(w):
    """Position of the leftmost 1-bit of ``w`` within WBITS (1-based),
    WBITS+1 if w = 0 — built as an integer-threshold CASE chain, never
    float log2 (exact at power-of-two boundaries in every engine)."""
    expr = F.when(w == 0, F.lit(HLL_WBITS + 1))
    for b in range(HLL_WBITS - 1, -1, -1):
        expr = expr.when(w >= 2**b, F.lit(HLL_WBITS - b))
    return expr


#: salt prefix for the HLL hash: the rolling poly hash of a SHORT
#: string never wraps the modulus, leaving the high bits (which rho
#: reads) near-empty — a 1500-key test stream estimated 4.1M distinct.
#: 10 salt chars force ≥3 modular wraparounds for any input, which is
#: what stands in for avalanche in this engine-portable hash.
HLL_SALT = "hllsketch#"


def hll_registers(items: DataFrame, item_col: str) -> DataFrame:
    """Register state (register, max_rho) — ≤ m rows, the whole sketch.
    Merging sketches = unionByName + max per register. One hash agg
    over the raw stream; NO pre-distinct needed (max absorbs
    duplicates — the property that makes HLL stream-able).

    The poly hash is LINEAR in its last characters (consecutive ids →
    consecutive hashes, so 64-id blocks shared one register word and
    collapsed the statistics: 1500 keys estimated as ~219); squaring
    mod p decorrelates register index from register word — the cheap
    engine-portable stand-in for an avalanche finalizer. Squaring
    halves the effective hash space (x and p−x collide): birthday
    collisions stay negligible below ~√(p/2) ≈ 2·10⁴ distinct —
    beyond that, raise p or add a second mixing round."""
    h = poly_hash(F.concat(F.lit(HLL_SALT), F.col(item_col).cast("string")))
    g = (h * h + F.lit(12345)) % F.lit(FP_MOD)
    reg = (g % HLL_M).alias("register")
    w = F.floor(g / HLL_M).cast("long")
    return (
        items.select(reg, hll_rho(w).alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate_expr(registers: DataFrame) -> DataFrame:
    """1-row estimate from the register frame: the raw HLL harmonic
    mean with the small-range linear-counting correction (E ≤ 2.5m and
    empty registers present → m·ln(m/V)); all arithmetic over the
    ≤ m-row frame. Absent registers contribute 2^0 = 1 to the harmonic
    sum (rho 0), exactly as the dense form would."""
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("__sum_present"),
        F.count(F.lit(1)).alias("__n_present"),
    )
    total = (
        F.col("__sum_present") + (F.lit(HLL_M) - F.col("__n_present"))
    )
    raw = F.lit(HLL_ALPHA) * HLL_M * HLL_M / total
    empty = F.lit(HLL_M) - F.col("__n_present")
    corrected = F.when(
        (raw <= 2.5 * HLL_M) & (empty > 0),
        HLL_M * F.log(F.lit(float(HLL_M)) / empty),
    ).otherwise(raw)
    return agg.select(corrected.alias("hll_estimate"))


#: KMV sketch size: k smallest distinct hash values per set. 256 gives
#: ~1/sqrt(254) ≈ 6% distinct-count error and usable intersections.
KMV_K = 256


def kmv_sketch(items: DataFrame, hash_col: str, side_col: str) -> DataFrame:
    """K-minimum-values sketch per side: the k smallest DISTINCT hash
    values (rows (side, gv), ≤ k per side) — the theta-sketch family's
    base form. Unlike HLL registers, the sketch IS a uniform sample of
    the hashed universe below a per-side threshold, which is what makes
    set INTERSECTION estimable: survivors below the common theta are a
    uniform sample of the intersection. Merge = union + re-take k
    smallest. One distinct + one per-side window rank."""
    from pyspark.sql import Window

    dv = items.select(side_col, hash_col).distinct()
    rn = F.row_number().over(
        Window.partitionBy(side_col).orderBy(hash_col)
    )
    return dv.withColumn("__rn", rn).filter(F.col("__rn") <= KMV_K).drop("__rn")
