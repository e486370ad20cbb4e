"""Fuzzy/near-duplicate detection (LLM-data-pipeline extension):
token-shingling, n-gram Jaccard, MinHash signatures + LSH banding,
SimHash. Everything is built-in array/higher-order functions so the
whole pipeline is JVM-side and (except where noted) oracle-checkable
via the shared polynomial hash (operators/textqa.doc_fingerprint).

Scale notes (the reason these shapes were chosen for 100 TB):
- shingle→hash→explode→band-bucket join touches each doc O(shingles)
  and each candidate pair once — never the O(n²) cartesian.
- the band-bucket groupBy shuffles on (band, hash): uniformly
  distributed, skew-free.
- exact Jaccard verification runs only on LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import tokens
from parcel_analytics_etl_notebook_spark.operators.textqa import FP_MOD


def shingles(toks: Column, k: int = 3) -> Column:
    """Contiguous k-token shingles joined by a single space.

    Docs shorter than k tokens yield an empty array (sequence(0, n-k)
    would be invalid; guarded with a when)."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - k)
    parts = lambda i: [toks[i + j] for j in range(k)]  # noqa: E731
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))
    )


def poly_hash(col: Column) -> Column:
    """Polynomial string hash (codepoint rolling hash, mod prime) —
    shared with the DuckDB oracle, unlike xxhash64/murmur which differ
    across engines. Used as the base hash for MinHash."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % F.lit(FP_MOD),
    )


#: multiplier combining token hashes into a shingle hash (mod FP_MOD);
#: large enough to mix, small enough that h*MULT stays well inside int64
SHINGLE_MULT = 1_000_003


def shingle_hashes_from_tokens(token_hashes: Column, k: int = 3) -> Column:
    """k-gram shingle hashes derived from per-token hashes:
    h(g) = fold of token hashes with SHINGLE_MULT (mod FP_MOD).

    Built with slice+zip_with rather than indexed access inside a
    transform lambda: element access on an expression-backed array
    re-inlines (and re-evaluates) the whole producing expression per
    element — O(shingles·tokens) hidden work. slice/zip_with evaluate
    the token-hash array a constant number of times per row."""
    n = F.size(token_hashes)
    width = n - (k - 1)
    out = F.slice(token_hashes, 1, width)
    for j in range(1, k):
        nxt = F.slice(token_hashes, j + 1, width)
        out = F.zip_with(
            out, nxt, lambda a, b: (a * SHINGLE_MULT + b) % F.lit(FP_MOD)
        )
    return F.when(n < k, F.array().cast("array<bigint>")).otherwise(out)


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """id + MinHash signature per document (array<bigint> of length
    ``num_hashes``); for seed s, h_s(x) = ((2s+1)·x + 7919·s) mod P and
    signature[s] = min over shingle hashes. Docs with < k tokens get an
    all-null signature.

    Shape: explode shingle hashes to rows, then ONE hash aggregate with
    ``num_hashes`` conditional mins — fully codegen'd, map-side
    partials, single shuffle on the doc id. (The tempting pure-HOF form
    — transform(seeds, s -> array_min(...)) — re-evaluates the whole
    shingle pipeline once per seed per row: 16× the work, interpreted.)

    The token-hash array is materialized behind a round-robin exchange
    before shingling: shingle_hashes_from_tokens references its input
    ~7× (three slices plus size guards), and interpreted HOF
    expressions re-evaluate per reference (no subexpression
    elimination), so without the barrier the tokenize+hash pipeline
    runs ~7× per row. The exchange shuffles only (id, array<bigint>).
    """
    nparts = df.sparkSession.sparkContext.defaultParallelism
    tok_hashes = F.transform(tokens(text_col), lambda t: poly_hash(t))
    th = df.select(id_col, tok_hashes.alias("__th")).repartition(nparts)
    hashed = shingle_hashes_from_tokens(F.col("__th"), k)
    exploded = th.select(id_col, F.explode_outer(hashed).alias("__h"))
    aggs = [
        F.min(
            ((2 * s + 1) * F.col("__h") + s * 7919) % F.lit(FP_MOD)
        ).alias(f"__m{s}")
        for s in range(num_hashes)
    ]
    sig = exploded.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col,
        F.array(*[f"__m{s}" for s in range(num_hashes)]).alias("minhash"),
    )


def drop_hot_shingles(
    sh: DataFrame, shingle_col: str = "shingle", max_df: int = 10_000
) -> DataFrame:
    """Document-frequency cap for inverted-index self-joins: drop
    shingles appearing in more than ``max_df`` documents BEFORE pairing.

    A single boilerplate shingle shared by d documents contributes
    d·(d-1)/2 candidate pairs — one hot key turns the bucketed join
    quadratic (the classic web-corpus scale-killer: headers, license
    blocks, stop-phrases). Capping df bounds any shingle's contribution
    at max_df²/2 pairs and, in MinHash/Jaccard practice, *improves*
    dedup precision — corpus-wide boilerplate carries no similarity
    signal. The hot list is at most (total shingle instances)/max_df
    entries, so the anti-join's build side is small by construction
    (AQE picks broadcast)."""
    hot = (
        sh.groupBy(shingle_col)
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > max_df)
        .select(shingle_col)
    )
    return sh.join(hot, on=shingle_col, how="left_anti")


def lsh_banded(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 4,
    sig_len: int = 16,
    max_bucket: int | None = 10_000,
    persist: bool = True,
) -> DataFrame:
    """LSH banding bucket rows: split each signature into ``bands``
    equal bands and emit one ``(id, band, sig_band)`` row per band —
    the bucket index both the full self-join (:func:`lsh_candidate_
    pairs`) and the incremental batch-vs-corpus candidate join build
    on. One explode; the frame is persisted because every consumer
    references it at least twice (join sides, hot-bucket count).

    ``max_bucket`` drops buckets holding more than that many docs
    before any pairing (same rationale as :func:`drop_hot_shingles`:
    one boilerplate-signature bucket with d docs is d²/2 pairs — on a
    web corpus a single hot bucket is the whole job's runtime). Docs
    sharing a dropped bucket still pair through their other
    ``bands-1`` bands unless they're boilerplate-identical in every
    band — exactly the mass-duplicate case handled by exact dedup
    upstream. ``None`` disables the cap.

    ``sig_len`` must be divisible by ``bands`` — otherwise the trailing
    ``sig_len % bands`` signature positions would silently never
    participate in any band (quietly degraded recall)."""
    if sig_len % bands != 0:
        raise ValueError(
            f"signature length {sig_len} is not divisible by bands={bands}: "
            f"the last {sig_len % bands} MinHash values would be ignored"
        )
    # rows_per_band from the VALIDATED parameter, never the data: the
    # old size()/bands form silently ignored trailing positions of a
    # signature longer than sig_len — the exact bug the divisibility
    # guard exists to prevent. The assert_true evaluates per row and
    # raises on any signature whose actual length disagrees.
    rows_per_band = sig_len // bands
    checked = F.expr(
        f"CASE WHEN assert_true(size({sig_col}) = {sig_len}, "
        f"'minhash signature length <> sig_len={sig_len}') IS NULL "
        f"THEN {sig_col} END"
    )
    banded = sig_df.withColumn(sig_col, checked).select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.slice(
                        F.col(sig_col), b * rows_per_band + 1, rows_per_band
                    ).alias("sig_band"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", F.col("bb.sig_band").cast("array<string>").alias("sig_band"))
    # joins over this frame would otherwise recompute the full
    # signature pipeline once per side — persist the (small) banded
    # frame. Deliberately NOT unpersisted here: the result is lazy, so
    # the cache must outlive this function; long-lived sessions reclaim
    # via spark.catalog.clearCache() (bench.py does so between queries).
    # ``persist=False`` is for callers that cache the result themselves
    # and CANNOT rely on a between-queries clearCache — a continuously
    # running foreachBatch stream would otherwise leak one cached frame
    # per micro-batch for its lifetime (ADVICE r09 #3).
    if persist:
        banded = banded.persist()
    if max_bucket is not None:
        hot = (
            banded.groupBy("band", "sig_band")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_bucket)
            .select("band", "sig_band")
        )
        banded = banded.join(hot, on=["band", "sig_band"], how="left_anti")
        if persist:
            banded = banded.persist()
    return banded


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 4,
    sig_len: int = 16,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """LSH banding self-join: bucket docs by (band_idx, band_values)
    via :func:`lsh_banded`, emit intra-bucket pairs. One explode + one
    shuffle on the bucket key; pair blow-up is bounded by bucket sizes
    (``max_bucket``), not n²."""
    banded = lsh_banded(
        sig_df, id_col=id_col, sig_col=sig_col, bands=bands,
        sig_len=sig_len, max_bucket=max_bucket,
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig_band") == F.col("b.sig_band"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates()
    )


def simhash(token_hashes: Column, bits: int = 16) -> Column:
    """SimHash fingerprint: per bit j, sign of Σ_tokens (±1 by bit j of
    the token hash); near-identical token multisets land at small
    Hamming distance. Returns a ``bits``-wide integer.

    ``bits`` unrolls at plan-build time (shift amounts must be Python
    ints for shiftleft/shiftright) — one codegen'd expression, no UDF.
    """
    def bit_sum(j: int) -> Column:
        # plain closure — a `j=j` default would change the lambda's
        # arity, which PySpark inspects to bind HOF variables
        return F.aggregate(
            token_hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(
                F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        )

    fp: Column = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(bit_sum(j) > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return fp


def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """id + SimHash fingerprint per document, via explode → one hash
    aggregate with ``bits`` conditional sums (codegen'd; the pure-HOF
    :func:`simhash` re-evaluates the token-hash pipeline per bit —
    fine for arrays already materialized, 16× overhead otherwise)."""
    tok_hashes = F.transform(tokens(text_col), lambda t: poly_hash(t))
    exploded = df.select(id_col, F.explode_outer(tok_hashes).alias("__h"))
    sums = [
        F.sum(
            F.when(
                F.shiftright(F.col("__h"), j).bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"__b{j}")
        for j in range(bits)
    ]
    agg = exploded.groupBy(id_col).agg(*sums)
    fp: Column = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(
            F.col(f"__b{j}") > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0))
    return agg.select(id_col, fp.alias("simhash"))


def hamming_distance(a: Column, b: Column, bits: int = 16) -> Column:
    """Hamming distance between two simhash fingerprints."""
    x = a.bitwiseXOR(b)
    return sum(
        F.shiftright(x, j).bitwiseAND(F.lit(1)) for j in range(bits)
    ).cast("bigint")


#: per-band remix multipliers for the wide (4×16-bit) SimHash: band k
#: hashes the token stream through h_k = (h · SIMHASH_MIXERS[k]) mod
#: FP_MOD before taking sign-bits, so the four 16-bit sub-fingerprints
#: are decorrelated. Band 0's mixer is 1, i.e. band 0 IS the classic
#: 16-bit SimHash of :func:`with_simhash` — the recall comparison
#: between the two paths is a column comparison, not a re-run. All
#: multipliers keep h·C < 2^63 (h < FP_MOD ≈ 2^30), exact on both
#: engines.
SIMHASH_MIXERS = (1, 1_000_003, 998_244_353, 69_069)


def with_simhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    band_bits: int = 16,
) -> DataFrame:
    """id + the four 16-bit bands of a 64-bit SimHash (columns
    ``band_0..band_3``, each BIGINT in [0, 2^band_bits)).

    This is the structural fix the 16-bit path's band-bucket cap only
    approximates (SCALING.md round-8: an 8-bit band has 256 values, so
    intra-bucket pairs grow n²/256 and the cap silently DROPS pairs in
    hot buckets at corpus scale). A 16-bit band has 65,536 values —
    bucket occupancy n/65,536 — so banding the wide fingerprint keeps
    the candidate join linear WITHOUT sacrificing recall to a cap, and
    pigeonhole over 4 bands guarantees every pair at 64-bit hamming ≤ 3
    shares at least one intact band.

    Shape: same as :func:`with_simhash` — explode token hashes once,
    then ONE hash aggregate carrying 4×band_bits conditional sums
    (map-side combined, fully codegen'd; a single shuffle on the doc
    id). The bands stay separate BIGINT columns rather than one packed
    64-bit value: bit 63 would need an unsigned literal (1<<63
    overflows signed int64 on both engines), and the band columns are
    exactly the join keys the candidate query needs anyway."""
    tok_hashes = F.transform(tokens(text_col), lambda t: poly_hash(t))
    exploded = df.select(id_col, F.explode_outer(tok_hashes).alias("__h"))
    sums = []
    for k, mix in enumerate(SIMHASH_MIXERS):
        hk = (F.col("__h") * F.lit(mix)) % F.lit(FP_MOD)
        for j in range(band_bits):
            sums.append(
                F.sum(
                    F.when(
                        F.shiftright(hk, j).bitwiseAND(F.lit(1)) == 1,
                        F.lit(1),
                    ).otherwise(-1)
                ).alias(f"__b{k}_{j}")
            )
    agg = exploded.groupBy(id_col).agg(*sums)
    bands = []
    for k in range(len(SIMHASH_MIXERS)):
        fp: Column = F.lit(0).cast("long")
        for j in range(band_bits):
            fp = fp + F.when(
                F.col(f"__b{k}_{j}") > 0, F.lit(1 << j).cast("long")
            ).otherwise(F.lit(0))
        bands.append(fp.alias(f"band_{k}"))
    return agg.select(id_col, *bands)
