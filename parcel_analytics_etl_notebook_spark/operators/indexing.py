"""Scalable global row numbering.

The naive form — ``row_number() OVER (ORDER BY ...)`` with no
PARTITION BY — forces every row through ONE task (Spark plans a global
Window after a total sort, with no partition key to parallelize on).
Fine at 60k rows, fatal at 100 TB.

Two scalable constructions live here; the operators pick automatically:

**Literal-boundary bucketing (preferred).** One tiny
``percentile_approx`` aggregate yields ~``num_partitions`` boundary
LITERALS for the leading (numeric/date/timestamp) order column. Each
row's bucket is then a PURE FUNCTION of its own values — deterministic
across jobs and executor failures with no checkpoint — so the
construction is: bucket counts (small aggregate, map-side partials) →
explode-based prefix fold (lazy, no collect, no single-partition
window) → global index = bucket offset + ``row_number`` over a window
PARTITIONED by bucket (fully parallel). Equal rows share a
bucket (boundaries compare strictly), so within-bucket tiebreak order
composes into the exact total order. Boundary accuracy only affects
bucket BALANCE, never correctness; a single hot value concentrates its
ties into one bucket (same skew profile as any range partitioning on
ties).

**String keys** take the same literal-boundary path with cut points
as STRING literals from a bounded sample (``_string_boundaries``) —
Spark compares strings by UTF-8 bytes, so a frozen string literal is
as valid a boundary as a double.

**Range-repartition two-pass (fallback).** For the remaining leading
order column types (arrays, structs, binary):
``repartitionByRange`` + ``localCheckpoint`` (range
sampling is order-sensitive, so the assignment must be frozen before
the counts pass reads it — on a cluster where executor loss matters,
swap in reliable ``checkpoint()``), then the same
counts → offsets → partitioned ``row_number`` assembly keyed on
``spark_partition_id()``.

Both equal the single-task form row-for-row whenever ``order_cols`` is
a total order (enforce uniqueness via a tiebreak column, same rule as
every dedup/top-k in this engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_NUMERIC_DTYPES = {"tinyint", "smallint", "int", "bigint", "float", "double"}

#: bounded sample size for string-key boundary estimation — ~100
#: samples per bucket at the 256-bucket cap keeps cut-point quality
#: high while the collect stays driver-safe at any data scale
_STRING_SAMPLE_TARGET = 25_600


def _string_boundaries(df: DataFrame, col_name: str, n: int) -> list[str]:
    """Up to ``n-1`` ascending string cut points for literal-boundary
    bucketing of a STRING order column (VERDICT r04 #6 — retires the
    localCheckpoint+collect fallback from the string-key hot path).

    Spark orders strings by UTF-8 binary comparison, so cut points can
    be literal strings: a bounded random sample (one count — parquet
    answers it from row-group metadata — plus one ≤~26k-row collect)
    yields evenly spaced sample quantiles. Sample quality affects only
    bucket BALANCE: once collected, the cuts are frozen literals and
    the bucket stays a pure function of the row's own value —
    deterministic across jobs, retries, and executor loss, which is
    the invariant the checkpoint existed to fake."""
    cnt = df.count()
    if cnt == 0:
        return []
    frac = min(1.0, (_STRING_SAMPLE_TARGET * 1.25) / cnt)
    vals = sorted(
        r[0]
        for r in df.select(col_name)
        .where(F.col(col_name).isNotNull())
        .sample(fraction=frac, seed=42)
        .limit(4 * _STRING_SAMPLE_TARGET)
        .collect()
    )
    if not vals:
        return []
    return sorted({vals[(len(vals) * i) // n] for i in range(1, n)})


def _bucket_sort_key(df: DataFrame, col_name: str) -> Column | None:
    """A double-valued, order-preserving sort key for ``col_name``, or
    None when the column can't drive literal-boundary bucketing
    (strings, arrays, missing)."""
    dt = dict(df.dtypes).get(col_name)
    if dt is None:
        return None
    if dt == "date":
        return F.unix_date(F.col(col_name)).cast("double")
    if dt == "timestamp":
        # plain (LTZ) timestamps: the EPOCH is the monotone key — it is
        # zone-independent by definition. Field decomposition
        # (to_date/hour/minute/second) is what breaks under a DST
        # fall-back (a later instant repeats smaller wall-clock fields),
        # so it must NOT be used here (ADVICE r04, verified misbucketing
        # across 2021-11-07 in America/New_York).
        return F.unix_micros(F.col(col_name)).cast("double")
    if dt.startswith("timestamp"):
        # timestamp_ntz: no epoch functions apply (no zone to anchor
        # one), but wall-clock fields ARE the value, so their
        # decomposition is monotone NON-DECREASING to the second —
        # sub-second ties just share a bucket, which bucketing allows
        c = F.col(col_name)
        return (
            F.unix_date(F.to_date(c)).cast("double") * 86400.0
            + F.hour(c) * 3600.0
            + F.minute(c) * 60.0
            + F.second(c)
        )
    if dt in _NUMERIC_DTYPES or dt.startswith("decimal"):
        return F.col(col_name).cast("double")
    return None


def _bucketed(
    df: DataFrame,
    order_cols: list,
    n: int,
    boundaries: list[float] | None = None,
) -> tuple[DataFrame, int] | None:
    """Tag each row with ``__pid`` = its literal-boundary bucket on the
    leading order column, or None when the fast path is ineligible
    (leading order entry not a plain numeric/date/timestamp/string
    column name). Costs ONE tiny aggregate action for the boundaries
    (strings: one metadata count + one bounded sample collect) — or
    ZERO when the caller supplies ``boundaries`` (any ascending-sorted
    cut points on the SORT-KEY scale; only bucket balance depends on
    their quality, never correctness). Callers computing several
    indexes over one frame should batch all boundary sets into one
    aggregate (see spearman_spend_balance / rfm_segmentation).

    NULL keys bucket to -1, matching ascending NULLS FIRST — callers
    ordering descending must pre-negate the key column (the engine
    convention, see token_batch_packing / rfm_segmentation)."""
    if not order_cols or not isinstance(order_cols[0], str):
        return None
    if n > 256:
        # the unrolled boundary-comparison expression grows O(n); past
        # a few hundred terms plan size/codegen outweigh the checkpoint
        # the fallback path spends (a two-level coarse→fine bucket
        # lookup would lift this — not needed at current scales)
        return None
    col0 = order_cols[0]
    key = _bucket_sort_key(df, col0)
    is_string = key is None and dict(df.dtypes).get(col0) == "string"
    if key is None and not is_string:
        return None
    if is_string:
        # string order column: cut points are STRING literals from a
        # bounded sample (UTF-8 binary comparison IS Spark's string
        # order) — see _string_boundaries
        key = F.col(col0)
        if boundaries is None:
            boundaries = _string_boundaries(df, col0, n)
        bs = sorted({str(b) for b in boundaries if b is not None})
    else:
        if boundaries is None:
            probs = [i / n for i in range(1, n)]
            row = df.agg(
                F.percentile_approx(key, probs, 1000).alias("bs")
            ).first()
            boundaries = row["bs"] or []
        bs = sorted({float(b) for b in boundaries if b is not None})
    # materialize the key ONCE into a column before the boundary
    # comparisons: inlining it repeats the (date-math) key expression
    # per boundary — measured 3× slower. The unrolled sum of boolean
    # casts (vs a higher-order aggregate lambda, interpreted per row)
    # keeps the comparisons inside whole-stage codegen.
    kc = F.col("__key")
    if not bs:
        bucket = F.when(kc.isNull(), F.lit(-1)).otherwise(F.lit(0))
    else:
        strictly_less = sum(
            ((kc > F.lit(b)).cast("int") for b in bs), F.lit(0)
        )
        bucket = F.when(kc.isNull(), F.lit(-1)).otherwise(strictly_less)
    # persist the TAGGED frame: the cache is an optimizer barrier, so
    # the inner join's inferred isnotnull(__pid) null-filter references
    # the stored column — without it, predicate pushdown INLINES the
    # whole n-comparison bucket expression into a per-row Filter below
    # the projection (measured 3.6× on orders_global_index). Both the
    # offsets subtree and the consumer read this one materialization.
    tagged = (
        df.withColumn("__key", key)
        .withColumn("__pid", bucket)
        .drop("__key")
        .persist()
    )
    return tagged, len(bs)


def stable_global_index(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "global_idx",
    num_partitions: int | None = None,
    boundaries: list[float] | None = None,
) -> DataFrame:
    """Add a 1-based dense global index following ``order_cols``.

    ``order_cols`` must be a total order (unique tiebreak included) or
    the assignment within ties is partition-dependent.

    Numeric/date/timestamp leading order column → the literal-boundary
    bucketing path (module docstring): no checkpoint, bucket assignment
    recomputation-safe. Otherwise the range-repartition fallback, where
    the pid-tagged frame is localCheckpoint'ed (materialized) before
    the counts pass: the counts job and the final indexing job MUST see
    the same partition assignment, and a re-executed repartitionByRange
    can sample different range boundaries per job.
    """
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    bucketed = _bucketed(df, order_cols, n, boundaries)
    if bucketed is not None:
        # relational offsets: no driver collect, no extra action — the
        # explode-based prefix fold over the bucket-grain counts frame,
        # broadcast back (left join: the minimum bucket has no row)
        with_pid, max_pid = bucketed
        off = _bucket_offsets(
            with_pid,
            [F.count(F.lit(1)).cast("bigint").alias("__off")],
            max_pid,
        )
        return (
            with_pid.join(off, "__pid", "left")
            .withColumn(
                # widen BEFORE adding: int32 row_number wraps negative
                # past 2^31 rows under non-ANSI arithmetic — the exact
                # scale this operator exists for
                out_col,
                F.coalesce(F.col("__off"), F.lit(0).cast("bigint"))
                + F.row_number().over(w).cast("bigint"),
            )
            .drop("__pid", "__off")
        )

    with_pid = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in with_pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets = {}
    running = 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]

    indexed = _attach_offset(with_pid, offsets).withColumn(
        out_col,
        F.col("__off").cast("bigint") + F.row_number().over(w).cast("bigint"),
    )
    return indexed.drop("__pid", "__off")


def _bucket_offsets(
    with_pid: DataFrame, aggs: list, max_pid: int
) -> DataFrame:
    """(__pid, <agg outputs>) where each output is the exclusive prefix
    fold of that aggregate over buckets in ``__pid`` order — WITHOUT a
    single-partition window (the indexing operators' defining
    invariant, fenced by tests/test_scale_hygiene): bucket ids are
    dense literals in [-1, max_pid], so each bucket's subtotal
    ``sequence``-explodes to every LATER bucket id and a plain hash
    aggregate sums the contributions. O(buckets²) ≤ 66k intermediate
    rows at the 256-bucket cap — model-sized. Lazy (no collect, no
    extra action) and broadcast-hinted; buckets with no predecessor
    (the minimum present id) emit NO row, so consumers LEFT-join and
    coalesce to typed zero."""
    tot = with_pid.groupBy("__pid").agg(*aggs)
    names = [c for c in tot.columns if c != "__pid"]
    dtypes = dict(tot.dtypes)
    later = F.when(
        F.col("__pid") < max_pid,
        F.sequence(F.col("__pid") + 1, F.lit(max_pid)),
    ).otherwise(F.array().cast("array<int>"))
    contrib = tot.select(F.explode(later).alias("__pid"), *names)
    return F.broadcast(
        contrib.groupBy("__pid").agg(
            *[F.sum(c).cast(dtypes[c]).alias(c) for c in names]
        )
    )


#: above this many partitions, pid→offset switches from a literal
#: create_map (serialized-plan size and expression depth grow O(n)) to
#: a broadcast hash join against a tiny (pid, offset) frame
_MAX_LITERAL_OFFSETS = 4096


def _attach_offset(with_pid: DataFrame, offsets: dict) -> DataFrame:
    """Attach ``__off`` = cumulative offset of each row's ``__pid``.

    Literal ``create_map`` for ≤ _MAX_LITERAL_OFFSETS partitions (no
    exchange, folds into codegen); beyond that — 10⁵ partitions is
    realistic at 100 TB — the literal would bloat the plan, so the
    lookup becomes a broadcast join on the (tiny, exactly
    num_partitions rows) offsets frame instead."""
    items = sorted(offsets.items())
    if len(items) <= _MAX_LITERAL_OFFSETS:
        offset_map = F.create_map(
            *[
                c
                for p, v in items
                for c in (F.lit(p), F.lit(v).cast("bigint"))
            ]
        )
        return with_pid.withColumn("__off", offset_map[F.col("__pid")])
    spark = with_pid.sparkSession
    lookup = spark.createDataFrame(
        [(int(p), int(v)) for p, v in items], "__pid int, __off bigint"
    )
    return with_pid.join(F.broadcast(lookup), on="__pid", how="left")


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    sum_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
    boundaries: list[float] | None = None,
) -> DataFrame:
    """Inclusive global running sum of ``sum_col`` over the total order
    ``order_cols`` — without the single-task global Window.

    Same two-pass construction as :func:`stable_global_index`: range
    partition on the order, per-partition SUM (tiny aggregate), driver
    prefix-sum of partition subtotals, then each partition computes
    offset + within-partition cumulative sum — every heavy step fully
    parallel. Equal to ``SUM() OVER (ORDER BY ...)`` row-for-row when
    the order is total (unique tiebreak).

    The primitive behind token-budget batch packing (sequence packing
    for pretraining): batch_id = (running_sum - x) DIV budget.
    """
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(sum_col).cast("double")).over(w)
    bucketed = _bucketed(df, order_cols, n, boundaries)
    if bucketed is not None:
        with_pid, max_pid = bucketed
        off = _bucket_offsets(
            with_pid,
            [F.sum(F.col(sum_col).cast("double")).alias("__off")],
            max_pid,
        )
        return (
            with_pid.join(off, "__pid", "left")
            .withColumn(out_col, F.coalesce(F.col("__off"), F.lit(0.0)) + cum)
            .drop("__pid", "__off")
        )
    with_pid = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()  # counts and cumsum must see ONE assignment
    )
    subtotals = {
        r["__pid"]: r["s"]
        for r in with_pid.groupBy("__pid")
        .agg(F.sum(F.col(sum_col).cast("double")).alias("s"))
        .collect()
    }
    offsets: dict[int, int] = {}
    running = 0
    for pid in sorted(subtotals):
        offsets[pid] = running
        running += subtotals[pid] or 0
    return (
        _attach_offset(with_pid, offsets)
        .withColumn(out_col, F.col("__off") + cum)
        .drop("__pid", "__off")
    )


def global_running_sums(
    df: DataFrame,
    order_cols: list,
    sum_cols: list[str],
    out_cols: list[str] | None = None,
    num_partitions: int | None = None,
    boundaries: list[float] | None = None,
) -> DataFrame:
    """Inclusive global running sums of SEVERAL measures over one total
    order — the multi-measure sibling of :func:`global_running_sum`,
    for ECDF-style queries that need parallel prefix sums of two or
    more counters (e.g. the two-sample KS statistic's per-group
    cumulative counts).

    One range partition + one checkpoint + one partitioned window no
    matter how many measures. Unlike :func:`global_running_sum`, sums
    run in each column's OWN type (no double cast): integral counters
    accumulate exactly as BIGINT, which is what makes cumulative
    counts hash-comparable against a SQL oracle.
    """
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    out_cols = out_cols or [f"{c}_run" for c in sum_cols]
    if len(out_cols) != len(sum_cols):
        raise ValueError("out_cols must match sum_cols")
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bucketed = _bucketed(df, order_cols, n, boundaries)
    if bucketed is not None:
        with_pid, max_pid = bucketed
        off = _bucket_offsets(
            with_pid,
            [F.sum(F.col(c)).alias(f"__off_{c}") for c in sum_cols],
            max_pid,
        )
        res = with_pid.join(off, "__pid", "left")
        for c, oc in zip(sum_cols, out_cols):
            res = res.withColumn(
                oc,
                F.coalesce(F.col(f"__off_{c}"), F.lit(0))
                + F.sum(F.col(c)).over(w),
            )
        return res.drop("__pid", *[f"__off_{c}" for c in sum_cols])
    with_pid = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()  # subtotals/cumsum must see ONE assignment
    )
    rows = (
        with_pid.groupBy("__pid")
        .agg(*[F.sum(F.col(c)).alias(c) for c in sum_cols])
        .collect()
    )
    subtot = {r["__pid"]: [r[c] for c in sum_cols] for r in rows}
    offsets: dict[int, list] = {}
    running = [0] * len(sum_cols)
    for pid in sorted(subtot):
        offsets[pid] = list(running)
        for i, v in enumerate(subtot[pid]):
            running[i] += v or 0
    res = with_pid
    for i, (c, oc) in enumerate(zip(sum_cols, out_cols)):
        off_map = F.create_map(
            *[
                x
                for pid, vs in sorted(offsets.items())
                for x in (F.lit(pid), F.lit(vs[i]))
            ]
        )
        res = res.withColumn(
            oc, off_map[F.col("__pid")] + F.sum(F.col(c)).over(w)
        )
    return res.drop("__pid")


def global_frac_rank(
    df: DataFrame,
    value_col: str,
    out_col: str = "frac_rank",
    num_partitions: int | None = None,
    boundaries: list[float] | None = None,
) -> DataFrame:
    """Average (fractional) rank of each row's ``value_col`` over the
    whole frame — ``lo + (cnt + 1) / 2`` where ``lo`` = rows strictly
    below and ``cnt`` = rows tied — the tie-aware rank Spearman/ECDF
    statistics need, WITHOUT the single-task global window and WITHOUT
    the value-grain groupBy + join-back the rank-map composition
    spends. NULL values rank first (below every non-null), matching
    ascending NULLS FIRST.

    One exchange on the literal-boundary bucket (a pure function of
    the row's own value — every tie lands in one bucket, so in-bucket
    ``rank() - 1`` is the within-bucket strict-below count and a
    (bucket, value)-partitioned ``count`` is the global tie count),
    plus the explode-based prefix offsets broadcast back. Critical
    path: tag → one shuffle → two windows sharing that partitioning.

    Requires a numeric/date/timestamp/string ``value_col`` (the
    literal-boundary eligibility rule); composes with caller-batched
    ``boundaries`` like the other operators here.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    bucketed = _bucketed(df, [value_col], n, boundaries)
    if bucketed is None:
        raise ValueError(
            f"global_frac_rank needs a numeric/date/timestamp/string "
            f"column, got {dict(df.dtypes).get(value_col)!r} for "
            f"{value_col!r}"
        )
    with_pid, max_pid = bucketed
    off = _bucket_offsets(
        with_pid, [F.count(F.lit(1)).cast("bigint").alias("__off")], max_pid
    )
    w_rank = Window.partitionBy("__pid").orderBy(value_col)
    w_tie = Window.partitionBy("__pid", value_col)
    return (
        with_pid.join(off, "__pid", "left")
        .withColumn(
            out_col,
            F.coalesce(F.col("__off"), F.lit(0).cast("bigint"))
            + (F.rank().over(w_rank).cast("bigint") - F.lit(1))
            + (F.count(F.lit(1)).over(w_tie).cast("double") + 1.0) / 2.0,
        )
        .drop("__pid", "__off")
    )


def _ntile_bucket_expr(rank_col: str, total: int, n_buckets: int) -> str:
    """ntile's documented bucket arithmetic as a SQL expression over a
    1-based global rank column: the first ``total % n`` buckets take
    ``ceil(total/n)`` rows, the rest ``floor(total/n)`` — exact integer
    math (``div``), equal to ``ntile(n)`` under the same total order."""
    q, r = divmod(total, n_buckets)
    big = r * (q + 1)  # rows covered by the ceil-sized leading buckets
    return (
        f"CASE WHEN {rank_col} <= {big}"
        f" THEN ({rank_col} - 1) div {max(q + 1, 1)}"
        f" ELSE {r} + ({rank_col} - {big} - 1) div {max(q, 1)} END + 1"
    )


def exact_ntile_bounded(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list,
    n_buckets: int,
    out_col: str = "bucket",
    total: int | None = None,
    descending: bool = False,
) -> DataFrame:
    """``ntile(n)`` over the total order (``value_col``, tiebreaks)
    when ``value_col`` has BOUNDED cardinality (calendar days,
    small-count integers, enum codes) — the cheap sibling of
    :func:`exact_ntile`.

    Global rank = cumulative count of strictly-preceding value groups
    (one cumulative window over the value-grain frame — bounded by
    assumption, so the single-partition sort is O(distinct values),
    not O(rows)) + ``row_number`` within the value group (a window
    PARTITIONED by value — fully parallel). One broadcast join, one
    partitioned window, no checkpoint and no per-partition counts
    pass. Caller asserts the bound; for unbounded (continuous) value
    columns use :func:`exact_ntile`.
    """
    if total is None:
        total = df.count()
    order = F.col(value_col).desc() if descending else F.col(value_col).asc()
    grp = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("__cnt"))
    wv = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    off = grp.select(
        value_col,
        F.coalesce(F.sum("__cnt").over(wv), F.lit(0))
        .cast("bigint")
        .alias("__off"),
    )
    wr = Window.partitionBy(value_col).orderBy(*tiebreak_cols)
    return (
        df.join(F.broadcast(off), value_col)
        .withColumn(
            "__rn", F.col("__off") + F.row_number().over(wr).cast("bigint")
        )
        .withColumn(
            out_col,
            F.expr(_ntile_bucket_expr("__rn", total, n_buckets)).cast(
                "bigint"
            ),
        )
        .drop("__off", "__rn")
    )


def exact_ntile(
    df: DataFrame,
    order_cols: list,
    n_buckets: int,
    out_col: str = "bucket",
    total: int | None = None,
    num_partitions: int | None = None,
    boundaries: list[float] | None = None,
) -> DataFrame:
    """``ntile(n_buckets)`` over a TOTAL order (unique tiebreak
    required) without the single-partition global window.

    Two passes: :func:`stable_global_index` supplies the global rank,
    then ntile's documented bucket arithmetic maps rank → bucket — the
    first ``total % n`` buckets take ``ceil(total/n)`` rows, the rest
    ``floor(total/n)`` — in exact integer math (``div``), so the
    result equals ``F.ntile(n).over(Window.orderBy(...))`` row-for-row.

    ``total`` (the row count) costs one driver scalar when not
    supplied; pass it when the caller already knows it or computes
    several ntiles over the same frame (count once, share it).
    ``order_cols`` accepts Column expressions, so descending ntiles
    (``F.col("x").desc()``) work as in a window spec.
    """
    if total is None:
        total = df.count()
    idx = stable_global_index(
        df,
        order_cols,
        out_col="__rn",
        num_partitions=num_partitions,
        boundaries=boundaries,
    )
    return idx.withColumn(
        out_col,
        F.expr(_ntile_bucket_expr("__rn", total, n_buckets)).cast("bigint"),
    ).drop("__rn")
