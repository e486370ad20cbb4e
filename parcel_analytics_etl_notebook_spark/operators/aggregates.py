"""Aggregation operators (SURVEY §2.4).

``conditional_min_pivot`` is the analytical heart of the reference's KPI
query (``notebooks/report.ipynb`` cell 8:11-15): long→wide event-time
pivot via ``min(when(...))`` — one hash aggregate, map-side partials,
single shuffle on the group key. ``dq_summary`` replaces the
reference's 4-actions-per-checkpoint DQ loop
(``/root/reference/etl/main.py:21-65``) with ONE aggregate pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conditional_min_pivot(
    df: DataFrame,
    group_key: str,
    label_col: Column | str,
    value_col: Column | str,
    labels: dict[str, str],
) -> DataFrame:
    """``groupBy(key).agg(min(when(label==L, value)) for each L)``.

    ``labels`` maps label value → output column name. Equivalent to
    ``groupBy().pivot().min()`` but with a static column list, so the
    plan needs no distinct-values pre-pass (pivot() without values runs
    an extra job to discover them — never do that at 100 TB).
    """
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    aggs = [
        F.min(F.when(lab == lv, val)).alias(out) for lv, out in labels.items()
    ]
    return df.groupBy(group_key).agg(*aggs)


def dq_summary(df: DataFrame, null_check_cols: list[str] | None = None) -> DataFrame:
    """Single-pass data-quality summary: row count + per-column null
    counts, one row out. The reference issued 1 + N separate ``count()``
    actions re-executing the full lineage each time; this is one job.

    Default checks ALL columns — a DQ gate that silently skipped
    columns 4+ wouldn't gate. Reference-parity callers pass
    ``df.columns[:3]`` explicitly (``etl/main.py:45`` checks exactly
    the first three).
    """
    return df.agg(*_dq_metrics(df, null_check_cols))


def _dq_metrics(df: DataFrame, null_check_cols: list[str] | None) -> list[Column]:
    cols = null_check_cols if null_check_cols is not None else df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("row_count")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"nulls_{c}")
        )
    return aggs


def dq_observation(df: DataFrame, null_check_cols: list[str] | None = None):
    """ZERO-extra-pass DQ: attach the :func:`dq_summary` metrics to the
    DataFrame via ``observe()`` so they are computed as a side effect of
    whatever action consumes it (typically the parquet write) — no
    second pass over the data at all. ``dq_summary`` costs one extra
    aggregate job per checkpoint; at 100 TB even that pass is worth
    eliminating, and ``observe`` metrics are accumulator-based, adding
    nothing to the shuffle.

    Returns ``(observed_df, observation)``; run exactly one action on
    ``observed_df``, then read ``observation.get`` (blocks until the
    action finishes).
    """
    from pyspark.sql import Observation

    obs = Observation()
    return df.observe(obs, *_dq_metrics(df, null_check_cols)), obs


def rolling_distinct_actives(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    window_days: int = 7,
    out_day: str = "day",
    out_count: str = "active",
) -> DataFrame:
    """Trailing-``window_days`` distinct-``id_col`` count per observed
    day (the WAU/MAU curve family).

    Sliding DISTINCT is not frame-decomposable, so no window frame can
    compute it; the scale-safe rewrite: collapse to distinct (day, id)
    pairs once (day-grain, vastly smaller than the event log), let each
    pair vote for the ≤``window_days`` OBSERVED days it keeps the id
    active in (bounded explode), and distinct-count per day. Only days
    that actually appear in the data are emitted — the day grid is
    calendar-bounded, hence broadcast. Property-tested against a
    brute-force per-day Python model (tests/test_properties.py); the
    oracled catalog twin is plans/queries_relational9.
    rolling_7d_active_users."""
    from pyspark.sql import functions as F  # local alias for clarity

    du = df.select(F.to_date(ts_col).alias("__d"), id_col).distinct()
    days = du.select("__d").distinct()
    votes = du.select(
        F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("__i"),
        "__d",
        id_col,
    ).select(F.date_add(F.col("__d"), F.col("__i")).alias("__day_out"), id_col)
    return (
        votes.join(F.broadcast(days), votes.__day_out == days.__d)
        .groupBy("__day_out")
        .agg(F.countDistinct(id_col).cast("bigint").alias(out_count))
        .select(F.col("__day_out").alias(out_day), out_count)
    )
