"""Star-schema ETL recipes — parity with the reference's warehouse build
(``/root/reference/etl/main.py:163-264``), generalized and fixed:

- deterministic sha2 surrogate keys (not per-action uuid(), §4.3);
- deterministic keyed dedup (row_number, not dropDuplicates([key]));
- caching at fan-out points so dims aren't recomputed per action;
- FK resolution via left joins that preserve the fact (reference J1-J6).

At 100 TB: dims are orders of magnitude smaller than facts — FK
resolution joins broadcast automatically under AQE; the fact never
shuffles for dim joins. ``build_dim`` shuffles once on the natural key.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.keys import surrogate_key
from parcel_analytics_etl_notebook_spark.operators.dedup import dedup_first_row


@dataclass
class DimSpec:
    """One dimension: natural key columns, carried attributes, key name."""

    name: str
    natural_keys: list[str]
    attrs: list[str] = field(default_factory=list)
    key_col: str | None = None  # default: f"{name}_id"

    @property
    def id_col(self) -> str:
        return self.key_col or f"{self.name}_id"


def build_dim(df: DataFrame, spec: DimSpec, tiebreak: list[str] | None = None) -> DataFrame:
    """Distinct rows per natural key + deterministic surrogate key.

    Mirrors the reference dim builds (``etl/main.py:166-211``) with
    first-row-wins replaced by an explicit ``row_number`` tiebreak
    (defaults to the attribute columns so the choice is deterministic).
    """
    cols = spec.natural_keys + spec.attrs
    projected = df.select(*cols).filter(
        F.lit(True) if not spec.natural_keys
        else _all_not_null(spec.natural_keys)
    )
    if spec.attrs:
        order = [F.col(c) for c in (tiebreak or spec.attrs)]
        deduped = dedup_first_row(projected, keys=spec.natural_keys, order_by=order)
    else:
        deduped = projected.dropDuplicates()
    return deduped.withColumn(spec.id_col, surrogate_key(*spec.natural_keys))


def _all_not_null(cols: list[str]) -> Column:
    cond = F.col(cols[0]).isNotNull()
    for c in cols[1:]:
        cond = cond & F.col(c).isNotNull()
    return cond


def resolve_fk(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    dim_key: str,
    fk_name: str | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """Left-join a dim and attach only its surrogate key to the fact
    (reference DimShipping build, ``etl/main.py:214-245``). The fact
    side is preserved; unmatched rows carry a NULL FK — same semantics
    as the reference's left joins. The dim is projected to key columns
    only and (by default) broadcast-hinted: the fact never shuffles for
    FK resolution.

    ``broadcast=True`` is a PROMISE that the dim fits executor memory —
    true for enumeration dims (date, status, location) at any scale,
    but an ENTITY-grain dim (customer, shipment) grows with the
    business and a forced broadcast of it is a driver/executor OOM at
    extreme SF. For those pass ``broadcast=False``: AQE broadcasts
    anyway when the dim measures small at runtime and degrades to a
    shuffle join when it doesn't (same reasoning as the dedup
    component-map join, queries_llm.near_dup_dedup_summary)."""
    fk = fk_name or dim_key
    dim_proj = dim.select(*on, F.col(dim_key).alias(fk))
    if broadcast:
        dim_proj = F.broadcast(dim_proj)
    return fact.join(dim_proj, on=on, how="left")


def scd1_upsert(current: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Type-1 slowly-changing-dimension merge: update rows replace
    current rows on key match, unmatched current rows survive, new keys
    insert. Shape: one anti-join (current minus touched keys) + union —
    both sides shuffle on the key once; with the dim bucketed on the
    key the anti-join is shuffle-free.

    Batch-engine equivalent of ``MERGE INTO`` (no transactional table
    format in this environment; on Delta/Iceberg use their MERGE)."""
    survivors = current.join(updates.select(*keys), on=keys, how="left_anti")
    return updates.unionByName(survivors)


def build_date_dim(df: DataFrame, date_col: Column | str, out_date: str = "date") -> DataFrame:
    """DimDate (``etl/main.py:201-211``): distinct calendar dates with
    derived attributes + deterministic key."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return (
        df.select(F.to_date(c).alias(out_date))
        .dropDuplicates()
        .select(
            out_date,
            F.year(out_date).cast("bigint").alias("year"),
            F.month(out_date).cast("bigint").alias("month"),
            F.dayofmonth(out_date).cast("bigint").alias("day"),
            F.quarter(out_date).cast("bigint").alias("quarter"),
            F.dayofweek(out_date).cast("bigint").alias("weekday"),
            surrogate_key(out_date).alias("date_id"),
        )
    )
