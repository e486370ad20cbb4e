"""Streaming join operators (SURVEY §2.9 extension): the two join
shapes Structured Streaming supports beyond plain stateless maps.

- stream ⋈ static: per-micro-batch hash join against a (broadcastable)
  dimension — no state, no watermark needed; the streaming twin of the
  batch star-schema enrichment joins (reference J5/J7).
- stream ⋈ stream: both sides buffered in watermark-bounded state; the
  join condition MUST constrain event time on both sides or state grows
  forever. Shown as the view→purchase interval join (the streaming twin
  of the batch as-of join, operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    events: DataFrame, dim: DataFrame, broadcast: bool = False
) -> DataFrame:
    """Enrich a stream with a static dimension (left join on user_id).

    The static side is re-scanned per micro-batch (picking up file
    appends), never stateful. By default Catalyst/AQE picks the join
    strategy — it broadcasts small dims on its own; pass
    ``broadcast=True`` only when you KNOW the dim fits executor memory
    (a forced hint on a multi-GB dim fails every micro-batch, which is
    why forcing is not the default)."""
    d = F.broadcast(dim) if broadcast else dim
    return events.join(d, on="user_id", how="left")


def _purchase_view_interval_join(
    events: DataFrame, max_gap: str, watermark: str, how: str
) -> DataFrame:
    """Shared builder for the purchase⋈view interval joins — ONE copy
    of the projections, watermarks, and time-bounded condition, so the
    inner and left-outer forms cannot drift."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_event_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}")
        )
    )
    return purchases.join(views, cond, how).select(
        "user_id",
        "purchase_event_id",
        "purchase_ts",
        "view_event_id",
        "view_ts",
    )


def stream_stream_purchase_after_view(
    events: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase paired with every view
    by the same user within ``max_gap`` BEFORE it.

    Both sides carry watermarks and the join condition bounds view time
    relative to purchase time, so Spark can evict buffered rows once
    the watermark passes — the state-boundedness condition for
    stream-stream joins on unbounded input."""
    return _purchase_view_interval_join(events, max_gap, watermark, "inner")


def stream_stream_purchase_with_optional_view(
    events: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase emits —
    paired with its preceding views when any exist, with NULL view
    columns otherwise.

    Outer streaming joins have a subtlety inner ones don't: the
    unmatched row can only emit once the watermark proves no match can
    still arrive, so NULL-padded results trail the inner results by up
    to the watermark delay. State stays bounded exactly as in the inner
    form (both sides watermarked + time-bounded condition)."""
    return _purchase_view_interval_join(
        events, max_gap, watermark, "left_outer"
    )
