"""Structured Streaming twins of the batch event-lifecycle operators
(SURVEY §2.9: the reference is pure batch, but its data shape — a
timestamped event log sessionized per entity — is exactly what
``session_window`` + watermarks model).

These run with ``Trigger.AvailableNow`` over a parquet directory in
tests; in production the same code points at Kafka/files and runs
continuously. Watermarks bound state: late events beyond the watermark
are dropped rather than growing state forever — the property that makes
the operator viable on an unbounded 100-TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.session import pin_session


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Stream the driver's events table (parquet directory source).

    Schema is taken from a batch peek (streaming sources require an
    explicit schema); the int64-nanos ``ts`` is converted exactly like
    the batch reader (plans/catalog.table).
    """
    pin_session(spark)
    path = f"{sf_dir}/events.parquet"
    # the streaming file source requires a DIRECTORY; the driver ships
    # one parquet file per table, so stage a symlink dir (no data copy)
    import hashlib
    import os
    import tempfile

    if os.path.isfile(path):
        # stable name (NOT hash(): python salts str hashes per process,
        # which would leak a fresh staging dir every run)
        digest = hashlib.sha256(sf_dir.encode()).hexdigest()[:16]
        staged = os.path.join(tempfile.gettempdir(), f"events_stream_{digest}")
        os.makedirs(staged, exist_ok=True)
        link = os.path.join(staged, "part-0.parquet")
        if not os.path.exists(link):
            os.symlink(path, link)
        path = staged
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dtype == "timestamp_ntz":
        # parquet timestamp[us] without timezone reads as TIMESTAMP_NTZ in
        # Spark 4, but withWatermark requires TIMESTAMP
        # ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]). Session TZ is pinned UTC
        # (session.pin_session), so the cast is deterministic and the wall
        # values match the batch reader's NTZ values exactly.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def streaming_session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user gap-based sessions via ``session_window`` — the
    streaming equivalent of operators/sessionize.session_stats. State
    per (user, open session); closed by watermark passage."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_lifecycle_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed conditional counts of lifecycle stages — the streaming
    form of the flagship KPI's label+aggregate chain (tumbling window
    instead of all-time, since global aggregates don't stream)."""
    labeled = events.filter(
        F.col("event_type").isin("signup", "view", "purchase")
    )
    return (
        labeled.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window))
        .agg(
            F.sum((F.col("event_type") == "signup").cast("long")).alias("signups"),
            F.sum((F.col("event_type") == "view").cast("long")).alias("views"),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias("purchases"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "signups",
            "views",
            "purchases",
            "approx_users",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exactly-once-per-id dedup keyed on event_id ALONE
    (``dropDuplicatesWithinWatermark``): a retried event that was
    re-stamped with a slightly different timestamp still dedups, and
    the watermark bounds state (ids older than the window are evicted
    rather than kept forever). The streaming twin of the batch
    exact-dedup operators."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def streaming_content_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming CONTENT dedup: exactly-one-per-normalized-text within
    the watermark window — the streaming twin of the batch
    operators.dedup.dedup_exact, keyed on the sha2 of normalized text
    instead of the event id, so re-scraped/re-ingested copies of the
    same document collapse even though every copy carries a fresh id.

    State is one (hash, ts) entry per distinct document seen inside
    the watermark horizon; older hashes are evicted, which is the
    deliberate trade a streaming dedup makes — duplicates arriving
    farther apart than the watermark pass through, and the BATCH
    exact-dedup pass downstream is what catches those (the standard
    lambda pairing: bounded-state stream filter + exact batch sweep)."""
    from parcel_analytics_etl_notebook_spark.functions.textfns import (
        normalize_text,
    )

    return (
        docs.withColumn("__content_hash", F.sha2(normalize_text(text_col), 256))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__content_hash"])
        .drop("__content_hash")
    )


def write_stream_foreach_batch(stream: DataFrame, path: str, checkpoint: str):
    """foreachBatch parquet sink: each micro-batch lands via the BATCH
    writer (idempotent by batch id on replay) — the standard bridge for
    sinks without native streaming support (JDBC, MERGE targets...)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("__batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(path)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
