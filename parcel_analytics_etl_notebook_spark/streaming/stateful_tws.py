"""Arbitrary stateful streaming via ``transformWithStateInPandas`` —
Spark 4's successor to ``applyInPandasWithState`` (see stateful.py for
the classic-API funnel). The new API gives named, typed state variables
(value/list/map) managed by the RocksDB state store, per-key timers,
and schema evolution of state — the production substrate for the
incrementally-maintained per-entity aggregates a 100 TB event pipeline
needs (the reference recomputes its per-shipment lifecycle pivot from
scratch each run; this maintains the running answer with O(1) state
per key).

Operator here: a running per-user spend tracker. State is one
(n_events, total_value) tuple per user; each micro-batch folds its
rows into the state and emits the updated running totals for exactly
the users it touched — a changelog of the aggregate, not a recompute.

Scale: state lives in RocksDB on each executor (spill-to-disk, not
heap-bound), keyed by the shuffle partitioning on user_id; emitted
rows are O(touched keys per batch). Requires
``spark.sql.streaming.stateStore.providerClass`` =
``RocksDBStateStoreProvider`` (set by :func:`rocksdb_state_conf`) and
the ``protobuf`` Python package at runtime (the per-executor state
server protocol); environments without it should use the
``applyInPandasWithState`` twin in stateful.py, which has identical
semantics for this operator and no extra dependencies.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_VENDOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "vendor",
)


def ensure_protobuf_runtime() -> bool:
    """Make ``google.protobuf`` importable in the driver AND future
    Python workers; return True when the transformWithState protocol can
    run.

    With a pip-installed ``protobuf`` this is a no-op. Otherwise it
    applies ``vendor/sitecustomize.py``'s shim (pure-Python runtime from
    the local Google Cloud SDK, version gate relaxed) to this process
    and prepends ``vendor/`` to ``PYTHONPATH`` so worker interpreters
    self-apply it via ``site`` at startup. Must be called BEFORE the
    SparkSession / JVM launches for workers to inherit the env.
    """
    if _VENDOR_DIR not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _VENDOR_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")
        ).rstrip(os.pathsep)
    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        sys.path.insert(0, _VENDOR_DIR)
        import importlib

        try:
            importlib.import_module("sitecustomize")
            import google.protobuf.descriptor  # noqa: F401
        except ImportError:
            return False
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401
    except Exception:
        return False
    return True


def rocksdb_state_conf(spark: SparkSession) -> None:
    """transformWithState requires the RocksDB state store provider."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


class RunningTotalsProcessor(StatefulProcessor):
    """Fold each user's micro-batch rows into running (count, sum)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        n = 0
        total = 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        if self._totals.exists():
            prev_n, prev_total = self._totals.get()
            n += prev_n
            total += prev_total
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Changelog stream of per-user running (n_events, total_value).

    Each emitted row is the post-batch running total for a user the
    batch touched; downstream consumers upsert by user_id (SCD1 shape,
    plans/star.scd1_upsert) or just keep the latest row per key.
    """
    return events_stream.select("user_id", "value").groupBy(
        "user_id"
    ).transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )
