"""SparkSession factory.

The reference creates bare sessions with zero config
(``/root/reference/etl/main.py:16-18``, ``notebooks/report.ipynb`` cell 1)
and relies on Spark defaults. For a 100-TB target we pin the handful of
settings that matter for determinism and scale and let Catalyst/AQE do
the rest:

- UTC session timezone: makes ``to_date``/``datediff`` on timestamps
  deterministic and DuckDB-oracle-reproducible.
- AQE on (coalesce partitions + skew-join): runtime re-planning replaces
  hand-tuned shuffle-partition counts at any scale factor.
- Arrow on: fast ``toPandas`` / pandas-UDF exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for local[] testing; on a real cluster the same knobs
# are what you'd set, just with cluster-sized values via spark-submit.
_BASE_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # preferSortMergeJoin stays at its DEFAULT (true): an r12
    # interleaved A/B (same session, alternating the runtime conf per
    # run — see OPTIMIZATION_r12.md §7) measured shuffled-hash join a
    # wash-to-slower on this catalog (market_basket_lift min 2.40 vs
    # 2.13s, star_fact_orders 0.76 vs 0.68s); an earlier two-session
    # A/B that "showed" SHJ 1.7× faster was a session-ordering artifact
    # (the second JVM is warmer). Kept as a documented negative result.
    # parquet nested-schema pruning (on by default; pinned for clarity)
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # let pushFilters() on Python data sources receive predicates
    # (off by default in 4.1; sources/pydatasource.py implements it)
    "spark.sql.python.filterPushdown.enabled": "true",
    # the driver's events.parquet uses TIMESTAMP(NANOS) which the vectorized
    # reader rejects; read as int64 nanos and convert explicitly (see
    # plans/catalog.table) — micro-truncation matches DuckDB TIMESTAMP (µs).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(
    app_name: str = "parcel-analytics-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's pinned config."""
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        # SPARK_MASTER's VALUE is applied (not just used as a
        # skip-local sentinel — it was silently dropped before, so
        # `SPARK_MASTER=spark://host:7077 python ...` raised
        # "A master URL must be set" instead of connecting)
        master = os.environ.get("SPARK_MASTER") or (
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
        )
    builder = builder.master(master)
    conf = dict(_BASE_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def pin_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable config to an existing session.

    The driver hands us its own SparkSession; timezone/AQE are runtime
    SQL configs, so pin them here for deterministic date semantics.
    """
    for k, v in _BASE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # static config on a live session — ignore
            pass
    return spark
