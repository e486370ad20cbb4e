"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``parcel_analytics_etl_notebook_spark`` — the
catalog (``plans/catalog.py``) registers every query with its oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parcel_analytics_etl_notebook_spark.plans import catalog as _catalog

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.queries()["lifecycle_kpis"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each (SQL-expressible) query."""
    return _catalog.oracle_sql()


def scale_guards() -> dict[str, dict]:
    """OPTIONAL extension (ADVICE r09 #4): per-query candidate-budget
    contract for the few queries whose Spark plan FAILS FAST (raising
    ``CandidateBudgetExceeded``) on corpora larger than their verified
    scale window, while their DuckDB oracle would still answer. A
    harness running above a query's ``max_verified_sf`` should record
    that exception as a skip (and run the named ``scale_path`` query
    instead), never score it as an engine-vs-oracle mismatch. At every
    sf ≤ ``max_verified_sf`` the guard never trips and engine == oracle
    byte-identically."""
    return _catalog.scale_guards()
