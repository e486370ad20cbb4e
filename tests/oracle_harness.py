"""Local stand-in for the driver's DuckDB-oracle correctness check.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and values
(order-insensitive, float-tolerant so we can detect *near* misses that
would still flip an exact hash).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    """Canonicalize one cell to a hashable, engine-neutral value.

    Floats are kept at FULL precision: the external harness hashes
    ``repr`` of the raw values, so a sub-1e-9 divergence that a
    pre-rounded comparison would absorb still flips its hash — the
    near-miss branch in :func:`compare` reports exactly that case
    instead of hiding it."""
    if v is None:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else v
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon(x) for x in v)
    try:
        if pd.isna(v):  # NaT and pandas NA scalars
            return None
    except (TypeError, ValueError):
        pass
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (int,)) or type(v).__name__.startswith(("int", "uint")):
        return int(v)
    return v


def _rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon(v) for v in t)
        for t in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


@dataclass
class CompareResult:
    name: str
    ok: bool
    problems: list[str] = field(default_factory=list)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return CompareResult(name, False, problems)
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return CompareResult(name, False, problems)
    cols = sorted(spark_pdf.columns)
    for i, (a_row, b_row) in enumerate(zip(_rows(spark_pdf), _rows(oracle_pdf))):
        for col, a, b in zip(cols, a_row, b_row):
            if a == b:
                continue
            if (
                isinstance(a, float)
                and isinstance(b, float)
                and math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
            ):
                problems.append(
                    f"col {col} row {i}: float near-miss {a!r} vs {b!r} (would break exact hash)"
                )
                continue
            problems.append(f"col {col} row {i}: {a!r} != {b!r}")
            if len(problems) > 8:
                return CompareResult(name, False, problems)
    return CompareResult(name, not problems, problems)
