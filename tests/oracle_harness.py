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


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values to comparable primitives
    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return round(v, 9)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(canon(x) for x in v)
        return v

    out = df.map(canon)
    if pd.isna(out).all(axis=None) and len(out.columns) == 0:
        return out
    return out.sort_values(by=list(out.columns), key=lambda s: s.map(repr)).reset_index(
        drop=True
    )


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
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    for col in s.columns:
        sv, ov = list(s[col]), list(o[col])
        for i, (a, b) in enumerate(zip(sv, ov)):
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
