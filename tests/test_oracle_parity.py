"""Every catalog query must match its DuckDB oracle — the local version
of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_harness import compare, duckdb_con

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert rows[0]["total_users"] > 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    con = duckdb_con(sf_dir)
    oracle_pdf = con.execute(ORACLES[name]).df()
    res = compare(name, spark_pdf, oracle_pdf)
    assert res.ok, "\n".join(res.problems)


ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))

if ROWS_ONLY:  # empty since r03 (every query oracled) — an empty
    # parametrize would register one permanent SKIP, muddying `-rs`

    @pytest.mark.parametrize("name", ROWS_ONLY)
    def test_rows_only_queries_run(spark, sf_dir, name):
        """Non-SQL-expressible queries still must run and return a
        schema."""
        df = QUERIES[name](spark, sf_dir)
        assert df.columns
        df.limit(5).collect()
