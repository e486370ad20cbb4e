"""Deterministic surrogate keys.

The reference keys every dim/fact row with ``expr("uuid()")``
(``/root/reference/etl/main.py:172,189,198,211,256``), which is
nondeterministic AND re-evaluated per action — with no caching this
published a warehouse with broken fact→dim referential integrity
(SURVEY §4.3). The engine replaces it with a pure function of the
natural key: idempotent across actions, identical across reruns, and
reproducible in ANSI SQL (DuckDB ``sha256``) for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Unit-separator: a character that cannot appear in key components, so
#: ("ab","c") and ("a","bc") never collide.
KEY_SEP = "\x1f"

#: Sentinel for NULL key parts — concat_ws *skips* nulls, which would
#: make ("a", NULL, "b") collide with ("a", "b", NULL).
NULL_TOKEN = "\x01null"


def surrogate_key(*cols: Column | str) -> Column:
    """sha2-256 hex of the null-safe, separator-joined natural key.

    ANSI-SQL twin (DuckDB):
    ``sha256(concat_ws(chr(31), coalesce(c1::VARCHAR, '<tok>'), ...))``
    """
    parts = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"),
                   F.lit(NULL_TOKEN))
        for c in cols
    ]
    return F.sha2(F.concat_ws(KEY_SEP, *parts), 256)


def surrogate_key_sql(*cols: str) -> str:
    """The DuckDB-flavored SQL twin of :func:`surrogate_key`, used by
    the query catalog's oracle strings."""
    parts = ", ".join(f"coalesce(CAST({c} AS VARCHAR), chr(1) || 'null')" for c in cols)
    return f"sha256(concat_ws(chr(31), {parts}))"
