"""Text scalar helpers (LLM-pipeline extension; SURVEY §7.6).

All built-in-function compositions — JVM-side, codegen-friendly. No
Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """Lowercase, collapse whitespace runs, trim — the canonical form
    used by exact-dup hashing so trivially-different bytes dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string>.

    NULL and blank text both yield ``[]`` — bare ``split(trim(''),
    '\\s+')`` would yield ``[""]`` (a phantom empty token) and
    ``split(NULL)`` would yield NULL (whose ``size()`` is -1 under
    non-ANSI defaults), so every downstream token count/ratio guards
    here once instead of each caller special-casing."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNull() | (F.length(F.trim(c)) == 0),
        F.array().cast("array<string>"),
    ).otherwise(F.split(F.trim(c), r"\s+"))


def token_count(col: Column | str) -> Column:
    """Token count; 0 for NULL/blank text."""
    return F.size(tokens(col))
