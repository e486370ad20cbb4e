"""PII redaction for training-data pipelines: regex-based email/phone/
IP scrubbing, JVM-side (`regexp_replace` chains — no UDF), with
per-document redaction counts for audit.

The pattern set is intentionally conservative/simple (same dialect in
Spark's Java regex and DuckDB's RE2 so the oracle can replay it); a
production pipeline layers NER-based PII behind the same interface via
a pandas UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: pattern → replacement token (order matters: emails before bare hosts)
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"\d{3}[-.]\d{3}[-.]\d{4}", "<PHONE>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact_pii(col: Column | str) -> Column:
    """Text with all PII patterns replaced by type tokens."""
    out = F.col(col) if isinstance(col, str) else col
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-pattern match counts (for audit/metrics), computed on the
    PROGRESSIVELY-redacted text exactly as :func:`redact_pii` applies
    the patterns — pattern i counts what replacement i actually
    replaces, so a phone number inside an already-redacted email is not
    double-counted and the audit sums reconcile with the redacted
    output. Patterns go in as ``lit`` columns — embedding them in an
    ``expr`` SQL string would re-interpret the regex backslashes."""
    cur = F.col(col) if isinstance(col, str) else col
    out: dict[str, Column] = {}
    for pattern, token in PII_PATTERNS:
        out[token.strip("<>").lower()] = F.size(
            F.regexp_extract_all(cur, F.lit(pattern), F.lit(0))
        ).cast("bigint")
        cur = F.regexp_replace(cur, pattern, token)
    return out


def redact_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """id, redacted text, and per-type counts in one projection."""
    counts = pii_counts(text_col)
    return df.select(
        id_col,
        redact_pii(text_col).alias("redacted_text"),
        *[v.alias(f"n_{k}") for k, v in counts.items()],
    )
