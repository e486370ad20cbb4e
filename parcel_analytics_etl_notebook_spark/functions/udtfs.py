"""Python UDTF surface (Spark 4): table-valued functions for row→rows
expansion where each input row yields a variable number of typed output
rows. The reference has no UDFs of any kind (SURVEY §2.10); this is the
engine's demonstration of the UDTF + LATERAL join surface.

UDTFs are the Python slow path: one process round-trip per partition,
rows through Arrow (``useArrow=True``). Anything expressible with
``split``/``posexplode`` should use those instead — the docstring of
:func:`register_split_sentences` shows the equivalence. Keep UDTFs for
logic that genuinely needs imperative per-row expansion (parsers,
tokenizers with state, external-library decoders).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

_SENT_RE = re.compile(r"\.\s+")


@udtf(returnType="sentence_idx: bigint, sentence: string, n_tokens: bigint", useArrow=True)
class SplitSentences:
    """text → one row per sentence (split on '.'+whitespace), with a
    1-based index over non-empty sentences and a whitespace token count.
    Deterministic, so LATERAL results are oracle-checkable."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        idx = 0
        for raw in _SENT_RE.split(text):
            s = raw.strip()
            if s:
                idx += 1
                yield idx, s, len(s.split())


def register_split_sentences(spark: SparkSession, name: str = "split_sentences") -> None:
    """Register the UDTF for SQL LATERAL use:

    ``SELECT d.doc_id, s.* FROM docs d, LATERAL split_sentences(d.text) s``

    Built-in equivalent (the JVM fast path for this particular logic)::

        posexplode(filter(transform(split(text, '\\\\.\\\\s+'), x -> trim(x)),
                          x -> x != ''))
    """
    spark.udtf.register(name, SplitSentences)
