"""Custom Python data source (Spark 4 DataSource API): a deterministic
synthetic-corpus generator, registered as ``format("synthcorpus")``.

Why a generator source: scale rehearsal. Driving a 100 TB pipeline
needs inputs bigger than any fixture you want to store; a partitioned
generator source produces them on the fly — every executor synthesizes
its own split in parallel, nothing is read from disk, and the output
is a pure function of (seed, row id) so runs are reproducible and
partition-count-independent.

The reference's only source is a CSV scan
(`/root/reference/etl/main.py:75-80`); this shows the engine's source
surface is extensible from plain Python — no JVM code, no jar — via
the V2 DataSource API (schema declaration, partition planning,
per-partition iterators).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

_WORDS = (
    "parcel shipment delivery route depot scan event manifest carrier "
    "customs transit hub linehaul lastmile pickup return label weight "
    "volume priority express standard economy fragile signature"
).split()

_LANGS = ("en", "fr", "de", "es")
_SOURCES = ("web", "wiki", "news")

_MOD = 1_000_000_007
_MULT = 2_654_435_761


def _row(seed: int, i: int) -> tuple:
    """Deterministic document row for global row id ``i``."""
    h = (seed * 31 + i * _MULT) % _MOD
    n_words = 20 + h % 80
    words = [
        _WORDS[(h + j * 131) % len(_WORDS)] for j in range(n_words)
    ]
    text = " ".join(words)
    return (
        i,
        text,
        _LANGS[h % len(_LANGS)],
        _SOURCES[(h // 7) % len(_SOURCES)],
        len(text),
    )


class _RangePartition(InputPartition):
    def __init__(self, seed: int, start: int, end: int):
        self.seed = seed
        self.start = start
        self.end = end


class SynthCorpusReader(DataSourceReader):
    """Partition-planning reader with real filter pushdown (Spark 4.1
    ``pushFilters``): range predicates on ``doc_id`` clamp the generated
    id range — i.e. PARTITION PRUNING, whole splits never get planned —
    and equality/membership predicates on ``lang``/``source`` are
    applied at generation time so skipped rows are never materialized or
    shipped over Arrow. Both pushed forms are EXACT, so they are
    consumed (not yielded back) and Spark plans no residual filter for
    them — the scan itself is the filter, which is the shape a 100 TB
    source must have (the alternative reads everything and throws most
    of it away on the executor)."""

    #: columns whose EqualTo/In pushdown is exact at generation time
    _CAT_COLS = ("lang", "source")

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("numPartitions", 8))
        if self.rows < 0:
            raise ValueError(f"rows must be >= 0, got {self.rows}")
        if self.num_partitions < 1:
            raise ValueError(
                f"numPartitions must be >= 1, got {self.num_partitions}"
            )
        # pushdown state: [lo, hi) id bounds and per-column allowed sets
        self.lo = 0
        self.hi = self.rows
        self.allowed: dict[str, frozenset] = {}

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume doc_id range bounds and lang/source memberships;
        yield everything else back for Spark to evaluate post-scan."""
        for f in filters:
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if col == "doc_id" and isinstance(
                f,
                (EqualTo, GreaterThan, GreaterThanOrEqual,
                 LessThan, LessThanOrEqual),
            ) and isinstance(f.value, int):
                v = f.value
                if isinstance(f, EqualTo):
                    self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                else:  # LessThanOrEqual
                    self.hi = min(self.hi, v + 1)
            elif col in self._CAT_COLS and isinstance(f, EqualTo) and isinstance(f.value, str):
                prev = self.allowed.get(col)
                new = frozenset({f.value})
                self.allowed[col] = new if prev is None else prev & new
            elif col in self._CAT_COLS and isinstance(f, In) and all(
                isinstance(v, str) for v in f.value
            ):
                prev = self.allowed.get(col)
                new = frozenset(f.value)
                self.allowed[col] = new if prev is None else prev & new
            elif col in ("doc_id", "text", "n_chars", *self._CAT_COLS) and isinstance(f, IsNotNull):
                pass  # generated columns are never NULL: trivially true
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        # contiguous row-id ranges: output is partition-count-invariant
        # because rows depend only on (seed, id), never on the split.
        # Pushed doc_id bounds shrink [lo, hi) BEFORE planning, so out-
        # of-range splits are pruned here, not filtered on executors.
        lo, hi = self.lo, max(self.lo, self.hi)
        if hi == lo:
            return [_RangePartition(self.seed, lo, lo)]
        step = -(-(hi - lo) // self.num_partitions)
        return [
            _RangePartition(self.seed, s, min(s + step, hi))
            for s in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        allowed = self.allowed
        for i in range(partition.start, partition.end):
            row = _row(partition.seed, i)
            if allowed:
                # schema order: doc_id, text, lang, source, n_chars
                if "lang" in allowed and row[2] not in allowed["lang"]:
                    continue
                if "source" in allowed and row[3] not in allowed["source"]:
                    continue
            yield row


class SynthCorpusDataSource(DataSource):
    """``spark.read.format("synthcorpus").option("rows", N)`` →
    a documents-shaped frame (doc_id, text, lang, source, n_chars)."""

    @classmethod
    def name(cls) -> str:
        return "synthcorpus"

    def schema(self) -> str:
        return (
            "doc_id bigint, text string, lang string, "
            "source string, n_chars bigint"
        )

    def reader(self, schema) -> SynthCorpusReader:
        return SynthCorpusReader(self.options)

    def simpleStreamReader(self, schema) -> "SynthCorpusStreamReader":
        return SynthCorpusStreamReader(self.options)


class SynthCorpusStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: each micro-batch emits the next ``batchRows``
    generated documents; the offset is just the global row id, so the
    replay contract (readBetweenOffsets after a crash) is exact — the
    same (seed, id)-pure rows come back. A Kafka-shaped source without
    Kafka, for exercising streaming operators in tests and scale
    rehearsal.
    """

    def __init__(self, options: dict):
        self.seed = int(options.get("seed", 42))
        self.batch_rows = int(options.get("batchRows", 100))
        # honor the batch path's "rows" option as the stream cap too, so
        # readStream.option("rows", N) doesn't silently truncate at the
        # maxRows default; explicit maxRows wins
        self.max_rows = int(
            options.get("maxRows", options.get("rows", 1000))
        )
        if self.batch_rows < 1:
            raise ValueError(f"batchRows must be >= 1, got {self.batch_rows}")
        if self.max_rows < 0:
            raise ValueError(f"maxRows must be >= 0, got {self.max_rows}")

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch_rows, self.max_rows)
        return (self._rows(lo, hi), {"next": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["next"], end["next"])

    def _rows(self, lo: int, hi: int):
        return iter([_row(self.seed, i) for i in range(lo, hi)])


def register_synthcorpus(spark: SparkSession) -> None:
    spark.dataSource.register(SynthCorpusDataSource)
