"""Custom Python data sink (Spark 4 DataSource API): a JSONL writer
with a real two-phase commit, registered as ``format("jsonlsink")``.

The engine's JVM-side JSONL path is ``sources.writers.write_jsonl``
(Spark's own json sink — always prefer it). This sink exists to prove
the WRITE half of the Python DataSource surface end-to-end the way the
read half is proven by ``pydatasource.SynthCorpusDataSource``: the
reference's only sinks are parquet + a pandas CSV
(``/root/reference/etl/main.py:296-315``); a pluggable sink written in
plain Python (no jar) is what lets the engine target systems Spark has
no built-in connector for.

Scale/correctness shape — the part worth copying into any custom sink:
tasks NEVER write final files. Each task writes
``.staged-<uuid>.jsonl`` and returns the name in its commit message;
the driver's ``commit()`` renames exactly the acknowledged files into
``part-*.jsonl`` and deletes every other ``.staged-*`` leftover (failed
or SPECULATIVE duplicate attempts — Spark may run the same partition
twice and only one attempt's message reaches commit), then drops a
``_SUCCESS`` marker. ``abort()`` deletes all staged files. Readers that
require ``_SUCCESS`` therefore never observe a torn write — the same
rename-on-commit protocol Hadoop's FileOutputCommitter v1 uses.

Storage note: the protocol assumes executors and driver share the
filesystem under ``path`` (local mode, NFS, FUSE-mounted object store).
A cluster sink against S3/HDFS would swap the ``os`` calls for fsspec /
``pyarrow.fs`` handles — the commit/abort structure stays identical.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass
from datetime import date, datetime
from decimal import Decimal

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType


def _json_default(v):
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    raise TypeError(f"not JSON-serializable: {type(v).__name__}")


@dataclass
class _StagedFile(WriterCommitMessage):
    name: str
    n_rows: int


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, path: str, overwrite: bool):
        self.path = path
        self.overwrite = overwrite
        # per-write run id baked into COMMITTED names: append mode must
        # never rename onto a prior write's part files (os.replace would
        # silently clobber them)
        self.run_id = uuid.uuid4().hex[:8]

    # -- executor side ---------------------------------------------------
    def write(self, iterator: Iterator[Row]) -> _StagedFile:
        os.makedirs(self.path, exist_ok=True)
        # uuid (not partitionId) in the STAGED name: two attempts of the
        # same partition must not collide; commit renames to a stable
        # part-<i> numbering afterwards
        name = f".staged-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                f.write(
                    json.dumps(
                        row.asDict(recursive=True),
                        default=_json_default,
                        sort_keys=True,
                    )
                )
                f.write("\n")
                n += 1
        return _StagedFile(name=name, n_rows=n)

    # -- driver side ------------------------------------------------------
    def commit(self, messages: list[_StagedFile]) -> None:
        os.makedirs(self.path, exist_ok=True)  # 0-partition frames
        acked = {m.name for m in messages if m is not None}
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.startswith("part-") or f == "_SUCCESS":
                    os.remove(os.path.join(self.path, f))
        for i, m in enumerate(sorted(acked)):
            os.replace(
                os.path.join(self.path, m),
                os.path.join(self.path, f"part-{i:05d}-{self.run_id}.jsonl"),
            )
        # leftovers = failed / speculative-duplicate attempts
        self._drop_staged()
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages: list[_StagedFile]) -> None:
        self._drop_staged()

    def _drop_staged(self) -> None:
        # A straggler task can still be flushing its staged file when the
        # driver aborts (Spark interrupts tasks, Python workers may flush
        # late), so one sweep can miss it — benign: readers only see
        # part-*, and the NEXT write's commit sweeps leftovers again.
        try:
            names = os.listdir(self.path)
        except FileNotFoundError:
            return  # aborted before any task created the directory
        for f in names:
            if f.startswith(".staged-"):
                try:
                    os.remove(os.path.join(self.path, f))
                except OSError:
                    pass


class JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming twin: one commit per micro-batch epoch, IDEMPOTENT on
    the epoch id. After a crash Spark replays the last epoch; its
    ``_epoch-N`` manifest already existing means the data is already
    published, so the replayed attempt's staged files are swept instead
    of republished — end-to-end exactly-once on top of an at-least-once
    replay, which is precisely the contract a custom streaming sink has
    to supply itself (the engine guarantees only the replay)."""

    def __init__(self, path: str):
        self.path = path

    def write(self, iterator: Iterator[Row]) -> _StagedFile:
        return JsonlSinkWriter(self.path, overwrite=False).write(iterator)

    def commit(self, messages: list[_StagedFile], batchId: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        manifest = os.path.join(self.path, f"_epoch-{batchId}")
        staged = sorted(m.name for m in messages if m is not None)
        if os.path.exists(manifest):  # replayed epoch: already published
            for name in staged:
                try:
                    os.remove(os.path.join(self.path, name))
                except OSError:
                    pass
            return
        final = [
            f"part-{batchId:05d}-{i:05d}.jsonl" for i in range(len(staged))
        ]
        for src, dst in zip(staged, final):
            os.replace(
                os.path.join(self.path, src), os.path.join(self.path, dst)
            )
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batchId, "files": final}, f)
        os.replace(tmp, manifest)  # manifest appears atomically, LAST

    def abort(self, messages: list[_StagedFile], batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.name))
                except OSError:
                    pass


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonlsink").mode("overwrite").save(path)`` →
    ``part-*.jsonl`` + ``_SUCCESS`` under ``path``. Streaming:
    ``df.writeStream.format("jsonlsink").option("path", p)`` →
    per-epoch ``part-<epoch>-*.jsonl`` + ``_epoch-<n>`` manifests."""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonlsink requires a path: .save(path)")
        return path

    def writer(self, schema: StructType, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self._path(), overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> JsonlStreamWriter:
        return JsonlStreamWriter(self._path())


def register_jsonlsink(spark: SparkSession) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
