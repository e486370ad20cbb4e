"""Multimodal column plumbing (LLM-pipeline extension).

Images/audio/video ride through Spark as opaque ``binary`` columns with
a typed metadata struct alongside. The Spark-side machinery here —
schemas, Arrow-batched ``mapInPandas``, partition sizing — is real and
tested; the actual media decode is STUBBED (this environment has no
image/audio libraries): ``decode_stub`` derives deterministic fake
features from the bytes so tests are reproducible, and raises
``NotImplementedError`` when a real codec is requested.

At scale: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` small enough that a partition of
payloads fits executor memory, and NEVER collect payload columns; all
feature extraction happens inside mapInPandas batches.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the feature extractor: id + byte stats + fixed-dim
#: feature vector (stubbed decode).
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 8


def to_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Pack a column into an opaque binary payload + metadata struct —
    the on-wire shape a real image/audio table would have."""
    return df.select(
        id_col,
        F.encode(F.col(text_col), "UTF-8").cast(BinaryType()).alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.encode(F.col(text_col), "UTF-8")).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, mime: str) -> list[float]:
    """Deterministic fake 'decode + featurize'. Real codecs are not
    available in this container; anything non-text raises."""
    if mime != "text/plain":
        raise NotImplementedError(
            f"no codec for {mime!r} in this environment — plug a real "
            "decoder (PIL/torchaudio/decord) here"
        )
    digest = hashlib.sha256(payload).digest()
    return [float(digest[i]) / 255.0 for i in range(FEATURE_DIM)]


#: Output schema of the frame sampler: one row per sampled "frame".
FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_sha", StringType()),
    ]
)


def resize_stub(payload: bytes, target: int) -> bytes:
    """Deterministic fake 'resize': keep every ceil(len/target)-th byte
    so output length ≤ target. A real implementation decodes with
    PIL/opencv and re-encodes; the Spark-side contract (bytes → smaller
    bytes, same row) is what's exercised here."""
    if len(payload) <= target:
        return payload
    step = -(-len(payload) // target)
    return payload[::step]


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for 'video' payloads: emit ``n_frames`` evenly
    spaced byte-chunks per payload as separate rows (mapInPandas is a
    flat-map — output rows need not align 1:1 with input). Real decoders
    (decord/ffmpeg) drop into the same batch loop."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_sha": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                chunk = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    frame = payload[i * chunk : (i + 1) * chunk]
                    if not len(frame):
                        break
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(len(frame))
                    out["frame_sha"].append(hashlib.sha256(bytes(frame)).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams column batches through Python once —
    the only sanctioned Python hop in the engine; everything before
    and after stays JVM-side.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(payload, meta["mime"])
                for payload, meta in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "content_sha": [
                        hashlib.sha256(p).hexdigest() for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def extract_features_arrow(df: DataFrame) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_features`: the batches
    arrive as ``pyarrow.RecordBatch`` — no Arrow→pandas materialization
    at all, the leanest Python hop Spark offers. Worth the less
    ergonomic API when the payload column dominates batch size (pandas
    would copy every payload into Python objects; Arrow buffers stay
    zero-copy until ``.as_py()`` on exactly the bytes being hashed).

    Output is identical to :func:`extract_features`
    (tests/test_operators.py asserts it row-for-row).
    """
    import pyarrow as pa

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            payloads = batch.column("payload")
            mimes = batch.column("meta").field("mime")
            raw = [p.as_py() for p in payloads]
            feats = [decode_stub(p, m.as_py()) for p, m in zip(raw, mimes)]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pa.array([len(p) for p in raw], pa.int64()),
                    pa.array([hashlib.sha256(p).hexdigest() for p in raw]),
                    pa.array(feats, pa.list_(pa.float32())),
                ],
                names=["doc_id", "n_bytes", "content_sha", "features"],
            )

    return df.mapInArrow(run, FEATURE_SCHEMA)


#: output schema of the per-group z-score normalizer
ZSCORE_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("label", LongType()),
        StructField("z_first", FloatType()),
    ]
)


def zscore_first_component(df: DataFrame) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-label z-score of the first
    embedding component (sample std, ddof=1 — matches SQL stddev_samp).
    The third pandas API surface next to mapInPandas (stateless batch
    flat-map) and applyInPandasWithState (streaming state machine):
    grouped-map sees ONE GROUP AT A TIME as a pandas frame — the shape
    for per-group model fitting/normalization. Each group must fit in
    one executor's memory; at 100 TB that means the group key is chosen
    accordingly (label/shard, never whole-corpus)."""
    import numpy as np

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        first = np.array([v[0] for v in pdf["embedding"]], dtype=np.float64)
        mu = first.mean()
        sd = first.std(ddof=1)
        # degenerate groups (singleton → sd NaN, constant → sd 0) emit
        # NaN, matching SQL stddev_samp's NULL / division-by-zero —
        # NOT 0.0, which would diverge from the declarative twin
        z = (first - mu) / sd if sd > 0 else np.full_like(first, np.nan)
        return pd.DataFrame(
            {"vec_id": pdf["vec_id"], "label": pdf["label"], "z_first": z.astype(np.float32)}
        )

    return df.groupBy("label").applyInPandas(norm, ZSCORE_SCHEMA)


#: output schema of the container-metadata parser
IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def parse_image_header(payload: bytes) -> tuple[str | None, int | None, int | None]:
    """REAL container-metadata decode, zero dependencies: extract
    (format, width, height) from PNG / JPEG / GIF / BMP headers by
    reading the magic bytes directly. Unlike ``decode_stub`` this is not
    a fake — it is the exact field layout of each container spec (PNG
    IHDR big-endian at offset 16; GIF logical-screen little-endian at 6;
    BMP BITMAPINFOHEADER little-endian at 18; JPEG height/width in the
    first SOFn segment). Pixel decode stays out of scope (no codec libs
    here); dimension harvesting at ingest is how a multimodal curation
    pipeline filters by resolution WITHOUT decoding 100 TB of pixels.

    Unknown/truncated containers return (None, None, None) rather than
    raising — corrupt rows are data, not crashes, at scale.
    """
    b = bytes(payload)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
            return (
                "png",
                int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"),
            )
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            return (
                "gif",
                int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"),
            )
        if b[:2] == b"BM" and len(b) >= 26:
            # BITMAPINFOHEADER: int32 width @18, int32 height @22
            # (height < 0 = top-down DIB; magnitude is the dimension)
            w = int.from_bytes(b[18:22], "little", signed=True)
            h = int.from_bytes(b[22:26], "little", signed=True)
            return ("bmp", abs(w), abs(h))
        if b[:2] == b"\xff\xd8":  # JPEG SOI: walk segments to SOFn
            i = 2
            while i + 3 < len(b):
                if b[i] != 0xFF:  # desync: not a marker where expected
                    return ("jpeg", None, None)
                marker = b[i + 1]
                if marker == 0xFF:  # fill byte
                    i += 1
                    continue
                if 0xD0 <= marker <= 0xD9:  # RSTn/SOI/EOI: no payload
                    i += 2
                    continue
                if (
                    0xC0 <= marker <= 0xCF
                    and marker not in (0xC4, 0xC8, 0xCC)  # not DHT/JPG/DAC
                ):
                    if i + 9 <= len(b):  # SOFn: u16 height @+5, width @+7
                        return (
                            "jpeg",
                            int.from_bytes(b[i + 7 : i + 9], "big"),
                            int.from_bytes(b[i + 5 : i + 7], "big"),
                        )
                    return ("jpeg", None, None)
                i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
            return ("jpeg", None, None)
    except (IndexError, ValueError):
        pass
    return (None, None, None)


def extract_image_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched dimension harvesting over (doc_id, payload) rows —
    the real-decode counterpart of :func:`extract_features`. Runs
    map-side with no shuffle; the output is small typed metadata, so the
    heavy binary column is dropped the moment the header is read."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_image_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": [p[0] for p in parsed],
                    "width": pd.array(
                        [p[1] for p in parsed], dtype="Int64"
                    ),
                    "height": pd.array(
                        [p[2] for p in parsed], dtype="Int64"
                    ),
                    "n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(run, IMAGE_META_SCHEMA)


def zscore_first_component_arrow(df: DataFrame) -> DataFrame:
    """``applyInArrow`` twin of :func:`zscore_first_component`: the
    per-label group arrives as ONE ``pyarrow.Table`` — no pandas
    materialization between the JVM and the math. Same rules (sample
    std ddof=1, degenerate groups → NaN); tests assert row-for-row
    agreement with the pandas twin, mirroring how
    :func:`extract_features_arrow` pins :func:`extract_features`.
    Completes the grouped-map surface: pandas and Arrow forms of both
    the stateless batch map (mapInPandas/mapInArrow) and the grouped
    map (applyInPandas/applyInArrow)."""
    import numpy as np
    import pyarrow as pa

    def norm(tbl: pa.Table) -> pa.Table:
        emb = tbl.column("embedding")
        first = np.array(
            [v[0].as_py() for v in emb], dtype=np.float64
        )
        mu = first.mean()
        sd = first.std(ddof=1)
        z = (first - mu) / sd if sd > 0 else np.full_like(first, np.nan)
        # Arrow is strict about result types (pandas silently upcast):
        # the fixture stores int32 ids/labels, the schema says bigint
        return pa.Table.from_arrays(
            [
                tbl.column("vec_id").cast(pa.int64()),
                tbl.column("label").cast(pa.int64()),
                pa.array(z.astype(np.float32), pa.float32()),
            ],
            names=["vec_id", "label", "z_first"],
        )

    return df.groupBy("label").applyInArrow(norm, ZSCORE_SCHEMA)
