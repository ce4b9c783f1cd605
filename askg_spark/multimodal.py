"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched
`mapInPandas` stages. The decode kernels themselves are STUBBED in this
environment (no PIL/ffmpeg in the container) behind an import-try with
a deterministic fallback — the Spark-side contract (schema, batch shape,
partitioning, null handling) is real and tested.

Scale notes: binary payloads dominate byte volume; stages that don't
need the payload must never deserialize it (column pruning — see
extract.py's html handling for the same rule), and
`spark.sql.execution.arrow.maxRecordsPerBatch` bounds decode-batch
memory (payloads x batch-size is the working set per worker).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

FEATURE_DIM = 8

DECODED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("features", ArrayType(FloatType())),
    StructField("decode_error", StringType()),
])


def attach_payload(df: DataFrame, payload_col: str = "text") -> DataFrame:
    """Demo adapter: wrap a column as an opaque binary payload with
    metadata — the shape a crawl with image/audio attachments has."""
    return df.select(
        "doc_id",
        F.col(payload_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("image/png").alias("content_type"),
            F.length(F.col(payload_col).cast("binary")).cast("long").alias("n_bytes"),
        ).alias("media_meta"),
    )


def _decode_real(payload: bytes):
    """Real decoder — requires an image library not present here."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL; this environment ships none — "
            "the deterministic fallback below keeps the plumbing testable"
        ) from exc
    raise NotImplementedError("wire Image.open(io.BytesIO(payload)) here")


def _decode_fallback(payload: bytes):
    """Deterministic fake decode: dimensions and features derived from
    md5(payload) — stable across runs/executors, exercises the full
    schema incl. realistic value ranges."""
    import hashlib
    d = hashlib.md5(payload).digest()
    width = 64 + d[0]
    height = 64 + d[1]
    features = [((d[i] / 255.0) * 2 - 1) for i in range(2, 2 + FEATURE_DIM)]
    return width, height, features


def decode_media(df: DataFrame) -> DataFrame:
    """(doc_id, payload, media_meta) -> DECODED_SCHEMA rows.

    Null/empty payloads produce a decode_error row (quarantine
    discipline, same VALID/REJECT split as extraction)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                    pdf["doc_id"], pdf["payload"], pdf["media_meta"]):
                base = {
                    "doc_id": doc_id,
                    "media_type": meta["content_type"] if meta is not None else None,
                    "n_bytes": len(payload) if payload is not None else 0,
                    "width": None, "height": None, "features": None,
                    "decode_error": None,
                }
                if payload is None or len(payload) == 0:
                    base["decode_error"] = "empty_payload"
                else:
                    try:
                        w, h, feats = _decode_real(payload)
                    except NotImplementedError:
                        w, h, feats = _decode_fallback(bytes(payload))
                    base.update(width=w, height=h,
                                features=[float(x) for x in feats])
                rows.append(base)
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA])

    return df.select("doc_id", "payload", "media_meta").mapInPandas(
        run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("payload", BinaryType()),
    StructField("resize_error", StringType()),
])


def _resize_real(payload: bytes, max_side: int):
    """Real resize — requires an image library not present here."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image resize requires PIL; deterministic fallback keeps the "
            "plumbing testable") from exc
    raise NotImplementedError("wire Image.thumbnail((max_side, max_side))")


def _resize_fallback(payload: bytes, max_side: int):
    """Deterministic fake resize: source dims from the same md5-derived
    geometry as `_decode_fallback`, aspect-ratio-preserving scale to fit
    `max_side`, output payload scaled to ~scale^2 of the input bytes
    (what a real re-encode roughly does) — md5-keyed so it is stable
    across runs/executors."""
    import hashlib
    d = hashlib.md5(payload).digest()
    w, h = 64 + d[0], 64 + d[1]
    scale = min(1.0, max_side / max(w, h))
    ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
    out_len = max(1, int(len(payload) * scale * scale))
    reps = out_len // len(d) + 1
    return ow, oh, (d * reps)[:out_len]


def resize_media(df: DataFrame, max_side: int = 256) -> DataFrame:
    """(doc_id, payload, media_meta) -> RESIZED_SCHEMA rows: bounded-box
    downscale keeping aspect ratio (never upscales). Kernel stubbed like
    `decode_media` (no PIL here); the Spark contract — binary-in /
    binary-out Arrow batches, quarantine rows for empty payloads, a
    schema any downstream encoder can consume — is real.

    Scale note: output bytes <= input bytes by construction, so this
    stage only ever shrinks the shuffle footprint; run it BEFORE any
    repartition of media rows."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    rows.append({"doc_id": doc_id, "width": None,
                                 "height": None, "payload": None,
                                 "resize_error": "empty_payload"})
                    continue
                try:
                    w, h, out = _resize_real(bytes(payload), max_side)
                except NotImplementedError:
                    w, h, out = _resize_fallback(bytes(payload), max_side)
                rows.append({"doc_id": doc_id, "width": w, "height": h,
                             "payload": out, "resize_error": None})
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA])

    return df.select("doc_id", "payload", "media_meta").mapInPandas(
        run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("ts_ms", LongType()),
    StructField("frame", BinaryType()),
    StructField("sample_error", StringType()),
])


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Uniform temporal frame sampling for video payloads:
    (doc_id, payload, media_meta) -> one FRAME_SCHEMA row per sampled
    frame, indices evenly spaced over the clip (first and last always
    included when n_frames >= 2).

    The ffmpeg seek+decode kernel is stubbed (none in this container);
    the fake derives a deterministic per-clip frame count and duration
    from md5(payload) and emits md5(payload || frame_idx)-keyed frame
    bytes — stable across executors, so tests can assert the exact
    emission set. Fan-out is n_frames rows per clip: bound Arrow batch
    memory with spark.sql.execution.arrow.maxRecordsPerBatch, and size
    n_frames so frame_bytes x n_frames stays under the per-worker
    budget (the same working-set rule as decode_media)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    rows.append({"doc_id": doc_id, "frame_idx": None,
                                 "ts_ms": None, "frame": None,
                                 "sample_error": "empty_payload"})
                    continue
                d = hashlib.md5(bytes(payload)).digest()
                total = 8 + d[2] % 120          # fake clip frame count
                fps = 24
                if n_frames >= total:
                    idxs = list(range(total))
                else:
                    step = (total - 1) / max(1, n_frames - 1)
                    idxs = sorted({round(i * step) for i in range(n_frames)})
                for fi in idxs:
                    fd = hashlib.md5(bytes(payload) + fi.to_bytes(4, "big"))
                    rows.append({"doc_id": doc_id, "frame_idx": fi,
                                 "ts_ms": int(fi * 1000 / fps),
                                 "frame": fd.digest(),
                                 "sample_error": None})
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    return df.select("doc_id", "payload", "media_meta").mapInPandas(
        run, schema=FRAME_SCHEMA)


def media_feature_stats(decoded: DataFrame) -> DataFrame:
    """Aggregate check over decoded media: count, dimension bounds —
    ints only, a cheap correctness probe over the decode stage."""
    ok = decoded.filter(F.col("decode_error").isNull())
    return ok.agg(
        F.count(F.lit(1)).alias("n_decoded"),
        F.min("width").cast("long").alias("min_width"),
        F.max("width").cast("long").alias("max_width"),
        F.min("height").cast("long").alias("min_height"),
        F.max("height").cast("long").alias("max_height"),
    )
