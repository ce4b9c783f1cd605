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
from pyspark.sql.types import (ArrayType, FloatType, IntegerType, LongType,
                               StringType, StructField, StructType)

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
