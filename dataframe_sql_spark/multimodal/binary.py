"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (north-star extension, BASELINE.json).

The Spark-side plumbing — schemas, partition-friendly batch shapes,
Arrow-batched UDF signatures — is real and tested. The actual media
decode is STUBBED: codec libraries (Pillow/ffmpeg/librosa) are not in
this container, so ``decode_*`` raise ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic header-parse fake so
the downstream pipeline shape can be exercised end-to-end.

Scale notes: every stage here is ``mapInPandas``/expression map-side
work over binary blobs — no shuffle; blobs never pass through the
driver; Arrow moves them zero-copy between JVM and Python workers.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_SCHEMA",
    "sniff_media_type",
    "attach_blob_metadata",
    "decode_image_batch",
    "extract_image_features",
    "chunk_audio",
    "sample_video_frames",
]

# typed metadata carried alongside every media blob
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_length", T.LongType()),
        T.StructField("content_hash", T.StringType()),
    ]
)

_MAGIC = {
    "89504e47": "image/png",
    "ffd8ff": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "audio/wav-or-avi",  # RIFF container
    "00000018": "video/mp4",
    "00000020": "video/mp4",
    "494433": "audio/mp3",
}


def sniff_media_type(blob: Column) -> Column:
    """Magic-byte sniffing as a pure expression over the hex prefix."""
    prefix = F.lower(F.hex(F.substring(blob, 1, 4)))
    expr = F.lit("application/octet-stream")
    for magic, mtype in _MAGIC.items():
        expr = F.when(prefix.startswith(magic.lower()), F.lit(mtype)).otherwise(expr)
    return expr


def attach_blob_metadata(df: DataFrame, blob_col: str) -> DataFrame:
    """Add the typed metadata struct for a binary column — length,
    content hash (md5, cross-engine stable), sniffed type. All
    JVM-side expressions."""
    b = F.col(blob_col)
    meta = F.struct(
        sniff_media_type(b).alias("media_type"),
        F.length(b).cast("long").alias("byte_length"),
        F.md5(b).alias("content_hash"),
    )
    return df.withColumn(f"{blob_col}_meta", meta)


def _fake_decode(blob: bytes) -> tuple[int, int, int]:
    """Deterministic FAKE decode for environments without codecs:
    width/height/channels derived from the first bytes. Clearly not a
    real image decode — exists so the pipeline shape is testable."""
    if not blob:
        return 0, 0, 0
    w = 1 + blob[0] % 64
    h = 1 + (blob[1] if len(blob) > 1 else 0) % 64
    c = 3
    return w, h, c


def decode_image_batch(
    df: DataFrame, blob_col: str, fake: bool = False
) -> DataFrame:
    """Decode image blobs → (width, height, channels) via Arrow-batched
    ``mapInPandas``. Real decode requires Pillow (NOT in this
    container) → ``NotImplementedError`` unless ``fake=True``.

    The batch shape is the part that matters at scale: blobs stream
    through in Arrow record batches partition-by-partition; output
    schema = input schema + the three ints.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real image decode needs Pillow; pass fake=True for the "
                    "deterministic stub"
                )
            decoded = pdf[blob_col].map(lambda b: _fake_decode(b or b""))
            pdf = pdf.assign(
                width=decoded.map(lambda t: t[0]).astype("int32"),
                height=decoded.map(lambda t: t[1]).astype("int32"),
                channels=decoded.map(lambda t: t[2]).astype("int32"),
            )
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def extract_image_features(
    df: DataFrame, blob_col: str, dim: int = 16, fake: bool = False
) -> DataFrame:
    """Feature-extract blobs → array<float> embedding via mapInPandas.
    Stub: deterministic byte-histogram features when ``fake=True``;
    real model inference is out of scope for this container."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real feature extraction needs a vision model; pass fake=True"
                )

            def feat(b: bytes | None) -> list[float]:
                b = b or b""
                hist = [0] * dim
                for byte in b[:4096]:
                    hist[byte % dim] += 1
                total = float(sum(hist)) or 1.0
                return [h / total for h in hist]

            yield pdf.assign(features=pdf[blob_col].map(feat))

    return df.mapInPandas(batches, schema=out_schema)


def chunk_audio(
    df: DataFrame,
    blob_col: str,
    chunk_seconds: float = 10.0,
    bytes_per_second: int = 32000,
    fake: bool = False,
) -> DataFrame:
    """Chunk audio blobs → exploded (chunk_idx, chunk_start_s,
    chunk_blob) rows, the standard pre-ASR/pre-training segmentation.
    Stub treats blobs as 16 kHz 16-bit mono PCM (``bytes_per_second``)
    and slices fixed byte windows when ``fake=True``; the real path
    (soundfile/ffmpeg resample + silence-aware splitting) is not in
    this container.

    Same fan-out caveat as frame sampling: one row becomes
    ceil(duration/chunk_seconds) rows before any shuffle.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("chunk_start_s", T.DoubleType()),
            T.StructField("chunk_blob", T.BinaryType()),
        ]
    )
    step = int(chunk_seconds * bytes_per_second)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real audio chunking needs soundfile/ffmpeg; pass fake=True"
                )
            if len(pdf) == 0:
                yield pd.DataFrame(columns=[f.name for f in out_schema.fields])
                continue
            # Vectorized fan-out: repeat each row by its chunk count,
            # then derive per-chunk index/offset with array arithmetic.
            # Only the byte-slice itself stays Python (blobs are opaque
            # objects); no iterrows / per-row dict building.
            blobs = pdf[blob_col].map(lambda b: b or b"")
            counts = blobs.map(len).floordiv(-1 * step).mul(-1).clip(lower=1)  # ceil, ≥1
            out = pdf.loc[pdf.index.repeat(counts)].reset_index(drop=True)
            idx = np.concatenate([np.arange(c) for c in counts.to_numpy()])
            out["chunk_idx"] = idx.astype("int32")
            out["chunk_start_s"] = idx * chunk_seconds
            out["chunk_blob"] = [
                b[i * step : (i + 1) * step]
                for b, c in zip(blobs, counts.to_numpy())
                for i in range(c)
            ]
            yield out[[f.name for f in out_schema.fields]]

    return df.mapInPandas(batches, schema=out_schema)


def sample_video_frames(
    df: DataFrame, blob_col: str, every_n_bytes: int = 1024, max_frames: int = 8, fake: bool = False
) -> DataFrame:
    """Frame-sample video blobs → exploded (frame_idx, frame_blob)
    rows. Stub samples fixed-offset byte windows when ``fake=True``
    (real path: ffmpeg). One input row fans out to ≤ max_frames rows —
    partition sizes grow by that factor, which is why this runs before
    any shuffle stage in a real pipeline."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_blob", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError("real frame sampling needs ffmpeg; pass fake=True")
            if len(pdf) == 0:
                yield pd.DataFrame(columns=[f.name for f in out_schema.fields])
                continue
            blobs = pdf[blob_col].map(lambda b: b or b"")
            counts = blobs.map(len).floordiv(every_n_bytes).clip(lower=1, upper=max_frames)
            out = pdf.loc[pdf.index.repeat(counts)].reset_index(drop=True)
            idx = np.concatenate([np.arange(c) for c in counts.to_numpy()])
            out["frame_idx"] = idx.astype("int32")
            out["frame_blob"] = [
                b[i * every_n_bytes : (i + 1) * every_n_bytes]
                for b, c in zip(blobs, counts.to_numpy())
                for i in range(c)
            ]
            yield out[[f.name for f in out_schema.fields]]

    return df.mapInPandas(batches, schema=out_schema)
