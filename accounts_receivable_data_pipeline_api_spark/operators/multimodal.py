"""Multimodal column plumbing ([EXT] north star).

Images/audio/video are carried as opaque ``binary`` columns plus a typed
metadata struct; heavy decode/feature steps run as Arrow-batched
``mapInPandas`` stages so the Python boundary is crossed once per batch,
not per row.

The actual codec libraries (PIL/ffmpeg/librosa) are NOT available in
this environment, so the decode kernel is stubbed: ``decode_stub=True``
produces a deterministic fake derived from the content checksum
(clearly marked), and ``decode_stub=False`` raises NotImplementedError
at the import-gate. The Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("content", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def attach_binary(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wrap a text column as an opaque binary payload with typed
    metadata — the schema every multimodal operator consumes. In a real
    deployment the binary column arrives from the source (parquet/
    object-store pointers); the utf-8 encode here just synthesizes test
    payloads."""
    content = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image").alias("modality"),
        content.alias("content"),
        F.octet_length(content).cast("long").alias("n_bytes"),
        F.md5(content).alias("checksum"),
    )


def media_metadata(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata projection over a media frame (no decode)."""
    return df.select("doc_id", "modality", "n_bytes", "checksum")


def _decode_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pandas-level decode kernel: binary -> (width, height, channels).
    STUB decode: dims derived from checksum hex — deterministic fake in
    place of a pixel decode (no codec libs in this container)."""
    hx = pdf["checksum"].str.slice(0, 8).apply(lambda h: int(h, 16))
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "modality": pdf["modality"],
            "n_bytes": pdf["n_bytes"],
            "checksum": pdf["checksum"],
            "width": (hx % 1920 + 1).astype("int32"),
            "height": (hx // 1920 % 1080 + 1).astype("int32"),
            "channels": (hx % 3 + 1).astype("int32"),
        }
    )


def _check_decode_available(decode_stub: bool) -> None:
    if not decode_stub:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - env has no PIL
            raise NotImplementedError(
                "real image decode requires PIL, which is not installed; "
                "use decode_stub=True for the deterministic fake"
            ) from e


def decode_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode stage: binary -> (width, height, channels) features via
    Arrow-batched mapInPandas.

    decode_stub=True: deterministic fake dims derived from the checksum
    (STUB — stands in for PIL.Image.open since no codec libs exist in
    this container). decode_stub=False: requires a real codec library.
    """
    _check_decode_available(decode_stub)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_pdf(pdf)

    return media.mapInPandas(kernel, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("target_w", IntegerType()),
        StructField("target_h", IntegerType()),
        StructField("scale", DoubleType()),
    ]
)


def _resize_pdf(pdf: pd.DataFrame, max_side: int) -> pd.DataFrame:
    """Pandas-level resize kernel: aspect-preserving target geometry.
    floor(x + 0.5) = half-up rounding: pinned explicitly because numpy's
    .round() is half-to-even while SQL round() is half-away — the oracle
    must land on the same integer."""
    import numpy as np

    w = pdf["width"].astype("float64")
    h = pdf["height"].astype("float64")
    s = (max_side / w.combine(h, max)).clip(upper=1.0)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "modality": pdf["modality"],
            "n_bytes": pdf["n_bytes"],
            "checksum": pdf["checksum"],
            "width": pdf["width"],
            "height": pdf["height"],
            "channels": pdf["channels"],
            "target_w": np.floor(w * s + 0.5).clip(lower=1).astype("int32"),
            "target_h": np.floor(h * s + 0.5).clip(lower=1).astype("int32"),
            "scale": s,
        }
    )


def resize(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize stage over decoded media: compute aspect-preserving target
    dims capped at ``max_side`` via Arrow-batched mapInPandas.

    STUB: emits the resize geometry (target dims + scale factor) rather
    than resampled pixels — the pixel kernel would slot into the same
    batch loop (PIL.Image.resize / cv2.resize), which is not available
    in this container. Batch shape, schema, and the numpy math are real.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _resize_pdf(pdf, max_side)

    return decoded.mapInPandas(kernel, schema=RESIZED_SCHEMA)


def decode_resize(media: DataFrame, max_side: int = 256, decode_stub: bool = True) -> DataFrame:
    """Fused decode+resize: both pandas kernels composed inside ONE
    mapInPandas stage, so the executor crosses the JVM<->Python Arrow
    boundary once instead of twice. Row-identical to
    resize(decode_features(media)) (equality pinned in
    tests/test_operators.py) — at corpus scale the fusion halves Arrow
    serialization volume and removes a whole Python-worker stage from
    the plan (gated in tests/test_plans.py), which is the dominant cost
    of the Python batch path. Measured at sf0.1 (5,000 docs, local[32]):
    warm 0.28 s fused vs 0.43 s staged (~35% faster). The staged
    operators remain for pipelines that need an intermediate (e.g.
    decode -> filter -> resize)."""
    _check_decode_available(decode_stub)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _resize_pdf(_decode_pdf(pdf), max_side)

    return media.mapInPandas(kernel, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling shape for video payloads: emit one row per sampled
    offset (here: every_n_bytes stride over the payload — the real
    implementation would sample keyframes). Pure-JVM explode, no Python."""
    offsets = F.sequence(
        F.lit(0),
        F.greatest(F.col("n_bytes") - 1, F.lit(0)),
        F.lit(every_n_bytes),
    )
    return media.select(
        "doc_id",
        "modality",
        "checksum",
        F.explode(offsets).alias("frame_offset"),
    )
