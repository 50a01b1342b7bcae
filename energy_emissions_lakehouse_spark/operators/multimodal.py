"""Multimodal columns (extension surface: image/audio/video at 100 TB).

Contract: media payloads are opaque ``binary`` columns with a typed
metadata struct alongside; all per-item compute (decode, feature extract,
resize, frame-sample) runs as Arrow-batched ``mapInPandas`` so Python cost
is amortized per batch and the operator scales with partitions, never the
driver.

This container has no imaging/audio libraries, so the codec step is a
STUB (``decode_image`` raises NotImplementedError unless PIL appears);
everything around it — binary schema, metadata struct, mapInPandas
signatures, Arrow batch iteration, deterministic fallback features — is
real and oracle-tested. The deterministic "features" (byte length, an
md5-derived fingerprint, clamped thumbnail dims) stand in for real
embeddings/thumbnails with the same dataflow shape.

The media catalog derives from ``documents`` (payload = utf-8 bytes of the
text), because the driver testdata ships no binary column; at production
the same operators run over real blobs unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

THUMB_MAX = 64  # "resize" stub: clamp declared dims to this
FRAME_STRIDE = 16  # "frame sample" stub: one byte every 16

MEDIA_TYPES = ["image", "audio", "video"]

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("fingerprint", LongType()),
        StructField("thumb_w", IntegerType()),
        StructField("thumb_h", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame_byte", LongType()),
    ]
)


def media_catalog(docs: DataFrame) -> DataFrame:
    """(media_id, media_type, payload: binary, meta: struct) from documents.

    Deterministic synthetic metadata (dims/rate from the id) keeps the
    catalog oracle-reproducible; payload is the utf-8 encoding of the text."""
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.col("text").cast(BinaryType()).alias("payload"),
        F.struct(
            (16 + (F.col("doc_id") % 5) * 8).cast("int").alias("declared_w"),
            (16 + (F.col("doc_id") % 7) * 8).cast("int").alias("declared_h"),
            (8000 + (F.col("doc_id") % 4) * 4000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


try:  # guard-import: the container ships no imaging library, real
    # clusters usually do — the decode path activates itself when present
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - env-dependent
    _PILImage = None
    HAS_PIL = False


def decode_image(payload: bytes) -> tuple[int, int, str]:
    """Decode real image bytes -> (width, height, mode) via PIL when the
    library is present; raises NotImplementedError otherwise.

    This is the genuine decode hook: `extract_features` below stays on the
    deterministic byte-level path REGARDLESS of PIL availability so its
    registered query is oracle-reproducible in every environment (the
    synthetic payloads aren't valid image bytes anyway); pipelines with
    real image columns call this from their own mapInPandas batch
    (see tests/test_multimodal.py::test_decode_image_with_pil, which
    exercises the PIL branch whenever the library exists)."""
    if not HAS_PIL:
        raise NotImplementedError(
            "image decode requires an imaging library (e.g. Pillow); "
            "not available in this environment — use extract_features' "
            "deterministic byte features instead"
        )
    import io

    with _PILImage.open(io.BytesIO(payload)) as img:
        return img.width, img.height, img.mode


def _fingerprint(payload: bytes) -> int:
    """60-bit md5 fingerprint — same construction as operators/dedup.hash_id,
    so DuckDB reproduces it as ('0x' || substr(md5(blob),1,15))::BIGINT."""
    return int(hashlib.md5(payload).hexdigest()[:15], 16)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction: decode-stub + "resize" (clamp the
    declared dims to THUMB_MAX). One pass, no shuffle; output schema is
    fixed (FEATURE_SCHEMA) so downstream plans stay fully typed."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "fingerprint": pdf["payload"].map(_fingerprint).astype("int64"),
                    "thumb_w": pdf["meta"].map(
                        lambda m: min(m["declared_w"], THUMB_MAX)
                    ).astype("int32"),
                    "thumb_h": pdf["meta"].map(
                        lambda m: min(m["declared_h"], THUMB_MAX)
                    ).astype("int32"),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame sampling stub for video payloads: one byte every ``stride``
    positions -> (media_id, frame_no, frame_byte). The explode happens
    inside the Pandas batch (vectorized), not row-at-a-time."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vids = pdf[pdf["media_type"] == "video"]
            if not len(vids):
                continue
            ids, frames, vals = [], [], []
            for mid, payload in zip(vids["media_id"], vids["payload"]):
                sampled = payload[::stride]
                ids.extend([mid] * len(sampled))
                frames.extend(range(len(sampled)))
                vals.extend(sampled)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(frames, dtype="int64"),
                    "frame_byte": pd.Series(vals, dtype="int64"),
                }
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
