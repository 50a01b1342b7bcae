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


PHASH_BITS = 32
PHASH_BANDS = 4  # 4 x 8-bit bands: pigeonhole-exact for hamming <= 3

PHASH_SCHEMA = StructType(
    [StructField("media_id", LongType()), StructField("phash", LongType())]
)


def phash32(media: DataFrame) -> DataFrame:
    """Block-average perceptual hash (aHash) over the raw payload bytes:
    the payload splits into 32 byte segments; bit i is set when segment
    i's byte-sum strictly exceeds the per-segment mean. Small payload
    edits perturb few segment sums, so near-duplicate payloads land at
    small hamming distance — the image-dedup primitive (on decoded
    pixels in production; on raw bytes here, same dataflow).

    Arrow-batched mapInPandas; numpy bincount does the segment sums, no
    per-byte Python."""
    import numpy as np

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = len(b)
                if n == 0:
                    out.append((int(mid), 0))
                    continue
                seg = (np.arange(n, dtype=np.int64) * PHASH_BITS) // n
                sums = np.bincount(
                    seg, weights=b, minlength=PHASH_BITS
                ).astype(np.int64)
                total = int(sums.sum())
                ph = 0
                for i in range(PHASH_BITS):
                    # integer cross-multiplication: sum_i > mean <=>
                    # sum_i * 32 > total (exact, no float mean)
                    if int(sums[i]) * PHASH_BITS > total:
                        ph |= 1 << (PHASH_BITS - 1 - i)
                out.append((int(mid), ph))
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    return media.select("media_id", "payload").mapInPandas(
        hash_batches, PHASH_SCHEMA
    )


def phash_neardup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by banded equi-join on 8-bit phash bands + popcount
    verify. With 4 bands, any pair at hamming <= 3 shares at least one
    band (pigeonhole), so the banded candidate set is EXACT for the
    threshold — the same argument as the SimHash tier, at image scale:
    candidates come from bucket joins, never all-pairs.

    ``hashes`` is materialized once (round-12): both self-join sides
    reference it, and its upstream is the Arrow-batched payload hashing
    pass — the expensive kind of recompute (every payload byte crosses
    to Python again); the hash table itself is two longs per media row,
    the cheap kind of state, at any corpus size."""
    hashes = hashes.localCheckpoint(eager=True)
    bands = hashes.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftright(
                            F.col("phash"), (PHASH_BANDS - 1 - j) * 8
                        )
                        .bitwiseAND(F.lit(255))
                        .alias("val"),
                    )
                    for j in range(PHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("media_id", "phash", F.col("b.band"), F.col("b.val"))
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(
        F.col("ph_a").bitwiseXOR(F.col("ph_b"))
    ).cast("long")
    return cands.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """`mapInArrow` twin of extract_features: the batches arrive and leave
    as pyarrow RecordBatches with NO pandas conversion in between — the
    zero-copy path for binary-heavy columns (a pandas round-trip copies
    every payload into Python objects; Arrow keeps them as buffers).
    Same output contract as extract_features, pinned equal in tests."""
    import pyarrow as pa

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in it:
            payloads = rb.column(rb.schema.get_field_index("payload"))
            meta = rb.column(rb.schema.get_field_index("meta"))
            fps = pa.array(
                [_fingerprint(p) for p in payloads.to_pylist()],
                type=pa.int64(),
            )
            n_bytes = pa.compute.binary_length(payloads).cast(pa.int64())
            thumb_w = pa.compute.min_element_wise(
                meta.field("declared_w"), pa.scalar(THUMB_MAX, pa.int32())
            )
            thumb_h = pa.compute.min_element_wise(
                meta.field("declared_h"), pa.scalar(THUMB_MAX, pa.int32())
            )
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(rb.schema.get_field_index("media_id")),
                    rb.column(rb.schema.get_field_index("media_type")),
                    n_bytes,
                    fps,
                    thumb_w,
                    thumb_h,
                ],
                names=[
                    "media_id",
                    "media_type",
                    "n_bytes",
                    "fingerprint",
                    "thumb_w",
                    "thumb_h",
                ],
            )

    return media.mapInArrow(batches, schema=FEATURE_SCHEMA)
