"""Multimodal-column queries (operators/multimodal.py) with SQL oracles.

The mapInPandas outputs are deterministic byte-level functions of the
payload, so DuckDB reproduces them exactly: octet_length for n_bytes, the
md5 construction shared with operators/dedup.hash_id for fingerprints, and
ascii(substr(...)) for sampled frame bytes (payloads are utf-8 of ascii
synthetic text, so byte == char).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.operators import multimodal as mm
from energy_emissions_lakehouse_spark.registry import register
from energy_emissions_lakehouse_spark.tables import t

# DuckDB's md5() takes VARCHAR and hashes its utf-8 bytes — exactly the
# payload bytes Spark-side hashlib sees, so no blob cast is needed.
_FPRINT = "CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)"
_MTYPE = "['image','audio','video'][CAST(doc_id % 3 AS INT) + 1]"


@register(
    "media_feature_extract",
    oracle=f"""
    SELECT doc_id AS media_id,
           {_MTYPE} AS media_type,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           {_FPRINT} AS fingerprint,
           CAST(LEAST(16 + (doc_id % 5) * 8, {mm.THUMB_MAX}) AS INT) AS thumb_w,
           CAST(LEAST(16 + (doc_id % 7) * 8, {mm.THUMB_MAX}) AS INT) AS thumb_h
    FROM documents
    """,
    survey="extension (multimodal): binary payload + typed metadata struct "
    "-> Arrow-batched mapInPandas feature extraction (decode stubbed, "
    "plumbing real: schema, batch iteration, resize clamp)",
)
def media_feature_extract(spark, sf_dir) -> DataFrame:
    media = mm.media_catalog(t(spark, sf_dir, "documents"))
    return mm.extract_features(media)


@register(
    "media_frame_sample",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(i AS BIGINT) AS frame_no,
           CAST(ascii(substr(text, 1 + CAST(i AS INT) * {mm.FRAME_STRIDE}, 1))
                AS BIGINT) AS frame_byte
    FROM documents,
         UNNEST(range(CAST(ceil(octet_length(CAST(text AS BLOB))
                                / {mm.FRAME_STRIDE}.0) AS BIGINT))) AS u(i)
    WHERE doc_id % 3 = 2
    """,
    survey="extension (multimodal): per-payload frame sampling inside the "
    "Pandas batch (vectorized byte slicing) — video rows only",
)
def media_frame_sample(spark, sf_dir) -> DataFrame:
    media = mm.media_catalog(t(spark, sf_dir, "documents"))
    return mm.frame_sample(media)
