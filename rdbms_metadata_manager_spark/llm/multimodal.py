"""Multimodal column plumbing: opaque binary blobs + typed metadata,
processed with Arrow-batched ``mapInPandas``.

[beyond-reference] surface. The container has no image/audio codecs,
so the DECODE step is stubbed: ``_try_real_decode`` gates the real
libraries behind an import-try and the pipeline falls back to a
deterministic md5-derived fake feature extractor. Everything
Spark-side is real and tested — BinaryType column, modality metadata,
mapInPandas batch iteration, output schema — and the fake features
are reproducible in SQL, so even the Python-UDF path has an exact
DuckDB oracle.

Scale: mapInPandas streams Arrow batches executor-side (no driver
involvement, no per-row Python); at 100 TB you partition by the blob
store layout and tune ``spark.sql.execution.arrow.maxRecordsPerBatch``
to keep batches ~64 MB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.base import load_spread

MODALITIES = ["image", "audio", "video"]

FEATURES_SCHEMA = (
    "doc_id bigint, modality string, n_bytes bigint, content_hash string, "
    "width int, height int"
)


def _try_real_decode(blob: bytes, modality: str):
    """Real decoder — requires codec libraries this container lacks.
    Kept as the integration point; returns None when unavailable."""
    try:
        if modality == "image":
            from PIL import Image  # noqa: F401
        elif modality == "audio":
            import soundfile  # noqa: F401
        else:
            import av  # noqa: F401
    except ImportError:
        return None
    raise NotImplementedError("real decode path not exercised in this environment")


def _fake_features(blob: bytes) -> tuple[str, int, int]:
    """Deterministic md5-derived stand-in for decoded media features,
    mirrored by the SQL oracle."""
    h = hashlib.md5(blob).hexdigest()
    width = 64 + int(h[8:12], 16) % 448
    height = 64 + int(h[12:16], 16) % 448
    return h[:8], width, height


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [
            _try_real_decode(blob, mod) or _fake_features(blob)
            for blob, mod in zip(pdf["blob"], pdf["modality"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "modality": pdf["modality"],
                "n_bytes": [len(b) for b in pdf["blob"]],
                "content_hash": [f[0] for f in feats],
                "width": pd.Series([f[1] for f in feats], dtype="int32"),
                "height": pd.Series([f[2] for f in feats], dtype="int32"),
            }
        )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize blobs from document text (the container ships no
    media files), tag a modality, and run the decode/feature-extract
    stage through mapInPandas."""
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    blobs = docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]), (F.col("doc_id") % 3 + 1).cast("int")
        ).alias("modality"),
    )
    return blobs.mapInPandas(_decode_batches, FEATURES_SCHEMA).orderBy("doc_id")


_FEATURES_SQL = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       strlen(text)              AS n_bytes,
       substr(md5(text), 1, 8)   AS content_hash,
       CAST(64 + ('0x' || substr(md5(text), 9, 4))::BIGINT % 448 AS INT)  AS width,
       CAST(64 + ('0x' || substr(md5(text), 13, 4))::BIGINT % 448 AS INT) AS height
FROM documents
ORDER BY doc_id
"""


QUERIES = {"multimodal_features": multimodal_features}
ORACLES = {"multimodal_features": _FEATURES_SQL}
