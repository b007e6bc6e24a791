"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata. Decode /
feature-extraction libraries are NOT in this container, so the decode step
is STUBBED (deterministic fake features keyed on content hash, clearly
marked) — the Spark-side plumbing is real and tested: schemas, batched
``mapInPandas`` signatures, partition-size control, metadata extraction.

Real deployment swaps ``_decode_stub`` for Pillow/torchaudio/decord calls
inside the same batch loop; nothing at the Spark layer changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_DIM = 32


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB: deterministic fake 'decoded features' from the content hash.

    Replace with a real decoder (PIL image → resize → pooled pixels;
    audio → mel-spectrogram pooling; video → frame-sampled image path).
    Raises for unknown kinds, mirroring a real decoder's failure mode.
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_media_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """binary payload → feature vector, Arrow-batched.

    Output: (media_id, kind, n_bytes, features: array<float>). Batch shape
    is the real contract: one pandas frame per Arrow batch, decode loop per
    row inside the batch (the decode itself is the stub above).
    """
    out_schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("kind", StringType()),
            StructField("n_bytes", IntegerType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                b = bytes(payload) if payload is not None else b""
                nbytes.append(len(b))
                try:
                    feats.append(_decode_stub(b, kind).tolist())
                except NotImplementedError:
                    feats.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": np.array(nbytes, dtype=np.int32),
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def synthesize_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table with real binary payloads."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (i % 7 + 1)
        rows.append((f"m{i}", kind, f"{kind}/fake", bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
