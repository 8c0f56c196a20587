"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction / resize / frame-sampling are
``mapInPandas`` stages whose Spark-side contract (schema, batch shape,
partitioning) is real and tested here, while the actual codec call is stubbed
(image/audio libraries are not in this container): ``decoder='stub'`` raises
``NotImplementedError``; ``decoder='fake'`` produces a deterministic fake
decode (byte-histogram features) so the full pipeline is exercisable.

At 100 TB the payload column dominates I/O: keep it in its own parquet column
(column pruning skips it unless a decode stage runs), partition by content
bucket, and size ``spark.sql.files.maxPartitionBytes`` so one task holds a
few hundred payloads, not gigabytes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, features array<float>"


def media_metadata(df: DataFrame) -> DataFrame:
    """Typed metadata without touching payload bytes beyond length —
    column-pruned scan reads only what it needs."""
    return df.select(
        "media_id",
        "kind",
        F.length(F.col("payload")).alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Real decoder hook.  Container has no codec libs -> explicit stub."""
    raise NotImplementedError(
        "media decode requires image/audio codecs not present in this "
        "environment; plug a decoder in here (PIL / torchaudio / pyav)"
    )


def decode_fake(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake decode: 16-bin byte histogram, L1-normalized —
    exercises the exact batch shape a real decoder would produce."""
    if not payload:
        return np.zeros(16, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
    return hist / max(hist.sum(), 1.0)


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """payload -> feature vector, Arrow-batched.  ``decoder='stub'`` raises
    (documents the integration point); ``'fake'`` is the deterministic test
    double."""
    fn = decode_stub if decoder == "stub" else decode_fake

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fn(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        _feat, schema=FEATURES_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to decode (media_id,
    frame_ts_ms) derived from metadata only — the decode itself happens in
    ``extract_features`` per-frame.  Planning stays JVM-side."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
