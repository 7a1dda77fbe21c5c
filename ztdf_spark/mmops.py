"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_media`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case a seeded, content-hash-derived
fake decoder produces stable feature vectors / frame samples — so the
Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) is real and fully tested, and a real decoder (PIL/ffmpeg/torchaudio)
drops in behind the same signature.

Scale notes: media blobs dominate row size → ``spark.sql.files.
maxPartitionBytes`` and Arrow ``maxRecordsPerBatch`` must be tuned so one
Arrow batch of blobs fits executor memory; feature extraction is
embarrassingly parallel (no shuffle), and outputs are narrow rows, so the
pattern is scan-heavy map-only — the ideal 100 TB shape.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_SCHEMA = "media_id long, media_type string, n_bytes long, feature array<float>"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_hash string"


def decode_media(payload: bytes, media_type: str, *, deterministic_fake: bool = False) -> np.ndarray:
    """STUB: decode a media blob into a dense array.

    Real implementation requires PIL/ffmpeg/torchaudio (absent here). The
    deterministic fake derives a 16-dim float vector from the content hash —
    stable across runs, executors, and parallelism levels.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "media decoding requires image/audio libs not present in this container; "
            "pass deterministic_fake=True for the test double"
        )
    digest = hashlib.blake2b(payload, digest_size=64, key=media_type.encode()[:16]).digest()
    return (np.frombuffer(digest, dtype=np.uint32).astype(np.float32) / np.float32(2**32))[:16]


def extract_features(media: DataFrame, *, deterministic_fake: bool = True) -> DataFrame:
    """Per-blob feature extraction via mapInPandas (map-only, no shuffle)."""

    def _extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_media(bytes(p), t, deterministic_fake=deterministic_fake).tolist()
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, *, deterministic_fake: bool = True) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    (frame decode stubbed as a positional content hash)."""

    def _frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for mid, mtype, payload, meta in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"], pdf["meta"]
            ):
                if mtype != "video" or meta is None:
                    continue
                if not deterministic_fake:
                    raise NotImplementedError("video frame decode requires ffmpeg")
                dur = int(meta["duration_ms"] or 0)
                for fi in range(max(1, dur // every_ms)):
                    ids.append(mid)
                    idxs.append(fi)
                    hashes.append(
                        hashlib.blake2b(bytes(payload) + fi.to_bytes(4, "little"), digest_size=8).hexdigest()
                    )
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_hash": hashes})

    return media.mapInPandas(_frames, schema=FRAME_SCHEMA)


def synthetic_media(spark, n: int = 20, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (for tests)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 256)), dtype=np.uint8).tobytes()
        meta = (
            int(rng.integers(16, 512)),
            int(rng.integers(16, 512)),
            int(rng.integers(1000, 10000)) if mtype == "video" else 0,
            {"image": "png", "audio": "pcm", "video": "h264"}[mtype],
        )
        rows.append((i, mtype, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
