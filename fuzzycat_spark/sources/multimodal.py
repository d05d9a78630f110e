"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A training-data pipeline at 100 TB carries media payloads next to text.
This module provides the Spark-side plumbing — schemas, Arrow-batched
`mapInPandas` transforms, partition-size guidance — with the codec step
behind a clear seam: the actual decoders (PIL/ffmpeg) are NOT in this
container, so `decode=` accepts an injectable codec; the default
`deterministic_fake_decoder` derives reproducible pseudo-content from the
bytes (tests exercise the full distributed path), and `strict_decoder`
raises NotImplementedError to mark the production integration point.

Design rules for binary columns at scale (mirrors SURVEY §4's "never carry
html through a shuffle"):
- media bytes are projected out before every shuffle; only (id, features)
  move
- batch sizes are rows-based (arrow maxRecordsPerBatch) — tune down for
  large media
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("bytes", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("content_sha", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ]
)


def strict_decoder(raw: bytes, kind: str) -> np.ndarray:
    """Production integration point: plug PIL/ffmpeg here."""
    raise NotImplementedError(
        f"no media codec available in this environment (kind={kind}); "
        "inject a decoder via extract_media_features(decode=...)"
    )


def deterministic_fake_decoder(raw: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in: pseudo-pixels seeded by the content hash.
    Lets the full distributed pipeline (batching, schema, feature math) run
    and be asserted on without real codecs."""
    seed = int.from_bytes(hashlib.md5(raw).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=256, dtype=np.uint8).astype(np.float32)


def extract_media_features(
    media: DataFrame,
    decode: Callable[[bytes, str], "np.ndarray"] = deterministic_fake_decoder,
    embedding_dim: int = 16,
) -> DataFrame:
    """media table → (media_id, content_sha, n_bytes, embedding).

    Arrow-batched mapInPandas: decode → byte-histogram projection → a
    fixed-dim embedding. The embedding math (histogram + projection) is the
    real pipeline; only `decode` is environment-dependent.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proj = None
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                raw = bytes(r["bytes"]) if r["bytes"] is not None else b""
                px = decode(raw, r["kind"])
                hist, _ = np.histogram(px, bins=64, range=(0, 256))
                hist = hist.astype(np.float64)
                hist /= max(hist.sum(), 1.0)
                if proj is None or proj.shape[1] != embedding_dim:
                    proj = np.random.RandomState(7).standard_normal((64, embedding_dim))
                emb = (hist @ proj).astype(np.float32)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "content_sha": hashlib.sha256(raw).hexdigest(),
                        "n_bytes": len(raw),
                        "embedding": emb,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    narrow = media.select("media_id", "kind", "bytes")
    return narrow.mapInPandas(run, FEATURE_SCHEMA)


def sample_video_frames(
    media: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp with
    the frame bytes left to the decoder seam. Real implementation would
    seek with ffmpeg; here the schedule (the Spark-side part) is real and
    the frame extraction returns the content hash as a placeholder."""
    out_schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("frame_ts_ms", LongType(), False),
            StructField("frame_ref", StringType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                dur = int(r["duration_ms"] or 0)
                sha = hashlib.sha256(bytes(r["bytes"] or b"")).hexdigest()[:16]
                for ts in range(0, max(dur, 1), every_ms):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_ts_ms": ts,
                            "frame_ref": f"{sha}@{ts}",
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "duration_ms", "bytes"
    )
    return vids.mapInPandas(run, out_schema)
