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
        proj = np.random.RandomState(7).standard_normal((64, embedding_dim))
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            raws = pdf["bytes"].map(lambda b: bytes(b) if b is not None else b"")
            # the codec seam is inherently one media object per call; every
            # step around it is column-wise over the whole Arrow batch
            pixels = [decode(r, k) for r, k in zip(raws, pdf["kind"])]
            lens = np.fromiter((p.size for p in pixels), dtype=np.int64, count=n)
            hist = np.zeros((n, 64), dtype=np.float64)
            if lens.sum() > 0:
                # ragged batch histogram in one bincount: flatten all pixel
                # arrays, bucket to 64 bins, offset each row's bins by row*64
                flat = np.concatenate(pixels)
                row_idx = np.repeat(np.arange(n), lens)
                bins = np.clip(flat.astype(np.int64) >> 2, 0, 63)
                hist = (
                    np.bincount(row_idx * 64 + bins, minlength=n * 64)
                    .reshape(n, 64)
                    .astype(np.float64)
                )
            hist /= np.maximum(hist.sum(axis=1, keepdims=True), 1.0)
            emb = (hist @ proj).astype(np.float32)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "content_sha": raws.map(lambda r: hashlib.sha256(r).hexdigest()),
                    "n_bytes": raws.map(len).astype("int64"),
                    "embedding": list(emb),
                },
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

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
            n = len(pdf)
            if n == 0:
                continue
            dur = pdf["duration_ms"].fillna(0).astype("int64").to_numpy()
            shas = pdf["bytes"].map(
                lambda b: hashlib.sha256(bytes(b) if b is not None else b"").hexdigest()[:16]
            ).to_numpy()
            # frames per video = ceil(max(dur,1)/every_ms); the whole batch
            # schedule is one repeat + one offset arange, no per-row loop
            n_frames = np.maximum((dur + every_ms - 1) // every_ms, 1)
            total = int(n_frames.sum())
            starts = np.concatenate(([0], np.cumsum(n_frames)[:-1]))
            ts = (np.arange(total) - np.repeat(starts, n_frames)) * every_ms
            refs = pd.Series(np.repeat(shas, n_frames)).str.cat(
                pd.Series(ts).astype(str), sep="@"
            )
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(pdf["media_id"].to_numpy(), n_frames),
                    "frame_ts_ms": ts.astype("int64"),
                    "frame_ref": refs.to_numpy(),
                },
                columns=[f.name for f in out_schema.fields],
            )

    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "duration_ms", "bytes"
    )
    return vids.mapInPandas(run, out_schema)
