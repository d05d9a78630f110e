"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A training-data pipeline at 100 TB carries media payloads next to text.
This module provides the Spark-side plumbing — schemas, Arrow-batched
`mapInPandas` transforms, partition-size guidance — with the codec step
behind a clear seam: `decode=` accepts an injectable codec. `real_decoder`
is a genuine pure-byte codec for the formats that need no external
library (uncompressed 24-bit BMP, binary PPM/PGM, PCM WAV, and 8-bit
non-interlaced PNG — zlib inflate + scanline unfiltering, stdlib only);
JPEG/MP4 still require PIL/ffmpeg, which are not in this container —
`strict_decoder` and `real_decoder`'s unknown-magic branch raise
NotImplementedError to mark that integration point. `deterministic_fake_decoder` derives reproducible pseudo-content
from the bytes so tests can exercise the distributed path on arbitrary
payloads.

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


def _decode_bmp(raw: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) → flat float32
    pixel samples in top-down, row-major, R,G,B order, values 0..255.
    Pure byte parsing: file header offset, int32 dims (negative height =
    top-down storage), 4-byte row padding, per-pixel BGR → RGB swap."""
    if len(raw) < 54:
        raise ValueError("BMP truncated: missing header")
    off = int.from_bytes(raw[10:14], "little")
    width = int.from_bytes(raw[18:22], "little", signed=True)
    height = int.from_bytes(raw[22:26], "little", signed=True)
    bpp = int.from_bytes(raw[28:30], "little")
    compression = int.from_bytes(raw[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP is supported (bpp={bpp}, "
            f"compression={compression})"
        )
    if width <= 0 or height == 0:
        raise ValueError(f"BMP has degenerate dimensions {width}x{height}")
    top_down = height < 0
    height = abs(height)
    row_bytes = ((bpp * width + 31) // 32) * 4
    need = off + row_bytes * height
    if len(raw) < need:
        raise ValueError(f"BMP truncated: {len(raw)} bytes, need {need}")
    rows = (
        np.frombuffer(raw, dtype=np.uint8, count=row_bytes * height, offset=off)
        .reshape(height, row_bytes)[:, : width * 3]
        .reshape(height, width, 3)
    )
    if not top_down:
        rows = rows[::-1]  # stored bottom-up
    return rows[:, :, ::-1].reshape(-1).astype(np.float32)  # BGR → RGB


def _decode_pnm(raw: bytes) -> np.ndarray:
    """Binary PPM (P6, RGB) / PGM (P5, gray) → flat float32 samples 0..255.
    Header is whitespace-separated ASCII tokens with '#' comments; one
    whitespace byte separates the maxval from the raster."""
    magic = raw[:2]
    if magic not in (b"P5", b"P6"):
        raise NotImplementedError(f"unsupported PNM magic {magic!r}")
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(raw):
            raise ValueError("PNM truncated: incomplete header")
        c = raw[pos : pos + 1]
        if c == b"#":  # comment to end of line
            while pos < len(raw) and raw[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(raw) and not raw[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(raw[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise NotImplementedError(f"PNM maxval {maxval} > 255 (2-byte samples)")
    n = width * height * (3 if magic == b"P6" else 1)
    if len(raw) < pos + n:
        raise ValueError(f"PNM truncated: {len(raw)} bytes, need {pos + n}")
    return np.frombuffer(raw, dtype=np.uint8, count=n, offset=pos).astype(
        np.float32
    )


def _decode_wav(raw: bytes) -> np.ndarray:
    """PCM RIFF/WAVE (8- or 16-bit) → flat float32 samples scaled 0..255
    (16-bit samples map through (x + 32768) >> 8 so the downstream 64-bin
    histogram sees the same value range as image pixels)."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = int.from_bytes(raw[pos + 4 : pos + 8], "little")
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise NotImplementedError(f"only PCM WAV supported (format={audio_format})")
    if bits == 8:
        return np.frombuffer(data, dtype=np.uint8).astype(np.float32)
    if bits == 16:
        x = np.frombuffer(data[: len(data) & ~1], dtype="<i2").astype(np.int32)
        return ((x + 32768) >> 8).astype(np.float32)
    raise NotImplementedError(f"unsupported WAV bit depth {bits}")


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel at bit depth 8
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(data: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Reverse the per-scanline PNG filters (types 0-4). Sequential by
    spec — Sub/Average/Paeth reference the reconstructed left neighbor —
    so this is a plain byte loop; fixture/thumbnail-sized images in this
    container, swap a C codec in via `decode=` for full-size corpora."""
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = data[pos]
        line = data[pos + 1 : pos + 1 + stride]
        pos += 1 + stride
        row_off = y * stride
        prev_off = row_off - stride
        for x in range(stride):
            a = out[row_off + x - bpp] if x >= bpp else 0  # left
            b = out[prev_off + x] if y > 0 else 0  # up
            if ftype == 0:
                v = line[x]
            elif ftype == 1:
                v = line[x] + a
            elif ftype == 2:
                v = line[x] + b
            elif ftype == 3:
                v = line[x] + ((a + b) >> 1)
            elif ftype == 4:
                c = out[prev_off + x - bpp] if (x >= bpp and y > 0) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = line[x] + pred
            else:
                raise ValueError(f"bad PNG filter type {ftype} on row {y}")
            out[row_off + x] = v & 0xFF
    return out


def _decode_png(raw: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (zlib inflate + scanline unfiltering) →
    flat float32 samples 0..255. Supports bit depth 8, color types
    0/2/3/4/6 (gray, RGB, palette, gray+alpha, RGBA), non-interlaced —
    the shapes crawl thumbnails actually take. Palette indices expand
    through PLTE to RGB so the sample contract matches the other image
    codecs."""
    import zlib

    if raw[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(raw):
        length = int.from_bytes(raw[pos : pos + 4], "big")
        ctype = raw[pos + 4 : pos + 8]
        body = raw[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError(f"PNG truncated inside {ctype!r} chunk")
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, _comp, _filt, interlace = ihdr[8:13]
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG depth={bit_depth} color={color_type} interlace={interlace}"
            " unsupported (8-bit non-interlaced gray/RGB/palette/alpha only)"
        )
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    data = zlib.decompress(b"".join(idat))
    if len(data) != height * (stride + 1):
        raise ValueError(
            f"PNG pixel data {len(data)}B != {height}x(1+{stride})B"
        )
    flat = _png_unfilter(data, height, stride, bpp=channels)
    arr = np.frombuffer(bytes(flat), dtype=np.uint8)
    if color_type == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG missing/odd PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if int(arr.max(initial=0)) >= len(pal):
            raise ValueError("PNG palette index out of range")
        arr = pal[arr].reshape(-1)
    return arr.astype(np.float32)


def real_decoder(raw: bytes, kind: str) -> np.ndarray:
    """Real deterministic codec for the formats decodable without any
    external library — uncompressed BMP, binary PPM/PGM, PCM WAV, and
    8-bit non-interlaced PNG (zlib is stdlib) — chosen by magic bytes.
    JPEG/MP4/... still raise NotImplementedError: THAT remains the
    PIL/ffmpeg integration seam, but the decode step itself is no longer
    a stub. Output is always a flat float32 array of 0..255 samples, the
    contract the feature histogram consumes."""
    if raw[:2] == b"BM":
        return _decode_bmp(raw)
    if raw[:2] in (b"P5", b"P6"):
        return _decode_pnm(raw)
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        return _decode_wav(raw)
    if raw[:8] == _PNG_SIG:
        return _decode_png(raw)
    raise NotImplementedError(
        f"no built-in codec for this payload (kind={kind}, "
        f"magic={raw[:4]!r}); plug PIL/ffmpeg via "
        "extract_media_features(decode=...)"
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


DECODE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("px_count", LongType(), False),
        StructField("px_sum", LongType(), False),
        StructField("px_sha", StringType(), False),
    ]
)


def decode_media_stats(
    media: DataFrame,
    decode: Callable[[bytes, str], "np.ndarray"] = real_decoder,
) -> DataFrame:
    """Distributed decode audit: per media object, the decoded sample
    count, sum, and sha256 of the uint8 sample bytes — scalar invariants
    that pin the codec byte-for-byte. The driver gate compares these
    against stats precomputed from the SOURCE pixel arrays at
    fixture-generation time (tools/make_media_fixture.py), so encoder →
    committed bytes → `real_decoder` round-trips exactly or the gate
    hash-mismatches. Same narrow-projection discipline as
    extract_media_features: bytes never cross a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for mid, b, k in zip(pdf["media_id"], pdf["bytes"], pdf["kind"]):
                px = decode(bytes(b) if b is not None else b"", k).astype(np.uint8)
                out.append(
                    (
                        mid,
                        int(px.size),
                        int(px.astype(np.int64).sum()),
                        hashlib.sha256(px.tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in DECODE_STATS_SCHEMA.fields]
            )

    return media.select("media_id", "kind", "bytes").mapInPandas(
        run, DECODE_STATS_SCHEMA
    )


AUDIO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("n_samples", IntegerType(), False),
        StructField("energy", LongType(), False),
        StructField("zero_crossings", LongType(), False),
    ]
)


def frame_stats_u8(samples: "np.ndarray", frame_len: int) -> list[tuple]:
    """Per-frame (frame_idx, n_samples, energy, zero_crossings) over a
    flat uint8 sample stream cut into non-overlapping frames (the last
    partial frame is kept). Integer-only so any engine reproduces the
    values exactly:

    - energy = sum of (x - 128)^2 — signal power about the 8-bit
      midline the WAV decode maps onto;
    - zero_crossings = adjacent sign flips of (x - 128) with >= 128
      counted positive (a crude pitch/noisiness proxy — the classic
      cheap audio feature pair).

    Shared by the Spark operator AND the fixture generator so the gate
    pins decode → framing → features end to end (the decode round trip
    itself is pinned by `media_decode`)."""
    x = samples.astype(np.int64) - 128
    out = []
    for i in range(0, len(x), frame_len):
        fr = x[i : i + frame_len]
        pos = fr >= 0
        out.append(
            (
                i // frame_len,
                int(fr.size),
                int((fr * fr).sum()),
                int((pos[1:] != pos[:-1]).sum()),
            )
        )
    return out


def audio_frame_stats(
    media: DataFrame,
    frame_len: int = 16,
    decode: Callable[[bytes, str], "np.ndarray"] = real_decoder,
) -> DataFrame:
    """Frame-level audio features over the audio rows of a media table:
    decode each PCM payload, cut into `frame_len`-sample frames, emit
    integer energy + zero-crossing counts per frame (see
    `frame_stats_u8`). Non-audio rows are excluded before the decode
    (no grid/stream semantics to frame). Same narrow-projection
    discipline as the other media passes: bytes never cross a shuffle,
    one Arrow batch in → feature rows out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for mid, b, k in zip(pdf["media_id"], pdf["bytes"], pdf["kind"]):
                px = decode(bytes(b) if b is not None else b"", k).astype(
                    np.uint8
                )
                out.extend(
                    (mid, idx, n, e, z)
                    for idx, n, e, z in frame_stats_u8(px, frame_len)
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FRAME_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "kind", "bytes")
        .mapInPandas(run, AUDIO_FRAME_SCHEMA)
    )


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


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("rs_count", LongType(), False),
        StructField("rs_sum", LongType(), False),
        StructField("rs_sha", StringType(), False),
    ]
)


def resize_nearest(
    samples: "np.ndarray", src_h: int, src_w: int, out_h: int, out_w: int
) -> "np.ndarray":
    """Nearest-neighbor resize of a FLAT uint8 sample array (the decoder
    contract) to (out_h, out_w), channels inferred from the sample count.
    Index map is the floor grid yi = y*src_h // out_h — deterministic,
    integer-only, no half-pixel centers, so the fixture generator can pin
    the result from source arrays. Raises when the sample count is not an
    exact multiple of src_h*src_w (bad table metadata must fail loudly,
    not silently misinterpret pixels)."""
    a = np.asarray(samples).astype(np.uint8).reshape(-1)
    if src_h <= 0 or src_w <= 0:
        raise ValueError(f"degenerate source dims {src_w}x{src_h}")
    if out_h <= 0 or out_w <= 0:
        raise ValueError(f"degenerate target dims {out_w}x{out_h}")
    if a.size % (src_h * src_w):
        raise ValueError(
            f"{a.size} samples do not tile {src_w}x{src_h}: metadata and "
            "payload disagree"
        )
    ch = a.size // (src_h * src_w)
    img = a.reshape(src_h, src_w, ch)
    yi = (np.arange(out_h, dtype=np.int64) * src_h) // out_h
    xi = (np.arange(out_w, dtype=np.int64) * src_w) // out_w
    return img[yi][:, xi].reshape(-1)


def ahash64(samples: "np.ndarray", src_h: int, src_w: int) -> int:
    """64-bit average perceptual hash of a FLAT uint8 sample array:
    integer grayscale ((r+g+b) DIV 3 for >=3 channels, channel 0
    otherwise — alpha ignored), nearest-neighbor resize to 8x8 on the
    shared floor grid, then bit i set iff pixel i exceeds the integer
    mean (strict, ties clear). Every step is integer-only and shared
    with the fixture generator, so the gate pins decode → gray →
    resize → threshold end to end. Returned as SIGNED int64 (two's
    complement wrap) to match the Spark/DuckDB long columns it lands
    in. Same image in a different container (BMP vs PNG, bottom-up vs
    top-down) hashes identically; small pixel edits flip few bits."""
    a = np.asarray(samples).astype(np.uint8).reshape(-1)
    if a.size % (src_h * src_w):
        raise ValueError(
            f"{a.size} samples do not tile {src_w}x{src_h}: metadata and "
            "payload disagree"
        )
    ch = a.size // (src_h * src_w)
    img = a.reshape(src_h, src_w, ch).astype(np.int64)
    if ch >= 3:
        gray = (img[:, :, 0] + img[:, :, 1] + img[:, :, 2]) // 3
    else:
        gray = img[:, :, 0]
    rs = resize_nearest(
        gray.astype(np.uint8).reshape(-1), src_h, src_w, 8, 8
    ).astype(np.int64)
    m = int(rs.sum()) // 64
    h = 0
    for bit in (rs > m).astype(np.int64):
        h = (h << 1) | int(bit)
    return h - (1 << 64) if h >= 1 << 63 else h


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("ahash", LongType(), False),
    ]
)


def image_ahash(
    media: DataFrame,
    decode: Callable[[bytes, str], "np.ndarray"] = real_decoder,
) -> DataFrame:
    """(media_id, ahash) for the image rows: decode each payload and
    hash through `ahash64` with the TABLE's width/height metadata.
    Non-image rows are excluded (no 2-D grid)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for mid, b, k, w, h in zip(
                pdf["media_id"], pdf["bytes"], pdf["kind"], pdf["width"],
                pdf["height"],
            ):
                px = decode(bytes(b) if b is not None else b"", k)
                out.append((mid, ahash64(px, int(h), int(w))))
            yield pd.DataFrame(
                out, columns=[f.name for f in AHASH_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "kind", "bytes", "width", "height")
        .mapInPandas(run, AHASH_SCHEMA)
    )


# signed-int64 value of mask 0xFF << (8*i): band equality compares the
# MASKED hash, never a shifted one — arithmetic vs logical right shift
# differs between engines on negative hashes, & does not
_AHASH_BAND_MASKS = [
    (m - (1 << 64)) if (m := 255 << (8 * i)) >= 1 << 63 else m
    for i in range(8)
]


def image_dup_pairs(
    media: DataFrame,
    max_hamming: int = 7,
    decode: Callable[[bytes, str], "np.ndarray"] = real_decoder,
    max_bucket_size: int | None = 200,
) -> DataFrame:
    """Perceptual near-duplicate image pairs: (id_a, id_b, hamming)
    with hamming(ahash_a, ahash_b) <= max_hamming. Candidates come
    from 8x 8-bit band equality through the shared capped band
    machinery (`lsh.lsh_candidate_pairs`, band_id='ah<i>'): a pair
    within hamming <= 7 differs in at most 7 of the 8 bytes, so at
    least one band matches — exact recall at the default threshold,
    and a boilerplate mega-bucket (e.g. a blank-image farm) is
    cap-excluded, not exploded. Only (id, 8-byte hash) rows ride the
    shuffles; pixels never leave the decode pass — and the decode pass
    itself runs ONCE: the hash table feeds three plan branches (band
    explode + both join-backs), so it is materialized through the
    ephemeral parquet checkpoint before fan-out."""
    from fuzzycat_spark.operators.lsh import lsh_candidate_pairs
    from fuzzycat_spark.plans.checkpoint import materialize

    ah = materialize(image_ahash(media, decode=decode), "image_ahash")
    bands = ah.select(
        F.col("media_id").alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"ah{i}").alias("band_id"),
                        (F.col("ahash").bitwiseAND(F.lit(mask)))
                        .cast("string")
                        .alias("band_hash"),
                    )
                    for i, mask in enumerate(_AHASH_BAND_MASKS)
                ]
            )
        ).alias("b"),
    ).select("id", "b.band_id", "b.band_hash")
    cand = lsh_candidate_pairs(bands, max_bucket_size)
    return (
        cand.join(
            ah.select(
                F.col("media_id").alias("id_a"), F.col("ahash").alias("_ha")
            ),
            on="id_a",
        )
        .join(
            ah.select(
                F.col("media_id").alias("id_b"), F.col("ahash").alias("_hb")
            ),
            on="id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def resize_media(
    media: DataFrame,
    out_h: int = 8,
    out_w: int = 8,
    decode: Callable[[bytes, str], "np.ndarray"] = real_decoder,
) -> DataFrame:
    """Distributed image resize audit: decode each image payload, reshape
    the flat samples with the TABLE's width/height metadata, resize
    nearest-neighbor to (out_h, out_w), and emit scalar invariants
    (count/sum/sha of the resized uint8 samples). The driver gate compares
    these against scalars precomputed from the SOURCE pixel arrays at
    fixture-generation time, pinning decode → metadata reshape → resize
    end to end. Images only (audio/video have no 2-D grid); bytes never
    cross a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for mid, b, k, w, h in zip(
                pdf["media_id"], pdf["bytes"], pdf["kind"],
                pdf["width"], pdf["height"],
            ):
                px = decode(bytes(b) if b is not None else b"", k)
                rs = resize_nearest(px, int(h), int(w), out_h, out_w)
                out.append(
                    (
                        mid,
                        int(rs.size),
                        int(rs.astype(np.int64).sum()),
                        hashlib.sha256(rs.tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    imgs = media.filter(F.col("kind") == "image").select(
        "media_id", "kind", "bytes", "width", "height"
    )
    return imgs.mapInPandas(run, RESIZE_SCHEMA)
