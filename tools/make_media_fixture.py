"""Generate fixtures/media_docs.parquet: real binary media payloads
(uncompressed 24-bit BMP, binary PPM/PGM, PCM WAV) plus oracle columns.

The px_count/px_sum/px_sha columns are computed from the SOURCE sample
arrays here at generation time — NOT by running the decoder — so the
driver gate (`media_decode`) pins the encode→decode round trip
byte-for-byte: Spark decodes the committed bytes with
`sources.multimodal.real_decoder` in a distributed mapInPandas pass while
the DuckDB oracle reads the committed scalars; any codec drift
hash-mismatches the gate.
"""

from __future__ import annotations

import hashlib
import struct
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def encode_bmp(rgb: np.ndarray, top_down: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BI_RGB BMP bytes."""
    assert rgb.dtype == np.uint8, rgb.dtype
    h, w, _ = rgb.shape
    row_bytes = ((24 * w + 31) // 32) * 4
    pad = row_bytes - w * 3
    bgr = rgb[:, :, ::-1]
    if not top_down:
        bgr = bgr[::-1]  # bottom-up storage
    body = b"".join(bgr[r].tobytes() + b"\x00" * pad for r in range(h))
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    return header + info + body


def encode_ppm(rgb: np.ndarray, comment: str | None = None) -> bytes:
    assert rgb.dtype == np.uint8, rgb.dtype
    h, w, _ = rgb.shape
    head = b"P6\n"
    if comment:
        head += f"# {comment}\n".encode()
    head += f"{w} {h}\n255\n".encode()
    return head + rgb.tobytes()


def encode_pgm(gray: np.ndarray) -> bytes:
    assert gray.dtype == np.uint8, gray.dtype
    h, w = gray.shape
    return f"P5\n{w} {h}\n255\n".encode() + gray.tobytes()


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    samples: np.ndarray,
    color_type: int,
    row_filters: list[int],
    palette: np.ndarray | None = None,
) -> bytes:
    """(h, w, channels) uint8 → 8-bit non-interlaced PNG, forward-filtering
    each scanline with the requested filter type (0=None 1=Sub 2=Up
    3=Average 4=Paeth) so the decoder's unfilter path is pinned per type."""
    import zlib

    assert samples.dtype == np.uint8
    h, w = samples.shape[:2]
    ch = 1 if samples.ndim == 2 else samples.shape[2]
    flat = samples.reshape(h, w * ch).astype(np.int16)
    bpp = ch
    raw = bytearray()
    for y, ftype in zip(range(h), row_filters):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros_like(cur)
        left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
        if ftype == 0:
            out = cur
        elif ftype == 1:
            out = cur - left
        elif ftype == 2:
            out = cur - prev
        elif ftype == 3:
            out = cur - ((left + prev) >> 1)
        elif ftype == 4:
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            out = cur - pred
        else:
            raise ValueError(ftype)
        raw.append(ftype)
        raw += (out % 256).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    png = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        png += _png_chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    # split IDAT in two to pin multi-chunk concatenation
    z = zlib.compress(bytes(raw), 6)
    png += _png_chunk(b"IDAT", z[: len(z) // 2])
    png += _png_chunk(b"IDAT", z[len(z) // 2 :])
    return png + _png_chunk(b"IEND", b"")


def encode_wav(samples: np.ndarray, bits: int, rate: int = 8000) -> bytes:
    if bits == 16:
        data = samples.astype("<i2").tobytes()
    else:
        data = samples.astype(np.uint8).tobytes()
    block = bits // 8
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * block, block, bits)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def main() -> None:
    rng = np.random.RandomState(20260817)
    rows = []

    # rs8 scalars pin decode → metadata reshape → 8x8 nearest resize; the
    # resize/ahash kernels are shared with the Spark ops, the decode round
    # trip is NOT — these are computed from the SOURCE arrays
    from fuzzycat_spark.sources.multimodal import ahash64, resize_nearest

    def add(mid, kind, mime, raw, expected_u8, width=None, height=None, dur=None):
        e = expected_u8.astype(np.uint8)
        rs_count = rs_sum = rs_sha = ah = None
        if kind == "image":
            rs = resize_nearest(e, height, width, 8, 8)
            rs_count = int(rs.size)
            rs_sum = int(rs.astype(np.int64).sum())
            rs_sha = hashlib.sha256(rs.tobytes()).hexdigest()
            ah = ahash64(e, height, width)
        rows.append(
            {
                "media_id": mid,
                "kind": kind,
                "mime": mime,
                "bytes": raw,
                "width": width,
                "height": height,
                "duration_ms": dur,
                "px_count": int(e.size),
                "px_sum": int(e.astype(np.int64).sum()),
                "px_sha": hashlib.sha256(e.tobytes()).hexdigest(),
                "rs8_count": rs_count,
                "rs8_sum": rs_sum,
                "rs8_sha": rs_sha,
                "ahash": ah,
            }
        )

    # 4x3 bottom-up BMP with a deterministic gradient (exercises row
    # padding: 4*3=12 bytes/row, already aligned → add a 5x2 too)
    # NOTE: % 256 on a uint8 array promotes to int16 under NEP 50 —
    # cast back to uint8 or the encoders would write 2-byte samples
    g1 = ((np.arange(4 * 3 * 3) * 7) % 256).astype(np.uint8).reshape(3, 4, 3)
    add("bmp_grad", "image", "image/bmp", encode_bmp(g1), g1.reshape(-1), 4, 3)
    # 5x2: row = 15 bytes → padded to 16 (pins the padding arithmetic)
    g2 = rng.randint(0, 256, size=(2, 5, 3), dtype=np.uint8)
    add("bmp_padded", "image", "image/bmp", encode_bmp(g2), g2.reshape(-1), 5, 2)
    # top-down (negative height) variant
    g3 = rng.randint(0, 256, size=(2, 2, 3), dtype=np.uint8)
    add("bmp_topdown", "image", "image/bmp", encode_bmp(g3, top_down=True), g3.reshape(-1), 2, 2)
    # P6 PPM with a header comment
    p1 = rng.randint(0, 256, size=(2, 3, 3), dtype=np.uint8)
    add("ppm_comment", "image", "image/x-portable-pixmap",
        encode_ppm(p1, comment="fixture"), p1.reshape(-1), 3, 2)
    # P5 PGM grayscale
    p2 = rng.randint(0, 256, size=(1, 4), dtype=np.uint8)
    add("pgm_gray", "image", "image/x-portable-graymap", encode_pgm(p2), p2.reshape(-1), 4, 1)
    # PNG: every filter type across the rows of one RGB image
    png_rgb = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    add("png_rgb_allfilters", "image", "image/png",
        encode_png(png_rgb, 2, [0, 1, 2, 3, 4]), png_rgb.reshape(-1), 4, 5)
    # grayscale with Sub/Up/Paeth
    png_g = rng.randint(0, 256, size=(3, 6), dtype=np.uint8)
    add("png_gray", "image", "image/png",
        encode_png(png_g, 0, [1, 2, 4]), png_g.reshape(-1), 6, 3)
    # RGBA (alpha kept as a 4th sample per pixel)
    png_a = rng.randint(0, 256, size=(2, 3, 4), dtype=np.uint8)
    add("png_rgba", "image", "image/png",
        encode_png(png_a, 6, [4, 3]), png_a.reshape(-1), 3, 2)
    # palette: expected samples are the PLTE-expanded RGB triples
    pal = rng.randint(0, 256, size=(7, 3), dtype=np.uint8)
    idx = rng.randint(0, 7, size=(3, 5), dtype=np.uint8)
    add("png_palette", "image", "image/png",
        encode_png(idx, 3, [0, 1, 2], palette=pal), pal[idx].reshape(-1), 5, 3)
    # gray+alpha (color type 4)
    png_ga = rng.randint(0, 256, size=(2, 4, 2), dtype=np.uint8)
    add("png_gray_alpha", "image", "image/png",
        encode_png(png_ga, 4, [2, 4]), png_ga.reshape(-1), 4, 2)
    # 16-bit PCM WAV: expected samples go through the documented
    # (x + 32768) >> 8 mapping to the 0..255 histogram range
    s16 = (np.sin(np.arange(64) / 4.0) * 20000).astype(np.int16)
    add("wav_pcm16", "audio", "audio/wav", encode_wav(s16, 16),
        ((s16.astype(np.int32) + 32768) >> 8), dur=int(64 / 8))
    # 8-bit PCM WAV with an ODD byte count (pins the word-align padding)
    s8 = rng.randint(0, 256, size=33, dtype=np.uint8)
    add("wav_pcm8", "audio", "audio/wav", encode_wav(s8, 8), s8, dur=int(33 / 8))

    # perceptual-dup family for image_ahash/image_dup_pairs: the SAME g1
    # gradient pixels in a different BMP layout and a different FORMAT
    # (identical ahash, hamming 0) plus a one-pixel tweak (hamming 6,
    # inside the default <=7 threshold); the random images above stay
    # unpaired
    add("bmp_grad_dup", "image", "image/bmp",
        encode_bmp(g1, top_down=True), g1.reshape(-1), 4, 3)
    add("png_grad", "image", "image/png",
        encode_png(g1, 2, [1, 2, 0]), g1.reshape(-1), 4, 3)
    g1t = g1.reshape(-1).astype(np.int64)
    g1t[15:18] = np.clip(g1t[15:18] + 8, 0, 255)  # pixel 5 of the 3x4 grid
    g1t = g1t.astype(np.uint8)
    add("bmp_grad_tweak", "image", "image/bmp",
        encode_bmp(g1t.reshape(3, 4, 3)), g1t, 4, 3)

    table = pa.table(
        {
            "media_id": pa.array([r["media_id"] for r in rows], pa.string()),
            "kind": pa.array([r["kind"] for r in rows], pa.string()),
            "mime": pa.array([r["mime"] for r in rows], pa.string()),
            "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
            "width": pa.array([r["width"] for r in rows], pa.int32()),
            "height": pa.array([r["height"] for r in rows], pa.int32()),
            "duration_ms": pa.array([r["duration_ms"] for r in rows], pa.int64()),
            "px_count": pa.array([r["px_count"] for r in rows], pa.int64()),
            "px_sum": pa.array([r["px_sum"] for r in rows], pa.int64()),
            "px_sha": pa.array([r["px_sha"] for r in rows], pa.string()),
            "rs8_count": pa.array([r["rs8_count"] for r in rows], pa.int64()),
            "rs8_sum": pa.array([r["rs8_sum"] for r in rows], pa.int64()),
            "rs8_sha": pa.array([r["rs8_sha"] for r in rows], pa.string()),
            "ahash": pa.array([r["ahash"] for r in rows], pa.int64()),
        }
    )
    # regeneration guard: payloads must stay byte-identical to the
    # committed fixture (the gates pin shas of decoded payload bytes)
    import os

    out_path = "/root/repo/fixtures/media_docs.parquet"
    if os.path.exists(out_path):
        old = pq.read_table(out_path).to_pydict()
        old_bytes = dict(zip(old["media_id"], old["bytes"]))
        for r in rows:
            if r["media_id"] in old_bytes:
                assert old_bytes[r["media_id"]] == r["bytes"], r["media_id"]
    pq.write_table(table, out_path)

    # per-frame audio features from the SOURCE sample arrays (kernel
    # shared with sources.multimodal.audio_frame_stats; frame_len must
    # match the gate's) — the audio analog of the rs8_* resize scalars
    from fuzzycat_spark.sources.multimodal import frame_stats_u8

    FRAME_LEN = 16
    frames = [
        (r["media_id"], idx, n, e, z)
        for r in rows
        if r["kind"] == "audio"
        for idx, n, e, z in frame_stats_u8(
            np.frombuffer(
                {"wav_pcm16": ((s16.astype(np.int32) + 32768) >> 8)
                 .astype(np.uint8).tobytes(),
                 "wav_pcm8": s8.tobytes()}[r["media_id"]],
                dtype=np.uint8,
            ),
            FRAME_LEN,
        )
    ]
    ft = pa.table(
        {
            "media_id": pa.array([f[0] for f in frames], pa.string()),
            "frame_idx": pa.array([f[1] for f in frames], pa.int32()),
            "n_samples": pa.array([f[2] for f in frames], pa.int32()),
            "energy": pa.array([f[3] for f in frames], pa.int64()),
            "zero_crossings": pa.array([f[4] for f in frames], pa.int64()),
        }
    )
    pq.write_table(ft, "/root/repo/fixtures/media_audio_frames.parquet")
    for r in rows:
        print(r["media_id"], len(r["bytes"]), "bytes →", r["px_count"], "samples")
    print(len(frames), "audio frames")


if __name__ == "__main__":
    main()
