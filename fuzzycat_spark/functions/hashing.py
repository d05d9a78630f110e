"""Hashing kernels: content hashes, MinHash signatures, SimHash fingerprints.

Two implementations per sketch:
- **Native Catalyst** (`minhash_signature_sql`, `simhash32`) — md5-based,
  JVM-side, whole-stage codegen, bit-for-bit reproducible in DuckDB for the
  correctness oracle.
- **Vectorized pandas UDF** (`minhash_signature_udf`) — one md5 per shingle
  then k derived permutations via numpy broadcast ((a_i*h + b_i) mod p),
  the classic Broder construction; Arrow-batched for the 100 TB path where
  k native md5 calls per shingle would dominate.

Reference semantics being generalized: fuzzycat blocks on a single
normalized key (`/root/reference/fuzzycat/sandcrawler.py:66-90` via
`notes/old_pipeline.md:19-23`); MinHash/SimHash band keys are the
north-star replacement for that sorted-key slab clustering.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

# Mersenne prime 2^61-1: (a*h+b) mod p stays in uint64/float-free numpy math
_MERSENNE_P = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def content_hash(col: Column | str) -> Column:
    """md5 of raw bytes — the exact-duplicate key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("binary"))


def minhash_signature_sql(shingles: Column, k: int = 16) -> Column:
    """MinHash signature as array<string>: sig[i] = min(md5(i || ':' || s)).

    Pure Catalyst. k independent md5 families indexed by seed prefix; min of
    a uniform hash per family is the standard one-hash-per-family MinHash.
    Empty shingle sets → array of md5(i || ':') sentinels (deterministic,
    collides only with other empty docs).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.when(F.size(shingles) == 0,
                         F.md5(F.concat(i.cast("string"), F.lit(":")).cast("binary")))
        .otherwise(
            F.array_min(
                F.transform(
                    shingles,
                    lambda s: F.md5(
                        F.concat(i.cast("string"), F.lit(":"), s).cast("binary")
                    ),
                )
            )
        ),
    )


def minhash_signature_udf(k: int = 16, seed: int = 42):
    """Vectorized MinHash over an array<string> shingle column.

    Returns a pandas UDF producing array<long> of length k. One md5 per
    shingle (C-speed hashlib), then all k permutations in a single numpy
    (k, n_shingles) broadcast + min — no per-permutation rehash.
    """
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE_P, size=k, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE_P, size=k, dtype=np.uint64)
    empty_sig = ((a * np.uint64(0) + b) % np.uint64(_MERSENNE_P) & np.uint64(_MAX_HASH)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def _minhash(shingle_series: pd.Series) -> pd.Series:
        out = []
        for shingles in shingle_series:
            if shingles is None or not isinstance(shingles, (list, np.ndarray)) or len(shingles) == 0:
                out.append(empty_sig)
                continue
            base = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
                    for s in shingles
                ),
                dtype=np.uint64,
                count=len(shingles),
            )
            # (k, n) broadcast: permute every shingle hash under all k families
            perms = (a[:, None] * base[None, :] + b[:, None]) % np.uint64(_MERSENNE_P)
            sig = (perms.min(axis=1) & np.uint64(_MAX_HASH)).astype(np.int64)
            out.append(sig)
        return pd.Series(out)

    return _minhash


def lsh_band_keys(sig: Column, bands: int, rows: int) -> Column:
    """Compress a signature into `bands` band-hash strings.

    band_key[b] = md5 of the b-th slice of `rows` signature entries.
    Explode downstream with posexplode → (band_id, band_hash) join keys.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(
            F.concat_ws("|", F.transform(F.slice(sig, b * rows + 1, rows),
                                         lambda x: x.cast("string"))).cast("binary")
        ),
    )


def _hex2long_expr(c: Column) -> Column:
    """First 8 hex chars of an md5 string → long (0..2^32-1). conv() is
    JVM-native; DuckDB oracle mirrors it with positional hex arithmetic."""
    return F.conv(F.substring(c, 1, 8), 16, 10).cast("long")


def simhash32(tokens: Column) -> Column:
    """32-bit SimHash over a token array (duplicates = term-frequency weight).

    Single Catalyst expression: per-token 32-bit hash from md5, per-bit ±1
    votes folded with aggregate(zip_with(...)), sign → bits. Empty → -1.
    """
    hashes = F.transform(tokens, lambda t: _hex2long_expr(F.md5(t.cast("binary"))))
    zero = F.lit(0).cast("long")
    # one aggregate pass per bit; bit index j is a Python int so shiftright
    # stays a static JVM expression
    def _vote_merge(j: int):
        def merge(acc, h):
            return acc + F.when(
                F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return merge

    fp = None
    for j in range(32):
        vote = F.aggregate(hashes, zero, _vote_merge(j))
        bit = F.when(vote > 0, F.lit(1 << j).cast("long")).otherwise(zero)
        fp = bit if fp is None else fp + bit
    return (
        F.when(tokens.isNull(), F.lit(None).cast("long"))
        .when(F.size(tokens) == 0, F.lit(-1).cast("long"))
        .otherwise(fp)
    )


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance between two 32-bit fingerprints stored as long."""
    x = a.bitwiseXOR(b)
    out = None
    for j in range(32):
        bit = F.shiftright(x, j).bitwiseAND(F.lit(1))
        out = bit if out is None else out + bit
    return out.cast("int")


__all__ = [
    "content_hash",
    "minhash_signature_sql",
    "minhash_signature_udf",
    "lsh_band_keys",
    "simhash32",
    "hamming32",
]
