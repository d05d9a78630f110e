"""Generate fixtures/embeddings_planted.parquet — an embeddings table with
PLANTED structure so the ANN/embedding gates run non-vacuously at the
production threshold (round-4 VERDICT Next #6) and actually exercise the
bucket cap (round-4 ADVICE):

- 5 near-duplicate families x 4 vectors with pairwise cosine > 0.9 that
  share one hyperplane bucket (verified against the package's own
  hyperplane_planes(dim=64, n_planes=8, seed=42)) — cluster formation at
  embedding_strong=0.9 is provable, not empty-set agreement;
- one 210-copy IDENTICAL vector (mega bucket, > max_bucket_size=200):
  its C(210,2) cosine-1.0 pairs MUST be excluded by the cap on both
  engines — an oracle without the cap mirrored diverges by ~22k rows;
- 40 random unit fillers (pairwise cosine well under the threshold).

Determinism: numpy PCG with a fixed seed; family/bucket/margin invariants
are asserted at generation time (resampled deterministically until they
hold), then the parquet is committed — the fixture, not the script, is
the gate input.

Run: python tools/make_planted_embeddings.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fuzzycat_spark.operators.knn import hyperplane_planes

DIM = 64
N_PLANES = 8
SEED = 42
N_FAMILIES = 5
FAMILY_SIZE = 4
MEGA_COPIES = 210
N_FILLER = 40
OUT = os.path.join(
    os.path.dirname(__file__), "..", "fixtures", "embeddings_planted.parquet"
)


def bucket_of(v: np.ndarray, planes: np.ndarray) -> str:
    dots = planes @ v
    assert np.min(np.abs(dots)) > 1e-3, "sign-margin too small for cross-engine safety"
    return "".join("1" if d >= 0 else "0" for d in dots)


def unit(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


def main() -> None:
    rng = np.random.default_rng(20260817)
    planes = np.array(hyperplane_planes(DIM, N_PLANES, seed=SEED), dtype=np.float64)

    vecs: list[np.ndarray] = []
    fam_buckets: set[str] = set()
    for _ in range(N_FAMILIES):
        while True:
            base = unit(rng.normal(size=DIM))
            # noise std 0.02 -> noise-vector norm ~0.16 at dim 64 ->
            # pairwise member cosine ~0.97 (std 0.08 put it at ~0.71,
            # below the 0.92 floor — unreachable)
            members = [
                unit(base + 0.02 * rng.normal(size=DIM)) for _ in range(FAMILY_SIZE)
            ]
            try:
                buckets = {bucket_of(m, planes) for m in members}
            except AssertionError:
                continue
            cosines = [
                float(a @ b) for i, a in enumerate(members) for b in members[i + 1:]
            ]
            if len(buckets) == 1 and min(cosines) > 0.92 and buckets.isdisjoint(fam_buckets):
                fam_buckets.add(next(iter(buckets)))
                vecs.extend(members)
                break

    while True:
        mega = unit(rng.normal(size=DIM))
        try:
            mb = bucket_of(mega, planes)
        except AssertionError:
            continue
        if mb not in fam_buckets:
            break
    vecs.extend([mega] * MEGA_COPIES)

    fillers: list[np.ndarray] = []
    while len(fillers) < N_FILLER:
        f = unit(rng.normal(size=DIM))
        try:
            fb = bucket_of(f, planes)
        except AssertionError:
            continue
        # fillers may share any bucket EXCEPT the mega one (the mega bucket
        # must stay exactly MEGA_COPIES so its size is stable) and must sit
        # far from every planted family (no accidental >=0.9 pair)
        if fb == mb:
            continue
        if all(abs(float(f @ v)) < 0.5 for v in vecs[: N_FAMILIES * FAMILY_SIZE]):
            if all(abs(float(f @ g)) < 0.5 for g in fillers):
                fillers.append(f)
    vecs.extend(fillers)

    arr = np.array(vecs, dtype=np.float32)
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in arr], pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(table, os.path.abspath(OUT))
    n_mega_bucket = sum(
        1 for v in arr if bucket_of(v.astype(np.float64), planes) == mb
    )
    assert n_mega_bucket == MEGA_COPIES, n_mega_bucket
    print(
        f"wrote {len(vecs)} vectors -> {os.path.abspath(OUT)} "
        f"(families={N_FAMILIES}x{FAMILY_SIZE}, mega={MEGA_COPIES} in bucket {mb})"
    )


if __name__ == "__main__":
    main()
