"""Measure recall@k of every approximate-nearest-neighbor path against
exact brute force.

Recall is tie-aware (the standard ANN-benchmark definition): a retrieved
neighbor counts as a hit iff its TRUE distance/similarity is at least as
good as the TRUE k-th neighbor's — with duplicate-heavy corpora (the
planted fixture's 210-copy family) any member of a tied shell is as good
as any other, and naive id-set intersection would punish correct
answers. For the compressed-domain paths (PQ ADC, IVFADC) the returned
`adist` is a reconstruction ESTIMATE, so hits are judged by re-computing
the true metric for every retrieved id, never by the estimate itself.

Hyperplane LSH runs UNCAPPED here (max_bucket_size=None) so the number
is the algorithm's recall — in production the bucket cap deliberately
drops mega-buckets from the ANN path because key-equality star edges
already link those families exactly.

Cosine-metric paths (hyperplane LSH, multiprobe, IVF) are scored against
exact cosine top-k; compressed-domain paths against exact integer
squared-L2 top-k over the SAME quantized vectors — each method is judged
on the metric it actually ranks by. Ground truth and per-pair true
metrics come from numpy over the collected table (this is a measurement
tool for gate-scale corpora; the operators under test run in Spark).

Usage: python tools/measure_ann_recall.py [emb_path] [k] [n_probes]
  emb_path: parquet with (vec_id, embedding) — a testdata sf dir's
  embeddings.parquet (random vectors: the ADVERSARIAL case, neighbors
  are near-orthogonal so bucketing has little signal) or
  fixtures/embeddings_planted.parquet (real near-dup families: the case
  the dedup pipeline actually runs on).
Prints one JSON line: {"k":..., "n_probes":..., "recall": {...}}.
"""

from __future__ import annotations

import json
import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from fuzzycat_spark import get_spark  # noqa: E402


def _recall(pairs, kth, true_metric, better_or_equal, k):
    """pairs: iterable of (probe_id, neighbor_id). Hit iff the TRUE
    metric of the pair is at least as good as the probe's true k-th."""
    hits = {}
    for p, n in pairs:
        if p in kth and better_or_equal(true_metric(p, n), kth[p]):
            hits[p] = hits.get(p, 0) + 1
    return sum(min(h, k) for h in hits.values()) / (len(kth) * k)


def main():
    emb_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/testdata/sf0.01/embeddings.parquet"
    )
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_probes = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    from fuzzycat_spark.operators.knn import (
        hyperplane_knn,
        ivf_centroids,
        ivf_knn,
    )
    from fuzzycat_spark.operators.pq import ivfadc_knn, pq_knn

    spark = get_spark(cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(emb_path).select("vec_id", "embedding")
    dim = emb.select(F.size("embedding")).first()[0]
    probes = emb.filter(F.col("vec_id") < n_probes)
    probe_ids = probes.select("vec_id")

    # ground truth in numpy over the collected table
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    idx = {v: i for i, v in enumerate(ids)}
    norms = np.linalg.norm(V, axis=1)
    Q = np.floor(V * 1_000_000).astype(np.int64)  # the operators' quantization
    plist = sorted(v for v in ids if v < n_probes)

    def true_cos(p, n):
        a, b = idx[p], idx[n]
        return float(V[a] @ V[b] / (norms[a] * norms[b]))

    def true_l2(p, n):
        d = Q[idx[p]] - Q[idx[n]]
        return int(d @ d)

    cos_kth, l2_kth = {}, {}
    for p in plist:
        others = [v for v in ids if v != p]
        cs = sorted((true_cos(p, n) for n in others), reverse=True)
        ds = sorted(true_l2(p, n) for n in others)
        cos_kth[p] = cs[min(k, len(cs)) - 1]
        l2_kth[p] = ds[min(k, len(ds)) - 1]

    ge = lambda a, b: a >= b - 1e-12  # noqa: E731  (cosine: bigger is better)
    le = lambda a, b: a <= b  # noqa: E731  (distance: smaller is better)

    def pairs(df, ncol):
        return [(r.probe_id, r[ncol]) for r in df.collect()]

    recall = {}
    recall["hyperplane_lsh_p10"] = _recall(
        pairs(hyperplane_knn(probes, emb, k=k, n_planes=10, dim=dim,
                             max_bucket_size=None), "neighbor_id"),
        cos_kth, true_cos, ge, k,
    )
    recall["hyperplane_multiprobe_p10"] = _recall(
        pairs(hyperplane_knn(probes, emb, k=k, n_planes=10, dim=dim,
                             multiprobe=1, max_bucket_size=None),
              "neighbor_id"),
        cos_kth, true_cos, ge, k,
    )
    cents = ivf_centroids(emb, k=8)
    recall["ivf_nprobe2"] = _recall(
        pairs(ivf_knn(probes, emb, cents, k=k, nprobe=2), "neighbor_id"),
        cos_kth, true_cos, ge, k,
    )
    recall["ivf_nprobe4"] = _recall(
        pairs(ivf_knn(probes, emb, cents, k=k, nprobe=4), "neighbor_id"),
        cos_kth, true_cos, ge, k,
    )
    recall["pq_adc_m4k16"] = _recall(
        pairs(pq_knn(emb, probe_ids, topk=k, m=4, k=16, iters=3, dim=dim),
              "vec_id"),
        l2_kth, true_l2, le, k,
    )
    recall["ivfadc_kc8_np4_m4k16"] = _recall(
        pairs(ivfadc_knn(emb, probe_ids, topk=k, kc=8, m=4, k=16, iters=3,
                         nprobe=4, dim=dim), "vec_id"),
        l2_kth, true_l2, le, k,
    )
    print(
        json.dumps(
            {
                "emb_path": emb_path,
                "k": k,
                "n_probes": len(plist),
                "n_vectors": len(ids),
                "recall": {m: round(v, 4) for m, v in recall.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
