"""Model-based quality classification: a linear scorer over hashed
unigram+bigram bag-of-words features, the fastText/CCNet-style "does this
page look like the reference corpus" filter every production web-text
pipeline runs between heuristic admission and dedup.

The reference pipeline's quality decisions are rule cascades
(`/root/reference/fuzzycat/verify.py` status logic); a web-scale corpus
additionally needs the learned-filter stage (GPT-3/LLaMA-style "classify
against WebText/Wikipedia"). This module supplies the Spark-side scoring
plumbing plus a deterministic Naive-Bayes fitter, keeping every
distributed quantity integer so results are reduction-order-free.

Scale design (the 100 TB story):
- Feature extraction is the zero-shuffle in-row run-length machinery of
  `operators/retrieval._term_rows`: tokens and in-row-built bigrams ride
  as 8-byte md5 hashes; no explode → groupBy, no Python.
- Scoring is ONE broadcast join (the weight table is a vocabulary — at
  most a few million rows, the classic broadcast dim) followed by ONE
  partial-aggregated groupBy(id) sum of int64 products. Per-doc scores
  are exact integers: any partition count, any reduction order, any
  engine gives the same bits.
- Fitting (`fit_nb_weights`) counts features distributedly and collects
  only the per-(feature,label) count table — the LABELED training set is
  small by definition (thousands of docs), the unlabeled corpus being
  scored is the big side and never collects.
"""

from __future__ import annotations

import math
from hashlib import md5 as _md5

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.functions.normalize import tokens_col
from fuzzycat_spark.operators.retrieval import _term_rows

__all__ = [
    "text_feature_rows",
    "linear_score_fp",
    "fit_nb_weights",
    "py_feature_hash",
]

WEIGHT_SCALE = 1_000_000  # fixed-point scale of w_fp (1e6 per nat)


def py_feature_hash(feat: str) -> int:
    """Driver-side mirror of `functions.hashing.md5_h64` (first 8 md5
    bytes as signed big-endian int64) — lets a fitter pin the exact hash
    keys the Spark scorer joins on."""
    return int.from_bytes(_md5(feat.encode("utf-8")).digest()[:8], "big", signed=True)


def _feature_array(df: DataFrame, id_col: str, text_col: str, bigrams: bool) -> DataFrame:
    """(id, _toks): slug tokens plus in-row 'a b' bigram strings. The
    bigram zip_with reads only its lambda arguments (no captured outer
    expression), so there is no per-element re-evaluation trap."""
    narrow = df.select(
        F.col(id_col).alias("id"), tokens_col(text_col).alias("_t")
    )
    if not bigrams:
        return narrow.select("id", F.col("_t").alias("_toks"))
    n = F.size("_t")
    shifted = F.concat(
        F.slice("_t", 2, F.greatest(n - 1, F.lit(0))),
        F.array(F.lit(None).cast("string")),
    )
    bi = F.filter(
        F.zip_with(
            F.col("_t"),
            shifted,
            lambda a, b: F.when(b.isNotNull(), F.concat(a, F.lit(" "), b)),
        ),
        lambda x: x.isNotNull(),
    )
    return narrow.select("id", F.concat(F.col("_t"), bi).alias("_toks"))


def text_feature_rows(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bigrams: bool = True,
) -> DataFrame:
    """(id, h, tf, dl): hashed unigram(+bigram) bag features with
    occurrence counts, via the in-row run-length difference (zero
    shuffles). `dl` is the total feature count of the document."""
    return _term_rows(_feature_array(docs, id_col, text_col, bigrams), "id")


def linear_score_fp(
    docs: DataFrame,
    weights: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bigrams: bool = True,
    bias_fp: int = 0,
) -> DataFrame:
    """(id, score_fp): integer linear score sum_f tf(f) * w_fp(f) +
    bias_fp per document. Every input doc appears — docs sharing no
    feature with the vocabulary score exactly `bias_fp`. With NB
    log-odds weights, score_fp > 0 reads "more target-like than
    background" at fixed point 1e6 per nat.

    `weights` is an (h:int64, w_fp:int64) table (extra columns are
    ignored); it is broadcast — pass the output of `fit_nb_weights` or
    any persisted vocabulary."""
    feats = text_feature_rows(
        docs, id_col=id_col, text_col=text_col, bigrams=bigrams
    )
    scored = (
        feats.join(F.broadcast(weights.select("h", "w_fp")), "h")
        .groupBy("id")
        .agg(F.sum(F.col("tf") * F.col("w_fp")).alias("_s"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            (F.coalesce(F.col("_s"), F.lit(0)) + F.lit(int(bias_fp)))
            .cast("long")
            .alias("score_fp"),
        )
    )


def fit_nb_weights(
    labeled: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    pos_label: str = "pos",
    bigrams: bool = True,
    scale: int = WEIGHT_SCALE,
):
    """Multinomial-Naive-Bayes log-odds weights from a small labeled set:
    w(f) = ln((c_pos(f)+1)/(T_pos+V)) - ln((c_neg(f)+1)/(T_neg+V)),
    add-one smoothed, quantized to int64 at `scale` per nat. Returns
    (rows, bias_fp): rows is a list of (feat, h, w_fp) with h pinned via
    `py_feature_hash`, bias_fp = round(scale * ln(N_pos/N_neg)).

    Feature counting runs distributed; only the (feature, label, count)
    vocabulary collects — sized by the labeled set's vocabulary, not the
    corpus. The returned rows round-trip through parquet/createDataFrame
    into `linear_score_fp`'s `weights` input.
    """
    fa = _feature_array(labeled, id_col, text_col, bigrams)
    lab = labeled.select(
        F.col(id_col).alias("id"),
        (F.col(label_col) == pos_label).alias("_is_pos"),
    )
    counts = (
        fa.join(lab, "id")
        .select("_is_pos", F.explode("_toks").alias("feat"))
        .groupBy("feat", "_is_pos")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    pos_c: dict[str, int] = {}
    neg_c: dict[str, int] = {}
    for r in counts:
        (pos_c if r["_is_pos"] else neg_c)[r["feat"]] = r["c"]
    vocab = sorted(set(pos_c) | set(neg_c))
    t_pos, t_neg, v = sum(pos_c.values()), sum(neg_c.values()), len(vocab)
    n_pos = labeled.filter(F.col(label_col) == pos_label).count()
    n_neg = labeled.count() - n_pos
    if min(t_pos, t_neg, n_pos, n_neg) == 0:
        raise ValueError("fit_nb_weights: both classes need non-empty text")
    rows = [
        (
            f,
            py_feature_hash(f),
            round(
                scale
                * (
                    math.log((pos_c.get(f, 0) + 1) / (t_pos + v))
                    - math.log((neg_c.get(f, 0) + 1) / (t_neg + v))
                )
            ),
        )
        for f in vocab
    ]
    return rows, round(scale * math.log(n_pos / n_neg))
