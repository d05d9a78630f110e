"""Pairwise verification cascade for web pages.

Re-targets fuzzycat's `verify(a, b) -> (status, reason)` first-match-wins
rule cascade (`/root/reference/fuzzycat/verify.py:154-617`, ~42 rules over
publication metadata) to the web-page payload, per the north star:

| reference rule family                      | web analog here               |
|--------------------------------------------|-------------------------------|
| DOI/work_id equality → EXACT               | content-hash equality         |
| SHORT_TITLE screens (verify.py:186-187)    | empty/short text screens      |
| title-slug equality → EXACT/STRONG         | slug equality                 |
| NUM_DIFF digit projection (verify.py:491)  | digit-projected slug equality |
| TITLE_ARTIFACT containment (verify.py:608) | shingle-containment ratio     |
| author jaccard (verify.py:575-578)         | shingle/token jaccard         |

Status enum mirrors `/root/reference/fuzzycat/common.py:4-16`:
exact | strong | weak | different | ambiguous.

The whole cascade is ONE Catalyst `when` chain — first-match-wins is
short-circuit evaluation inside whole-stage codegen, exactly the early-exit
ordering the reference hand-tuned (§4 of SURVEY.md). No Python in the pair
loop; the strict suffix-style substring check is the only optional UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.functions.hashing import content_hash
from fuzzycat_spark.functions.normalize import (
    num_project,
    slug_text,
    tokens_col,
    word_shingles_from_tokens,
)
from fuzzycat_spark.functions.text import jaccard_col
from fuzzycat_spark.plans.checkpoint import materialize

# thresholds (the shingle/signature config that recall is measured at)
CONTAINMENT_MIN_RATIO = 0.8
STRONG_JACCARD = 0.7
WEAK_JACCARD = 0.4
SHORT_TOKENS = 5
SHINGLE_N = 3


def prepare_pages(
    df: DataFrame, id_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Two-stage materialized document preparation shared by blocking and
    verification: (id, ch, slug, toks, lang) checkpointed first, then
    shingles/tokset/nproj derived FROM THOSE ATTRIBUTES and checkpointed.

    The staging is load-bearing, not cosmetic: Catalyst inlines projections
    (CollapseProject) and re-evaluates captured expressions inside
    higher-order-function lambdas per array element, so computing shingles
    directly over the slug/split expression costs O(L^2) regex work per
    document — measured 13x slower on a 105k-doc corpus. Materializing
    tokens makes every downstream lambda read an O(1) attribute. On a
    cluster these two stages are the natural Iceberg feature tables.
    """
    stage_a = df.select(
        F.col(id_col).alias("id"),
        content_hash(text_col).alias("ch"),
        slug_text(text_col).alias("slug"),
        tokens_col(text_col).alias("toks"),
        F.col("lang").alias("lang")
        if "lang" in df.columns
        else F.lit(None).cast("string").alias("lang"),
    )
    stage_a = materialize(stage_a, "prep_tokens")
    toks = F.col("toks")
    shingles = word_shingles_from_tokens(toks, SHINGLE_N)
    tokset = F.array_distinct(toks)
    # alongside the string features, fixed-width hashed forms: the pair
    # join shuffles ONLY these (set intersections are hash-invariant;
    # equality checks become key equality) — at 100 TB the verify shuffle
    # carries int64 arrays, never the shingle strings
    stage_b = stage_a.select(
        "id",
        "ch",
        "slug",
        "toks",
        "lang",
        num_project(F.col("slug")).alias("nproj"),
        tokset.alias("tokset"),
        shingles.alias("shingles"),
        F.size(toks).alias("n_tok"),
        F.md5(F.col("slug").cast("binary")).alias("slug_key"),
        F.md5(num_project(F.col("slug")).cast("binary")).alias("nproj_key"),
        F.transform(shingles, lambda s: F.xxhash64(s)).alias("shingles_h"),
        F.transform(tokset, lambda t: F.xxhash64(t)).alias("tokset_h"),
    )
    return materialize(stage_b, "prep_features")


def _containment_ratio(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    m = F.least(F.size(a), F.size(b)).cast("double")
    return F.when(m <= 0, F.lit(0.0)).otherwise(inter / m)


def verify_expr() -> tuple[Column, Column]:
    """(status, reason) column pair over a joined pair-row with a_* / b_*
    feature columns. Strictly ordered; first match wins.

    Operates entirely on the hashed feature forms (slug_key/nproj_key,
    shingles_h/tokset_h): set intersections and equality are invariant
    under the per-element hash, so statuses are identical to string-side
    evaluation while the join shuffles only fixed-width values.
    """
    a_ch, b_ch = F.col("a_ch"), F.col("b_ch")
    a_sh, b_sh = F.col("a_shingles_h"), F.col("b_shingles_h")
    a_ts, b_ts = F.col("a_tokset_h"), F.col("b_tokset_h")
    jac_sh = jaccard_col(a_sh, b_sh)
    jac_tok = jaccard_col(a_ts, b_ts)
    contain = _containment_ratio(a_sh, b_sh)
    short = (F.col("a_n_tok") < SHORT_TOKENS) | (F.col("b_n_tok") < SHORT_TOKENS)
    empty = (
        F.col("a_n_tok").isNull()
        | F.col("b_n_tok").isNull()
        | (F.col("a_n_tok") == 0)
        | (F.col("b_n_tok") == 0)
    )

    rules: list[tuple[Column, str, str]] = [
        (a_ch.isNotNull() & (a_ch == b_ch), "exact", "CONTENT_HASH"),
        (empty, "ambiguous", "EMPTY_TEXT"),
        (short, "ambiguous", "SHORT_TEXT"),
        (F.col("a_slug_key") == F.col("b_slug_key"), "exact", "SLUG_MATCH"),
        (F.col("a_nproj_key") == F.col("b_nproj_key"), "different", "NUM_DIFF"),
        (
            (contain >= CONTAINMENT_MIN_RATIO)
            & (F.least(F.col("a_n_tok"), F.col("b_n_tok")) >= 10),
            "strong",
            "CONTAINMENT",
        ),
        (jac_sh >= STRONG_JACCARD, "strong", "SHINGLE_JACCARD"),
        (jac_tok >= STRONG_JACCARD, "strong", "TOKEN_JACCARD"),
        (jac_sh >= WEAK_JACCARD, "weak", "SHINGLE_JACCARD_WEAK"),
        (
            F.col("a_lang").isNotNull()
            & F.col("b_lang").isNotNull()
            & (F.col("a_lang") != F.col("b_lang")),
            "different",
            "LANGUAGE",
        ),
    ]
    status = None
    reason = None
    for cond, s, r in rules:
        status = F.when(cond, s) if status is None else status.when(cond, s)
        reason = F.when(cond, r) if reason is None else reason.when(cond, r)
    return status.otherwise("ambiguous"), reason.otherwise("UNKNOWN")


def verify_pairs(pairs: DataFrame, features: DataFrame) -> DataFrame:
    """(id_a, id_b, status, reason) for every candidate pair.

    Joins features twice (by id_a, id_b), projecting ONLY the hashed verify
    columns — string slugs/shingles never enter this shuffle. For small
    probe sets AQE elects broadcast automatically.
    """
    cols = ["id", "ch", "slug_key", "nproj_key", "shingles_h", "tokset_h", "n_tok", "lang"]
    narrow = features.select(*cols)
    fa = narrow.select([F.col(c).alias(f"a_{c}") for c in cols])
    fb = narrow.select([F.col(c).alias(f"b_{c}") for c in cols])
    joined = (
        pairs.select("id_a", "id_b")
        .join(fa, on=F.col("id_a") == F.col("a_id"))
        .join(fb, on=F.col("id_b") == F.col("b_id"))
    )
    status, reason = verify_expr()
    return joined.select(
        "id_a", "id_b", status.alias("status"), reason.alias("reason")
    )


def verdict_counts(verified: DataFrame) -> DataFrame:
    """The reference's reason Counter (`verify.py:113,143,147`) as a
    groupBy — per-(status, reason) counts."""
    return verified.groupBy("status", "reason").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
