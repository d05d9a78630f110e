"""Text analysis kernels: jaccard, token stats, quality, language-ID,
fingerprinting — all pure Catalyst column expressions (JVM-side, codegen),
each with a DuckDB-expressible oracle equivalent.

Reference semantics: jaccard `/root/reference/fuzzycat/utils.py:150-156`,
tokenize `utils.py:166-170`, token n-grams `utils.py:159-163`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from fuzzycat_spark.functions.normalize import slug_text, tokens_col

# Stopword inventories for the language-ID heuristic — the classifier's
# parameters (the Spark expression and the DuckDB oracle both derive from
# this constant, so they can never disagree). 30 high-frequency function
# words per language; shared forms (e.g. "la" fr/es, "in" en/de) are fine:
# the vote is argmax over per-language hit counts, ties -> "und".
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": (
        "the", "and", "of", "to", "in", "is", "that", "for", "with", "a",
        "as", "was", "on", "are", "by", "this", "be", "from", "at", "or",
        "an", "it", "not", "which", "but", "his", "her", "they", "have", "has",
    ),
    "de": (
        "der", "die", "das", "und", "ist", "nicht", "von", "mit", "ein", "zu",
        "den", "dem", "des", "eine", "einen", "auf", "im", "als", "auch", "sich",
        "nach", "bei", "aus", "wird", "werden", "sind", "oder", "wie", "dass", "fur",
    ),
    "fr": (
        "le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans",
        "des", "du", "en", "un", "au", "aux", "ce", "cette", "qui", "sur",
        "plus", "par", "avec", "sont", "ont", "mais", "ou", "nous", "se", "ne",
    ),
    "es": (
        "el", "la", "los", "que", "y", "es", "en", "un", "por", "con",
        "las", "del", "se", "una", "su", "para", "no", "al", "lo", "como",
        "mas", "pero", "sus", "le", "ya", "o", "este", "ha", "son", "entre",
    ),
    "it": (
        "il", "di", "che", "e", "la", "per", "un", "in", "non", "una",
        "sono", "con", "si", "del", "le", "della", "i", "al", "dei", "come",
        "anche", "piu", "nel", "ma", "ha", "gli", "alla", "lo", "questo", "essere",
    ),
    "pt": (
        "o", "de", "a", "e", "que", "do", "da", "em", "um", "para",
        "com", "nao", "uma", "os", "no", "se", "na", "por", "mais", "as",
        "dos", "como", "mas", "ao", "ele", "das", "seu", "sua", "ou", "foi",
    ),
}


def jaccard_col(a: Column, b: Column) -> Column:
    """Set jaccard |a∩b|/|a∪b| over two array columns; 0.0 when union empty."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count of the slugged text (BPE-ish proxy: the slug
    splits punctuation off first, so counts approximate subword-merge input)."""
    return F.size(tokens_col(col)).cast("long")


# GPT-2-style pre-tokenizer classes, minus the lookahead RE2 can't do:
# optional leading space + (letter run | digit run | punct run). Counting
# these matches approximates the sequence a BPE merge would start from.
# Shared verbatim by the DuckDB oracle (RE2) and Spark (Java regex).
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_ish_token_count(col: Column | str) -> Column:
    """Pre-tokenizer match count over raw text — the LLM-pipeline token
    estimate (letters/digits/punctuation runs with attached space), native
    regexp_count, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN)).cast("long")


def quality_score_cols(col: Column | str) -> dict[str, Column]:
    """Document-quality signals: length, token stats, alpha/digit/space
    ratios, stopword ratio — combined into a [0,1] score.

    All double arithmetic (IEEE-identical across engines); callers should
    round before hashing comparisons.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    toks = tokens_col(col)
    n_tok = F.size(toks).cast("double")
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    digit = F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double")
    space = F.length(F.regexp_replace(c, r"[^ ]", "")).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*LANG_STOPWORDS["en"]))
    ).cast("double")
    safe_n = F.greatest(n, F.lit(1.0))
    safe_tok = F.greatest(n_tok, F.lit(1.0))
    alpha_ratio = alpha / safe_n
    digit_ratio = digit / safe_n
    space_ratio = space / safe_n
    stop_ratio = stop_hits / safe_tok
    mean_tok_len = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        (n - space) / safe_tok
    )
    # Heuristic blend: alphabetic, some stopwords, sane token length = good.
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * F.least(stop_ratio * 2, F.lit(1.0))
        + F.lit(0.2) * F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), 1.0).otherwise(0.0)
        + F.lit(0.1) * (F.lit(1.0) - F.least(digit_ratio * 5, F.lit(1.0)))
    )
    return {
        "n_tokens": n_tok.cast("long"),
        "alpha_ratio": alpha_ratio,
        "digit_ratio": digit_ratio,
        "stop_ratio": stop_ratio,
        "mean_tok_len": mean_tok_len,
        "quality": score,
    }


def lang_id_col(col: Column | str) -> Column:
    """Stopword-vote language ID over the slug tokens.

    argmax over languages of per-token stopword hits; ties and zero hits →
    'und' (undetermined). Pure Catalyst (filter/size over arrays).
    """
    toks = tokens_col(col)
    votes = [
        (lang, F.size(F.filter(toks, lambda t: t.isin(*stops))))
        for lang, stops in sorted(LANG_STOPWORDS.items())
    ]
    best = F.greatest(*[v for _, v in votes])
    n_best = sum(F.when(v == best, 1).otherwise(0) for _, v in votes)
    out = F.lit("und")
    # first language (alphabetical) achieving the max, only if unique and >0
    for lang, v in reversed(votes):
        out = F.when((best > 0) & (n_best == 1) & (v == best), lang).otherwise(out)
    return out


def doc_fingerprint(col: Column | str, n: int = 3) -> Column:
    """Deterministic document fingerprint: min md5 over word n-gram shingles
    (a 1-permutation MinHash — robust to local edits, cheap to compare).
    Empty docs → md5 of empty string.
    """
    from fuzzycat_spark.functions.normalize import word_shingles

    sh = word_shingles(col, n)
    return F.when(F.size(sh) == 0, F.md5(F.lit("").cast("binary"))).otherwise(
        F.array_min(F.transform(sh, lambda s: F.md5(s.cast("binary"))))
    )


__all__ = [
    "LANG_STOPWORDS",
    "jaccard_col",
    "token_count",
    "quality_score_cols",
    "lang_id_col",
    "doc_fingerprint",
    "slug_text",
]
