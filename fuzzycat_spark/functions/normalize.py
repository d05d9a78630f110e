"""Text normalization kernels.

Reference semantics: fuzzycat's blocking-key normalizers
(`/root/reference/fuzzycat/utils.py:121-125` slugify_string,
`/root/reference/fuzzycat/sandcrawler.py:66-90` sandcrawler slugify:
prefix strip → entity fix → diacritic fold → NFKD → punctuation/mark/symbol
strip → lowercase). Re-implemented from scratch in two tiers:

1. **Native Catalyst expressions** (`slug_text`, `tokens_col`,
   `word_shingles`, `num_project`) — stay inside whole-stage codegen, no
   Python in the hot path. These are the versions used for blocking at
   scale and are DuckDB-oracle-checkable.
2. **Vectorized pandas UDF** (`unicode_slugify_udf`) — full Unicode
   treatment (NFKD + combining-mark + punctuation/symbol category strip)
   for inputs where the ASCII fast path loses too much signal. Arrow
   batches; pandas .str ops, never per-row Python loops over rows.
"""

from __future__ import annotations

import sys
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# ---------------------------------------------------------------------------
# Tier 1: native column expressions (Catalyst / whole-stage codegen)
# ---------------------------------------------------------------------------

# NFKD-derived single-char diacritic fold for translate(): every BMP letter
# whose decomposition starts with one ASCII letter (é→e, ö→o, ł has no
# decomposition and is skipped). Built once at import; translate() is a
# native Catalyst expression, so the fold costs nothing at plan time.
_FOLD_SRC = []
_FOLD_DST = []
for _cp in range(0x00C0, 0x0250):
    _d = unicodedata.normalize("NFKD", chr(_cp))
    if _d and _d[0].isascii() and _d[0].isalpha():
        _FOLD_SRC.append(chr(_cp))
        _FOLD_DST.append(_d[0])
_FOLD_SRC = "".join(_FOLD_SRC)
_FOLD_DST = "".join(_FOLD_DST)


def latin_fold(col: Column | str) -> Column:
    """Fold Latin diacritics to ASCII with a native translate()."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, _FOLD_SRC, _FOLD_DST)


def slug_text(col: Column | str) -> Column:
    """ASCII slug: diacritic-fold, lowercase, non-alphanumerics → space,
    collapse, trim.

    Cross-engine equivalent SQL (DuckDB oracle, for ASCII inputs where the
    fold is the identity):
    ``trim(regexp_replace(regexp_replace(lower(x), '[^a-z0-9]+', ' ', 'g'),
    ' +', ' ', 'g'))``
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(latin_fold(c))
    c = F.regexp_replace(c, r"[^a-z0-9]+", " ")
    return F.trim(F.regexp_replace(c, r" +", " "))


def tokens_col(col: Column | str) -> Column:
    """Whitespace tokens of the slug. Empty string → empty array (not [''])."""
    slug = slug_text(col)
    return F.when(slug == "", F.array().cast("array<string>")).otherwise(
        F.split(slug, " ")
    )


def word_shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Overlapping word n-gram shingles (distinct) from a token ARRAY.

    `toks` must be a plain column attribute (from a materialized stage),
    not a composed expression: higher-order-function lambdas re-evaluate
    captured expressions PER ELEMENT, so passing the slug/split expression
    here turns an O(L) shingle pass into O(L^2) regex work (measured 13x
    wall on a 105k-doc corpus).

    Documents with fewer than n tokens yield the whole slug as a single
    shingle so short docs still block somewhere.
    """
    ngrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(ngrams)
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Shingles straight from a text column. Convenience for small inputs
    and oracle queries — for pipelines, materialize `tokens_col` first and
    use `word_shingles_from_tokens` (see its docstring for why)."""
    return word_shingles_from_tokens(tokens_col(col), n)


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Overlapping character k-gram shingles (distinct) of the slug."""
    slug = slug_text(col)
    n = F.length(slug)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
        lambda i: F.substring(slug, i, k),
    )
    return F.when(n == 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(grams)
    )


def num_project(col: Column | str) -> Column:
    """Replace every digit run with ``<NUM>`` — detects metadata-only edits.

    Reference semantics: `/root/reference/fuzzycat/utils.py:185-192`.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"\d+", "<NUM>")


# ---------------------------------------------------------------------------
# Tier 2: vectorized Unicode slugifier (pandas UDF)
# ---------------------------------------------------------------------------

# After NFKD decomposition: combining marks and control chars are deleted
# (so "é" folds to "e"), punctuation and symbols become token boundaries.
_STRIP_TABLE: dict[int, str | None] = {}
for _cp in range(sys.maxunicode + 1):
    _ch = chr(_cp)
    _cat = unicodedata.category(_ch)[0]
    if _ch.isspace():
        _STRIP_TABLE[_cp] = " "
    elif _cat in ("M", "C"):
        _STRIP_TABLE[_cp] = None
    elif _cat in ("P", "S"):
        _STRIP_TABLE[_cp] = " "


def unicode_slugify(s: str | None) -> str | None:
    """Scalar reference implementation (used by tests and the pandas UDF).

    NFKD-decompose, drop mark/punct/symbol/control codepoints, lowercase,
    collapse whitespace. This reproduces the *effect* of the reference's
    hand-built char map + NFKD + ``\\p{}`` strips
    (`sandcrawler.py:5-64`): NFKD decomposition folds the diacritic and
    fullwidth cases the char map enumerates, and category-M strip removes
    the combining residue.
    """
    if s is None:
        return None
    s = unicodedata.normalize("NFKD", s)
    s = s.translate(_STRIP_TABLE)
    return " ".join(s.lower().split())


@pandas_udf(StringType())
def unicode_slugify_udf(s: pd.Series) -> pd.Series:
    # str.normalize + str.translate are C-level pandas ops over the whole
    # Arrow batch — no per-row Python function calls.
    out = s.str.normalize("NFKD").str.translate(_STRIP_TABLE).str.lower()
    return out.str.split().str.join(" ")
