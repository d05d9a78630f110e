"""Encoding repair for crawl text: undo the dominant real-world mangle —
UTF-8 bytes decoded once as cp1252 ("mojibake": Ã© for é, â€™ for ’) —
plus stray NBSP artifacts, as ONE Catalyst literal-replace chain. The
ftfy `fix_text` analog for the 95% case, JVM-side, zero shuffles, zero
Python.

Reference scope analog: fuzzycat's sandcrawler slug exists because titles
arrive encoding-damaged (`sandcrawler.py`'s char fold tables); a web
pipeline has to REPAIR body text, not just normalize keys.

Strategy (load-bearing):
- The mangled forms are CONSTRUCTED, not hand-typed: for each repaired
  character, LHS = its UTF-8 bytes decoded as cp1252 with C1 passthrough
  (the "sloppy cp1252" browsers and ftfy model) — so every pair is
  correct by construction and the table is auditable as one string of
  intended characters.
- Every LHS starts with Â/Ã/â/â„/Å (a UTF-8 lead byte rendered through
  cp1252) followed by specific continuation renderings — sequences that
  essentially never occur as intentional text. Bare Ã before whitespace
  is left alone.
- Repairs are ordered literal `replace`s, identical in DuckDB, so the
  oracle is a true two-engine agreement on every planted form.
- `mojibake_score` counts marker sequences BEFORE repair so corpora can
  be audited for double-encoding rates without rewriting anything.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mangle_utf8_as_cp1252(text: str) -> str:
    """How `text` renders after the classic double-encoding accident:
    its UTF-8 bytes decoded as cp1252, unmapped C1 bytes passing through
    as their Latin-1 code points (browser behavior; ftfy's sloppy-cp1252).
    Exposed for tests/fixtures — the repair map inverts exactly this."""
    out = []
    for b in text.encode("utf-8"):
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


# the characters this module repairs: curly quotes/dashes/ellipsis, the
# western European accented letters, and NBSP
REPAIRED_CHARS: str = "’‘“”„–—…·€éèêëàáâäåçíìîïñòóôöùúûüýßÉÈÀÁÇÑÖÜ "

# (mangled, intended), longest LHS first so 3-byte renderings are
# rewritten before any 2-byte rendering that prefixes them
MOJIBAKE_MAP: tuple[tuple[str, str], ...] = tuple(
    sorted(
        ((mangle_utf8_as_cp1252(c), c) for c in REPAIRED_CHARS),
        key=lambda kv: -len(kv[0]),
    )
)

# sequences whose presence indicates double-encoding; counted on raw text
MOJIBAKE_MARKERS: tuple[str, ...] = tuple(
    mangle_utf8_as_cp1252(c) for c in ("’", "“", "é", "ö", "ü", "\xa0")
)


# pass-1 placeholders: one private-use codepoint per rule. A direct
# LHS→RHS chain is NOT confluent — an early rule's clean output can
# complete a later rule's LHS (e.g. 'Ã' + mangled-'‘' repairs to 'Ã‘',
# which the Ñ rule then rewrites into a character never present). PUA
# chars occur in no LHS and no RHS, so LHS→PUA then PUA→RHS is
# order-safe by construction. (Input text already containing U+E0xx is
# sacrificed — private-use codepoints in crawl text are garbage.)
_PLACEHOLDERS: tuple[str, ...] = tuple(
    chr(0xE000 + i) for i in range(len(MOJIBAKE_MAP))
)


def fix_mojibake(col: str | Column) -> Column:
    """Text with every mapped mojibake sequence replaced by its intended
    character — two ordered literal-replace passes (LHS→placeholder,
    placeholder→RHS), one codegen chain, confluent regardless of rule
    interactions."""
    out = F.col(col) if isinstance(col, str) else col
    for (bad, _), ph in zip(MOJIBAKE_MAP, _PLACEHOLDERS):
        out = F.replace(out, F.lit(bad), F.lit(ph))
    for (_, good), ph in zip(MOJIBAKE_MAP, _PLACEHOLDERS):
        out = F.replace(out, F.lit(ph), F.lit(good))
    return out


def fix_mojibake_py(text: str) -> str:
    """Pure-Python reference of the exact two-pass chain (tests/fixtures)."""
    for (bad, _), ph in zip(MOJIBAKE_MAP, _PLACEHOLDERS):
        text = text.replace(bad, ph)
    for (_, good), ph in zip(MOJIBAKE_MAP, _PLACEHOLDERS):
        text = text.replace(ph, good)
    return text


def mojibake_score(col: str | Column) -> Column:
    """Count of double-encoding marker sequences in the RAW text — the
    corpus-audit signal (how much of this crawl is encoding-damaged)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lit(0)
    for marker in MOJIBAKE_MARKERS:
        out = out + (
            (F.length(c) - F.length(F.replace(c, F.lit(marker), F.lit(""))))
            / F.lit(len(marker))
        ).cast("int")
    return out
