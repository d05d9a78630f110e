"""PII scrubbing for training corpora: email / credit-card / IPv6 /
IPv4 / phone-number redaction and counting as pure Catalyst regexp work.

Reference scope analog: fuzzycat normalizes away noise fields before
keying (sandcrawler slug, DOI cleanup); a web-text pipeline additionally
has to REMOVE identifying strings before a corpus ships (the C4/Dolma
PII pass). Same design rule as the rest of `functions/`: no Python in
the hot path — `regexp_replace`/`regexp_count` run JVM-side inside
whole-stage codegen, so redaction adds zero shuffles and no UDF cost at
100 TB.

Pattern constraints (load-bearing):
- Patterns stay in the Java-regex ∩ RE2 common subset (no lookaround,
  no backreferences) so the DuckDB oracle executes the IDENTICAL
  pattern — the driver gate is a real two-engine cross-check, not a
  golden file.
- Counts are computed per-pattern on the RAW text, independently of
  redaction order (a phone-shaped digit run inside an email counts as
  both; documented, deterministic in both engines).
- Redaction order is fixed email → card → IPv6 → IPv4 → phone: the
  earlier classes are structurally more specific, so their digits are
  consumed before the looser phone pattern can bite into them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# optional +CC, then 3-3-4 with optional ()/space/dot/dash separators;
# the trailing \b keeps a match from ending mid-digit-run
PHONE_RE = (
    r"(?:\+?[0-9]{1,2}[ .\-]?)?\(?[0-9]{3}\)?[ .\-]?[0-9]{3}[ .\-]?[0-9]{4}\b"
)
# 13-16 digits as three 4-digit groups + 1-4 more, optional space/dash
# separators: spaced, dashed, and bare card numbers; a 10-digit phone run
# cannot reach the 13-digit minimum, and IPv4/phone groups are ≤3 digits
CARD_RE = r"\b(?:[0-9]{4}[ \-]?){3}[0-9]{1,4}\b"
# full-form IPv6 only (8 hex groups); compressed `::` forms are a
# documented non-goal — expanding them needs alternation RE2 allows but
# that Java's \b semantics around ':' make order-sensitive, and crawl
# text overwhelmingly carries the full form in server logs
IPV6_RE = r"\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP_ADDRESS>"
IPV6_TOKEN = "<IP_ADDRESS>"
PHONE_TOKEN = "<PHONE_NUMBER>"
CARD_TOKEN = "<CREDIT_CARD>"

# (name, pattern, replacement) in redaction order: more-structured
# classes first so their digits are consumed before looser patterns
# (a 16-digit card contains a phone-shaped suffix; emails carry digits)
PII_RULES = (
    ("email", EMAIL_RE, EMAIL_TOKEN),
    ("card", CARD_RE, CARD_TOKEN),
    ("ipv6", IPV6_RE, IPV6_TOKEN),
    ("ipv4", IPV4_RE, IPV4_TOKEN),
    ("phone", PHONE_RE, PHONE_TOKEN),
)


def redact_pii(col: str | Column) -> Column:
    """Text with every PII match replaced by its class token. One codegen
    expression chain — no shuffle, no UDF."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pattern, token in PII_RULES:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: str | Column) -> list[Column]:
    """One count column per PII_RULES entry in redaction order —
    currently [n_email, n_card, n_ipv6, n_ipv4, n_phone] — over the raw
    text; feed to select(*pii_counts("text")). Consumers should key on
    the aliases, not positions."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.regexp_count(c, F.lit(pattern)).alias(f"n_{name}")
        for name, pattern, _ in PII_RULES
    ]


def has_pii(col: str | Column) -> Column:
    """Boolean: any PII class present — the cheap corpus-filter predicate
    (rlike short-circuits; no replacement work)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lit(False)
    for _, pattern, _ in PII_RULES:
        out = out | c.rlike(pattern)
    return out
