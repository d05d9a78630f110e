"""Generate fixtures/pii_docs.parquet — planted-PII corpus for the
pii_scrub gate. Arms self-asserted non-vacuous:
- plain email / subdomain+tag email / email with digit-heavy local part
- IPv4 mid-sentence, IPv4 at line end, version-string lookalike (1.2.3.4
  IS matched — documented behavior, identical in both engines)
- phone in 3-3-4, dotted, +CC and (area) forms; digit run longer than a
  phone (both engines must pick the same leftmost match)
- unicode text around PII; clean docs with zero matches
Run: python tools/make_pii_fixture.py
"""

from __future__ import annotations

import os
import re
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fuzzycat_spark.functions.pii import EMAIL_RE, IPV4_RE, PHONE_RE  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "pii_docs.parquet",
)

DOCS = [
    ("p00", "Contact alice@example.com for details."),
    ("p01", "Mail bob.smith+tag@mail.sub.example.co.uk or visit the office."),
    ("p02", "Fallback address: 5551234567@sms-gateway.net works too."),
    ("p03", "The server at 192.168.10.250 timed out again."),
    ("p04", "Peers: 10.0.0.1, 10.0.0.2 and 172.16.254.3"),
    ("p05", "Upgrade to version 1.2.3.4 today."),
    ("p06", "Call 555-123-4567 during business hours."),
    ("p07", "Tel: +1 (555) 987-6543 or 555.222.3333."),
    ("p08", "Card-shaped run 4111111111111111 is not a phone? Both engines decide."),
    ("p09", "Mixed: ana@example.org from 8.8.8.8 called +1 555 294 0958."),
    ("p10", "日本語テキストの中の admin@例-example.com と 203.0.113.7 です。"),
    ("p11", "No identifiers here, just prose about web crawling."),
    ("p12", "Another clean document. Nothing to redact at all."),
    ("p13", "Emails back to back: a@b.io,c@d.io;e@f.io done."),
    ("p14", "Trailing phone 5559876543"),
]


def main() -> None:
    emails = sum(len(re.findall(EMAIL_RE, t)) for _, t in DOCS)
    ips = sum(len(re.findall(IPV4_RE, t)) for _, t in DOCS)
    phones = sum(len(re.findall(PHONE_RE, t)) for _, t in DOCS)
    clean = sum(
        1
        for _, t in DOCS
        if not (re.search(EMAIL_RE, t) or re.search(IPV4_RE, t) or re.search(PHONE_RE, t))
    )
    assert emails >= 7, emails
    assert ips >= 6, ips
    assert phones >= 5, phones
    assert clean >= 2, clean
    assert re.search(IPV4_RE, "version 1.2.3.4"), "lookalike arm"
    assert any(len(re.findall(EMAIL_RE, t)) >= 3 for _, t in DOCS), "multi-email arm"

    pd.DataFrame(DOCS, columns=["doc_id", "text"]).to_parquet(OUT, index=False)
    print(f"wrote {len(DOCS)} docs: {emails} emails, {ips} ips, {phones} phones, {clean} clean")


if __name__ == "__main__":
    main()
