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

from fuzzycat_spark.functions.pii import (  # noqa: E402
    CARD_RE,
    EMAIL_RE,
    IPV4_RE,
    IPV6_RE,
    PHONE_RE,
)

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
    ("p15", "Pay with 4111 1111 1111 1111 or 5500-0000-0000-0004 today."),
    ("p16", "Amex 378282246310005 has 15 digits; 13-digit 4222222222222 too."),
    ("p17", "Order #123456789012 is 12 digits and must NOT redact as a card."),
    ("p18", "Node 2001:0db8:85a3:0000:0000:8a2e:0370:7334 answered."),
    ("p19", "fe80:1:2:3:4:5:6:7 and the time 12:34:56 plus dead:beef stay apart."),
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

    cards = sum(len(re.findall(CARD_RE, t)) for _, t in DOCS)
    ipv6s = sum(len(re.findall(IPV6_RE, t)) for _, t in DOCS)
    assert cards >= 4, cards  # spaced, dashed, 15-digit, 13-digit, bare-16
    assert ipv6s == 2, ipv6s  # full forms only
    assert not re.search(CARD_RE, "Order #123456789012 is"), "12-digit control"
    assert not re.search(IPV6_RE, "time 12:34:56 plus dead:beef"), "colon control"

    pd.DataFrame(DOCS, columns=["doc_id", "text"]).to_parquet(OUT, index=False)
    print(
        f"wrote {len(DOCS)} docs: {emails} emails, {ips} ips, {phones} phones, "
        f"{cards} cards, {ipv6s} ipv6, {clean} clean"
    )


if __name__ == "__main__":
    main()
