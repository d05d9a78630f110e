"""Generate fixtures/sample.warc.gz + sample_plain.warc + warc_expected.parquet.

The expected table is computed from the SAME literals the archive is
built from (a golden, independent of sources/warc.py), so the warc_scan
gate cross-checks the parser against hand-constructed truth. Every edge
arm is self-asserted non-vacuous:
- a body containing a fake "\\r\\n\\r\\nWARC/1.0" (delimiter-split trap —
  only Content-Length-driven parsing survives it)
- multi-byte UTF-8 body; raw binary body (all byte values)
- 404 with empty body; missing HTTP Content-Type; bare-LF HTTP head
- warcinfo / request / revisit records that the response filter drops

Run: python tools/make_warc_fixture.py
"""

from __future__ import annotations

import gzip
import hashlib
import os

import pandas as pd

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def http_block(status_line: bytes, headers: list[bytes], body: bytes,
               lf_only: bool = False) -> bytes:
    eol = b"\n" if lf_only else b"\r\n"
    return status_line + eol + eol.join(headers) + eol + eol + body


def warc_record(rtype: str, rec_id: str, date: str, block: bytes,
                url: str | None = None) -> bytes:
    lines = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Record-ID: <urn:uuid:" + rec_id.encode() + b">",
        b"WARC-Date: " + date.encode(),
    ]
    if url is not None:
        lines.append(b"WARC-Target-URI: " + url.encode())
    lines += [
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: " + str(len(block)).encode(),
    ]
    return b"\r\n".join(lines) + b"\r\n\r\n" + block + b"\r\n\r\n"


def main() -> None:
    trap_body = b"<html>pre\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\npost</html>"
    utf8_body = "<html>日本語 — café \U0001f600</html>".encode()
    binary_body = bytes(range(256)) * 3
    charset_body = b"<html>charset arm</html>"
    lf_body = b"<html>bare-lf head</html>"
    no_ct_body = b"<html>no content-type</html>"

    responses = [
        # (rec_id, date, url, status, content_type header or None, body, lf_only)
        ("r1", "2026-01-15T08:30:00Z", "https://example.com/a", 200,
         b"text/html", trap_body, False),
        ("r2", "2026-01-15T08:31:02Z", "https://example.com/ja", 200,
         b"text/html; charset=utf-8", utf8_body, False),
        ("r3", "2026-01-15T08:32:10Z", "https://cdn.example.com/blob", 200,
         b"application/octet-stream", binary_body, False),
        ("r4", "2026-01-15T08:33:20Z", "https://example.com/missing", 404,
         b"text/html", b"", False),
        ("r5", "2026-01-15T08:34:00Z", "https://example.com/noct", 200,
         None, no_ct_body, False),
        ("r6", "2026-01-15T08:35:30Z", "https://example.com/lf", 200,
         b"text/plain", lf_body, True),
        ("r7", "2026-01-15T08:36:45Z", "https://example.org/cs", 200,
         b"text/html; charset=ISO-8859-1", charset_body, False),
    ]
    assert any(b"\r\n\r\nWARC/1.0" in r[5] for r in responses), "trap arm"
    assert any(r[4] is None for r in responses), "missing-ct arm"
    assert any(r[6] for r in responses), "bare-lf arm"
    assert any(r[3] == 404 and r[5] == b"" for r in responses), "empty-404 arm"
    assert any(max(r[5]) > 127 for r in responses if r[5]), "non-ascii arm"

    records = [
        warc_record("warcinfo", "w0", "2026-01-15T08:29:00Z",
                    b"software: synth-crawler 1.0\r\nformat: WARC File Format 1.0\r\n"),
        warc_record("request", "q1", "2026-01-15T08:30:00Z",
                    b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n",
                    url="https://example.com/a"),
    ]
    expected = []
    reasons = {200: b"OK", 404: b"Not Found"}
    for rec_id, date, url, status, ctype, body, lf in responses:
        headers = [b"Server: synth"]
        if ctype is not None:
            headers.append(b"Content-Type: " + ctype)
        headers.append(b"Content-Length: " + str(len(body)).encode())
        block = http_block(
            b"HTTP/1.1 " + str(status).encode() + b" " + reasons[status],
            headers, body, lf_only=lf)
        records.append(warc_record("response", rec_id, date, block, url=url))
        expected.append({
            "url": url,
            "warc_ts": pd.Timestamp(date).tz_convert(None),
            "http_status": status,
            "content_type": ctype.decode() if ctype is not None else None,
            "payload_sha": hashlib.sha256(body).hexdigest(),
            "n_bytes": len(body),
        })
    records.append(
        warc_record("revisit", "v1", "2026-01-15T08:37:00Z",
                    b"HTTP/1.1 200 OK\r\n\r\n", url="https://example.com/a"))

    plain = b"".join(records)
    with open(os.path.join(OUT_DIR, "sample_plain.warc"), "wb") as f:
        f.write(plain)
    # Common Crawl style: one gzip member per record, deterministic mtime
    gz = b"".join(gzip.compress(r, mtime=0) for r in records)
    with open(os.path.join(OUT_DIR, "sample.warc.gz"), "wb") as f:
        f.write(gz)

    df = pd.DataFrame(expected)
    df["http_status"] = df["http_status"].astype("int32")
    df["n_bytes"] = df["n_bytes"].astype("int64")
    df.to_parquet(os.path.join(OUT_DIR, "warc_expected.parquet"), index=False)
    print(f"wrote {len(records)} records ({len(expected)} responses), "
          f"{len(plain)} plain bytes, {len(gz)} gz bytes")


if __name__ == "__main__":
    main()
