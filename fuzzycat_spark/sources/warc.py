"""WARC ingestion: Common-Crawl-style `.warc` / `.warc.gz` files → the
pipeline's page table (url, warc_ts, html:binary, ...).

Reference analog: fuzzycat consumes release JSON produced upstream of it;
this module is the upstream seam for the web-page retarget — the raw
crawl archive itself (the BASELINE input_hint's Iceberg table of
Common-Crawl-style pages is *loaded from* WARC segments by exactly this
kind of job).

Scale design (the part that matters at 100 TB):

- **File-level parallelism.** Common Crawl gzips each WARC record as its
  own gzip member, so a `.warc.gz` is NOT splittable mid-file; the unit
  of parallelism is the file (a crawl ships ~80k x ~1 GB segment files —
  far more files than executor slots, so file-granularity is enough).
- **Paths only through the scan.** We list files with the `binaryFile`
  source but project ONLY `path` — binaryFile prunes the `content`
  column, so listing never materializes file bytes in the JVM. Each
  task then *streams* its file through `pyarrow.fs` + `gzip.GzipFile`
  inside `mapInPandas`: constant memory per task, no 2 GB
  whole-file-in-a-row limit, and the same code path works on
  local / HDFS / S3 URIs.
- **Bounded output batches.** Records are yielded in chunks of
  `batch_rows` so one task never holds a whole segment's payloads.
- **Malformed data is loud, not dropped.** A record that cannot be
  parsed yields a row with `parse_error` set (url/payload null) so
  corrupt segments are countable downstream instead of silently
  shrinking the corpus.

Pure-byte parsing only (no external WARC library): WARC/1.0 header block
terminated by CRLFCRLF, `Content-Length`-driven block read (never
delimiter splitting — bodies may legally contain `WARC/1.0` or blank
lines), HTTP response head split tolerant of bare-LF headers.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("warc_ts", TimestampType(), True),
        StructField("record_id", StringType(), True),
        StructField("record_type", StringType(), True),
        StructField("http_status", IntegerType(), True),
        StructField("content_type", StringType(), True),
        StructField("html", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("warc_path", StringType(), False),
        StructField("parse_error", StringType(), True),
    ]
)

_CRLF2 = b"\r\n\r\n"


class WarcFormatError(ValueError):
    pass


def _read_exact(stream, n: int) -> bytes:
    """Read exactly n bytes (streams may return short reads near member
    boundaries); raise if the archive ends mid-block."""
    chunks = []
    remaining = n
    while remaining > 0:
        chunk = stream.read(remaining)
        if not chunk:
            raise WarcFormatError(
                f"truncated record: wanted {n} block bytes, missing {remaining}"
            )
        chunks.append(chunk)
        remaining -= len(chunk)
    return b"".join(chunks)


def _read_header_block(stream) -> bytes | None:
    """Bytes up to and including the blank line ending a WARC header,
    or None at clean end-of-archive. Reads byte-wise; header blocks are
    tiny (<1 KB) next to Content-Length'd bodies."""
    buf = bytearray()
    # skip inter-record padding (spec: two CRLFs after each block)
    while True:
        b = stream.read(1)
        if not b:
            return None
        if b not in (b"\r", b"\n"):
            buf += b
            break
    while not buf.endswith(_CRLF2) and not buf.endswith(b"\n\n"):
        b = stream.read(1)
        if not b:
            raise WarcFormatError("EOF inside WARC header block")
        buf += b
    return bytes(buf)


def _parse_headers(block: bytes) -> dict[str, str]:
    """Case-insensitive header dict from a CRLF (or bare-LF) header block.
    Continuation lines (obs-fold) are appended to the previous value."""
    headers: dict[str, str] = {}
    last = None
    for raw in block.split(b"\n"):
        line = raw.rstrip(b"\r")
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("utf-8", "replace")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            continue
        last = name.strip().decode("ascii", "replace").lower()
        headers[last] = value.strip().decode("utf-8", "replace")
    return headers


def iter_warc_records(stream) -> Iterator[dict]:
    """Yield one dict per WARC record from a (decompressed) byte stream.

    Keys: version, headers (lower-cased dict), block (bytes). Parsing is
    strictly Content-Length-driven; stops cleanly at EOF, raises
    WarcFormatError on a structurally broken record.
    """
    while True:
        header_block = _read_header_block(stream)
        if header_block is None:
            return
        first_line, _, rest = header_block.partition(b"\n")
        version = first_line.strip().decode("ascii", "replace")
        if not version.startswith("WARC/"):
            raise WarcFormatError(f"bad record start: {version[:40]!r}")
        headers = _parse_headers(rest)
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise WarcFormatError(f"missing/bad Content-Length: {exc}") from exc
        block = _read_exact(stream, length)
        yield {"version": version, "headers": headers, "block": block}


def split_http_response(block: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) from an HTTP response block.

    Tolerates bare-LF header termination (seen in real crawls). A block
    that does not start with HTTP/ is returned whole as the body — some
    archives store raw payloads under response records.
    """
    if not block.startswith(b"HTTP/"):
        return None, None, block
    # the head ends at the EARLIEST blank line of either flavor — a
    # bare-LF head followed by a body containing \r\n\r\n must split at
    # the \n\n, not at the first CRLFCRLF inside the body
    candidates = [
        (idx, sep)
        for sep in (_CRLF2, b"\n\n")
        if (idx := block.find(sep)) != -1
    ]
    if candidates:
        idx, sep = min(candidates)
        head, body = block[:idx], block[idx + len(sep) :]
    else:
        head, body = block, b""
    lines = head.split(b"\n")
    status_parts = lines[0].rstrip(b"\r").split(None, 2)
    try:
        status = int(status_parts[1])
    except (IndexError, ValueError):
        status = None
    http_headers = _parse_headers(b"\n".join(lines[1:]))
    return status, http_headers.get("content-type"), body


def _ts(value: str | None):
    if not value:
        return None
    try:
        ts = pd.Timestamp(value)
    except ValueError:
        return None
    return ts.tz_convert(None) if ts.tzinfo else ts


def parse_warc_file(raw: io.BufferedIOBase, path: str,
                    record_types: tuple[str, ...]) -> Iterator[dict]:
    """Row dicts (WARC_SCHEMA keys) for one WARC file stream. `.gz` paths
    are wrapped with GzipFile, which reads Common Crawl's concatenated
    per-record members transparently."""
    # gz: GzipFile's internal buffer amortizes the byte-wise header reads;
    # plain warc: buffer explicitly — an unbuffered pyarrow stream would
    # pay one FFI (and possibly one filesystem) call per header BYTE
    stream = (
        gzip.GzipFile(fileobj=raw)
        if path.endswith(".gz")
        else io.BufferedReader(raw, buffer_size=1 << 20)
    )
    records = iter_warc_records(stream)
    while True:
        try:
            rec = next(records)
        except StopIteration:
            return
        except (WarcFormatError, OSError, EOFError) as exc:
            # structural damage: emit one loud row, stop this file (byte
            # offsets past a broken Content-Length are meaningless)
            yield {
                "url": None, "warc_ts": None, "record_id": None,
                "record_type": "invalid", "http_status": None,
                "content_type": None, "html": None, "n_bytes": None,
                "warc_path": path, "parse_error": str(exc),
            }
            return
        rtype = rec["headers"].get("warc-type", "unknown")
        if record_types and rtype not in record_types:
            continue
        status, ctype, body = (None, None, rec["block"])
        if rtype in ("response", "revisit"):
            status, ctype, body = split_http_response(rec["block"])
        yield {
            "url": rec["headers"].get("warc-target-uri"),
            "warc_ts": _ts(rec["headers"].get("warc-date")),
            "record_id": rec["headers"].get("warc-record-id"),
            "record_type": rtype,
            "http_status": status,
            "content_type": ctype,
            "html": body,
            "n_bytes": len(body),
            "warc_path": path,
            "parse_error": None,
        }


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    batch_rows: int = 256,
    parallelism: int | None = None,
) -> DataFrame:
    """WARC files under `path` (glob ok) → DataFrame[WARC_SCHEMA].

    Listing projects only `path` from the binaryFile source (content is
    pruned — verified by the plan test); bytes are then STREAMED per
    task through pyarrow.fs, so arbitrarily large segment files cost
    constant memory and the same code serves file://, hdfs:// and s3://.
    """
    listing = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path")
    )
    n = parallelism or spark.sparkContext.defaultParallelism
    listing = listing.repartition(n)
    parse = _parse_paths_fn(tuple(record_types or ()), batch_rows)
    return listing.mapInPandas(parse, schema=WARC_SCHEMA)


def _parse_paths_fn(types: tuple[str, ...], batch_rows: int):
    """mapInPandas closure: path batches → parsed-record batches, shared
    by the batch and streaming readers."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyarrow import fs as pafs

        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            for uri in pdf["path"]:
                fs, fs_path = pafs.FileSystem.from_uri(uri)
                # compression=None: pyarrow would otherwise auto-gunzip
                # by extension; we wrap GzipFile ourselves (per-member
                # concatenated CC layout) in parse_warc_file.
                with fs.open_input_stream(fs_path, compression=None) as raw:
                    rows = []
                    for row in parse_warc_file(raw, uri, types):
                        rows.append(row)
                        if len(rows) >= batch_rows:
                            yield pd.DataFrame(rows, columns=cols)
                            rows = []
                    if rows:
                        yield pd.DataFrame(rows, columns=cols)

    return parse


def stream_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    batch_rows: int = 256,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of `read_warc`: new `.warc(.gz)` segments landing
    under `path` become micro-batches of parsed records — the ingestion
    front of the incremental dedup path (feed `warc_pages`-shaped rows to
    `streaming.dedup_stream.run_incremental_dedup`'s source).

    The binaryFile file-stream source tracks seen files in the query
    checkpoint, so each segment is parsed exactly once per checkpoint;
    `max_files_per_trigger` bounds per-batch work the same way crawl
    deliveries are paced. Paths-only projection + per-task pyarrow.fs
    streaming as in the batch reader."""
    reader = (
        spark.readStream.format("binaryFile")
        # file streaming sources require an explicit schema; binaryFile's
        # is fixed by the format
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", "*.warc*")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    listing = reader.load(path).select("path")
    parse = _parse_paths_fn(tuple(record_types or ()), batch_rows)
    return listing.mapInPandas(parse, schema=WARC_SCHEMA)


def warc_pages(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """The input_hint page shape straight off a crawl: (url, warc_ts,
    html) for HTTP-200 HTML responses — feed this to prepare_pages after
    html→text extraction."""
    from pyspark.sql import functions as F

    raw = read_warc(spark, path, **kwargs)
    return (
        raw.where(F.col("parse_error").isNull())
        .where(F.col("http_status") == 200)
        .where(F.col("url").isNotNull())
        .select("url", "warc_ts", "html", "content_type", "warc_path")
    )
