"""WARC ingestion: Common Crawl's container format -> rows.

The engine's input contract is a TABLE of pages (BASELINE.json
input_hint); real crawls arrive as WARC files. This source closes that
gap with zero extra dependencies: a spec-conformant WARC/1.0 parser
(header walk by ``Content-Length``, gzip multi-member transparent) over
``spark.read.format("binaryFile")`` + ``mapInPandas`` — per-FILE Python,
the standard Spark WARC pattern (record boundaries are stateful byte
offsets, unknowable to a row-oriented reader; even warcio-based
production pipelines parse inside mapPartitions).

Scale shape: one WARC file = one input row = one parse task, so
parallelism = number of files (Common Crawl ships ~1 GB segments,
100k+ per crawl — far more files than executors). The parser is an
ITERATOR over records AND the gzip inflate is incremental (member-by-
member, 1 MiB chunks within a member), so peak memory is the
compressed bytes (already materialized by binaryFile's row) + one
record + one inflate chunk — never the fully expanded segment; emitted
batches follow ``spark.sql.execution.arrow.maxRecordsPerBatch``.
Trailing non-gzip garbage after a complete member, and a corrupt or
truncated final member, stop the iterator cleanly at the last good
record instead of raising. Response records
re-join the engine through ``warc_responses`` -> the pages-table shape
(html payload as binary; ``text.extracted_text_col`` takes it from
there natively).

Fixture writer included (``write_warc_fixture``) — tests generate
byte-exact WARC/1.0 files (plain and gzip multi-member, the on-disk
format Common Crawl actually uses) rather than vendoring samples.
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"

RECORD_SCHEMA = ("src_file string, record_type string, url string, "
                 "warc_ts string, content_type string, http_status int, "
                 "payload binary")


def _split_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.decode("latin-1").strip().lower()] = \
                v.decode("latin-1").strip()
    return headers


_INFLATE_CHUNK = 1 << 20


def _decompressed_chunks(raw: bytes) -> Iterator[bytes]:
    """Incremental inflate: plain bytes pass through whole; gzip yields
    decompressed chunks member-by-member (Common Crawl is one member
    per record, so a member's expansion IS the record-sized unit).
    Stops cleanly on trailing non-gzip garbage, a corrupt member, or a
    truncated final member — everything decompressed so far was
    yielded."""
    if raw[:2] != b"\x1f\x8b":
        yield raw
        return
    view = memoryview(raw)
    pos, n = 0, len(raw)
    while pos < n and raw[pos:pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        while pos < n and not d.eof:
            chunk = view[pos:pos + _INFLATE_CHUNK]
            pos += len(chunk)
            try:
                out = d.decompress(chunk)
            except zlib.error:
                return  # corrupt member: keep what parsed so far
            if out:
                yield out
        if not d.eof:
            return  # truncated final member
        pos -= len(d.unused_data)  # rewind to the next member's start


def _ensure(buf: bytearray, chunks: Iterator[bytes], k: int) -> bool:
    """Grow ``buf`` from ``chunks`` until it holds ≥ k bytes."""
    while len(buf) < k:
        c = next(chunks, None)
        if c is None:
            return False
        buf.extend(c)
    return True


def _find(buf: bytearray, chunks: Iterator[bytes], pat: bytes) -> int:
    start = 0
    while True:
        i = buf.find(pat, start)
        if i >= 0:
            return i
        start = max(len(buf) - len(pat) + 1, 0)
        c = next(chunks, None)
        if c is None:
            return -1
        buf.extend(c)


def iter_warc_records(raw: bytes) -> Iterator[dict]:
    """Yield parsed records from WARC/1.0 bytes (plain or gzip
    multi-member, Common Crawl's layout). Pure stdlib; the gzip stream
    inflates INCREMENTALLY and the parse buffer compacts after every
    record, so peak memory stays at one record + one inflate chunk on
    top of the caller's compressed bytes. Tolerant of trailing garbage
    and truncated tails (stops at the last complete record)."""
    chunks = _decompressed_chunks(raw)
    buf = bytearray()
    while True:
        # skip inter-record blank lines
        while _ensure(buf, chunks, 2) and buf[:2] == _CRLF:
            del buf[:2]
        if not _ensure(buf, chunks, 5) or bytes(buf[:5]) != b"WARC/":
            return
        head_end = _find(buf, chunks, _CRLF + _CRLF)
        if head_end < 0:
            return
        headers = _split_headers(bytes(buf[buf.find(_CRLF):head_end]))
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            return
        body_start = head_end + 4
        if not _ensure(buf, chunks, body_start + length):
            return  # truncated body: the record never completed
        body = bytes(buf[body_start:body_start + length])
        del buf[:body_start + length]
        rec_type = headers.get("warc-type", "")
        out = {
            "record_type": rec_type,
            "url": headers.get("warc-target-uri"),
            "warc_ts": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": None,
            "payload": body,
        }
        if rec_type == "response" and body.startswith(b"HTTP/"):
            # strip the HTTP envelope: status line + headers, keep body
            http_end = body.find(_CRLF + _CRLF)
            if http_end >= 0:
                status_line = body.split(_CRLF, 1)[0].split(b" ")
                if len(status_line) >= 2 and status_line[1].isdigit():
                    out["http_status"] = int(status_line[1])
                http_headers = _split_headers(body[:http_end])
                out["content_type"] = http_headers.get(
                    "content-type", out["content_type"])
                out["payload"] = body[http_end + 4:]
        yield out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """All WARC records under ``path`` as rows (schema
    ``RECORD_SCHEMA``). Filter ``record_type = 'response'`` for pages;
    ``warc_responses`` below does that plus the pages-shape projection."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                rows = {k: [] for k in ("src_file", "record_type", "url",
                                        "warc_ts", "content_type",
                                        "http_status", "payload")}
                for rec in iter_warc_records(bytes(content)):
                    rows["src_file"].append(fpath)
                    for k in ("record_type", "url", "warc_ts",
                              "content_type", "http_status", "payload"):
                        rows[k].append(rec[k])
                if rows["src_file"]:
                    yield pd.DataFrame(rows)

    return files.mapInPandas(parse, RECORD_SCHEMA)


def warc_responses(spark: SparkSession, path: str) -> DataFrame:
    """HTTP 200 response records in the engine's pages-table shape:
    ``(url, warc_ts timestamp, html binary)`` — feed straight into
    ``text.extracted_text_col(html)`` (native decode + tag strip) and
    ``compile_plan`` validation."""
    from pyspark.sql import functions as F

    recs = read_warc(spark, path)
    return (
        recs.where((F.col("record_type") == "response")
                   & (F.col("http_status") == 200)
                   & F.col("url").isNotNull())
        .select(
            "url",
            F.to_timestamp("warc_ts").alias("warc_ts"),
            F.col("payload").alias("html"),
        )
    )


def wet_documents(spark: SparkSession, path: str) -> DataFrame:
    """Common Crawl WET (extracted-text) records → ``(url, warc_ts
    timestamp, text string)`` — the pre-extracted sibling of
    ``warc_responses`` (*.warc.wet.gz files carry ``WARC-Type:
    conversion`` records whose bare body is the page's plain text).

    The byte→string decode happens in a map-side Arrow kernel with
    ``errors='replace'`` rather than native ``F.decode``: WET bodies
    are nominally UTF-8 but real crawl segments carry occasional
    mis-encoded runs, and Spark 4's strict codec would fail the whole
    task for one bad byte — per-char U+FFFD substitution (what every
    WET consumer does) needs the Python codec's error handler."""
    from pyspark.sql import functions as F

    recs = read_warc(spark, path)
    conv = recs.where((F.col("record_type") == "conversion")
                      & F.col("url").isNotNull()) \
        .select("url", "warc_ts", "payload")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "url": pdf["url"],
                "warc_ts": pdf["warc_ts"],
                "text": [str(bytes(p or b""), "utf-8", errors="replace")
                         for p in pdf["payload"].to_numpy()],
            })

    out = conv.mapInPandas(decode, "url string, warc_ts string, text string")
    return out.select("url", F.to_timestamp("warc_ts").alias("warc_ts"),
                      "text")


# ------------------------------------------------------------ fixture writer

def build_warc_bytes(records: list[dict], compress: bool = False) -> bytes:
    """Spec-conformant WARC/1.0 bytes for tests. Each record dict:
    ``{url, ts, html, status=200, type='response'}``; response records
    carry a full HTTP envelope like real crawl output, while
    ``type='conversion'`` emits WET-style extracted-text records
    (``Content-Type: text/plain``, bare body — Common Crawl's *.wet
    layout). ``compress=True`` emits gzip MULTI-member (one member per
    record — Common Crawl's actual layout, which seekable readers rely
    on)."""
    members: list[bytes] = []
    for r in records:
        html = r["html"] if isinstance(r["html"], bytes) else r["html"].encode()
        rec_type = r.get("type", "response")
        if rec_type == "conversion":
            body = html
            content_type = "text/plain"
        else:
            status = r.get("status", 200)
            body = (f"HTTP/1.1 {status} OK\r\n"
                    f"Content-Type: text/html\r\n"
                    f"Content-Length: {len(html)}\r\n\r\n").encode() + html
            content_type = "application/http; msgtype=response"
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rec_type}\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r['ts']}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        members.append(head + body + _CRLF + _CRLF)
    if not compress:
        return b"".join(members)
    return b"".join(gzip.compress(m) for m in members)


def write_warc_fixture(path: str, records: list[dict],
                       compress: bool = False) -> None:
    with open(path, "wb") as f:
        f.write(build_warc_bytes(records, compress))
