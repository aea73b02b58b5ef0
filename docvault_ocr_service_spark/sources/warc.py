"""WARC source: the container format Common Crawl actually ships.

The reference service receives documents one at a time over HTTP
(``app/routes.py``); a crawl-scale corpus arrives instead as WARC
(ISO 28500) archives — ~1 GB files of length-prefixed records, usually
with **per-record gzip members** (``.warc.gz``).  This module turns a
directory of WARC files into the engine's INPUT_SCHEMA table:

- ``read_warc(spark, path)`` — ``binaryFile`` scan (one file = one row =
  one task, the standard Common-Crawl processing granularity: WARC.gz is
  not block-splittable, and CC shards the crawl into ~64k files exactly
  so that *files* are the unit of parallelism) → ``mapInPandas`` parse →
  one output row per ``response`` record.
- ``parse_warc(data)`` — pure-Python record walk: WARC header block,
  ``Content-Length``-delimited payload, HTTP header strip (incl. chunked
  transfer-encoding), multi-member gzip via ``zlib``.
- ``encode_warc(records)`` — deterministic writer used by tests and the
  round-trip invariant query (also handy to re-shard a corpus).

Scale notes: parsing is streamed record-by-record (no whole-file string
split), and the per-file memory high-water mark is one decompressed
record.  Oversized extracted payloads are subject to the same
``MAX_PAYLOAD_BYTES`` admission the rest of the engine applies
(``extract/document.py``), so a pathological record can't OOM a task.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"
# refuse to inflate a single record past this (zip-bomb guard; the
# engine's admission cap is 50 MB, so anything bigger is dead on arrival)
MAX_RECORD_BYTES = 128 * 1024 * 1024


class WarcFormatError(ValueError):
    """Structurally invalid WARC data (bad header block / truncation)."""


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout)."""
    out = []
    pos, total = 0, 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[pos:], MAX_RECORD_BYTES - total)
        except zlib.error as e:
            raise WarcFormatError(f"bad gzip member: {e}") from e
        out.append(chunk)
        total += len(chunk)
        if total >= MAX_RECORD_BYTES:
            raise WarcFormatError("gzip stream exceeds MAX_RECORD_BYTES")
        if not d.eof:  # truncated member
            raise WarcFormatError("truncated gzip member in .warc.gz")
        consumed = len(data) - pos - len(d.unused_data)
        pos += max(consumed, 1)
    return b"".join(out)


def _parse_header_block(block: bytes) -> dict[str, str]:
    lines = block.split(CRLF)
    if not lines or not lines[0].startswith(b"WARC/"):
        raise WarcFormatError(f"bad WARC version line: {lines[:1]!r}")
    headers: dict[str, str] = {}
    for line in lines[1:]:
        if not line:
            continue
        k, _, v = line.partition(b":")
        headers[k.strip().decode("ascii", "replace").lower()] = \
            v.strip().decode("utf-8", "replace")
    return headers


def _dechunk(body: bytes) -> bytes:
    """Reverse HTTP/1.1 chunked transfer-encoding (best-effort: returns
    the raw body when the chunk framing is broken — crawls contain
    servers that lie)."""
    out, pos = [], 0
    try:
        while pos < len(body):
            eol = body.index(CRLF, pos)
            size = int(body[pos:eol].split(b";")[0], 16)
            if size == 0:
                break
            start = eol + 2
            out.append(body[start:start + size])
            pos = start + size + 2  # skip chunk + trailing CRLF
        return b"".join(out)
    except (ValueError, IndexError):
        return body


def split_http_response(payload: bytes) -> tuple[dict[str, str], bytes]:
    """(http headers lowercased, body bytes) from a raw HTTP response.

    WARC ``response`` records store the wire bytes: status line, headers,
    CRLFCRLF, body.  Payloads that don't look like HTTP come back whole
    with empty headers (some archives store bare content).
    """
    if not payload.startswith(b"HTTP/"):
        return {}, payload
    sep = payload.find(CRLF + CRLF)
    if sep < 0:
        return {}, payload
    headers: dict[str, str] = {}
    for line in payload[:sep].split(CRLF)[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().decode("ascii", "replace").lower()] = \
            v.strip().decode("utf-8", "replace")
    body = payload[sep + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    if headers.get("content-encoding", "").lower() in ("gzip", "x-gzip"):
        try:
            body = gzip.decompress(body)
        except (OSError, EOFError, zlib.error):
            pass  # mislabeled/truncated encoding — keep raw bytes
    return headers, body


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield dicts (url, warc_ts, html, warc_type, http_status) per
    record of one WARC file (plain or multi-member gzip)."""
    if data[:2] == _GZIP_MAGIC:
        data = _gunzip_members(data)
    stream = io.BytesIO(data)
    while True:
        # skip inter-record blank lines
        line = stream.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            raise WarcFormatError(f"expected record start, got {line[:40]!r}")
        header_lines = [line.rstrip(CRLF)]
        while True:
            line = stream.readline()
            if not line:
                raise WarcFormatError("truncated WARC header block")
            if line.strip() == b"":
                break
            header_lines.append(line.rstrip(CRLF))
        headers = _parse_header_block(CRLF.join(header_lines))
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise WarcFormatError(f"bad Content-Length: {e}") from e
        if length > MAX_RECORD_BYTES:
            raise WarcFormatError("record exceeds MAX_RECORD_BYTES")
        payload = stream.read(length)
        if len(payload) != length:
            raise WarcFormatError("truncated WARC payload")
        warc_type = headers.get("warc-type", "")
        url = headers.get("warc-target-uri", "")
        ts = None
        raw_ts = headers.get("warc-date", "")
        if raw_ts:
            try:
                ts = datetime.fromisoformat(raw_ts.replace("Z", "+00:00"))
            except ValueError:
                ts = None
        http_headers, body = (split_http_response(payload)
                              if warc_type == "response" else ({}, payload))
        status = None
        if payload.startswith(b"HTTP/"):
            try:
                status = int(payload.split(b" ", 2)[1])
            except (IndexError, ValueError):
                status = None
        yield {
            "url": url,
            "warc_ts": ts,
            "html": body,
            "warc_type": warc_type,
            "http_status": status,
            "http_headers": http_headers,
        }


def encode_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Deterministic WARC writer: records are dicts with url (str),
    warc_ts (datetime | None), html (bytes), optional status (int)."""
    out = []
    for r in records:
        ts = r.get("warc_ts") or datetime(2020, 1, 1, tzinfo=timezone.utc)
        body = r["html"] or b""
        http = (b"HTTP/1.1 %d OK\r\ncontent-type: text/html\r\n"
                b"content-length: %d\r\n\r\n"
                % (r.get("status", 200), len(body))) + body
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + b"WARC-Target-URI: " + r["url"].encode() + CRLF
            + b"WARC-Date: "
            + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + CRLF
            + b"Content-Type: application/http; msgtype=response\r\n"
            + b"Content-Length: " + str(len(http)).encode() + CRLF
            + CRLF)
        rec = hdr + http + CRLF + CRLF
        out.append(gzip.compress(rec, 6, mtime=0) if gzip_members else rec)
    return b"".join(out)


def read_warc(spark, path: str, glob: str = "*.warc*"):
    """Directory of WARC files → INPUT_SCHEMA DataFrame (response
    records with a 2xx status or no HTTP framing; one row per page).

    Parallelism = number of files, the Common-Crawl contract (CC shards
    a crawl into ~64k ≈1 GB archives precisely so files are the unit of
    work).  Scale shape: the JVM scan is pruned to ``path`` only — the
    archive bytes never cross the Arrow boundary as a column (128 rows ×
    1 GB per batch would OOM the Python worker); each task opens its
    file through ``pyarrow.fs`` (file/hdfs/s3 URIs), so the per-task
    high-water mark is ONE archive.  Corrupt files surface as error rows
    (url = file path, null payload) rather than task failures — a crawl
    always contains garbage.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from ..schemas import INPUT_SCHEMA

    files = (spark.read.format("binaryFile")
             .option("recursiveFileLookup", "true")
             .option("pathGlobFilter", glob)
             .load(path)
             .select("path"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyarrow import fs as pafs

        cols = ["url", "warc_ts", "html", "text", "lang"]
        for pdf in batches:
            for fpath in pdf["path"]:
                rows = []
                try:
                    fsys, rel = pafs.FileSystem.from_uri(str(fpath))
                    with fsys.open_input_stream(rel) as f:
                        data = f.read()
                    for rec in parse_warc(data):
                        if rec["warc_type"] != "response":
                            continue
                        s = rec["http_status"]
                        if s is not None and not 200 <= s < 300:
                            continue
                        rows.append((rec["url"], rec["warc_ts"],
                                     rec["html"], None, None))
                except (WarcFormatError, OSError):
                    rows.append((str(fpath), None, None, None, None))
                # one yield per archive: bounds the output batch to one
                # file's records, whatever maxRecordsPerBatch says
                yield pd.DataFrame(rows, columns=cols)

    out = files.mapInPandas(kernel, schema=INPUT_SCHEMA)
    # normalize tz-aware python datetimes through Spark's session tz
    return out.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
