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

Scale notes: gzip members are inflated *incrementally* — compressed
bytes are fed to ``zlib.decompressobj`` ~1 MB at a time and only as much
output is produced as the record walk consumes, so the decompressed-side
memory high-water mark is one record (plus one inflate step), never the
whole archive.  A record whose ``Content-Length`` exceeds
``MAX_RECORD_BYTES`` is *skipped* (read-and-discarded in chunks), not a
file-level failure — a 1 GB Common Crawl archive routinely inflates past
any whole-file cap, and one pathological record must not drop the other
~50k.  Oversized extracted payloads are additionally subject to the same
``MAX_PAYLOAD_BYTES`` admission the rest of the engine applies
(``extract/document.py``), so a pathological record can't OOM a task.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import uuid
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"
# skip (not fail) any single record declaring more than this (zip-bomb /
# OOM guard; the engine's admission cap is 50 MB, so anything bigger is
# dead on arrival anyway)
MAX_RECORD_BYTES = 128 * 1024 * 1024
# a WARC/HTTP header line longer than this is not a header line
_MAX_LINE = 64 * 1024


class WarcFormatError(ValueError):
    """Structurally invalid WARC data (bad header block / truncation)."""


class _GzipMemberStream:
    """Incremental reader over concatenated gzip members (.warc.gz).

    Inflates lazily: compressed input is fed to ``zlib.decompressobj``
    ~1 MB at a time and at most ``_STEP`` output bytes are produced per
    step, so holding a 1 GB archive's *compressed* bytes never implies
    holding its (much larger) decompressed form.  Exposes the subset of
    the binary-stream API ``parse_warc`` needs: ``readline`` / ``read``
    / ``skip``.
    """

    _STEP = 1 << 20  # compressed bytes fed / inflated bytes produced per step

    def __init__(self, data: bytes):
        self._data = memoryview(data)
        self._pos = 0           # next unread compressed offset
        self._pending = b""     # unconsumed_tail / next-member leftover
        self._d = zlib.decompressobj(wbits=31)
        self._chunks: list[bytes] = []   # inflated, not yet consumed
        self._avail = 0

    def _step(self) -> bool:
        """Inflate one step; False when the stream is cleanly exhausted."""
        d = self._d
        if d is None:
            return False
        if self._pending:
            src, self._pending = self._pending, b""
        else:
            if self._pos >= len(self._data):
                if not d.eof:
                    raise WarcFormatError("truncated gzip member in .warc.gz")
                self._d = None
                return False
            src = bytes(self._data[self._pos:self._pos + self._STEP])
            self._pos += len(src)
        try:
            out = d.decompress(src, self._STEP)
        except zlib.error as e:
            raise WarcFormatError(f"bad gzip member: {e}") from e
        self._pending = d.unconsumed_tail
        if d.eof:
            leftover = d.unused_data
            if leftover or self._pending or self._pos < len(self._data):
                self._pending = self._pending + leftover
                self._d = zlib.decompressobj(wbits=31)
            else:
                self._d = None
        if out:
            self._chunks.append(out)
            self._avail += len(out)
        return True

    def _take(self, n: int) -> bytes:
        """Remove and return up to n buffered bytes (no inflation)."""
        out, need = [], n
        while need > 0 and self._chunks:
            head = self._chunks[0]
            if len(head) <= need:
                out.append(head)
                need -= len(head)
                self._chunks.pop(0)
            else:
                out.append(head[:need])
                self._chunks[0] = head[need:]
                need = 0
        got = b"".join(out)
        self._avail -= len(got)
        return got

    def read(self, n: int) -> bytes:
        while self._avail < n and self._step():
            pass
        return self._take(n)

    def skip(self, n: int) -> int:
        """Discard n bytes without accumulating them; bytes skipped."""
        done = 0
        while done < n:
            got = len(self._take(min(n - done, self._STEP)))
            if got == 0:
                if not self._step():
                    break
                continue
            done += got
        return done

    def _find_newline(self) -> int:
        off = 0
        for c in self._chunks:
            i = c.find(b"\n")
            if i >= 0:
                return off + i
            off += len(c)
        return -1

    def readline(self) -> bytes:
        while True:
            sep = self._find_newline()
            if sep >= 0:
                if sep > _MAX_LINE:
                    raise WarcFormatError("header line exceeds 64 KB")
                return self._take(sep + 1)
            if self._avail > _MAX_LINE:
                # a silent truncation here would mis-frame the record
                # walk and surface later as a confusing Content-Length
                # error — name the real problem instead
                raise WarcFormatError("header line exceeds 64 KB")
            if not self._step():
                return self._take(self._avail)    # final unterminated line


class _PlainStream:
    """Same read/skip/readline surface over already-inflated bytes."""

    def __init__(self, data: bytes):
        self._io = io.BytesIO(data)

    def read(self, n: int) -> bytes:
        return self._io.read(n)

    def skip(self, n: int) -> int:
        here = self._io.tell()
        self._io.seek(0, io.SEEK_END)
        end = self._io.tell()
        target = min(here + n, end)
        self._io.seek(target)
        return target - here

    def readline(self) -> bytes:
        line = self._io.readline(_MAX_LINE + 1)
        if len(line) > _MAX_LINE and not line.endswith(b"\n"):
            raise WarcFormatError("header line exceeds 64 KB")
        return line


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
    record of one WARC file (plain or multi-member gzip).

    Gzip archives are inflated incrementally (see ``_GzipMemberStream``);
    records declaring > ``MAX_RECORD_BYTES`` are skipped in place.
    """
    stream = (_GzipMemberStream(data) if data[:2] == _GZIP_MAGIC
              else _PlainStream(data))
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
            # one pathological record must not fail the whole archive
            if stream.skip(length) != length:
                raise WarcFormatError("truncated WARC payload")
            continue
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


def _record_id(url: str, ts) -> bytes:
    """Deterministic WARC-Record-ID (WARC/1.0 §5.2 requires one per
    record): a name-based UUID over url+timestamp, so identical inputs
    re-encode byte-identically."""
    digest = hashlib.md5(
        f"{url}|{ts.isoformat() if ts else ''}".encode()).digest()
    # version=3 stamps the RFC 4122 version/variant bits so the urn:uuid
    # is a spec-valid name-based UUID, not just 16 random-looking bytes
    return f"<urn:uuid:{uuid.UUID(bytes=digest, version=3)}>".encode()


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
            + b"WARC-Record-ID: " + _record_id(r["url"], ts) + CRLF
            + b"WARC-Target-URI: " + r["url"].encode() + CRLF
            + b"WARC-Date: "
            + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + CRLF
            + b"Content-Type: application/http; msgtype=response\r\n"
            + b"Content-Length: " + str(len(http)).encode() + CRLF
            + CRLF)
        rec = hdr + http + CRLF + CRLF
        out.append(gzip.compress(rec, 6, mtime=0) if gzip_members else rec)
    return b"".join(out)


def _surt(url: str) -> str:
    """Plain-Python SURT urlkey — the writer-side twin of
    ``sources/cdx.py::surt_key`` (same envelope: lowercase, userinfo
    and explicit port stripped, host labels reversed comma-joined,
    ``)`` then path with query, default path ``/``)."""
    import re

    u = url.lower()
    m = re.match(r"^[a-z]+://(?:[^/?#@]*@)?([^/?#]+)", u)
    host = re.sub(r":\d+$", "", m.group(1)) if m else ""
    rest = re.match(r"^[a-z]+://[^/?#]+([^#]*)", u)
    path = (rest.group(1) or "/") if rest else "/"
    return ",".join(reversed(host.split("."))) + ")" + (path or "/")


def encode_warc_indexed(records: list[dict], filename: str
                        ) -> tuple[bytes, list[str]]:
    """``encode_warc(gzip_members=True)`` plus its CDX-J index lines —
    every record its own gzip member (the Common-Crawl layout the
    planned-read path relies on), each line carrying the member's
    exact (offset, length) in the returned bytes, a SURT urlkey, the
    capture timestamp from ``warc_ts`` and a sha1 content digest over
    the html payload.  An engine that writes archives should index
    them; the index is also the natural fixture for the CDX-planned
    fetch oracle."""
    import hashlib as _hashlib
    import json as _json

    blob = bytearray()
    lines = []
    for r in records:
        ts = r.get("warc_ts") or datetime(2020, 1, 1, tzinfo=timezone.utc)
        member = encode_warc([r], gzip_members=True)
        digest = "sha1:" + _hashlib.sha1(r["html"] or b"").hexdigest()
        meta = {"url": r["url"], "mime": r.get("mime", "text/html"),
                "status": str(r.get("status", 200)), "digest": digest,
                "length": str(len(member)), "offset": str(len(blob)),
                "filename": filename}
        lines.append(f"{_surt(r['url'])} {ts.strftime('%Y%m%d%H%M%S')} "
                     f"{_json.dumps(meta)}")
        blob.extend(member)
    return bytes(blob), lines


def encode_wet(records: list[dict], gzip_members: bool = True) -> bytes:
    """Deterministic WET writer — Common Crawl's extracted-text sibling
    of the WARC archive: one ``WARC-Type: conversion`` record per page
    with ``Content-Type: text/plain`` and the UTF-8 extracted text as
    the payload (no HTTP framing).  Records are dicts with url (str),
    warc_ts (datetime | None), text (str | None).  This is the natural
    EXPORT format for the extraction job's results: downstream
    tokenizer/dedup pipelines that already consume CC WET shards can
    read the engine's output unchanged."""
    out = []
    for r in records:
        ts = r.get("warc_ts") or datetime(2020, 1, 1, tzinfo=timezone.utc)
        body = (r.get("text") or "").encode("utf-8")
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            + b"WARC-Record-ID: " + _record_id(r["url"], ts) + CRLF
            + b"WARC-Target-URI: " + r["url"].encode() + CRLF
            + b"WARC-Date: "
            + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + CRLF
            + b"Content-Type: text/plain\r\n"
            + b"Content-Length: " + str(len(body)).encode() + CRLF
            + CRLF)
        rec = hdr + body + CRLF + CRLF
        out.append(gzip.compress(rec, 6, mtime=0) if gzip_members else rec)
    return b"".join(out)


def write_wet(results, out_dir: str, *, records_per_shard: int = 1000,
              gzip_members: bool = True) -> None:
    """Results DataFrame (url, warc_ts?, text) → sharded .warc.wet.gz
    files under ``out_dir``, one file per task partition (the CC
    contract: files are the unit of work).  Error rows (null text) are
    skipped — WET carries successful conversions only.

    ``out_dir`` must be a path every executor can reach (shared
    filesystem / fuse mount); shards are written with plain ``open()``
    inside the task, so on a multi-node cluster point this at shared
    storage, not an executor-local disk.  Each task creates the
    directory itself, so a driver-only mkdir cannot strand executors
    on a missing path."""
    import os

    from pyspark.sql import functions as F

    has_ts = "warc_ts" in results.columns
    cols = ["url", "text"] + (["warc_ts"] if has_ts else [])
    rows = results.where(F.col("text").isNotNull()).select(*cols)

    def write_partition(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        batch: list[dict] = []
        shard = 0
        wrote = 0

        def flush():
            nonlocal shard, wrote
            if not batch:
                return
            name = f"part-{pid:05d}-{shard:04d}.warc.wet" + (
                ".gz" if gzip_members else "")
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(encode_wet(batch, gzip_members))
            wrote += len(batch)
            shard += 1
            batch.clear()

        for row in it:
            batch.append({"url": row["url"], "text": row["text"],
                          "warc_ts": row["warc_ts"] if has_ts else None})
            if len(batch) >= records_per_shard:
                flush()
        flush()
        yield wrote

    os.makedirs(out_dir, exist_ok=True)
    rows.rdd.mapPartitions(write_partition).sum()


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


def read_wet(spark, path: str, glob: str = "*.warc.wet*"):
    """Directory of WET shards (Common Crawl conversion records — or
    this engine's own ``write_wet`` output) → (url, warc_ts, text)
    rows.  The CONSUMER side of the WET contract: tokenizer/dedup
    pipelines that start from CC WET instead of raw WARC use this as
    their corpus source.  Same scale shape as ``read_warc`` (one task
    per shard, pyarrow.fs open, corrupt shards → error rows)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ])

    files = (spark.read.format("binaryFile")
             .option("recursiveFileLookup", "true")
             .option("pathGlobFilter", glob)
             .load(path)
             .select("path"))

    def kernel(batches):
        from pyarrow import fs as pafs

        cols = ["url", "warc_ts", "text"]
        for pdf in batches:
            for fpath in pdf["path"]:
                rows = []
                try:
                    fsys, rel = pafs.FileSystem.from_uri(str(fpath))
                    with fsys.open_input_stream(rel) as f:
                        data = f.read()
                    for rec in parse_warc(data):
                        if rec["warc_type"] != "conversion":
                            continue
                        rows.append((rec["url"], rec["warc_ts"],
                                     rec["html"].decode(
                                         "utf-8", errors="replace")))
                except (WarcFormatError, OSError):
                    rows.append((str(fpath), None, None))
                yield pd.DataFrame(rows, columns=cols)

    out = files.mapInPandas(kernel, schema=out_schema)
    return out.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))


def read_warc_records(spark, plan, base_dir: str | None = None):
    """CDX-planned record reads: ``plan`` rows (filename, offset,
    length, digest) → INPUT_SCHEMA columns + the plan's ``digest``
    (so the caller can append fetched digests to its seen-store).

    This is the don't-refetch path: instead of scanning whole
    archives, each task seeks to the planned (offset, length) slices —
    on Common-Crawl-shaped archives every record is its own gzip
    member, so a slice is a self-contained stream for ``parse_warc``.
    Scale shape: the plan repartitions by filename and sorts by offset
    within partitions, so one task touches few archives and reads each
    monotonically (sequential-friendly on object stores); only the
    planned bytes are ever fetched.  A bad slice (stale index, corrupt
    member) becomes an error row, never a task failure."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..schemas import INPUT_SCHEMA

    out_schema = T.StructType(
        INPUT_SCHEMA.fields
        + [T.StructField("digest", T.StringType(), True)])

    rows_df = (plan.select("filename", "offset", "length", "digest")
               .repartition(F.col("filename"))
               .sortWithinPartitions("filename", "offset"))

    def kernel(batches):
        from pyarrow import fs as pafs

        cols = ["url", "warc_ts", "html", "text", "lang", "digest"]
        cur_name, cur_file = None, None
        for pdf in batches:
            rows = []
            for name, off, length, digest in zip(
                    pdf["filename"], pdf["offset"], pdf["length"],
                    pdf["digest"]):
                full = (name if base_dir is None
                        else f"{base_dir.rstrip('/')}/{name}")
                try:
                    if name != cur_name:
                        if cur_file is not None:
                            cur_file.close()
                            cur_file = None
                        cur_name = None
                        fsys, rel = pafs.FileSystem.from_uri(str(full))
                        cur_file = fsys.open_input_file(rel)
                        cur_name = name
                except (OSError, ValueError):
                    # the ARCHIVE is unreachable or its name is
                    # malformed (pyarrow raises ArrowInvalid — a
                    # ValueError — on a bad URI from a stale/corrupt
                    # index): error row, handle state already reset so
                    # the next row retries
                    rows.append((f"{full}#{off}", None, None,
                                 None, None, digest))
                    continue
                try:
                    cur_file.seek(int(off))
                    data = cur_file.read(int(length))
                    rec = next((r for r in parse_warc(data)
                                if r["warc_type"] == "response"), None)
                    if rec is None:
                        raise WarcFormatError("no response record "
                                              "in planned slice")
                    rows.append((rec["url"], rec["warc_ts"],
                                 rec["html"], None, None, digest))
                except (WarcFormatError, EOFError, OSError,
                        ValueError):
                    # stale index / corrupt member → error row (null
                    # payload, like read_warc's corrupt-archive rows —
                    # the checkpoint taxonomy labels it empty_payload);
                    # the archive handle stays OPEN — the file itself
                    # is healthy, only this slice was bad
                    rows.append((f"{full}#{off}", None, None,
                                 None, None, digest))
            yield pd.DataFrame(rows, columns=cols)
        if cur_file is not None:
            cur_file.close()

    out = rows_df.mapInPandas(kernel, schema=out_schema)
    return out.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
