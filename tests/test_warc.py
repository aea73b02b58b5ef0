"""WARC source: round-trip, HTTP framing, gzip members, garbage files."""

import gzip
from datetime import datetime, timezone

import pytest

from docvault_ocr_service_spark.schemas import INPUT_SCHEMA
from docvault_ocr_service_spark.sources.warc import (
    WarcFormatError,
    encode_warc,
    parse_warc,
    read_warc,
    split_http_response,
)

TS = datetime(2024, 5, 17, 12, 0, 5, tzinfo=timezone.utc)
RECS = [
    {"url": "https://a.example/x", "warc_ts": TS,
     "html": b"<html><body>alpha</body></html>"},
    {"url": "https://b.example/y", "warc_ts": TS,
     "html": "<html><body>łódź</body></html>".encode()},
    {"url": "https://c.example/z", "warc_ts": TS, "html": b"", "status": 404},
]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    data = encode_warc(RECS, gzip_members=gz)
    got = list(parse_warc(data))
    assert [r["url"] for r in got] == [r["url"] for r in RECS]
    assert [r["html"] for r in got] == [r["html"] for r in RECS]
    assert all(r["warc_ts"] == TS for r in got)
    assert [r["http_status"] for r in got] == [200, 200, 404]
    assert all(r["warc_type"] == "response" for r in got)


def test_encode_deterministic():
    assert encode_warc(RECS, gzip_members=True) == \
        encode_warc(RECS, gzip_members=True)


def test_http_chunked_and_gzip_body():
    body = b"hello chunked world"
    chunked = b"7\r\nhello c\r\nC\r\nhunked world\r\n0\r\n\r\n"
    raw = (b"HTTP/1.1 200 OK\r\ntransfer-encoding: chunked\r\n\r\n" + chunked)
    headers, got = split_http_response(raw)
    assert got == body
    gz_body = gzip.compress(b"compressed page", mtime=0)
    raw = (b"HTTP/1.1 200 OK\r\ncontent-encoding: gzip\r\n\r\n" + gz_body)
    _, got = split_http_response(raw)
    assert got == b"compressed page"
    # mislabeled content-encoding: keep raw bytes, don't raise
    raw = b"HTTP/1.1 200 OK\r\ncontent-encoding: gzip\r\n\r\nnot-gzip"
    _, got = split_http_response(raw)
    assert got == b"not-gzip"


def test_non_response_records_and_truncation():
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
            b"\r\nabcd\r\n\r\n")
    data = info + encode_warc(RECS[:1])
    got = list(parse_warc(data))
    assert [r["warc_type"] for r in got] == ["warcinfo", "response"]
    with pytest.raises(WarcFormatError):
        list(parse_warc(encode_warc(RECS)[:40]))
    with pytest.raises(WarcFormatError):
        list(parse_warc(b"\x1f\x8btruncated-gzip"))


def test_read_warc_spark(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(encode_warc(RECS))
    (tmp_path / "b.warc.gz").write_bytes(
        encode_warc([{"url": "https://d.example/w", "warc_ts": TS,
                      "html": b"<p>gzipped member</p>"}], gzip_members=True))
    (tmp_path / "junk.warc").write_bytes(b"not a warc at all")
    df = read_warc(spark, str(tmp_path))
    assert df.schema == INPUT_SCHEMA or \
        df.schema.fieldNames() == INPUT_SCHEMA.fieldNames()
    rows = {r.url: r for r in df.collect()}
    # 404 record filtered; junk file surfaces as an error row
    assert set(rows) == {"https://a.example/x", "https://b.example/y",
                         "https://d.example/w",
                         next(u for u in rows if u.endswith("junk.warc"))}
    assert rows["https://a.example/x"].html == RECS[0]["html"]
    assert rows["https://d.example/w"].html == b"<p>gzipped member</p>"
    assert rows["https://a.example/x"].warc_ts is not None
    junk = next(u for u in rows if u.endswith("junk.warc"))
    assert rows[junk].html is None


def test_warc_to_extraction(spark, tmp_path):
    """WARC archive → read_warc → run_extraction end-to-end."""
    from docvault_ocr_service_spark.functions.udfs import run_extraction

    page = (b"<html><head><meta charset='utf-8'></head><body><article><p>"
            + b"Important invoice content here. " * 20
            + b"</p></article></body></html>")
    (tmp_path / "c.warc.gz").write_bytes(encode_warc(
        [{"url": "https://e.example/p", "warc_ts": TS, "html": page}],
        gzip_members=True))
    res = run_extraction(read_warc(spark, str(tmp_path))).collect()
    assert len(res) == 1 and res[0].status == "done"
    assert "Important invoice content here." in res[0].text


def test_single_gzip_member_whole_file():
    """Archives gzipped as ONE member (not per-record) must also parse."""
    data = gzip.compress(encode_warc(RECS), mtime=0)
    got = list(parse_warc(data))
    assert [r["url"] for r in got] == [r["url"] for r in RECS]
    assert [r["html"] for r in got] == [r["html"] for r in RECS]


def test_cumulative_size_is_not_capped(monkeypatch):
    """MAX_RECORD_BYTES guards ONE record; a many-record archive whose
    cumulative decompressed size exceeds it must parse fully (the
    pre-round-3 bug failed every real >128 MB-decompressed .warc.gz)."""
    from docvault_ocr_service_spark.sources import warc as W

    recs = [{"url": f"https://s.example/{i}", "warc_ts": TS,
             "html": b"x" * 100} for i in range(12)]
    data = encode_warc(recs, gzip_members=True)
    monkeypatch.setattr(W, "MAX_RECORD_BYTES", 300)  # << cumulative size
    got = list(W.parse_warc(data))
    assert [r["url"] for r in got] == [r["url"] for r in recs]


def test_oversized_record_skipped_not_fatal(monkeypatch):
    """A single record over MAX_RECORD_BYTES is skipped in place; its
    neighbours still come through."""
    from docvault_ocr_service_spark.sources import warc as W

    recs = [
        {"url": "https://ok.example/a", "warc_ts": TS, "html": b"small"},
        {"url": "https://big.example/b", "warc_ts": TS, "html": b"y" * 5000},
        {"url": "https://ok.example/c", "warc_ts": TS, "html": b"small2"},
    ]
    for gz in (False, True):
        data = encode_warc(recs, gzip_members=gz)
        monkeypatch.setattr(W, "MAX_RECORD_BYTES", 1000)
        got = list(W.parse_warc(data))
        assert [r["url"] for r in got] == \
            ["https://ok.example/a", "https://ok.example/c"]


def test_truncated_gzip_body_keeps_raw_bytes():
    """Content-Encoding: gzip with a truncated body must not raise."""
    gz = gzip.compress(b"full page body", mtime=0)[:10]
    raw = b"HTTP/1.1 200 OK\r\ncontent-encoding: gzip\r\n\r\n" + gz
    _, body = split_http_response(raw)
    assert body == gz                            # raw bytes kept


@pytest.mark.parametrize("gz", [False, True])
def test_oversized_header_line_names_the_problem(gz):
    """A 64 KB+ header line must raise a WarcFormatError naming the
    limit — not silently truncate and mis-frame the record walk."""
    monster = (b"WARC/1.0\r\nWARC-Target-URI: https://e.example/"
               + b"a" * (70 * 1024) + b"\r\n"
               + b"Content-Length: 0\r\n\r\n\r\n\r\n")
    data = gzip.compress(monster) if gz else monster
    with pytest.raises(WarcFormatError, match="64 KB"):
        list(parse_warc(data))


def test_final_unterminated_line_is_not_an_error():
    data = encode_warc(RECS[:1], gzip_members=False)
    # strip the trailing record separator newlines: parse must still
    # terminate cleanly on EOF
    assert len(list(parse_warc(data.rstrip(b"\r\n")))) == 1


def test_wet_roundtrip(tmp_path):
    from docvault_ocr_service_spark.sources.warc import encode_wet

    recs = [{"url": "https://a.example/x", "warc_ts": TS,
             "text": "extracted text one\nwith lines"},
            {"url": "https://b.example/y", "warc_ts": None,
             "text": "łódź unicode façade"},
            {"url": "https://c.example/z", "warc_ts": TS, "text": None}]
    for gz in (False, True):
        parsed = list(parse_warc(encode_wet(recs, gzip_members=gz)))
        assert [p["warc_type"] for p in parsed] == ["conversion"] * 3
        assert [p["url"] for p in parsed] == [r["url"] for r in recs]
        for p, r in zip(parsed, recs):
            assert p["html"] == (r["text"] or "").encode("utf-8")


def test_write_wet_spark(spark, tmp_path):
    import glob as globmod

    from docvault_ocr_service_spark.sources.warc import encode_wet, \
        write_wet

    rows = [(f"https://e.example/{i}", TS, f"text number {i}")
            for i in range(20)] + [("https://e.example/err", TS, None)]
    df = spark.createDataFrame(rows, ["url", "warc_ts", "text"]) \
        .repartition(3)
    out = str(tmp_path / "wet")
    write_wet(df, out, records_per_shard=4)
    texts = set()
    for f in globmod.glob(out + "/*.warc.wet.gz"):
        with open(f, "rb") as fh:
            for rec in parse_warc(fh.read()):
                assert rec["warc_type"] == "conversion"
                texts.add(rec["html"].decode())
    assert texts == {f"text number {i}" for i in range(20)}  # errs skipped


def test_read_wet_roundtrip(spark, tmp_path):
    """write_wet → read_wet: the consumer side of the WET contract."""
    from docvault_ocr_service_spark.sources.warc import (
        read_wet, write_wet)

    rows = [(f"https://ex.com/{i}", f"extracted text {i} body")
            for i in range(7)]
    df = spark.createDataFrame(rows, ["url", "text"])
    out = tmp_path / "wet"
    write_wet(df, str(out))
    back = read_wet(spark, str(out))
    got = {(r["url"], r["text"]) for r in back.collect()}
    assert got == set(rows)
    assert back.schema["warc_ts"].dataType.typeName() == "timestamp"
