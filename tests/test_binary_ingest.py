"""S2 path ingest: binaryFile directory scan → INPUT_SCHEMA → extraction.

Reference analogue: the filesystem upload route validates content by
magic bytes, not extension (app/routes.py:92-138 + the V1 type filter);
this test plants a mis-labeled file to pin the same behavior.
"""

import datetime

from docvault_ocr_service_spark.schemas import INPUT_SCHEMA
from docvault_ocr_service_spark.sources.tables import read_binary_corpus

HTML = (b"<html><head><meta charset='utf-8'><title>t</title></head><body>"
        b"<article><p>" + b"Invoice body text. " * 30 + b"</p></article>"
        b"</body></html>")


def _plant(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.html").write_bytes(HTML)
    (tmp_path / "sub" / "b.html").write_bytes(HTML.replace(b"Invoice",
                                                           b"Receipt"))
    # extension lies: .html bytes are really a PNG header
    (tmp_path / "sub" / "c.html").write_bytes(b"\x89PNG\r\n\x1a\n" + b"x" * 64)
    (tmp_path / "notes.txt").write_bytes(b"plain text, not html")
    return tmp_path


def test_read_binary_corpus_schema_and_recursion(spark, tmp_path):
    df = read_binary_corpus(spark, str(_plant(tmp_path)))
    assert df.schema.fieldNames() == INPUT_SCHEMA.fieldNames()
    assert [f.dataType for f in df.schema.fields] == \
        [f.dataType for f in INPUT_SCHEMA.fields]
    rows = {r.url.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.html", "b.html", "c.html", "notes.txt"}
    assert rows["a.html"].html == HTML
    assert rows["a.html"].text is None and rows["a.html"].lang is None
    assert isinstance(rows["a.html"].warc_ts, datetime.datetime)


def test_read_binary_corpus_glob(spark, tmp_path):
    df = read_binary_corpus(spark, str(_plant(tmp_path)), glob="*.html")
    names = {r.url.rsplit("/", 1)[-1] for r in df.select("url").collect()}
    assert names == {"a.html", "b.html", "c.html"}


def test_binary_ingest_through_extraction(spark, tmp_path):
    """End-to-end: files on disk → extraction results, with magic-byte
    (not extension) format identification."""
    from docvault_ocr_service_spark.functions.udfs import run_extraction

    pages = read_binary_corpus(spark, str(_plant(tmp_path)), glob="*.html")
    res = {r.url.rsplit("/", 1)[-1]: r
           for r in run_extraction(pages).collect()}
    assert res["a.html"].status == "done"
    assert "Invoice body text." in res["a.html"].text
    assert res["b.html"].status == "done"
    # the PNG-in-.html file must be sniffed as an image, not parsed as HTML
    assert res["c.html"].status == "failed_permanent"
    assert res["c.html"].error_kind.startswith("unsupported_format:image/png")
