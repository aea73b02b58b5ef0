"""CDX-J index source (sources/cdx.py)."""

import json

from docvault_ocr_service_spark.sources.cdx import (
    latest_captures, parse_cdxj, plan_fetch, surt_key)

from pyspark.sql import functions as F


def _line(urlkey, ts, **kw):
    return f"{urlkey} {ts} {json.dumps(kw)}"


LINES = [
    _line("com,example)/a", "20240101120000", url="https://example.com/a",
          mime="text/html", status="200", digest="sha1:AAA",
          length="100", offset="0", filename="w1.warc.gz"),
    _line("com,example)/a", "20240301120000", url="https://example.com/a",
          mime="text/html", status="200", digest="sha1:AAA",
          length="101", offset="500", filename="w2.warc.gz"),   # unchanged
    _line("com,example)/b", "20240301120000", url="https://example.com/b",
          mime="text/html", status="200", digest="sha1:BBB",
          length="200", offset="900", filename="w2.warc.gz"),
    _line("com,example)/c", "20240301120000", url="https://example.com/c",
          mime="application/pdf", status="200", digest="sha1:CCC",
          length="300", offset="1200", filename="w2.warc.gz"),
    _line("com,example)/d", "20240301120000", url="https://example.com/d",
          mime="text/html", status="404", digest="sha1:DDD",
          length="50", offset="1500", filename="w2.warc.gz"),
    "garbage line without json",
    "three part {not-json}",
]


def test_parse_cdxj_types_and_malformed(spark):
    df = spark.createDataFrame([(l,) for l in LINES], "line string")
    rows = parse_cdxj(df).collect()
    assert len(rows) == 5                       # malformed dropped
    r = next(x for x in rows if x["urlkey"] == "com,example)/b")
    assert (r["ts"], r["status"], r["length"], r["offset"]) == \
        ("20240301120000", 200, 200, 900)
    assert r["digest"] == "sha1:BBB"
    assert r["filename"] == "w2.warc.gz"


def test_latest_captures_keeps_newest(spark):
    df = parse_cdxj(
        spark.createDataFrame([(l,) for l in LINES], "line string"))
    latest = {r["urlkey"]: r["ts"] for r in latest_captures(df).collect()}
    assert latest["com,example)/a"] == "20240301120000"
    assert len(latest) == 4


def test_plan_fetch_digest_and_filters(spark):
    df = parse_cdxj(
        spark.createDataFrame([(l,) for l in LINES], "line string"))
    seen = spark.createDataFrame([("sha1:AAA",)], "digest string")
    got = {r["urlkey"] for r in plan_fetch(df, seen).collect()}
    # /a unchanged (digest seen), /c wrong mime, /d wrong status
    assert got == {"com,example)/b"}
    # with pdf allowed, /c joins the plan
    got2 = {r["urlkey"] for r in plan_fetch(
        df, seen, mime_prefixes=("text/", "application/pdf")).collect()}
    assert got2 == {"com,example)/b", "com,example)/c"}


def test_surt_key(spark):
    df = spark.createDataFrame(
        [("https://Sub.Example.COM:443/Path/X?q=1",),
         ("http://example.com",),
         ("https://a.b.c.example.org/",)], "url string")
    got = [r[0] for r in df.select(surt_key(F.col("url"))).collect()]
    assert got == ["com,example,sub)/path/x?q=1",
                   "com,example)/",
                   "org,example,c,b,a)/"]


def test_surt_key_uppercase_scheme_and_userinfo(spark):
    df = spark.createDataFrame(
        [("HTTPS://A.Example.COM/X",),
         ("https://user@host.example/p",)], "url string")
    got = [r[0] for r in df.select(surt_key(F.col("url"))).collect()]
    assert got == ["com,example,a)/x", "example,host)/p"]


def test_plan_fetch_filters_before_collapse(spark):
    # newest capture is a 404 — the older unseen 200 must still be
    # fetched (CDX filter= convention: filter, then collapse)
    lines = [
        _line("com,example)/e", "20240101120000",
              url="https://example.com/e", mime="text/html",
              status="200", digest="sha1:EEE", length="10",
              offset="0", filename="w1.warc.gz"),
        _line("com,example)/e", "20240601120000",
              url="https://example.com/e", mime="text/html",
              status="404", digest="sha1:E404", length="5",
              offset="9", filename="w2.warc.gz"),
    ]
    df = parse_cdxj(
        spark.createDataFrame([(l,) for l in lines], "line string"))
    seen = spark.createDataFrame([("sha1:ZZZ",)], "digest string")
    rows = plan_fetch(df, seen).collect()
    assert len(rows) == 1
    assert rows[0]["digest"] == "sha1:EEE"
    assert rows[0]["ts"] == "20240101120000"
