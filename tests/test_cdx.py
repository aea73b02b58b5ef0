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


def test_read_warc_records_planned(spark, tmp_path):
    """encode_warc_indexed offsets are exact: the planned reader pulls
    precisely the indexed slices back out, and a stale-index offset
    becomes an error row, never a task failure."""
    from datetime import datetime, timezone

    from docvault_ocr_service_spark.sources.warc import (
        encode_warc_indexed, read_warc_records)

    ts = datetime(2024, 5, 1, tzinfo=timezone.utc)
    recs = [{"url": f"https://ex.com/p{i}", "warc_ts": ts,
             "html": (f"<html><body><p>page {i} body text "
                      f"{'x' * i}</p></body></html>").encode()}
            for i in range(5)]
    blob, lines = encode_warc_indexed(recs, "shard0.warc.gz")
    (tmp_path / "shard0.warc.gz").write_bytes(blob)

    captures = spark.createDataFrame([(l,) for l in lines],
                                     "line string")
    plan = parse_cdxj(captures)
    got = read_warc_records(spark, plan,
                            base_dir=str(tmp_path)).collect()
    assert sorted(r["url"] for r in got) == \
        sorted(r["url"] for r in recs)
    by_url = {r["url"]: r for r in got}
    for rec in recs:
        assert bytes(by_url[rec["url"]]["html"]) == rec["html"]
        assert by_url[rec["url"]]["digest"].startswith("sha1:")

    # stale index: offset into the middle of a member -> error row
    bad = plan.limit(1).withColumn("offset", F.col("offset") + 7)
    err = read_warc_records(spark, bad, base_dir=str(tmp_path)).collect()
    assert len(err) == 1 and err[0]["html"] is None
    assert "#" in err[0]["url"]


def test_cdx_pipeline_dont_refetch_loop(spark, tmp_path):
    """The composed don't-refetch loop: run 1 over a CDX index fetches
    everything and banks the digests; run 2 over the SAME index (a
    recrawl where nothing changed) plans zero fetches."""
    from datetime import datetime, timezone

    from docvault_ocr_service_spark import corpus
    from docvault_ocr_service_spark.plans.pipeline import (
        run_crawl_pipeline)
    from docvault_ocr_service_spark.sources.warc import (
        encode_warc_indexed)

    ts = datetime(2024, 3, 1, tzinfo=timezone.utc)
    recs = []
    for i in range(12):
        r = corpus.generate_row(i)
        recs.append({"url": r["url"], "warc_ts": ts,
                     "html": r["html"] or (r["text"] or "").encode()})
    blob, lines = encode_warc_indexed(recs, "crawl0.warc.gz")
    warc_dir = tmp_path / "warc"
    warc_dir.mkdir()
    (warc_dir / "crawl0.warc.gz").write_bytes(blob)
    cdx_dir = tmp_path / "cdx"
    cdx_dir.mkdir()
    (cdx_dir / "index.cdx.gz.txt").write_text("\n".join(lines) + "\n")

    rep1 = run_crawl_pipeline(
        spark, str(warc_dir), str(tmp_path / "state1"),
        str(tmp_path / "out1"), cdx_dir=str(cdx_dir),
        seen_digests_dir=str(tmp_path / "seen"), window=512)
    assert rep1.cdx_planned == 12 and rep1.cdx_skipped == 0
    assert rep1.pages_in == 12

    rep2 = run_crawl_pipeline(
        spark, str(warc_dir), str(tmp_path / "state2"),
        str(tmp_path / "out2"), cdx_dir=str(cdx_dir),
        seen_digests_dir=str(tmp_path / "seen"), window=512)
    assert rep2.cdx_planned == 0
    assert rep2.cdx_skipped == 12
    assert rep2.extracted_done == 0
