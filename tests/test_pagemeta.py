"""Page-metadata + feed-item extraction (columnar regexp path)."""

from docvault_ocr_service_spark.functions.pagemeta import (
    extract_feed_items, extract_page_metadata)

PAGE = """<!doctype html>
<html LANG="pl-PL"><head>
<title> Strona · Testowa </title>
<meta name="description" content="Opis strony.">
<meta content="reversed order works" name="robots">
<meta property="og:title" content="OG Tytuł">
<meta property="og:image" content="https://cdn.example/i.png">
<link rel="canonical" href="https://example.pl/a?x=1">
</head><body><p>treść</p></body></html>"""

RSS = """<?xml version="1.0"?><rss><channel>
<title>Feed</title>
<item><title>First</title><link>https://e.x/1</link>
<pubDate>Mon, 01 Jul 2024 10:00:00 GMT</pubDate></item>
<item><title>Second</title><link> https://e.x/2 </link></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
<entry><title>A1</title><link href="https://a.x/e1"/>
<updated>2024-07-02T00:00:00Z</updated></entry>
</feed>"""


def test_page_metadata_fields(spark):
    df = spark.createDataFrame([("u1", PAGE), ("u2", "<p>no head</p>")],
                               ["url", "html_text"])
    got = {r["url"]: r for r in extract_page_metadata(df).collect()}
    r = got["u1"]
    assert r["title"] == "Strona · Testowa"          # trimmed
    assert r["description"] == "Opis strony."
    assert r["og_title"] == "OG Tytuł"
    assert r["og_image"] == "https://cdn.example/i.png"
    assert r["canonical_url"] == "https://example.pl/a?x=1"
    assert r["meta_robots"] == "reversed order works"  # attr order B
    assert r["html_lang"] == "pl-PL"                  # case-insensitive
    r2 = got["u2"]
    assert r2["title"] == "" and r2["canonical_url"] == ""


def test_feed_items_rss_and_atom(spark):
    df = spark.createDataFrame([("f1", RSS), ("f2", ATOM),
                                ("f3", "<html>not a feed</html>")],
                               ["url", "xml"])
    items = extract_feed_items(df).collect()
    by = {}
    for r in items:
        by.setdefault(r["feed"], []).append(r)
    f1 = sorted(by["f1"], key=lambda r: r["item_no"])
    assert [r["item_title"] for r in f1] == ["First", "Second"]
    assert f1[0]["item_link"] == "https://e.x/1"
    assert f1[1]["item_link"] == "https://e.x/2"     # trimmed
    assert f1[0]["item_date"].startswith("Mon, 01 Jul")
    f2 = by["f2"]
    assert f2[0]["item_title"] == "A1"
    assert f2[0]["item_link"] == "https://a.x/e1"    # atom href form
    assert f2[0]["item_date"] == "2024-07-02T00:00:00Z"
    assert "f3" not in by                            # zero items, no rows


def test_extract_jsonld(spark):
    from docvault_ocr_service_spark.functions.pagemeta import (
        extract_jsonld)

    html = ('<head><script type="application/ld+json">'
            '{"@type":"Product","name":"Widget","offers":{}}'
            '</script>'
            "<script type='application/ld+json'>{broken</script>"
            '<script type="text/javascript">ignored()</script></head>')
    df = spark.createDataFrame([("https://x/p", html)],
                               ["url", "html_text"])
    rows = extract_jsonld(df).orderBy("block_idx").collect()
    assert len(rows) == 2
    assert rows[0]["ld_type"] == "Product"
    assert rows[0]["name"] == "Widget" and rows[0]["valid"]
    assert not rows[1]["valid"] and rows[1]["ld_type"] is None


def test_extract_hreflang(spark):
    from docvault_ocr_service_spark.functions.pagemeta import (
        extract_hreflang)

    html = ('<link rel="alternate" hreflang="FR" href="https://x/fr">'
            '<link href="https://x/de" hreflang=de rel=alternate>'
            '<link rel="alternate" hreflang="x-default" '
            'href="https://x/">'
            '<link rel="stylesheet" href="/s.css">')
    df = spark.createDataFrame([("https://x/en", html)],
                               ["url", "html_text"])
    rows = sorted((r["hreflang"], r["alt_url"])
                  for r in extract_hreflang(df).collect())
    assert rows == [("de", "https://x/de"), ("fr", "https://x/fr"),
                    ("x-default", "https://x/")]
