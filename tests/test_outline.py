"""Heading-outline extraction (functions/pagemeta.py::extract_outline)."""

from docvault_ocr_service_spark.functions.pagemeta import extract_outline

PAGE = """
<html><body>
<h1 class="t">Main &amp; Title</h1>
<p>text</p>
<h2>Section <b>One</b></h2>
<h3></h3>
<h2>Section&nbsp;Two</h2>
<H4>deep</H4>
</body></html>
"""


def test_outline_basic(spark):
    df = spark.createDataFrame([("u", PAGE)], "url string, html_text string")
    got = [(r["heading_idx"], r["level"], r["heading"])
           for r in sorted(extract_outline(df).collect(),
                           key=lambda r: r["heading_idx"])]
    assert got == [
        (0, 1, "Main & Title"),
        (1, 2, "Section One"),
        # idx 2 is the empty <h3> — dropped, slot preserved
        (3, 2, "Section Two"),
        (4, 4, "deep"),
    ]


def test_outline_no_headings(spark):
    df = spark.createDataFrame(
        [("u", "<p>nothing</p>"), ("v", None)],
        "url string, html_text string")
    assert extract_outline(df).count() == 0


def test_outline_crossed_tags_contract(spark):
    # RE2 has no backreferences: a crossed close ends the match at the
    # first </hN> — documented contract
    df = spark.createDataFrame(
        [("u", "<h1>title</h2><h2>next</h1>")],
        "url string, html_text string")
    got = [(r["level"], r["heading"])
           for r in sorted(extract_outline(df).collect(),
                           key=lambda r: r["heading_idx"])]
    assert got == [(1, "title"), (2, "next")]
