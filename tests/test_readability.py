"""Arc90-Readability container scoring (extract/readability.py)."""

from docvault_ocr_service_spark.extract.readability import (
    readability_extract)


PAGE = """
<html><body>
<div class="header"><ul><li><a href="/">Home</a></li></ul></div>
<div class="sidebar"><p>Related sponsored links and further reading
suggestions here.</p><a href="/x">more</a></div>
<div class="content"><h1>Title</h1>
<p>This is the first real paragraph of the article, with clauses,
commas, and enough length to matter for the scorer.</p>
<p>The second paragraph continues, adding meaningful prose, detail,
and commentary for the reader of the page.</p></div>
<div class="footer"><p>Copyright, terms, privacy, contact, sitemap,
and other boilerplate rows.</p></div>
</body></html>
"""


def test_content_container_wins():
    r = readability_extract(PAGE)
    assert r["tag"] == "div"
    assert r["n_paragraphs"] == 2
    assert "first real paragraph" in r["text"]
    assert "Copyright" not in r["text"] and "sponsored" not in r["text"]
    assert r["link_density"] == 0.0
    assert r["score"] > 0


def test_link_density_penalizes_link_farms():
    """Two identical-prose divs; the one whose text is mostly anchors
    must lose on the (1 - link_density) factor."""
    para = ("<p>Genuinely long enough paragraph text, with commas, "
            "for scoring purposes and then some.</p>")
    linky = para.replace(
        "commas,", 'commas, <a href="/a">' + "link text " * 30 + "</a>")
    html = (f'<div id="alpha">{linky}</div>'
            f'<div id="beta">{para}{para}</div>')
    r = readability_extract(html)
    assert "link text" not in r["text"]
    assert r["n_paragraphs"] == 2


def test_fallback_whole_page_when_no_paragraphs():
    r = readability_extract("<html><body>bare text, no block tags, "
                            "still returned</body></html>")
    assert r["tag"] is None
    assert "bare text" in r["text"]
    assert r["n_paragraphs"] == 0 and r["score"] == 0.0


def test_script_style_excluded():
    html = ('<div class="content"><p>Real prose paragraph, long '
            'enough, with commas, to be scored properly.</p>'
            '<script>var x = "not, prose, at, all";</script>'
            '<style>.a{color:red}</style></div>')
    r = readability_extract(html)
    assert "prose, at, all" not in r["text"]
    assert "color:red" not in r["text"]
    assert r["n_paragraphs"] == 1


def test_totality_on_garbage():
    for bad in (None, b"", "<p>", "</div></div>", b"\xff\xfe<p>hi</p>",
                "<div" + "<p" * 500, "a" * 10000,
                "<td><td><td>" + "word, " * 30):
        out = readability_extract(bad)
        assert isinstance(out["text"], str)
        assert isinstance(out["n_paragraphs"], int)


def test_grandparent_half_credit():
    """A paragraph inside a weight-neutral inner div still half-credits
    the positive-class outer div; with two inner singles the outer
    accumulates more than either child and wins."""
    p = ("<p>Meaningful article paragraph, with commas, reaching the "
         "length threshold comfortably here.</p>")
    html = (f'<div class="article"><div>{p}</div><div>{p}</div></div>'
            f'<div class="sidebar"><p>Sponsored related reading '
            f'suggestions, links, offers.</p></div>')
    r = readability_extract(html)
    # the winner is one of the article-side containers, never sidebar
    assert "Sponsored" not in r["text"]


def test_bytes_input_decodes():
    r = readability_extract(PAGE.encode("utf-8"))
    assert r["n_paragraphs"] == 2
