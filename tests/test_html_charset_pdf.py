"""Unit tests for the web-text extraction kernels: charset ladder, DOM
boilerplate strip, minimal-PDF native text."""

import pytest

from docvault_ocr_service_spark.corpus import make_pdf
from docvault_ocr_service_spark.extract.charset import (
    decode_html_bytes, sniff_declared_charset)
from docvault_ocr_service_spark.extract.htmltext import extract_main_text
from docvault_ocr_service_spark.extract.pdftext import (
    PdfParseError, extract_pdf_pages, has_native_text)


# -- charset -----------------------------------------------------------------

def test_utf8_plain():
    text, codec = decode_html_bytes("żółć".encode("utf-8"))
    assert text == "żółć" and codec == "utf-8"


def test_declared_latin2():
    raw = '<meta charset="iso-8859-2"><p>żółć</p>'.encode("iso-8859-2")
    text, codec = decode_html_bytes(raw)
    assert "żółć" in text and codec == "iso8859-2"


def test_bom_utf8():
    raw = b"\xef\xbb\xbf" + "hello ż".encode("utf-8")
    text, codec = decode_html_bytes(raw)
    assert text == "hello ż" and codec == "utf-8-sig"


def test_mislabeled_charset_is_deterministic():
    body = "Zażółć gęślą jaźń"
    raw = ('<meta charset="iso-8859-2"><p>' + body + "</p>").encode("cp1250")
    t1, _ = decode_html_bytes(raw)
    t2, _ = decode_html_bytes(raw)
    assert t1 == t2  # mojibake is fine; nondeterminism is not


def test_garbage_never_raises():
    text, codec = decode_html_bytes(bytes(range(256)))
    assert isinstance(text, str)


def test_sniff_meta_variants():
    assert sniff_declared_charset(b'<meta charset="UTF-8">') == "utf-8"
    assert sniff_declared_charset(
        b'<meta http-equiv="Content-Type" content="text/html; '
        b'charset=iso-8859-2">') == "iso8859-2"
    assert sniff_declared_charset(b"<p>none</p>") is None


# -- html main-content -------------------------------------------------------

PAGE = """<!DOCTYPE html><html><head><title>T</title>
<style>p{color:red}</style><script>var x=1;</script></head><body>
<header><h1><a href="/">Site</a></h1></header>
<nav><ul><li><a href="/a">aaa</a></li><li><a href="/b">bbb</a></li></ul></nav>
<article><p>The main content paragraph lives here.</p>
<p>Second paragraph with <a href="/x">one link</a> inside longer text body.</p>
</article>
<aside><a href="/1">x</a> <a href="/2">y</a></aside>
<footer><a href="/tos">terms</a></footer>
</body></html>"""


def test_boilerplate_stripped():
    text, spans = extract_main_text(PAGE)
    assert "main content paragraph" in text
    assert "Second paragraph" in text
    assert "terms" not in text          # footer dropped
    assert "aaa" not in text            # nav dropped
    assert "var x=1" not in text        # script dropped
    assert "color:red" not in text      # style dropped
    assert "T" not in text.split("\n")  # head/title dropped


def test_spans_cover_text():
    text, spans = extract_main_text(PAGE)
    for s in spans:
        assert text[s.start:s.end] == text[s.start:s.end].strip()
        assert 0.0 <= s.link_density <= 1.0
    assert [s.seq for s in spans] == list(range(len(spans)))


def test_link_farm_block_dropped():
    html = ("<body><div>" + " ".join(
        f'<a href="/{i}">link{i}</a>' for i in range(20))
        + "</div><p>real text here</p></body>")
    text, _ = extract_main_text(html)
    assert "real text here" in text
    assert "link5" not in text


def test_long_block_with_moderate_links_kept():
    long_text = "word " * 40
    html = (f'<body><p>{long_text}<a href="/x">'
            f'{"link " * 30}</a></p></body>')
    text, _ = extract_main_text(html)
    assert "word" in text


def test_whitespace_collapse():
    text, _ = extract_main_text("<p>a\n\n   b\tc</p>")
    assert text == "a b c"


def test_malformed_html_never_raises():
    text, _ = extract_main_text("<div><p>ok</b></span><article>")
    assert "ok" in text


def test_empty_page():
    assert extract_main_text("") == ("", [])


# -- pdf ---------------------------------------------------------------------

def test_pdf_roundtrip_single_page():
    pdf = make_pdf(["Hello PDF world.\nSecond line."])
    pages = extract_pdf_pages(pdf)
    assert pages == ["Hello PDF world.\nSecond line."]


def test_pdf_multipage_order():
    pdf = make_pdf(["PAGE-1-alpha", "PAGE-2-bravo", "PAGE-3-charlie"])
    pages = extract_pdf_pages(pdf)
    assert pages == ["PAGE-1-alpha", "PAGE-2-bravo", "PAGE-3-charlie"]


def test_pdf_escapes():
    pdf = make_pdf([r"parens (nested) and \ backslash"])
    assert extract_pdf_pages(pdf) == [r"parens (nested) and \ backslash"]


def test_native_text_gate():
    # reference app/document_processor.py:200-202 — ≥100 stripped chars
    assert not has_native_text(["x" * 99])
    assert has_native_text(["x" * 100])
    assert has_native_text(["x" * 50, "y" * 50])


def test_not_a_pdf_raises():
    with pytest.raises(PdfParseError):
        extract_pdf_pages(b"not a pdf at all")


def test_truncated_pdf_raises():
    pdf = make_pdf(["some content"])[:60]
    with pytest.raises(PdfParseError):
        extract_pdf_pages(pdf)


def test_pdf_flate_compressed_roundtrip():
    pages = ["Compressed page one with plenty of text.",
             "PAGE-2 follows\nwith a newline."]
    raw = make_pdf(pages)
    flate = make_pdf(pages, compress=True)
    assert extract_pdf_pages(flate) == extract_pdf_pages(raw) == pages


def test_pdf_unsupported_filter_raises():
    pdf = make_pdf(["x"]).replace(b">>\nstream", b"/Filter /LZWDecode >>\nstream")
    with pytest.raises(PdfParseError, match="filter"):
        extract_pdf_pages(pdf)


def test_pdf_corrupt_flate_raises():
    flate = make_pdf(["hello compressed world"], compress=True)
    broken = flate.replace(b"stream\n", b"stream\nXX", 1)
    with pytest.raises(PdfParseError):
        extract_pdf_pages(broken)


# -- review-finding regressions ------------------------------------------------

def test_self_closing_anchor_does_not_poison_following_blocks():
    html = ('<p>Short intro.</p><p><a href="/x"/>text</p>'
            '<p>The real article content, long enough to matter.</p>')
    text, _ = extract_main_text(html)
    assert "real article content" in text
    assert "text" in text


def test_self_closing_script_does_not_swallow_content():
    text, _ = extract_main_text("<script/><p>visible body text</p>")
    assert "visible body text" in text


def test_utf16_bom_html_extracts():
    from docvault_ocr_service_spark.extract.document import (
        detect_format, extract_document)

    payload = ("<html><body><p>utf sixteen page body with enough words"
               "</p></body></html>").encode("utf-16")
    assert detect_format(payload) == "html"
    res = extract_document("u://utf16", payload, None, "en")
    assert res["status"] == "done"
    assert res["text"] == "utf sixteen page body with enough words"
    assert not res["text"].startswith("\ufeff")


def test_pdf_flate_trailing_newline_checksum():
    # deflate checksums ending in 0x0A used to be stripped -> corrupt
    for i in range(300):  # sweep content until a checksum ends with \n
        pages = [f"Page text {i} hello world"]
        assert extract_pdf_pages(make_pdf(pages, compress=True)) == pages


def test_pdf_contents_array():
    # hand-build a page whose /Contents is an array of two streams
    pdf = make_pdf(["part one"])
    assert extract_pdf_pages(pdf) == ["part one"]
    two = make_pdf(["part one", "part two"])
    # rewrite page 1 to reference both content streams as an array
    body = two.replace(b"/Contents 6 0 R", b"/Contents [6 0 R 7 0 R]", 1)
    pages = extract_pdf_pages(body)
    assert pages[0].startswith("part one")


def test_pdf_unresolvable_contents_ref_raises():
    pdf = make_pdf(["x"]).replace(b"/Contents 5 0 R", b"/Contents 99 0 R")
    with pytest.raises(PdfParseError, match="unresolvable"):
        extract_pdf_pages(pdf)


def test_pdf_hex_and_quote_operators():
    """Hex strings and the '/" show operators extract; literal-only PDFs
    keep their pinned byte-identical output (golden suite covers that)."""
    import zlib

    from docvault_ocr_service_spark.extract.pdftext import (
        extract_pdf_pages)

    content = (b"BT /F1 12 Tf "
               b"<48656C6C6F2068657820> Tj "
               b"(literal line) Tj "
               b"(moved line) ' "
               b"[(arr ) <776F726C64> ( mix)] TJ "
               b"ET")
    flate = zlib.compress(content)
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n"
           b"2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n"
           b"3 0 obj<</Type/Page/Parent 2 0 R/Contents 4 0 R>>endobj\n"
           b"4 0 obj<</Length " + str(len(flate)).encode()
           + b"/Filter/FlateDecode>>stream\n" + flate
           + b"\nendstream endobj\n%%EOF")
    pages = extract_pdf_pages(pdf)
    text = "\n".join(pages)
    assert "Hello hex" in text
    assert "literal line" in text
    assert "moved line" in text
    assert "arr world mix" in text


def test_pdf_hex_inside_literal_not_double_extracted():
    from docvault_ocr_service_spark.extract.pdftext import _stream_text

    assert _stream_text(b"[(x <ab> y)] TJ") == "x <ab> y"
    assert _stream_text(b"[(a) <20> (b)] TJ") == "a b"


def test_pdf_mixed_operators_stream_order():
    """Show operators of different kinds must emit in content-stream
    order, not grouped by operator kind (round-3 ADVICE fix)."""
    from docvault_ocr_service_spark.extract.pdftext import _stream_text

    stream = (b"BT (first Tj) Tj "
              b"[(second ) (TJ)] TJ "
              b"<746869726420686578> Tj "
              b"(fourth quote) ' "
              b"(fifth Tj) Tj ET")
    assert _stream_text(stream).split("\n") == [
        "first Tj", "second TJ", "third hex", "fourth quote", "fifth Tj"]


def test_pdf_ascii_hex_decode_filter():
    import zlib

    from docvault_ocr_service_spark.extract.pdftext import (
        extract_pdf_pages)

    def mini_pdf(stream_body: bytes, filt: bytes) -> bytes:
        return (b"%PDF-1.4\n"
                b"1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n"
                b"2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n"
                b"3 0 obj<</Type/Page/Parent 2 0 R/Contents 4 0 R>>endobj\n"
                b"4 0 obj<</Length " + str(len(stream_body)).encode()
                + filt + b">>stream\n" + stream_body
                + b"\nendstream endobj\n%%EOF")

    content = b"BT (hex filtered text) Tj ET"
    hexed = content.hex().encode() + b">"
    pages = extract_pdf_pages(mini_pdf(hexed, b"/Filter/ASCIIHexDecode"))
    assert "hex filtered text" in pages[0]

    chained = zlib.compress(content).hex().encode() + b">"
    pages2 = extract_pdf_pages(
        mini_pdf(chained, b"/Filter[/ASCIIHexDecode /FlateDecode]"))
    assert "hex filtered text" in pages2[0]


def test_pdf_page_spans_cover_text():
    """The hOCR-analogue invariant for native-PDF output: one span per
    page, full_text[start:end] == that page's text, seq == page index
    (mirrors the HTML spans-cover-text invariant)."""
    from docvault_ocr_service_spark.extract.document import extract_document

    pdf = make_pdf(["PAGE-1-alpha " * 20, "PAGE-2-bravo " * 20,
                    "PAGE-3-charlie " * 20])
    res = extract_document("u", pdf, None, "en")
    assert res["status"] == "done" and res["source"] == "native_pdf"
    spans = res["spans"]
    assert len(spans) == res["page_count"] == 3
    assert [s["seq"] for s in spans] == [0, 1, 2]
    for s, page in zip(spans, res["pages"]):
        assert s["tag"] == "page"
        assert res["text"][s["start"]:s["end"]] == page["text"]
    # spans tile the joined text exactly (joiner-width gaps)
    for a, b in zip(spans, spans[1:]):
        assert b["start"] == a["end"] + 2          # len("\n\n")
    assert spans[-1]["end"] == len(res["text"])
