"""hOCR serialization of extraction results.

The reference returns an hOCR XHTML document when ``output_format ==
"hocr"`` (app/ocr_service.py:321,382-384,414 — Tesseract's
``image_to_pdf_or_hocr``).  Native HTML/PDF text extraction has no
pixel geometry, so this serializer emits the same hOCR element
hierarchy (ocr_page → ocr_carea → ocr_par → ocr_line → ocrx_word) with
CHARACTER-OFFSET geometry: every ``bbox x0 0 x1 1`` carries offsets
into the page's text, the analogue of the page/block spans the engine
already pins (extract/document.py:84 page_spans, htmltext.py Span).
``x_wconf`` carries the document confidence, like Tesseract's per-word
confidence does.

Invariants (tested):
- ``page_text[x0:x1] == word`` for every ocrx_word bbox;
- line bboxes tile the non-blank lines of each page;
- the document parses as well-formed XML.

Deterministic, total (any text in → one string out) — safe as a column
kernel.
"""

from __future__ import annotations

import math
from xml.sax.saxutils import escape, quoteattr

_HEAD = (
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    "<!DOCTYPE html PUBLIC \"-//W3C//DTD XHTML 1.0 Transitional//EN\" "
    "\"http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd\">\n"
    "<html xmlns=\"http://www.w3.org/1999/xhtml\" lang=\"en\">\n"
    " <head>\n"
    "  <title></title>\n"
    "  <meta http-equiv=\"Content-Type\" "
    "content=\"text/html;charset=utf-8\"/>\n"
    "  <meta name=\"ocr-system\" "
    "content=\"docvault_ocr_service_spark\"/>\n"
    "  <meta name=\"ocr-capabilities\" content=\"ocr_page ocr_carea "
    "ocr_par ocr_line ocrx_word\"/>\n"
    " </head>\n"
    " <body>\n")
_FOOT = " </body>\n</html>\n"


def _xml_safe(s: str) -> str:
    """Length-preserving map of XML-1.0-illegal chars (C0 controls
    except tab/newline/CR) to U+FFFD — bbox offsets stay valid, the
    document stays well-formed."""
    if all(c >= " " or c in "\t\n\r" for c in s):
        return s
    return "".join(c if (c >= " " or c in "\t\n\r") else "\ufffd"
                   for c in s)


# RE2 \s exactly ([ \t\n\r\f] — note NO vertical tab), so SQL twins
# recomputing token counts with \s agree for ANY input — same rationale
# as the BPE encoder's ASCII split; NBSP, \x0b and unicode spaces are
# word characters on both sides
_ASCII_WS = " \t\r\f"


def _words(line: str, line_start: int) -> list[tuple[int, int, str]]:
    """(start, end, token) per ASCII-whitespace-separated token,
    offsets into the page text."""
    out = []
    i, n = 0, len(line)
    while i < n:
        while i < n and line[i] in _ASCII_WS:
            i += 1
        j = i
        while j < n and line[j] not in _ASCII_WS:
            j += 1
        if j > i:
            out.append((line_start + i, line_start + j, line[i:j]))
        i = j
    return out


def to_hocr(url: str, pages: list[str], confidence: float,
            lang: str | None) -> str:
    """Serialize per-page extracted text as an hOCR document.

    One ocr_page per page; one ocr_carea/ocr_par per page body; one
    ocr_line per non-blank text line; one ocrx_word per token.  All
    bboxes are char-offset ranges ``bbox start 0 end 1`` into that
    page's text.
    """
    conf = (int(round(confidence))
            if confidence is not None and math.isfinite(confidence)
            else 0)
    lang_attr = quoteattr(_xml_safe(lang or "unknown"))
    parts = [_HEAD]
    for p, text in enumerate(pages, start=1):
        text = text or ""
        parts.append(
            f"  <div class=\"ocr_page\" id=\"page_{p}\" "
            f"title={quoteattr(f'image {_xml_safe(url)}; bbox 0 0 {len(text)} 1; ppageno {p - 1}')}>\n")
        parts.append(
            f"   <div class=\"ocr_carea\" id=\"block_{p}_1\" "
            f"title=\"bbox 0 0 {len(text)} 1\">\n"
            f"    <p class=\"ocr_par\" id=\"par_{p}_1\" "
            f"lang={lang_attr} title=\"bbox 0 0 {len(text)} 1\">\n")
        off = 0
        line_no = 0
        word_no = 0
        for line in text.split("\n"):
            start, end = off, off + len(line)
            off = end + 1
            if line.strip(_ASCII_WS):
                line_no += 1
                parts.append(
                    f"     <span class=\"ocr_line\" "
                    f"id=\"line_{p}_{line_no}\" "
                    f"title=\"bbox {start} 0 {end} 1\">")
                toks = []
                for ws, we, w in _words(line, start):
                    word_no += 1
                    toks.append(
                        f"<span class=\"ocrx_word\" "
                        f"id=\"word_{p}_{word_no}\" "
                        f"title=\"bbox {ws} 0 {we} 1; x_wconf {conf}\">"
                        f"{escape(_xml_safe(w))}</span>")
                parts.append(" ".join(toks))
                parts.append("</span>\n")
        parts.append("    </p>\n   </div>\n  </div>\n")
    parts.append(_FOOT)
    return "".join(parts)
