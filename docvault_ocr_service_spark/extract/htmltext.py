"""Main-content extraction from HTML: DOM block scoring (pure Python).

The web-text analogue of the reference's OCR text-extraction stage
(``/root/reference/app/ocr_service.py:300-419``): bytes in →
``(text, spans)`` out.  Where the reference scores image quality and picks
Tesseract PSM modes, we score DOM *blocks* with Readability/trafilatura-style
heuristics — link density, text mass, and container tag weight — using only
the stdlib ``html.parser`` (no lxml in the target container).

Frozen extraction spec (the golden generator and the Spark UDF both call
``extract_main_text``; any change here invalidates goldens):

1. Tokenize with ``html.parser.HTMLParser`` (``convert_charrefs=True``).
2. Drop entirely: ``script style noscript template svg head iframe`` subtrees
   and comments/CDATA/declarations.
3. A *block* is the text accumulated between block-level tag boundaries
   (``BLOCK_TAGS``); inline tags do not flush.  ``<br>`` does not flush (it
   reads as a space after whitespace collapse).
4. Per block record: collapsed text (``\\s+`` → single space, stripped),
   chars inside ``<a>`` descendants, and whether any enclosing container is
   *boilerplate* (``nav header footer aside form``).
5. Keep a block iff: not in a boilerplate container, text non-empty, and
   link_density = link_chars/chars satisfies  (ld ≤ 0.5) or
   (chars ≥ 80 and ld < 0.75).
6. Extracted text = kept block texts joined with ``"\\n"``.
7. Spans = one struct per kept block: (seq, tag, char start/end in the
   final text, link_density) — the analogue of the reference's word boxes
   (``app/ocr_service.py:386-403``).
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser

# Subtrees dropped wholesale.
DROP_TAGS = frozenset(
    ("script", "style", "noscript", "template", "svg", "head", "iframe")
)
# Containers whose text is boilerplate by construction.
BOILERPLATE_TAGS = frozenset(("nav", "header", "footer", "aside", "form"))
# Tags that terminate the current text block.
BLOCK_TAGS = frozenset((
    "p", "div", "article", "section", "main", "li", "ul", "ol", "table",
    "tr", "td", "th", "blockquote", "pre", "h1", "h2", "h3", "h4", "h5",
    "h6", "figure", "figcaption", "dl", "dt", "dd", "body", "html",
))
# Void elements never put on the open-tag stack.
_VOID_TAGS = frozenset((
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
))

MIN_LONG_BLOCK_CHARS = 80
MAX_LINK_DENSITY = 0.5
MAX_LINK_DENSITY_LONG = 0.75


@dataclass
class Span:
    """One kept block in the output text (the 'boxes' analogue)."""
    seq: int            # block ordinal among kept blocks
    tag: str            # nearest enclosing block tag at flush time
    start: int          # char offset in the final joined text
    end: int
    link_density: float


class _BlockCollector(HTMLParser):
    """Single-pass tokenizer → list of (text, link_chars, boiler, tag)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, bool, str]] = []
        self._chunks: list[str] = []
        self._link_chars = 0
        self._drop_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._block_tag = "body"
        self._open: list[str] = []

    # -- block lifecycle ----------------------------------------------------
    def _flush(self) -> None:
        if not self._chunks:
            return
        raw = "".join(self._chunks)
        text = " ".join(raw.split())
        if text:
            self.blocks.append(
                (text, self._link_chars, self._boiler_depth > 0,
                 self._block_tag)
            )
        self._chunks = []
        self._link_chars = 0

    # -- parser callbacks ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID_TAGS:
            if self._drop_depth == 0:
                self._chunks.append(" ")
            return
        if tag in BLOCK_TAGS:
            self._flush()
            self._block_tag = tag
        if tag in DROP_TAGS:
            self._drop_depth += 1
        if tag in BOILERPLATE_TAGS:
            self._boiler_depth += 1
        if tag == "a":
            self._link_depth += 1
        self._open.append(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID_TAGS:
            return
        # pop the nearest matching open tag (tolerates misnesting)
        for i in range(len(self._open) - 1, -1, -1):
            if self._open[i] == tag:
                del self._open[i]
                break
        else:
            return  # stray close tag
        if tag in BLOCK_TAGS:
            self._flush()
        if tag in DROP_TAGS and self._drop_depth > 0:
            self._drop_depth -= 1
        if tag in BOILERPLATE_TAGS and self._boiler_depth > 0:
            self._boiler_depth -= 1
        if tag == "a" and self._link_depth > 0:
            self._link_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        self._chunks.append(data)
        if self._link_depth:
            self._link_chars += len(" ".join(data.split()))

    def close(self) -> None:  # flush the trailing block
        super().close()
        self._flush()


def keep_block(text: str, link_chars: int, in_boilerplate: bool) -> bool:
    """The frozen keep rule (spec step 5)."""
    if in_boilerplate or not text:
        return False
    n = len(text)
    ld = min(link_chars, n) / n
    if ld <= MAX_LINK_DENSITY:
        return True
    return n >= MIN_LONG_BLOCK_CHARS and ld < MAX_LINK_DENSITY_LONG


# -- fast tokenizer ----------------------------------------------------------
# The stdlib HTMLParser costs ~half the whole extraction kernel; this
# regex scanner implements the identical block state machine ~4× faster.
# Raw-text elements (script/style) and comments are swallowed in one
# token; the cross-check test asserts output identity with
# _BlockCollector over the corpus and malformed fuzz inputs.

import html as _html_mod  # noqa: E402  (stdlib unescape)
import re  # noqa: E402

_TOKEN_RE = re.compile(
    r"""<!--.*?(?:-->|$)
      | <!\[CDATA\[.*?(?:\]\]>|$)
      | <script\b[^>]*(?<!/)>.*?(?:</script\s*>|$)
      | <style\b[^>]*(?<!/)>.*?(?:</style\s*>|$)
      | <[!?][^>]*>
      | </?[a-zA-Z][^>]*>
    """,
    re.DOTALL | re.IGNORECASE | re.VERBOSE,
)
_TAG_NAME_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9:-]*)")
_HAS_ENTITY_RE = re.compile(r"&[#a-zA-Z]")


class _FastCollector:
    """Same state machine as _BlockCollector, driven by _TOKEN_RE."""

    __slots__ = ("blocks", "_chunks", "_link_chars", "_drop_depth",
                 "_boiler_depth", "_link_depth", "_block_tag", "_open")

    def __init__(self) -> None:
        self.blocks: list[tuple[str, int, bool, str]] = []
        self._chunks: list[str] = []
        self._link_chars = 0
        self._drop_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._block_tag = "body"
        self._open: list[str] = []

    def _flush(self) -> None:
        if not self._chunks:
            return
        text = " ".join("".join(self._chunks).split())
        if text:
            self.blocks.append(
                (text, self._link_chars, self._boiler_depth > 0,
                 self._block_tag))
        self._chunks = []
        self._link_chars = 0

    def feed(self, html: str) -> None:
        pos = 0
        for m in _TOKEN_RE.finditer(html):
            if m.start() > pos:
                self._data(html[pos:m.start()])
            tok = m.group(0)
            pos = m.end()
            second = tok[1]
            if second in "!?":
                continue  # comment / cdata / doctype / PI
            name_m = _TAG_NAME_RE.match(tok)
            if name_m is None:
                continue
            name = name_m.group(1).lower()
            if name in ("script", "style") and second != "/":
                continue  # raw-text element swallowed whole
            if second == "/":
                self._endtag(name)
            elif tok.endswith("/>"):
                # XHTML self-closing: open+close (HTMLParser's
                # handle_startendtag default does exactly this)
                self._starttag(name)
                self._endtag(name)
            else:
                self._starttag(name)
        if pos < len(html):
            self._data(html[pos:])
        self._flush()

    def _data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        if _HAS_ENTITY_RE.search(data):
            data = _html_mod.unescape(data)
        self._chunks.append(data)
        if self._link_depth:
            self._link_chars += len(" ".join(data.split()))

    def _starttag(self, tag: str) -> None:
        if tag in _VOID_TAGS:
            if self._drop_depth == 0:
                self._chunks.append(" ")
            return
        if tag in BLOCK_TAGS:
            self._flush()
            self._block_tag = tag
        if tag in DROP_TAGS:
            self._drop_depth += 1
        if tag in BOILERPLATE_TAGS:
            self._boiler_depth += 1
        if tag == "a":
            self._link_depth += 1
        self._open.append(tag)

    def _endtag(self, tag: str) -> None:
        if tag in _VOID_TAGS:
            return
        for i in range(len(self._open) - 1, -1, -1):
            if self._open[i] == tag:
                del self._open[i]
                break
        else:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        if tag in DROP_TAGS and self._drop_depth > 0:
            self._drop_depth -= 1
        if tag in BOILERPLATE_TAGS and self._boiler_depth > 0:
            self._boiler_depth -= 1
        if tag == "a" and self._link_depth > 0:
            self._link_depth -= 1


def collect_blocks_reference(html: str) -> list[tuple[str, int, bool, str]]:
    """HTMLParser-driven collector (cross-check implementation)."""
    collector = _BlockCollector()
    collector.feed(html)
    collector.close()
    return collector.blocks


def extract_main_text(html: str) -> tuple[str, list[Span]]:
    """HTML string → (main-content text, kept-block spans).

    Never raises on malformed markup; a page with no kept blocks yields
    ``("", [])``.
    """
    collector = _FastCollector()
    collector.feed(html)

    parts: list[str] = []
    spans: list[Span] = []
    offset = 0
    for text, link_chars, boiler, tag in collector.blocks:
        if not keep_block(text, link_chars, boiler):
            continue
        if parts:
            offset += 1  # the "\n" joiner
        n = len(text)
        ld = min(link_chars, n) / n
        spans.append(Span(len(spans), tag, offset, offset + n, ld))
        parts.append(text)
        offset += n
    return "\n".join(parts), spans
