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
# scanner implements the identical block state machine faster by (a)
# dispatching benign tags through one compiled regex and (b) skipping
# HTMLParser's attribute materialization, charref event splitting and
# method indirection.  For anything non-benign it replays HTMLParser's
# own tolerant algorithms (tagfind/attrfind/locatestarttagend,
# CPython Lib/html/parser.py) token for token, so the two collectors
# are output-identical — tests/test_fastcollector_differential.py pins
# this over the corpus and malformed fuzz inputs.

import html as _html_mod  # noqa: E402  (stdlib unescape)
import re  # noqa: E402

# HTMLParser's own tolerant tag grammar (module-level in html.parser
# since 3.5; reusing the exact compiled patterns keeps the replay
# bit-identical with the stdlib the container runs).
from html.parser import (  # noqa: E402
    attrfind_tolerant as _ATTRFIND,
    commentclose as _COMMENTCLOSE,
    endtagfind as _ENDTAGFIND,
    locatestarttagend_tolerant as _LOCATE_START_END,
    starttagopen as _STARTTAGOPEN,
    tagfind_tolerant as _TAGFIND,
)

_HAS_ENTITY_RE = re.compile(r"&[#a-zA-Z]")
# _markupbase's marked-section terminators (private there; same shape)
_MARKEDSECTIONCLOSE = re.compile(r"]\s*]\s*>")
_MSMARKEDSECTIONCLOSE = re.compile(r"]\s*>")
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
# raw-text (cdata) content ends only at a full close tag — this is
# HTMLParser.set_cdata_mode's `interesting` pattern
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
}

# Benign-tag fast path: a start/end tag whose simple reading provably
# agrees with the tolerant grammar — name of common shape; attributes
# `name` or `name=value` with quoted values free of <>, or unquoted
# values free of quotes/slashes/angle brackets; optional XHTML '/'.
# Anything else (unquoted values containing '/', quoted '>', junk)
# falls through to the exact HTMLParser replay.
_FAST_TAG = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9:-]*)"
    r"((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*"
    r"(?:\s*=\s*(?:\"[^\"<>]*\"|'[^'<>]*'|[^\s\"'=<>`/]+(?=[\s>])))?)*)"
    r"\s*(/?)>"
)


class _FastCollector:
    """Same state machine as _BlockCollector, same tolerant tokenizer
    semantics as HTMLParser(convert_charrefs=True), scanner-driven."""

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
        i, n = 0, len(html)
        while i < n:
            j = html.find("<", i)
            if j < 0:
                self._data(html[i:])
                break
            if j > i:
                self._data(html[i:j])
            i = j
            m = _FAST_TAG.match(html, i)
            if m is not None:
                closing, name, _, slash = m.groups()
                name = name.lower()
                k = m.end()
                if closing:
                    self._endtag(name)
                elif slash:
                    self._starttag(name)
                    self._endtag(name)
                else:
                    self._starttag(name)
                    if name in _CDATA_CLOSE:
                        k = self._skip_rawtext(html, name, k, n)
                i = k
                continue
            k = self._parse_other(html, i, n)
            if k < 0:
                # incomplete construct at EOF — HTMLParser's close()
                # fallback: raw text through the next '>' (else '<',
                # else one char) becomes visible data
                k = html.find(">", i + 1)
                if k < 0:
                    k = html.find("<", i + 1)
                    if k < 0:
                        k = i + 1
                else:
                    k += 1
                self._data(html[i:k])
            i = k
        self._flush()

    # -- HTMLParser replay for non-benign constructs -------------------------
    def _parse_other(self, html: str, i: int, n: int) -> int:
        """Dispatch one '<'-construct exactly like HTMLParser.goahead;
        returns the resume position, or -1 for incomplete-at-EOF."""
        if _STARTTAGOPEN.match(html, i):
            return self._parse_starttag(html, i, n)
        if html.startswith("</", i):
            return self._parse_endtag(html, i)
        if html.startswith("<!--", i):
            cm = _COMMENTCLOSE.search(html, i + 4)
            return cm.end() if cm else -1
        if html.startswith("<?", i):
            p = html.find(">", i + 2)
            return -1 if p < 0 else p + 1
        if html.startswith("<![", i):
            return self._parse_marked_section(html, i, n)
        if html.startswith("<!", i):
            # doctype and bogus comments both consume through '>'
            p = html.find(">", i + 2)
            return -1 if p < 0 else p + 1
        self._data("<")
        return i + 1

    def _parse_starttag(self, html: str, i: int, n: int) -> int:
        endpos = self._whole_start_tag_end(html, i, n)
        if endpos < 0:
            return -1
        tm = _TAGFIND.match(html, i + 1)
        name = tm.group(1).lower()
        k = tm.end()
        while k < endpos:
            am = _ATTRFIND.match(html, k)
            if am is None:
                break
            k = am.end()
        end = html[k:endpos].strip()
        if end not in (">", "/>"):
            # junk in the start tag: HTMLParser emits the raw tag text
            # as data (parse_starttag's handle_data call — no unescape)
            self._data_raw(html[i:endpos])
            return endpos
        if end == "/>":
            self._starttag(name)
            self._endtag(name)
            return endpos
        self._starttag(name)
        if name in _CDATA_CLOSE:
            return self._skip_rawtext(html, name, endpos, n)
        return endpos

    def _whole_start_tag_end(self, html: str, i: int, n: int) -> int:
        """HTMLParser.check_for_whole_start_tag, verbatim semantics."""
        j = _LOCATE_START_END.match(html, i).end()
        nxt = html[j:j + 1]
        if nxt == ">":
            return j + 1
        if nxt == "/":
            return j + 2 if html.startswith("/>", j) else -1
        if nxt == "":
            return -1
        if nxt in ("abcdefghijklmnopqrstuvwxyz=/"
                   "ABCDEFGHIJKLMNOPQRSTUVWXYZ"):
            return -1
        return j if j > i else i + 1

    def _parse_endtag(self, html: str, i: int) -> int:
        gt = html.find(">", i + 1)
        if gt < 0:
            return -1
        em = _ENDTAGFIND.match(html, i)
        if em is not None:
            self._endtag(em.group(1).lower())
            return em.end()
        nm = _TAGFIND.match(html, i + 2)
        if nm is None:
            if html.startswith("</>", i):
                return i + 3
            p = html.find(">", i + 2)  # bogus comment, no event
            return -1 if p < 0 else p + 1
        self._endtag(nm.group(1).lower())
        return html.find(">", nm.end()) + 1

    def _parse_marked_section(self, html: str, i: int, n: int) -> int:
        dm = _DECLNAME.match(html, i + 3)
        if dm is None or dm.end() == n:
            return -1
        keyword = dm.group(0).strip().lower()
        if keyword in ("temp", "cdata", "ignore", "include", "rcdata"):
            cm = _MARKEDSECTIONCLOSE.search(html, i + 3)
        elif keyword in ("if", "else", "endif"):
            cm = _MSMARKEDSECTIONCLOSE.search(html, i + 3)
        else:
            return -1  # html.parser raises here; degrade to data
        return cm.end() if cm else -1

    def _skip_rawtext(self, html: str, name: str, pos: int, n: int) -> int:
        """cdata mode: content runs to a full '</\\s*name\\s*>' close;
        an unterminated element swallows the rest of the document.  The
        content itself is inside a DROP_TAGS subtree, so skipping it is
        state-identical to HTMLParser feeding it as dropped data."""
        cm = _CDATA_CLOSE[name].search(html, pos)
        if cm is None:
            return n
        self._endtag(name)
        return cm.end()

    def _data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        if _HAS_ENTITY_RE.search(data):
            data = _html_mod.unescape(data)
        self._chunks.append(data)
        if self._link_depth:
            self._link_chars += len(" ".join(data.split()))

    def _data_raw(self, data: str) -> None:
        if self._drop_depth or not data:
            return
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
