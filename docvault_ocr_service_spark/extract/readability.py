"""Readability-style main-content extraction (the Arc90 algorithm).

The second of the two classic boilerplate-strip heuristics next to
jusText (functions/justext.py): instead of classifying paragraphs by
stopword/link density alone, Readability scores CONTAINER nodes —
every paragraph credits its parent (and half-credits its grandparent)
with ``1 + commas + min(len/100, 3)`` points, containers start from a
tag weight (+5 div, +3 pre/td/blockquote, −3 list/form tags, −5
headings) plus a ±25 class/id hint (``article|content|main|post…`` vs
``comment|footer|sidebar|widget…``), and the winner is the container
maximizing ``content_score × (1 − link_density)`` over its subtree.
The public algorithm is from Arc90's readability.js (the same scoring
model trafilatura/readability-lxml reimplement); this is an
independent pure-Python implementation over ``html.parser`` — same
kernel discipline as ``extract/htmltext.py`` (no lxml in the
environment, SURVEY §7.1: Python only where extraction semantics
require it).

Totality: any bytes/str input returns a result or raises nothing —
malformed HTML degrades to whatever containers parse; a page with no
scored container falls back to the whole-page text.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_POSITIVE_RE = re.compile(
    r"article|body|content|entry|hentry|main|page|pagination|post|"
    r"text|blog|story", re.I)
_NEGATIVE_RE = re.compile(
    r"combx|comment|com-|contact|foot|footer|footnote|masthead|media|"
    r"meta|outbrain|promo|related|scroll|shoutbox|sidebar|sponsor|"
    r"shopping|tags|tool|widget", re.I)

_TAG_WEIGHT = {
    "div": 5, "article": 5, "section": 5, "main": 5,
    "pre": 3, "td": 3, "blockquote": 3,
    "address": -3, "ol": -3, "ul": -3, "dl": -3, "dd": -3, "dt": -3,
    "li": -3, "form": -3,
    "h1": -5, "h2": -5, "h3": -5, "h4": -5, "h5": -5, "h6": -5,
    "th": -5,
}
# containers that can win; paragraphs that credit them
_CONTAINER_TAGS = frozenset(
    ("div", "article", "section", "main", "td", "blockquote", "body"))
_PARA_TAGS = frozenset(("p", "pre", "td", "blockquote"))
_SKIP_TAGS = frozenset(("script", "style", "noscript", "template"))
_VOID_TAGS = frozenset(
    ("br", "hr", "img", "input", "meta", "link", "area", "base",
     "col", "embed", "source", "track", "wbr"))

_MIN_PARA_CHARS = 25
_WS_RE = re.compile(r"\s+")


class _Node:
    __slots__ = ("tag", "parent", "weight", "content_score",
                 "text_chars", "link_chars", "scored")

    def __init__(self, tag: str, parent: "_Node | None",
                 attrs: dict) -> None:
        self.tag = tag
        self.parent = parent
        hint = " ".join(filter(None, (attrs.get("class", ""),
                                      attrs.get("id", ""))))
        w = _TAG_WEIGHT.get(tag, 0)
        if hint:
            if _POSITIVE_RE.search(hint):
                w += 25
            if _NEGATIVE_RE.search(hint):
                w -= 25
        self.weight = w
        self.content_score = 0.0
        self.text_chars = 0
        self.link_chars = 0
        self.scored = False


class _Readability(HTMLParser):
    """One pass: build container lineage, accumulate paragraph text,
    credit ancestors on paragraph close."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("body", None, {})
        self.stack: list[_Node] = [self.root]
        self.containers: list[_Node] = [self.root]
        self.skip_depth = 0
        self.para: list[str] | None = None
        self.para_container: _Node | None = None
        self.in_anchor = 0
        self.para_texts: dict[int, list[str]] = {}   # id(node) -> texts
        self.all_text: list[str] = []

    # -- tree maintenance --------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self.skip_depth += 1
            return
        if self.skip_depth:
            return
        if tag == "a":
            self.in_anchor += 1
            return
        if tag in _VOID_TAGS:
            return
        if tag in _PARA_TAGS and self.para is None:
            self.para = []
            self.para_container = self._nearest_container()
        node = _Node(tag, self.stack[-1], dict(attrs))
        self.stack.append(node)
        if tag in _CONTAINER_TAGS:
            self.containers.append(node)

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if self.skip_depth:
            return
        if tag == "a":
            self.in_anchor = max(0, self.in_anchor - 1)
            return
        if tag in _VOID_TAGS:
            return
        if tag in _PARA_TAGS and self.para is not None:
            self._close_para()
        # pop to the matching open tag if present (lenient recovery)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if self.skip_depth or not data:
            return
        self.all_text.append(data)
        n = len(_WS_RE.sub(" ", data).strip())
        for node in self.stack:
            node.text_chars += n
            if self.in_anchor:
                node.link_chars += n
        if self.para is not None:
            self.para.append(data)

    # -- scoring -----------------------------------------------------------
    def _nearest_container(self) -> _Node:
        for node in reversed(self.stack):
            if node.tag in _CONTAINER_TAGS:
                return node
        return self.root

    def _close_para(self):
        text = _WS_RE.sub(" ", "".join(self.para)).strip()
        self.para = None
        parent = self.para_container or self.root
        self.para_container = None
        if len(text) < _MIN_PARA_CHARS:
            return
        score = 1.0 + text.count(",") + min(len(text) // 100, 3)
        for node, share in ((parent, 1.0), (parent.parent, 0.5)):
            if node is None:
                continue
            if not node.scored:
                node.scored = True
                node.content_score += node.weight
            node.content_score += score * share
        self.para_texts.setdefault(id(parent), []).append(text)

    def finish(self) -> dict:
        if self.para is not None:
            self._close_para()
        best, best_final = None, None
        for node in self.containers:
            if not node.scored:
                continue
            ld = (node.link_chars / node.text_chars
                  if node.text_chars else 0.0)
            final = node.content_score * (1.0 - ld)
            if best_final is None or final > best_final:
                best, best_final = node, final
        if best is None:
            whole = _WS_RE.sub(" ", "".join(self.all_text)).strip()
            return {"text": whole, "score": 0.0, "link_density": 0.0,
                    "tag": None, "n_paragraphs": 0}
        ld = (best.link_chars / best.text_chars
              if best.text_chars else 0.0)
        paras = self.para_texts.get(id(best), [])
        return {"text": "\n\n".join(paras),
                "score": float(best_final),
                "link_density": float(ld),
                "tag": best.tag,
                "n_paragraphs": len(paras)}


def readability_extract(html: str | bytes | None) -> dict:
    """Arc90 content extraction → ``{text, score, link_density, tag,
    n_paragraphs}``.  Total: returns the whole-page fallback on pages
    with no creditable paragraphs, empty text on empty/undecodable
    input."""
    if html is None:
        return {"text": "", "score": 0.0, "link_density": 0.0,
                "tag": None, "n_paragraphs": 0}
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _Readability()
    try:
        parser.feed(html)
        parser.close()
    except Exception:  # noqa: BLE001 — html.parser rarely raises; total
        pass
    return parser.finish()
