"""HTML → Markdown conversion — the training-data serialization pass.

Modern pretraining / instruction-data pipelines increasingly keep
document STRUCTURE (headings, lists, emphasis, links, code, tables)
instead of flat text: markdown is the lingua franca the models are
trained to read and emit.  This kernel converts the block/inline
subset that matters into deterministic markdown; everything else
degrades to its text content.  The reference engine has no
counterpart (its HTML path flattens to text,
app/document_processor.py) — this operator exists for the
training-data tier, next to the hOCR/WET exporters.

Envelope (explicit): h1–h6 → ``#``-runs; p/div breaks → blank lines;
ul/ol → ``-`` / ``1.`` items with two-space nesting; a → ``[text]
(href)``; b/strong → ``**``; i/em → ``*``; code → backticks; pre →
fenced blocks (content verbatim); blockquote → ``> ``; hr → ``---``;
img → ``![alt](src)``; table/tr/td-th → pipe rows with a ``---``
separator after the first row.  script/style/noscript dropped.
Whitespace collapses outside ``pre``.  Total: any input returns a
string (bytes decode with replacement; malformed HTML degrades
through html.parser's lenient recovery).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_SKIP = frozenset(("script", "style", "noscript", "template"))
_H = {f"h{i}": i for i in range(1, 7)}
_WS = re.compile(r"[ \t\r\n\f\v]+")


class _Markdown(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[tuple[str, str]] = []   # (kind, block)
        self.cur: list[str] = []      # current block's inline pieces
        self.block_prefix = ""        # heading/list marker
        self.block_kind = "other"
        self.skip = 0
        self.pre = 0
        self.lists: list[dict] = []   # {ordered, n}
        self.quote = 0
        self.href: list[str] = []
        self.table: list[list[str]] | None = None
        self.row: list[str] | None = None
        self.cell: list[str] | None = None

    # -- block assembly ----------------------------------------------------
    def _flush(self) -> None:
        txt = "".join(self.cur)
        if not self.pre:
            txt = _WS.sub(" ", txt).strip()
        self.cur = []
        prefix, kind = self.block_prefix, self.block_kind
        self.block_prefix, self.block_kind = "", "other"
        if not txt:
            return
        txt = prefix + txt
        if self.quote:
            txt = "\n".join("> " * self.quote + ln
                            for ln in txt.split("\n"))
        self.out.append((kind, txt))

    def _emit(self, s: str) -> None:
        (self.cell if self.cell is not None else self.cur).append(s)

    # -- tags --------------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self.skip += 1
            return
        if self.skip:
            return
        a = dict(attrs)
        if tag in _H:
            self._flush()
            self.block_prefix = "#" * _H[tag] + " "
        elif tag in ("p", "div", "section", "article", "main"):
            self._flush()
        elif tag == "br":
            self._emit("\n")
        elif tag == "hr":
            self._flush()
            self.out.append(("other", "---"))
        elif tag in ("ul", "ol"):
            self._flush()
            self.lists.append({"ordered": tag == "ol", "n": 0})
        elif tag == "li":
            self._flush()
            depth = max(len(self.lists) - 1, 0)
            if self.lists and self.lists[-1]["ordered"]:
                self.lists[-1]["n"] += 1
                marker = f"{self.lists[-1]['n']}. "
            else:
                marker = "- "
            self.block_prefix = "  " * depth + marker
            self.block_kind = "li"
        elif tag in ("b", "strong"):
            self._emit("**")
        elif tag in ("i", "em"):
            self._emit("*")
        elif tag == "code" and not self.pre:
            self._emit("`")
        elif tag == "pre":
            self._flush()
            self.pre += 1
        elif tag == "blockquote":
            self._flush()
            self.quote += 1
        elif tag == "a":
            self.href.append(a.get("href", ""))
            self._emit("[")
        elif tag == "img":
            alt = _WS.sub(" ", a.get("alt", "")).strip()
            self._emit(f"![{alt}]({a.get('src', '')})")
        elif tag == "table":
            self._flush()
            self.table = []
        elif tag == "tr" and self.table is not None:
            self.row = []
        elif tag in ("td", "th") and self.row is not None:
            self.cell = []

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self.skip = max(0, self.skip - 1)
            return
        if self.skip:
            return
        if tag in _H or tag in ("p", "div", "section", "article",
                                "main", "li"):
            self._flush()
        elif tag in ("ul", "ol"):
            self._flush()
            if self.lists:
                self.lists.pop()
        elif tag in ("b", "strong"):
            self._emit("**")
        elif tag in ("i", "em"):
            self._emit("*")
        elif tag == "code" and not self.pre:
            self._emit("`")
        elif tag == "pre":
            if not self.pre:
                # stray </pre> with no open <pre>: prose must not be
                # refenced as code — leave the current block alone
                return
            txt = "".join(self.cur)
            self.pre -= 1
            self.cur = []
            self.block_prefix = ""
            self.out.append(("other", "```\n" + txt.rstrip("\n")
                             + "\n```"))
        elif tag == "blockquote":
            self._flush()
            self.quote = max(0, self.quote - 1)
        elif tag == "a":
            href = self.href.pop() if self.href else ""
            self._emit(f"]({href})")
        elif tag in ("td", "th") and self.cell is not None:
            cell = _WS.sub(" ", "".join(self.cell)).strip()
            self.row.append(cell.replace("|", "\\|"))
            self.cell = None
        elif tag == "tr" and self.row is not None:
            if self.table is not None:
                self.table.append(self.row)
            self.row = None
        elif tag == "table" and self.table is not None:
            rows = [r for r in self.table if r]
            self.table = None
            if rows:
                width = max(len(r) for r in rows)
                lines = ["| " + " | ".join(
                    r + [""] * (width - len(r))) + " |" for r in rows]
                lines.insert(1, "|" + " --- |" * width)
                self.out.append(("other", "\n".join(lines)))

    def handle_data(self, data):
        if self.skip:
            return
        self._emit(data)

    def finish(self) -> str:
        self._flush()
        pieces: list[str] = []
        prev_kind = None
        for kind, block in self.out:
            if not block.strip():
                continue
            if pieces:
                # consecutive list items join tight (single newline);
                # everything else is blank-line separated
                pieces.append("\n" if kind == "li" and prev_kind == "li"
                              else "\n\n")
            pieces.append(block)
            prev_kind = kind
        return "".join(pieces)


def html_to_markdown(html: str | bytes | None) -> str:
    """HTML → markdown string (see module docstring for the element
    envelope).  Total on arbitrary input."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _Markdown()
    try:
        p.feed(html)
        p.close()
    except Exception:  # noqa: BLE001 — lenient parser; stay total
        pass
    return p.finish()
