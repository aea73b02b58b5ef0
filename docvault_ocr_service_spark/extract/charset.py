"""Charset sniffing + canonical decode for raw page bytes (pure Python).

The web-text analogue of the reference's binary format sniffing
(``/root/reference/app/document_processor.py:48-97``: libmagic MIME on the
first 2048 bytes with magic-byte fallbacks).  For HTML payloads the problem
is charset, not container format, so the ladder below is the frozen,
deterministic decode spec — the golden corpus and the Spark engine share
this exact function, which is what makes "byte-identical extracted text per
url" a meaningful invariant.

Decode ladder (first success wins):
  1. Unicode BOM (utf-8-sig / utf-16 / utf-32).
  2. Charset declared in the first 2048 bytes (``<meta charset=...>`` or
     ``http-equiv`` ``content=...charset=...``), strict decode.
  3. Strict UTF-8.
  4. ``charset_normalizer`` best guess (pinned library, deterministic).
  5. cp1252 with ``errors="replace"`` (never fails).

The decoded text is then NFC-normalized — canonicalization step 1 of the
golden spec (FIXTURES.md §4).
"""

from __future__ import annotations

import codecs
import re
import unicodedata

try:
    from charset_normalizer import from_bytes as _cn_from_bytes
except ImportError:  # pragma: no cover - baked into the target container
    _cn_from_bytes = None

_SNIFF_WINDOW = 2048

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""",
    re.IGNORECASE,
)

_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


def sniff_declared_charset(data: bytes) -> str | None:
    """Charset named by a <meta> tag in the first 2 KiB, if any."""
    m = _META_CHARSET_RE.search(data[:_SNIFF_WINDOW])
    if not m:
        return None
    name = m.group(1).decode("ascii", "ignore").strip().lower()
    try:
        return codecs.lookup(name).name
    except LookupError:
        return None


def decode_html_bytes(data: bytes) -> tuple[str, str]:
    """Decode page bytes → (NFC text, codec label actually used)."""
    for bom, codec in _BOMS:
        if data.startswith(bom):
            try:
                # utf-8-sig strips its own BOM; the UTF-16/32 endian
                # codecs do not, so skip the BOM bytes explicitly
                raw = (data.decode("utf-8-sig") if codec == "utf-8-sig"
                       else data[len(bom):].decode(codec))
                return unicodedata.normalize("NFC", raw), codec
            except (UnicodeDecodeError, ValueError):
                break  # malformed despite BOM → continue down the ladder

    declared = sniff_declared_charset(data)
    if declared:
        try:
            return unicodedata.normalize("NFC", data.decode(declared)), declared
        except (UnicodeDecodeError, ValueError):
            pass

    try:
        return unicodedata.normalize("NFC", data.decode("utf-8")), "utf-8"
    except UnicodeDecodeError:
        pass

    if _cn_from_bytes is not None:
        best = _cn_from_bytes(data[: 1 << 20]).best()
        if best is not None:
            try:
                return (
                    unicodedata.normalize("NFC", data.decode(best.encoding)),
                    best.encoding,
                )
            except (UnicodeDecodeError, ValueError, LookupError):
                pass

    return (
        unicodedata.normalize("NFC", data.decode("cp1252", errors="replace")),
        "cp1252+replace",
    )
