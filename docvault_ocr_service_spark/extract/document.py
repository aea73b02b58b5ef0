"""Per-document extraction orchestrator: raw row → result dict (no Spark).

This is the kernel the ``mapInPandas`` stage applies per Arrow batch — the
batched restatement of the reference's worker pipeline
(``/root/reference/app/worker.py:152-406``): sniff format → fast path
(pre-extracted text) / HTML strip / PDF native text → page join → metadata →
categorize, with every per-document failure converted to an error row
(retry/DLQ semantics, ``app/worker.py:557-605``), never an exception that
could kill a task on a trillion-row job.

Error taxonomy mirrors ``app/error_handler.py:16-69``:
PERMANENT = {invalid_file_type, corrupted_file, unsupported_format,
ocr_unavailable, empty_payload, encrypted_pdf}; anything unexpected =
retryable.  ``encrypted_pdf`` (r6) is this engine's refinement: a PDF
declaring an ``/Encrypt`` dictionary is not corrupt — it is readable
by design only with a key, so the row says exactly that.
"""

from __future__ import annotations

import time
from . import categorize as cat
from . import metadata as md
from .charset import decode_html_bytes
from .htmltext import extract_main_text
from .images import sniff_image_format
from .pdftext import (
    NATIVE_TEXT_MIN_CHARS,
    PDF_MAGIC,
    PdfParseError,
    extract_pdf_pages,
    has_native_text,
)

PAGE_JOINER = "\n\n"        # app/worker.py:250,321
NATIVE_CONFIDENCE = 95.0    # app/worker.py:237,251-252
HTML_CONFIDENCE = 90.0      # this engine's fixed score for DOM extraction

# status values for the checkpoint table (FIXTURES.md §2)
STATUS_DONE = "done"
STATUS_FAILED_PERMANENT = "failed_permanent"
STATUS_FAILED_RETRYABLE = "failed_retryable"

PERMANENT_ERROR_KINDS = frozenset((
    "invalid_file_type", "corrupted_file", "unsupported_format",
    "ocr_unavailable", "empty_payload", "unsupported_language",
    "file_too_large", "encrypted_pdf",
))

MAX_PAYLOAD_BYTES = 50 * 1024 * 1024  # app/validators.py:9


def detect_format(payload: bytes | None) -> str:
    """Magic-byte container sniff (analogue of
    app/document_processor.py:48-97, minus libmagic).

    Returns 'pdf' | 'html' | 'png' | 'jpeg' | 'tiff' | 'gif' | 'webp'
    | 'empty' | 'unknown'.
    """
    if not payload:
        return "empty"
    if payload.startswith(PDF_MAGIC):
        return "pdf"
    img = sniff_image_format(payload[:16])
    if img is not None:
        return img
    head = payload[:2048]
    if head.startswith((b"\xff\xfe", b"\xfe\xff", b"\xef\xbb\xbf",
                        b"\xff\xfe\x00\x00", b"\x00\x00\xfe\xff")):
        # BOM'd payload: the ASCII markers are interleaved with NULs in
        # UTF-16/32 — sniff on the decoded text instead
        decoded, _ = decode_html_bytes(head)
        dh = decoded[:256].lstrip().lower()
        if dh.startswith(("<!doctype", "<html", "<head", "<body",
                          "<?xml")) or "<html" in dh or "<div" in dh \
                or "<p>" in dh:
            return "html"
        return "unknown"
    h = head.lstrip()[:256].lower()
    if h.startswith((b"<!doctype", b"<html", b"<head", b"<body",
                     b"<?xml")) \
            or b"<html" in h or b"<div" in h or b"<p>" in h:
        return "html"
    return "unknown"


def page_spans(pages: list[str]) -> list[dict]:
    """Char-offset span per page within the PAGE_JOINER-joined full
    text — the hOCR page-box analogue for native-PDF output (the
    reference emits hOCR/word boxes from Tesseract image_to_data,
    app/ocr_service.py:382-403; native text has no pixel geometry, so
    offsets into the joined text are the portable spans).  Invariant:
    full_text[start:end] == pages[seq]."""
    spans, off = [], 0
    for i, t in enumerate(pages):
        spans.append({"seq": i, "tag": "page", "start": off,
                      "end": off + len(t), "link_density": 0.0})
        off += len(t) + len(PAGE_JOINER)
    return spans


def _page_entries(pages: list[str], confidence: float, source: str) -> list[dict]:
    """Per-page result entries (shape of app/worker.py:231-239)."""
    return [
        {"page": i + 1, "text": t, "confidence": confidence, "source": source}
        for i, t in enumerate(pages)
    ]


def _finish(url: str, lang: str | None, pages: list[str], confidence: float,
            source: str, started: float, spans: list[dict]) -> dict:
    full_text = PAGE_JOINER.join(pages)
    meta = md.extract_metadata(full_text)
    meta["dates"] = list(meta["dates"])  # date objects pass through Arrow
    primary, cat_conf, langs = cat.categorize_fast(full_text)
    return {
        "url": url,
        "status": STATUS_DONE,
        "error_kind": None,
        "error_msg": None,
        "text": full_text,
        "confidence": confidence,
        "page_count": len(pages),
        "pages": _page_entries(pages, confidence, source),
        "spans": spans,
        "metadata": meta,
        "category": primary,
        "category_confidence": cat_conf,
        "detected_languages": langs,
        "lang": lang,
        "source": source,
        "processing_time": time.monotonic() - started,
    }


def _error(url: str, lang: str | None, kind: str, msg: str,
           started: float) -> dict:
    # kinds may carry a subtype ('unsupported_format:image/png');
    # permanence is decided on the base kind
    base_kind = kind.split(":", 1)[0]
    status = (STATUS_FAILED_PERMANENT if base_kind in PERMANENT_ERROR_KINDS
              else STATUS_FAILED_RETRYABLE)
    return {
        "url": url,
        "status": status,
        "error_kind": kind,
        "error_msg": msg[:500],
        "text": None,
        "confidence": None,
        "page_count": None,
        "pages": [],
        "spans": [],
        "metadata": None,
        "category": None,
        "category_confidence": None,
        "detected_languages": [],
        "lang": lang,
        "source": "error",
        "processing_time": time.monotonic() - started,
    }


def extract_document(url: str, html: bytes | None, text: str | None,
                     lang: str | None) -> dict:
    """One input row → one result row (dict keyed like RESULT_SCHEMA).

    Branches, in the order the reference's worker takes them:

    - pre-extracted ``text`` present → fast path, no parsing (the analogue
      of the native-PDF ≥100-char gate steering past OCR,
      app/worker.py:210-252); confidence pinned 95.0.
    - PDF payload → native text per page; <100 chars → the OCR fallback,
      which this container cannot run → permanent ``ocr_unavailable`` row.
    - HTML payload → charset decode + DOM boilerplate strip; single page.
    - empty/unknown payload → permanent error row.
    """
    started = time.monotonic()
    try:
        if text is not None and text != "":
            return _finish(url, lang, [text], NATIVE_CONFIDENCE,
                           "precomputed", started, [])

        if html is not None and len(html) > MAX_PAYLOAD_BYTES:
            return _error(url, lang, "file_too_large",
                          f"payload {len(html)} bytes > {MAX_PAYLOAD_BYTES}",
                          started)

        fmt = detect_format(html)
        if fmt == "empty":
            return _error(url, lang, "empty_payload", "no html bytes and no text",
                          started)
        if fmt == "pdf":
            # /Encrypt only refines the verdict when extraction
            # actually fails or comes back scant — a PDF that parses
            # to real text is fine whatever tokens it contains (no
            # false positives on documents ABOUT encryption)
            looks_encrypted = b"/Encrypt" in html
            try:
                pages = extract_pdf_pages(html)
            except PdfParseError as e:
                if looks_encrypted:
                    return _error(url, lang, "encrypted_pdf",
                                  "PDF declares an /Encrypt "
                                  "dictionary; decryption is out of "
                                  "envelope", started)
                return _error(url, lang, "corrupted_file", str(e), started)
            if has_native_text(pages):
                return _finish(url, lang, pages, NATIVE_CONFIDENCE,
                               "native_pdf", started, page_spans(pages))
            if looks_encrypted:
                return _error(url, lang, "encrypted_pdf",
                              "PDF declares an /Encrypt dictionary "
                              "and yields no native text; decryption "
                              "is out of envelope", started)
            return _error(
                url, lang, "ocr_unavailable",
                f"native text < {NATIVE_TEXT_MIN_CHARS} chars and no OCR "
                "runtime in this environment", started)
        if fmt in ("png", "jpeg", "tiff", "gif", "webp"):
            # valid *type* (V1: images pass admission), but this engine
            # has no OCR runtime to turn pixels into text — permanent
            # unsupported_format with the honest subtype, not
            # invalid_file_type.  Media features for these payloads live
            # in functions/multimodal.py.
            return _error(
                url, lang, f"unsupported_format:image/{fmt}",
                f"{fmt} payload: no OCR runtime in this environment "
                "(decode/features available via the media path)", started)
        if fmt == "html":
            decoded, _codec = decode_html_bytes(html)
            body, spans = extract_main_text(decoded)
            span_dicts = [
                {"seq": s.seq, "tag": s.tag, "start": s.start,
                 "end": s.end, "link_density": s.link_density}
                for s in spans
            ]
            return _finish(url, lang, [body], HTML_CONFIDENCE, "html",
                           started, span_dicts)
        return _error(url, lang, "invalid_file_type",
                      f"unrecognized payload (first bytes: {html[:16]!r})",
                      started)
    except Exception as e:  # noqa: BLE001 — poison row must not kill the task
        return _error(url, lang, "unexpected", f"{type(e).__name__}: {e}",
                      started)
