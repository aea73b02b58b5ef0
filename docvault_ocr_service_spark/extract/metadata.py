"""Structured-metadata extraction from document text (pure Python, no Spark).

Value-compatible with the reference's v2 extractor
(``/root/reference/app/metadata_extractor_v2.py:365-409``) — the one the
worker actually runs (``app/worker.py:23,82``) — with one deliberate
canonicalization: the reference returns ``list(set(...))`` for emails,
phones, invoice/po numbers, postal codes, addresses and tax ids
(``app/metadata_extractor_v2.py:256,267,278,289,300,311,323``), whose order
varies with the process hash seed.  We return those fields **sorted** so the
output is a pure function of the input text; the reference's own tests only
assert membership (``tests/test_metadata_extractor.py:187-195``), so sorted
order is a strictly stronger guarantee, and the golden corpus freezes it.

Order-preserving fields (dates, amounts, names + their contexts) follow the
reference exactly: pattern-union order (en then pl), duplicates included.

All regexes are precompiled once at import; extraction is a per-string
function meant to be mapped over an Arrow batch (``pd.Series``) inside a
pandas UDF — the per-batch loop lives in ``functions/udfs.py``.
"""

from __future__ import annotations

import re
from datetime import date

from dateutil import parser as _dateutil_parser

from . import patterns as P

# Precompiled pattern tables (module-level: compiled once per executor
# process, shared across every Arrow batch that worker handles).
_DATE_RES = tuple(re.compile(p, re.IGNORECASE) for p in P.DATE_PATTERNS)
_AMOUNT_RES = tuple(re.compile(p, re.IGNORECASE) for p in P.AMOUNT_PATTERNS)
_PHONE_RES = tuple(re.compile(p) for p in P.PHONE_PATTERNS)
_POSTAL_RES = tuple(re.compile(p) for p in P.POSTAL_PATTERNS)
_INVOICE_RES = tuple(re.compile(p, re.IGNORECASE) for p in P.INVOICE_PATTERNS)
_PO_RES = tuple(re.compile(p, re.IGNORECASE) for p in P.PO_PATTERNS)
_TAX_RES = tuple(re.compile(p, re.IGNORECASE) for p in P.TAX_ID_PATTERNS)
_ADDRESS_RES = tuple(re.compile(p) for p in P.ADDRESS_PATTERNS)
_EMAIL_RE = re.compile(P.EMAIL_PATTERN)
_NAME_RE = re.compile(P.NAME_PATTERN)

# Flat output schema (field order is the Spark StructType order).
METADATA_FIELDS: tuple[str, ...] = (
    "dates", "amounts", "names", "emails", "phones", "addresses",
    "postal_codes", "invoice_numbers", "po_numbers", "tax_ids",
    "date_contexts", "amount_labels", "name_contexts", "confidence",
)


# Prefilter gates: every date/amount/phone/postal/tax/address pattern
# requires at least one ASCII digit, the name pattern an uppercase
# letter, the email pattern an '@' — cheap scans that let digit-free
# noise documents skip ~40 regex passes with provably identical output.
_DIGIT_RE = re.compile(r"\d")
_UPPER_RE = re.compile(r"[A-Z]")
# invoice/po patterns cannot match without one of these literals
# (IGNORECASE → check on the lowered text).  The gate is only sound on
# pure-ASCII text: re.IGNORECASE case-folds some non-ASCII uppercase
# (e.g. Turkish 'İ' matches 'i') that str.lower() maps to a multi-char
# sequence ('i' + U+0307), so 'inv' would be absent from text.lower()
# while the regex still matches — non-ASCII text skips the gate.
_INVOICE_GATES = ("invoice", "inv", "faktura", "fakt", "fv", "fs")
_PO_GATES = ("po", "p.o.", "purchase order", "zamówienie", "zam")

from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=65536)
def _parse_date_cached(s: str):
    """dateutil fuzzy parse with memoization — real corpora repeat the
    same date strings endlessly, and the ISO pattern is matched twice by
    construction (en+pl both declare it)."""
    try:
        return _dateutil_parser.parse(s, fuzzy=True).date()
    except (ValueError, OverflowError):
        return None


def _tail_context(text: str, pos: int, window: int, keep: int) -> str:
    """Last ``keep`` chars of the stripped ``window`` chars before ``pos``.

    Matches the reference's context-window rule
    (app/metadata_extractor_v2.py:165-167, 216-218, 248-250).
    """
    ctx = text[max(0, pos - window):pos].strip()
    return ctx[-keep:] if len(ctx) > keep else ctx


def extract_dates(text: str) -> tuple[list[date], list[str]]:
    """Dates (1900..2100) + 50/30-char contexts, in pattern-union order.

    Reference: app/metadata_extractor_v2.py:148-175.  Duplicate matches are
    intentional (the ISO/numeric patterns appear once per language).
    """
    found: list[date] = []
    contexts: list[str] = []
    for rx in _DATE_RES:
        for m in rx.finditer(text):
            parsed = _parse_date_cached(m.group(0))
            if parsed is not None and 1900 <= parsed.year <= 2100:
                found.append(parsed)
                contexts.append(_tail_context(text, m.start(), 50, 30))
    return found, contexts


def _normalize_amount(raw: str) -> float:
    """US/EU separator disambiguation → float.

    Rules (app/metadata_extractor_v2.py:189-209): strip spaces; if both
    separators present, the right-most one is the decimal mark; a single
    comma with exactly two trailing digits is a decimal mark, any other
    comma is a thousands separator.
    """
    s = raw.replace(" ", "")
    if "." in s and "," in s:
        if s.rindex(",") > s.rindex("."):
            s = s.replace(".", "").replace(",", ".")   # 1.500,00 → 1500.00
        else:
            s = s.replace(",", "")                      # 1,500.00 → 1500.00
    elif "," in s:
        head, _, tail = s.partition(",")
        if "," not in tail and len(tail) == 2:
            s = head + "." + tail                       # 500,00 → 500.00
        else:
            s = s.replace(",", "")                      # 1,500 → 1500
    return float(s)


def extract_amounts(text: str) -> tuple[list[float], list[str]]:
    """Currency-adjacent amounts in (0, 1e9) + 30/20-char labels.

    Reference: app/metadata_extractor_v2.py:177-226 (two patterns: symbol
    before amount, amount before symbol).
    """
    amounts: list[float] = []
    labels: list[str] = []
    for rx in _AMOUNT_RES:
        for m in rx.finditer(text):
            try:
                value = _normalize_amount(m.group(1))
            except (ValueError, IndexError):
                continue
            if 0 < value < 1_000_000_000:
                amounts.append(value)
                labels.append(_tail_context(text, m.start(), 30, 20))
    return amounts, labels


def extract_names(text: str) -> tuple[list[str], list[str]]:
    """Capitalized 2–4 word runs, titles stripped, len>3 + contexts.

    Reference: app/metadata_extractor_v2.py:228-252.
    """
    names: list[str] = []
    contexts: list[str] = []
    for m in _NAME_RE.finditer(text):
        parts = [
            w.rstrip(".") for w in m.group(0).split()
            if w.rstrip(".") not in P.NAME_TITLES
        ]
        cleaned = " ".join(parts)
        if cleaned and len(cleaned) > 3:
            names.append(cleaned)
            contexts.append(_tail_context(text, m.start(), 30, 20))
    return names, contexts


def _sorted_unique_matches(res: tuple[re.Pattern, ...], text: str) -> list[str]:
    hits: set[str] = set()
    for rx in res:
        hits.update(rx.findall(text))
    return sorted(hits)


def extract_emails(text: str) -> list[str]:
    return sorted(set(_EMAIL_RE.findall(text)))


def extract_phones(text: str) -> list[str]:
    return _sorted_unique_matches(_PHONE_RES, text)


def extract_invoice_numbers(text: str) -> list[str]:
    return _sorted_unique_matches(_INVOICE_RES, text)


def extract_po_numbers(text: str) -> list[str]:
    return _sorted_unique_matches(_PO_RES, text)


def extract_postal_codes(text: str) -> list[str]:
    return _sorted_unique_matches(_POSTAL_RES, text)


def extract_addresses(text: str) -> list[str]:
    return _sorted_unique_matches(_ADDRESS_RES, text)


def extract_tax_ids(text: str) -> list[str]:
    return _sorted_unique_matches(_TAX_RES, text)


def metadata_confidence(md: dict) -> float:
    """Presence-weighted confidence in [0, 1].

    Weights (app/metadata_extractor_v2.py:325-363): dates .2, amounts .2,
    names .15, emails .15, phones .1, invoice|po .1, address|postal .1,
    tax .1, normalized by the 1.1 weight total.
    """
    score = 0.0
    if md["dates"]:
        score += 0.2
    if md["amounts"]:
        score += 0.2
    if md["names"]:
        score += 0.15
    if md["emails"]:
        score += 0.15
    if md["phones"]:
        score += 0.1
    if md["invoice_numbers"] or md["po_numbers"]:
        score += 0.1
    if md["addresses"] or md["postal_codes"]:
        score += 0.1
    if md["tax_ids"]:
        score += 0.1
    return score / 1.1


def extract_metadata(text: str) -> dict:
    """Full metadata dict for one document text.

    Keys = METADATA_FIELDS; ``dates`` holds ``datetime.date`` objects
    (DateType-compatible), everything else lists of str/float + the
    confidence double.  Never raises: any per-field failure yields the
    empty value for that field (the reference swallows at the extract()
    level, app/metadata_extractor_v2.py:405-407).
    """
    text = text or ""
    has_digit = _DIGIT_RE.search(text) is not None
    has_upper = _UPPER_RE.search(text) is not None
    if has_digit:
        dates, date_ctx = extract_dates(text)
        amounts, amount_labels = extract_amounts(text)
        phones = extract_phones(text)
        postal = extract_postal_codes(text)
        tax_ids = extract_tax_ids(text)
        addresses = extract_addresses(text)
    else:
        dates, date_ctx = [], []
        amounts, amount_labels = [], []
        phones, postal, tax_ids, addresses = [], [], [], []
    names, name_ctx = extract_names(text) if has_upper else ([], [])
    text_lower = text.lower()
    gates_sound = text.isascii()
    md = {
        "dates": dates,
        "amounts": amounts,
        "names": names,
        "emails": extract_emails(text) if "@" in text else [],
        "phones": phones,
        "addresses": addresses,
        "invoice_numbers": (extract_invoice_numbers(text)
                            if not gates_sound
                            or any(g in text_lower
                                   for g in _INVOICE_GATES) else []),
        "po_numbers": (extract_po_numbers(text)
                       if not gates_sound
                       or any(g in text_lower for g in _PO_GATES) else []),
        "postal_codes": postal,
        "tax_ids": tax_ids,
        "date_contexts": date_ctx,
        "amount_labels": amount_labels,
        "name_contexts": name_ctx,
    }
    md["confidence"] = metadata_confidence(md)
    return md
