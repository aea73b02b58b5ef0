"""Language pattern packs (en, pl) for metadata extraction + categorization.

The regex strings and keyword lists are the *behavioral contract* with the
reference engine — they must match what
``/root/reference/app/languages/en.py`` and ``.../pl.py`` declare (cited
per block below), because the golden invariant is value-identical extraction
output per document.  The *representation* here is deliberately different:
one flat, table-driven module (plain tuples) instead of a mutable global
registry with auto-registration side effects, so the pack can be pickled to
Spark executors once and shared by every Arrow batch.

Pattern-union semantics (reference: ``app/metadata_extractor_v2.py:93-146``):
the v2 extractor concatenates per-language pattern lists in language
registration order (en, then pl — ``app/languages/loader.py:16-19``), which
makes match *order* and even *duplicate matches* (e.g. the ISO date regex is
declared by both languages, so each ISO date is emitted twice) part of the
contract.  We reproduce the combined lists verbatim.
"""

from __future__ import annotations

import re
from types import MappingProxyType

# --------------------------------------------------------------------------
# Language order is part of the contract (en before pl):
# app/languages/loader.py:16-19 imports en then pl; the v2 builders iterate
# the registry in that insertion order (app/metadata_extractor_v2.py:110).
LANGS: tuple[str, ...] = ("en", "pl")

# -- per-language metadata patterns ----------------------------------------
# en: app/languages/en.py:137-194      pl: app/languages/pl.py:144-201

_DATE_PATTERNS = {
    "en": (
        r"\b(\d{4})-(\d{1,2})-(\d{1,2})\b",
        r"\b(\d{1,2})[/\-\.](\d{1,2})[/\-\.](\d{4})\b",
    ),
    "pl": (
        r"\b(\d{4})-(\d{1,2})-(\d{1,2})\b",
        r"\b(\d{1,2})[/\-\.](\d{1,2})[/\-\.](\d{4})\b",
    ),
}

_MONTHS = {
    "en": (
        "January", "February", "March", "April", "May", "June", "July",
        "August", "September", "October", "November", "December",
    ),
    "pl": (
        "stycznia", "lutego", "marca", "kwietnia", "maja", "czerwca",
        "lipca", "sierpnia", "września", "października", "listopada",
        "grudnia",
    ),
}

_MONTH_ABBREVS = {
    "en": ("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep",
           "Oct", "Nov", "Dec"),
    "pl": ("sty", "lut", "mar", "kwi", "maj", "cze", "lip", "sie", "wrz",
           "paź", "lis", "gru"),
}

_CURRENCY_SYMBOLS = {
    "en": ("$", "€", "£", "¥", "₹"),
    "pl": ("zł", "PLN"),
}

_PHONE_PATTERNS = {
    "en": (
        r"\+?\d{1,3}[-.\s]?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}",
        r"\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}",
    ),
    "pl": (
        r"\+?48\s*\d{3}[\s\-]?\d{3}[\s\-]?\d{3}",
        r"\b\d{3}[\s\-]?\d{3}[\s\-]?\d{3}\b",
        r"\b\d{9}\b",
    ),
}

_POSTAL_PATTERNS = {
    "en": (
        r"\b\d{5}(?:-\d{4})?\b",          # US ZIP
        r"\b[A-Z]\d[A-Z]\s?\d[A-Z]\d\b",  # Canadian
    ),
    "pl": (
        r"\b\d{2}-\d{3}\b",               # XX-XXX
    ),
}

_INVOICE_PATTERNS = {
    "en": (r"\b(?:Invoice|INV|INVOICE)[\s#:]*([A-Z0-9\-]+)\b",),
    "pl": (r"\b(?:Faktura|Fakt|FV|FS)[\s#:\/nr]*([A-Z0-9\-\/]+)\b",),
}

_PO_PATTERNS = {
    "en": (r"\b(?:PO|P\.O\.|Purchase Order)[\s#:]*([A-Z0-9\-]+)\b",),
    "pl": (r"\b(?:Zamówienie|Zam)[\s#:\/nr]*([A-Z0-9\-\/]+)\b",),
}

_TAX_ID_PATTERNS = {
    "en": (r"\b(?:Tax\s+ID|TIN|EIN)\s*:?\s*(\d{2}-\d{7})\b",),
    "pl": (r"\bNIP\s*:?\s*(\d{10}|\d{3}-\d{3}-\d{2}-\d{2}|\d{3}-\d{2}-\d{2}-\d{3})\b",),
}

_ADDRESS_PATTERNS = {
    "en": (r"\d+\s+[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*(?:\s+(?:Street|St|Avenue|Ave|Road|Rd|Boulevard|Blvd|Lane|Ln|Drive|Dr|Court|Ct)\.?)",),
    "pl": (r"\d+\s+[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*(?:\s+(?:ul\.|ulica|al\.|aleja|pl\.|plac))?\s*\d*[A-Za-z]?",),
}

_DATE_CTX_KEYWORDS = {
    "en": ("invoice", "bill", "due", "payment", "date", "dated", "issued",
           "from", "to", "created", "modified", "effective"),
    "pl": ("faktura", "termin", "płatność", "wystawiono", "data", "sprzedaż",
           "dnia", "z", "do"),
}

_AMOUNT_CTX_KEYWORDS = {
    "en": ("total", "subtotal", "amount", "price", "cost", "tax", "balance",
           "due", "paid", "payment"),
    "pl": ("suma", "razem", "kwota", "cena", "koszt", "vat", "należność",
           "zapłacono", "do zapłaty"),
}

_NAME_CTX_KEYWORDS = {
    "en": ("customer", "client", "vendor", "supplier", "from", "to",
           "bill to", "ship to", "name", "contact"),
    "pl": ("nabywca", "sprzedawca", "klient", "dostawca", "od", "do",
           "imię", "nazwisko"),
}


def _union(table: dict[str, tuple]) -> tuple:
    """Concatenate per-language tuples in LANGS order (the v2 union rule)."""
    out: list = []
    for lang in LANGS:
        out.extend(table.get(lang, ()))
    return tuple(out)


# -- combined (v2-union) pattern pack --------------------------------------

# Date patterns: per-language lists, then the two month-name forms built
# from [en months, en abbrevs, pl months, pl abbrevs] — mirrors
# app/metadata_extractor_v2.py:111-130 (order and duplication intact).
_month_alt = "|".join(
    m for lang in LANGS for m in (_MONTHS[lang] + _MONTH_ABBREVS[lang])
)
DATE_PATTERNS: tuple[str, ...] = _union(_DATE_PATTERNS) + (
    rf"\b(\d{{1,2}})\s+({_month_alt})\.?\s+(\d{{4}})\b",
    rf"\b({_month_alt})\.?\s+(\d{{1,2}}),?\s+(\d{{4}})\b",
)

# Amount patterns: currency alternation over the union of symbols, escaped —
# mirrors app/metadata_extractor_v2.py:132-137 (v2 drops v1's
# currency-code pattern; the worker path uses v2, app/worker.py:23).
_currency_alt = "|".join(re.escape(s) for s in _union(_CURRENCY_SYMBOLS))
AMOUNT_PATTERNS: tuple[str, ...] = (
    rf"(?:{_currency_alt})\s*(\d{{1,3}}(?:[,\.\s]\d{{3}})*(?:[,\.]\d{{2}})?)",
    rf"(\d{{1,3}}(?:[,\.\s]\d{{3}})*(?:[,\.]\d{{2}})?)\s*(?:{_currency_alt})",
)

PHONE_PATTERNS = _union(_PHONE_PATTERNS)
POSTAL_PATTERNS = _union(_POSTAL_PATTERNS)
INVOICE_PATTERNS = _union(_INVOICE_PATTERNS)
PO_PATTERNS = _union(_PO_PATTERNS)
TAX_ID_PATTERNS = _union(_TAX_ID_PATTERNS)
ADDRESS_PATTERNS = _union(_ADDRESS_PATTERNS)

# Language-independent patterns (app/metadata_extractor_v2.py:87-91).
EMAIL_PATTERN = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b"
NAME_PATTERN = r"\b([A-Z][a-z]+(?:\s+[A-Z][a-z]+){1,3})\b"

# Titles stripped from names (v2 adds Pan/Pani;
# app/metadata_extractor_v2.py:234).
NAME_TITLES = frozenset(
    ("Mr", "Mrs", "Ms", "Dr", "Prof", "Sir", "Madam", "Pan", "Pani")
)

DATE_CTX_KEYWORDS = _union(_DATE_CTX_KEYWORDS)
AMOUNT_CTX_KEYWORDS = _union(_AMOUNT_CTX_KEYWORDS)
NAME_CTX_KEYWORDS = _union(_NAME_CTX_KEYWORDS)

MONTH_NAMES_BY_LANG = MappingProxyType({k: tuple(v) for k, v in _MONTHS.items()})
DATE_CTX_BY_LANG = MappingProxyType(_DATE_CTX_KEYWORDS)
AMOUNT_CTX_BY_LANG = MappingProxyType(_AMOUNT_CTX_KEYWORDS)


# -- categorization packs ----------------------------------------------------
# Category → (keywords, regex patterns).  Per language:
# en: app/languages/en.py:13-134     pl: app/languages/pl.py:14-141
# The v2 categorizer concatenates keyword/pattern lists per category across
# languages in registry order (app/document_categorizer_v2.py:61-95).

_CATEGORIES_EN: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "invoice": (
        ("invoice", "bill to", "invoice number", "invoice #", "inv #",
         "inv-", "amount due", "payment due", "payment terms", "due date",
         "bill date", "invoice date", "total due", "balance due",
         "remittance"),
        (r"invoice\s*(?:number|#|no\.?)[:#\s]*[\w\-]+",
         r"inv[-#]\s*\d+",
         r"amount\s+due\s*:?\s*[$€£]\s*[\d,]+\.?\d*",
         r"payment\s+terms",
         r"net\s+\d+\s+days"),
    ),
    "receipt": (
        ("receipt", "store", "thank you", "subtotal", "tax", "change",
         "cash", "credit", "debit", "payment received", "paid",
         "transaction"),
        (r"receipt\s*(?:number|#|no\.?)?",
         r"thank\s+you\s+for\s+(?:your|shopping)",
         r"(?:sub)?total\s*:?\s*[$€£]\s*[\d,]+\.?\d*",
         r"change\s*:?\s*[$€£]\s*[\d,]+\.?\d*"),
    ),
    "contract": (
        ("contract", "agreement", "terms and conditions", "this agreement",
         "party", "parties", "whereas", "hereby", "entered into", "binding",
         "executed", "effective date", "term", "terminate", "termination"),
        (r"(?:employment|service|sales|lease)\s+(?:contract|agreement)",
         r"this\s+agreement\s+is\s+(?:made|entered)",
         r"terms\s+and\s+conditions",
         r"party\s+of\s+the\s+(?:first|second)\s+part",
         r"whereas.*(?:agrees?|undertakes?)"),
    ),
    "letter": (
        ("dear", "sincerely", "regards", "yours truly", "respectfully",
         "to whom it may concern", "best regards", "kind regards",
         "yours faithfully"),
        (r"dear\s+(?:mr|mrs|ms|dr|prof)\.?\s+\w+",
         r"(?:sincerely|regards|respectfully)\s*,?\s*$",
         r"yours\s+(?:truly|faithfully|sincerely)",
         r"to\s+whom\s+it\s+may\s+concern"),
    ),
    "report": (
        ("report", "executive summary", "introduction", "findings",
         "recommendations", "conclusion", "analysis", "quarterly", "annual",
         "monthly", "summary", "overview", "background"),
        (r"(?:quarterly|annual|monthly|weekly)\s+report",
         r"executive\s+summary",
         r"(?:section|chapter)\s+\d+",
         r"\d+\.\s+(?:introduction|findings|conclusion)"),
    ),
    "form": (
        ("application form", "form", "please complete", "fill in", "name:",
         "address:", "phone:", "email:", "signature:", "date:", "applicant",
         "registration"),
        (r"(?:application|registration)\s+form",
         r"(?:name|address|phone|email)\s*:?\s*_{3,}",
         r"please\s+(?:complete|fill\s+(?:in|out))",
         r"\[\s*\]\s*(?:yes|no|agree|disagree)"),
    ),
    "memo": (
        ("memorandum", "memo", "to:", "from:", "date:", "re:", "subject:",
         "cc:", "internal", "confidential"),
        (r"(?:memorandum|memo)\s*$",
         r"to\s*:\s*\w+.*from\s*:\s*\w+",
         r"(?:date|re|subject)\s*:.*"),
    ),
    "certificate": (
        ("certificate", "certify", "certification", "awarded", "completion",
         "achievement", "hereby certifies", "this certifies", "accredited"),
        (r"certificate\s+of\s+(?:completion|achievement|attendance)",
         r"(?:this|hereby)\s+certifies\s+that",
         r"awarded\s+(?:to|on)"),
    ),
    "statement": (
        ("statement", "account statement", "bank statement",
         "credit card statement", "balance", "transactions",
         "beginning balance", "ending balance"),
        (r"(?:account|bank|credit\s+card)\s+statement",
         r"(?:beginning|ending|closing)\s+balance",
         r"statement\s+(?:period|date)"),
    ),
}

_CATEGORIES_PL: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "invoice": (
        ("faktura", "faktura vat", "faktura nr", "nr faktury", "fv", "fs",
         "sprzedawca", "nabywca", "kwota do zapłaty", "termin płatności",
         "data wystawienia", "data sprzedaży", "suma", "razem",
         "wartość brutto", "netto", "vat", "należność", "płatność"),
        (r"faktura\s+(?:vat|nr|numer)?[:#\s]*[\w\-/]+",
         r"f(?:v|s)[/#\-]\s*\d+",
         r"nip\s*:?\s*\d{10}",
         r"kwota\s+do\s+zapłaty",
         r"termin\s+płatności"),
    ),
    "receipt": (
        ("paragon", "paragon fiskalny", "kwit", "dowód zakupu", "sklep",
         "suma", "wartość", "zapłacono", "reszta", "gotówka", "karta",
         "transakcja", "nr paragonu", "podziękowanie", "dziękujemy"),
        (r"paragon\s+(?:fiskalny|nr)?",
         r"suma\s*:?\s*[\d,]+\s*(?:zł|PLN)",
         r"zapłacono\s*:?\s*[\d,]+",
         r"dziękujemy\s+za\s+zakup"),
    ),
    "contract": (
        ("umowa", "kontrakt", "ugoda", "porozumienie", "warunki umowy",
         "strona", "strony", "niniejsza umowa", "zawiera", "zobowiązuje się",
         "postanowienia", "okres obowiązywania", "rozwiązanie",
         "wypowiedzenie", "podpis", "akceptacja", "przedmiot umowy"),
        (r"umowa\s+(?:o\s+)?(?:pracę|zlecenie|dzieło|najmu|sprzedaży)",
         r"niniejsza\s+umowa",
         r"strona\s+(?:pierwsza|druga)",
         r"zobowiązuje\s+się\s+do",
         r"w\s+świadectwie\s+powyższego"),
    ),
    "letter": (
        ("szanowny", "szanowna", "drogi", "droga", "uprzejmie",
         "z poważaniem", "łączę pozdrowienia", "serdeczne pozdrowienia",
         "z wyrazami szacunku", "do wiadomości", "w załączeniu",
         "informuję", "zwracam się"),
        (r"szanown(?:y|a)\s+(?:pan|pani|państwo)",
         r"z\s+poważaniem",
         r"łączę\s+(?:wyrazy|pozdrowienia)",
         r"zwracam\s+się\s+z\s+(?:prośbą|zapytaniem)"),
    ),
    "report": (
        ("raport", "sprawozdanie", "zestawienie", "analiza", "podsumowanie",
         "wstęp", "wprowadzenie", "wnioski", "rekomendacje", "zakończenie",
         "kwartalny", "roczny", "miesięczny", "przegląd", "dane", "wyniki"),
        (r"raport\s+(?:kwartalny|roczny|miesięczny)",
         r"sprawozdanie\s+(?:finansowe|zarządu)",
         r"(?:rozdział|punkt)\s+\d+",
         r"\d+\.\s+(?:wstęp|wnioski|zakończenie)"),
    ),
    "form": (
        ("formularz", "wniosek", "ankieta", "wypełnić", "proszę uzupełnić",
         "imię i nazwisko:", "adres:", "telefon:", "e-mail:", "podpis:",
         "data:", "wnioskodawca", "rejestracja", "zgłoszenie"),
        (r"formularz\s+(?:wniosku|zgłoszeniowy|rejestracyjny)",
         r"(?:imię|nazwisko|adres|telefon)\s*:?\s*_{3,}",
         r"proszę\s+(?:wypełnić|uzupełnić)",
         r"\[\s*\]\s*(?:tak|nie|zgadzam się)"),
    ),
    "memo": (
        ("notatka", "notatka służbowa", "do:", "od:", "data:", "dotyczy:",
         "temat:", "dw:", "wewnętrzne", "poufne", "służbowe"),
        (r"notatka\s+służbowa",
         r"do\s*:\s*\w+.*od\s*:\s*\w+",
         r"(?:data|dotyczy|temat)\s*:.*"),
    ),
    "certificate": (
        ("certyfikat", "świadectwo", "zaświadczenie", "poświadcza", "nadaje",
         "przyznaje", "ukończenie", "osiągnięcie", "niniejszym potwierdza",
         "zaświadcza się", "akredytowany"),
        (r"(?:certyfikat|świadectwo|zaświadczenie)\s+(?:ukończenia|udziału)",
         r"niniejszym\s+(?:potwierdza|zaświadcza)\s+(?:się|że)",
         r"nadaje\s+(?:tytuł|certyfikat)"),
    ),
    "statement": (
        ("wyciąg", "wyciąg z konta", "wyciąg bankowy", "zestawienie",
         "saldo", "transakcje", "operacje", "saldo początkowe",
         "saldo końcowe", "rachunek", "historia operacji"),
        (r"wyciąg\s+(?:z\s+konta|bankowy)",
         r"saldo\s+(?:początkowe|końcowe|na\s+dzień)",
         r"(?:historia|zestawienie)\s+(?:operacji|transakcji)"),
    ),
}

_CAT_BY_LANG = {"en": _CATEGORIES_EN, "pl": _CATEGORIES_PL}

# Combined category table in deterministic (sorted) category order.  The
# reference iterates a Python *set* of category names
# (app/document_categorizer_v2.py:71-76) whose order is hash-seed dependent;
# sorting is our canonicalization (affects only tie-breaks, which the
# reference's own tests never rely on).
CATEGORIES: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {}
for _name in sorted(set().union(*(_CAT_BY_LANG[l].keys() for l in LANGS))):
    _kw: list[str] = []
    _pat: list[str] = []
    for _lang in LANGS:
        if _name in _CAT_BY_LANG[_lang]:
            k, p = _CAT_BY_LANG[_lang][_name]
            _kw.extend(k)
            _pat.extend(p)
    CATEGORIES[_name] = (tuple(_kw), tuple(_pat))
