"""Deterministic synthetic Common-Crawl-style corpus generator (seed=42).

Produces the input table of the driver's input hint —
``(url string, warc_ts timestamp, html binary, text string, lang string)`` —
per FIXTURES.md §1/§3: fixture bodies modeled on the reference's own test
texts (``tests/test_metadata_extractor.py``,
``tests/test_document_categorizer.py``), wrapped in boilerplate-heavy HTML
(nav/header/footer/aside link farms, inline script/style, comments), ~5 %
minimal-PDF payloads, ~1 % poison rows, charset edge cases (latin-2 +
mislabeled), a log-normal-ish size skew with hand-placed giants, and a
pre-extracted ``text`` fast-path slice.

Everything is a pure function of the row index — no RNG state shared across
rows — so any slice of the corpus can be regenerated independently on any
executor (`mapInPandas` over a `spark.range`), which is how `bench.py`
materializes the sf0.1-scale corpus without driver-side loops.
"""

from __future__ import annotations

import hashlib
import random
import zlib
from datetime import datetime, timedelta, timezone

SEED = 42
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

TEMPLATE_IDS: tuple[str, ...] = (
    "invoice_en", "receipt_en", "contract_en", "letter_en", "invoice_pl",
    "amounts_eu", "multi_date", "unknown_noise", "boilerplate_heavy",
    "pdf_native", "pdf_scant", "multipage_pdf", "charset_l2",
    "charset_mislabel", "poison", "precomputed", "image_png",
    "image_jpeg", "image_tiff",
)

# template mix per 100 rows (deterministic wheel; poison ≈2 %, pdf ≈7 %,
# precomputed fast-path ≈10 %, charset cases ≈6 %, images ≈4 % — the
# crawl reality the reference's V1 filter admits as valid types)
_WHEEL: tuple[str, ...] = (
    ("invoice_en",) * 13 + ("receipt_en",) * 10 + ("contract_en",) * 7
    + ("letter_en",) * 7 + ("invoice_pl",) * 11 + ("amounts_eu",) * 5
    + ("multi_date",) * 5 + ("unknown_noise",) * 5
    + ("boilerplate_heavy",) * 8 + ("pdf_native",) * 4 + ("pdf_scant",) * 1
    + ("multipage_pdf",) * 2 + ("charset_l2",) * 4 + ("charset_mislabel",) * 2
    + ("poison",) * 2 + ("precomputed",) * 10
    + ("image_png",) * 2 + ("image_jpeg",) * 1 + ("image_tiff",) * 1
)
assert len(_WHEEL) == 100

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu"
).split()


def _rng(i: int) -> random.Random:
    """Per-row RNG keyed on (SEED, i) — independent of generation order."""
    return random.Random(f"{SEED}:{i}")


def template_for(i: int) -> str:
    return _WHEEL[i % 100]


def url_for(i: int) -> str:
    return f"https://site{i % 97}.example/{template_for(i)}/{i}"


def ts_for(i: int) -> datetime:
    return EPOCH + timedelta(seconds=137 * i)


def _noise_words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


# -- fixture bodies (FIXTURES.md §3) ----------------------------------------

def _body(i: int, template: str, rng: random.Random) -> str:
    if template in ("invoice_en", "precomputed"):
        return (
            f"INVOICE\nInvoice Number: INV-2024-{i % 10000:04d}\n"
            f"Date: 15/03/2024\nAmount Due: ${(i % 900) + 100}.00\n"
            f"Bill To: John Smith\nContact: john.smith{i % 50}@example.com\n"
            f"Phone: (555) 123-4567"
        )
    if template == "receipt_en":
        return (
            f"RECEIPT\nStore: Acme Store\nDate: 2024-03-15\n"
            f"Subtotal: ${(i % 90) + 10}.00\nTax: $2.50\n"
            f"Total: ${(i % 90) + 12}.50\nThank you!"
        )
    if template == "contract_en":
        return (
            "EMPLOYMENT CONTRACT\nThis agreement is made between "
            f"Acme Corp and Worker {i % 100}. The terms and conditions "
            "apply to the party of the first part. "
            + _noise_words(rng, 30)
        )
    if template == "letter_en":
        return (
            f"Dear Mr. Johnson,\n{_noise_words(rng, 25)}\n"
            "Sincerely,\nAlice Brown"
        )
    if template == "invoice_pl":
        return (
            f"Faktura VAT nr FV/{i % 1000}\nSprzedawca: Firma Testowa\n"
            "NIP: 123-456-78-90\nKwota do zapłaty: 1 234,56 zł\n"
            "Termin płatności: 15.01.2024\n00-950 Warszawa"
        )
    if template == "amounts_eu":
        return "Betrag: 1.500,00 € und Total: $1,500.00 zusammen."
    if template == "multi_date":
        return (
            "Invoice dated 01/01/2024, due date 15/01/2024, created "
            "2024-03-15, Dated March 15, 2024"
        )
    if template in ("charset_l2", "charset_mislabel"):
        return (
            f"Zażółć gęślą jaźń {i % 997}. Łódź, świerszcz, źdźbło. "
            "Kwota do zapłaty: 99,99 zł. Termin płatności: 15.01.2024."
        )
    # unknown_noise / boilerplate_heavy / pdf bodies
    return _noise_words(rng, 40 + (i % 60))


def _size_multiplier(i: int, rng: random.Random) -> int:
    """Heavy-tailed body repetition: top ~0.5 % rows 100×, giant per 10k."""
    if i > 0 and i % 10000 == 0:
        return 1000
    draw = rng.random()
    if draw > 0.995:
        return 100
    if draw > 0.97:
        return 10
    return 1


# -- HTML wrapper ------------------------------------------------------------

_NAV_LINKS = "".join(
    f'<li><a href="/cat/{w}">{w}</a></li>' for w in _WORDS[:12]
)


def _html_page(body: str, charset: str, declared: str, lang: str,
               rng: random.Random) -> bytes:
    """Boilerplate-wrapped page; main content is one <article> of <p>s."""
    paragraphs = "".join(
        f"<p>{chunk}</p>"
        for chunk in body.split("\n") if chunk.strip()
    )
    aside_links = "".join(
        f'<a href="/r/{rng.randrange(10**6)}">{rng.choice(_WORDS)}</a> '
        for _ in range(rng.randrange(5, 20))
    )
    doc = (
        f'<!DOCTYPE html><html lang="{lang}"><head>'
        f'<meta charset="{declared}"><title>fixture page</title>'
        "<style>body{margin:0}</style>"
        '<script>var trackers = "ignored";</script></head><body>'
        "<!-- generated fixture -->"
        f"<header><h1><a href=\"/\">SiteName</a></h1></header>"
        f"<nav><ul>{_NAV_LINKS}</ul></nav>"
        f"<article>{paragraphs}</article>"
        f"<aside>{aside_links}</aside>"
        f'<footer><a href="/tos">terms</a> <a href="/privacy">privacy</a>'
        "&copy; 2024 SiteName</footer>"
        "</body></html>"
    )
    return doc.encode(charset, errors="replace")


# -- minimal PDF writer -------------------------------------------------------

def make_pdf(pages: list[str], compress: bool = False) -> bytes:
    """Minimal valid PDF with literal-string content streams, raw or
    FlateDecode-compressed (``compress=True``)."""
    objects: list[bytes] = []

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    n_pages = len(pages)
    # obj 1: catalog, obj 2: pages, obj 3: font, pages at 4..., contents after
    kids = " ".join(f"{4 + i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    content_base = 4 + n_pages
    for i in range(n_pages):
        objects.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {content_base + i} 0 R "
            f"/Resources << /Font << /F1 3 0 R >> >> >>".encode()
        )
    for text in pages:
        lines = text.split("\n")
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            if j:
                ops.append("0 -14 Td")
            ops.append(f"({esc(line)}) Tj")
        ops.append("ET")
        stream = " ".join(ops).encode("latin-1", errors="replace")
        if compress:
            stream = zlib.compress(stream)
            objects.append(
                b"<< /Length " + str(len(stream)).encode()
                + b" /Filter /FlateDecode >>\nstream\n"
                + stream + b"\nendstream"
            )
        else:
            objects.append(
                b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
                + stream + b"\nendstream"
            )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# -- one row -----------------------------------------------------------------

def generate_row(i: int) -> dict:
    """Row ``i`` of the corpus (pure function of ``i``)."""
    rng = _rng(i)
    template = template_for(i)
    lang = "pl" if template in ("invoice_pl", "charset_l2",
                                "charset_mislabel") else (
        "de" if template == "amounts_eu" else "en")
    body = _body(i, template, rng)
    mult = _size_multiplier(i, rng)
    if mult > 1:
        body = body + "\n" + "\n".join(
            _noise_words(_rng(i * 31 + k), 50) for k in range(mult)
        )

    html: bytes | None
    text: str | None = None

    if template == "precomputed":
        # fast-path rows: upstream already extracted text; html kept as-is
        text = body
        html = _html_page(body, "utf-8", "utf-8", lang, rng)
    elif template in ("pdf_native", "multipage_pdf"):
        if template == "multipage_pdf":
            pages = [f"PAGE-{k + 1}-{_noise_words(_rng(i * 7 + k), 30)}"
                     for k in range(3)]
        else:
            pages = [body]
        html = make_pdf(pages)
    elif template == "pdf_scant":
        html = make_pdf(["tiny"])
    elif template == "charset_l2":
        html = _html_page(body, "iso-8859-2", "iso-8859-2", lang, rng)
    elif template == "charset_mislabel":
        # bytes are cp1250 but the page *claims* iso-8859-2
        html = _html_page(body, "cp1250", "iso-8859-2", lang, rng)
    elif template == "image_png":
        # real decodable PNG: deterministic gray gradient keyed on i
        import numpy as np

        from .extract.images import encode_png

        w, h = 16 + (i % 3) * 8, 16
        pix = np.fromfunction(
            lambda y, x: (i + x + y * w) % 256, (h, w)).astype("uint8")
        html = encode_png(pix)
    elif template == "image_jpeg":
        # real baseline JPEG (the engine has a full DCT codec now):
        # smooth gradient keyed on i, decodable by decode_jpeg
        import numpy as np

        from .extract.jpeg import encode_jpeg

        pix = np.fromfunction(
            lambda y, x: (i * 3 + 4 * x + 6 * y) % 256,
            (16, 24)).astype("uint8")
        html = encode_jpeg(pix, quality=85)
    elif template == "image_tiff":
        # alternate metadata-only multi-frame fixtures (keeps the honest
        # metadata_only taxonomy exercised) with real compressed TIFFs
        # (LZW / PackBits) that decode end-to-end
        if i % 3 == 0:
            from .extract.images import encode_tiff_frames

            html = encode_tiff_frames((i % 5) + 1)
        else:
            import numpy as np

            from .extract.images import encode_tiff_gray

            pix = np.fromfunction(
                lambda y, x: (i + 2 * x + 3 * y) % 256,
                (16, 16)).astype("uint8")
            html = encode_tiff_gray(
                [pix], compression="lzw" if i % 3 == 1 else "packbits")
    elif template == "poison":
        choice = i % 3
        if choice == 0:
            html = b""                                  # empty payload
        elif choice == 1:
            html = b"\xff\xfe\xfa\x00garbage" + bytes(rng.randrange(256)
                                                      for _ in range(64))
        else:  # truncated valid page
            html = _html_page(body, "utf-8", "utf-8", lang, rng)[:40]
    else:
        html = _html_page(body, "utf-8", "utf-8", lang, rng)

    return {
        "url": url_for(i),
        "warc_ts": ts_for(i),
        "html": html,
        "text": text,
        "lang": lang,
    }


def generate_rows(start: int, stop: int) -> list[dict]:
    return [generate_row(i) for i in range(start, stop)]


def corpus_pdf(n_rows: int):
    """pandas DataFrame of rows [0, n_rows) — test-scale convenience."""
    import pandas as pd

    return pd.DataFrame(generate_rows(0, n_rows))


def materialize(spark, n_rows: int, path: str, partitions: int = 64) -> None:
    """Distributed corpus materialization → parquet at ``path``.

    ``generate_row`` is a pure function of the row index, so each
    executor builds its slice independently — no driver-side loop, no
    broadcast state.
    """
    import pandas as pd

    from .schemas import INPUT_SCHEMA

    def kernel(pdfs):
        for pdf in pdfs:
            rows = [generate_row(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"])

    (spark.range(0, n_rows, 1, partitions)
     .mapInPandas(kernel, schema=INPUT_SCHEMA)
     .write.mode("overwrite").parquet(path))


def fingerprint(n_rows: int) -> str:
    """Stable digest of the first n rows (regression guard for goldens)."""
    h = hashlib.sha256()
    for row in generate_rows(0, n_rows):
        h.update(row["url"].encode())
        h.update(row["html"] or b"\x00")
        h.update((row["text"] or "").encode())
    return h.hexdigest()
