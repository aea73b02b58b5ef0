"""Categorizer tests mirroring the reference's expectations
(/root/reference/tests/test_document_categorizer.py)."""

from docvault_ocr_service_spark.extract.categorize import (
    CATEGORY_NAMES, categorize, categorize_detailed)

INVOICE = ("INVOICE\nInvoice Number: INV-2024-001\nBill To: Acme\n"
           "Amount Due: $500.00\nPayment Terms: Net 30 days")
RECEIPT = ("RECEIPT\nStore: Acme Store\nSubtotal: $25.00\nTax: $2.50\n"
           "Total: $27.50\nThank you for shopping!")
CONTRACT = ("EMPLOYMENT CONTRACT\nThis agreement is made between A and B. "
            "Terms and conditions. Party of the first part.")
LETTER = "Dear Mr. Johnson,\nThanks for your note.\nSincerely,\nAlice"
POLISH_INVOICE = ("Faktura VAT nr FV/123\nSprzedawca: X\nNabywca: Y\n"
                  "Kwota do zapłaty: 100 zł\nTermin płatności: 15.01.2024")


def test_invoice_detection():
    r = categorize_detailed(INVOICE)
    assert r.primary_category == "invoice"
    assert r.confidence > 0.7  # clear-document bar from reference tests


def test_receipt_detection():
    r = categorize_detailed(RECEIPT)
    assert r.primary_category == "receipt"
    assert r.confidence > 0.5


def test_contract_detection():
    assert categorize(CONTRACT) == "contract"


def test_letter_detection():
    assert categorize(LETTER) == "letter"


def test_polish_invoice():
    r = categorize_detailed(POLISH_INVOICE)
    assert r.primary_category == "invoice"
    assert "pl" in r.detected_languages


def test_empty_short_nonsense_are_unknown():
    for text in ("", "ab", "  ", "qwxz zzz vvv"):
        r = categorize_detailed(text)
        assert r.primary_category == "unknown"


def test_threshold():
    # single weak keyword → score 0.15 < 0.25 → unknown
    r = categorize_detailed("the store was closed")
    assert r.primary_category == "unknown"
    assert r.all_categories["receipt"] > 0


def test_score_formula():
    # exactly 2 keywords, no patterns → 0.30
    r = categorize_detailed("kwit gotówka")
    assert abs(r.all_categories["receipt"] - 0.30) < 1e-12
    # keyword + its pattern → 0.15 + 0.2
    r2 = categorize_detailed("paragon xyz")
    assert abs(r2.all_categories["receipt"] - 0.35) < 1e-12


def test_all_scores_bounded():
    r = categorize_detailed(INVOICE + RECEIPT + CONTRACT)
    assert set(r.all_categories) == set(CATEGORY_NAMES)
    assert all(0.0 <= v <= 1.0 for v in r.all_categories.values())


def test_language_detection_default():
    r = categorize_detailed("no marker words here at all")
    assert r.detected_languages == ["en", "pl"]
