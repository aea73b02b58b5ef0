"""Golden-value tests for the metadata extractor — frozen from the
reference's test expectations (tests/test_metadata_extractor.py in
/root/reference) and from a fuzz parity run against the reference
implementation at build time."""

from datetime import date

from docvault_ocr_service_spark.extract.metadata import (
    extract_metadata, metadata_confidence)


def test_date_slash_format():
    # reference tests/test_metadata_extractor.py:29-35: 15/03/2024
    md = extract_metadata("Invoice date: 15/03/2024")
    assert date(2024, 3, 15) in md["dates"]


def test_date_iso_is_matched_by_both_language_packs():
    # the ISO pattern exists in both en and pl packs → matched twice
    md = extract_metadata("Created 2024-03-15.")
    assert md["dates"] == [date(2024, 3, 15), date(2024, 3, 15)]


def test_date_written_english():
    md = extract_metadata("Dated March 15, 2024")
    assert date(2024, 3, 15) in md["dates"]


def test_date_written_polish_dropped_like_reference():
    # dateutil cannot parse Polish month names; the reference (which uses
    # the same dateutil call, app/metadata_extractor_v2.py:158) drops the
    # match too — verified against the reference implementation.
    md = extract_metadata("Wystawiono 15 stycznia 2024")
    assert md["dates"] == []


def test_date_polish_numeric():
    md = extract_metadata("Termin: 15.01.2024")
    assert md["dates"] == [date(2024, 1, 15), date(2024, 1, 15)]


def test_amount_us_format():
    # reference :106-112 → $1,500.00 = 1500.0
    md = extract_metadata("Total: $1,500.00")
    assert 1500.0 in md["amounts"]


def test_amount_european_format():
    # reference :114-120 → 1.500,00 € = 1500.0
    md = extract_metadata("Betrag: 1.500,00 €")
    assert 1500.0 in md["amounts"]


def test_amount_polish_zloty():
    md = extract_metadata("Kwota do zapłaty: 1 234,56 zł")
    assert 1234.56 in md["amounts"]


def test_amount_bounds():
    md = extract_metadata("$0.00 and $999999999999.00")
    assert all(0 < a < 1_000_000_000 for a in md["amounts"])


def test_email_and_sorted_dedup():
    md = extract_metadata("b@x.com a@x.com b@x.com")
    assert md["emails"] == ["a@x.com", "b@x.com"]


def test_phone_us():
    md = extract_metadata("Call (555) 123-4567 now")
    assert any("555" in p for p in md["phones"])


def test_phone_polish():
    md = extract_metadata("tel. +48 601 234 567")
    assert any("48" in p for p in md["phones"])


def test_invoice_number():
    md = extract_metadata("Invoice: INV-2024-001 attached")
    assert "INV-2024-001" in md["invoice_numbers"]


def test_polish_invoice_number():
    md = extract_metadata("Faktura VAT nr FV/123")
    assert any("123" in n for n in md["invoice_numbers"])


def test_nip_tax_id():
    md = extract_metadata("NIP: 123-456-78-90")
    assert "123-456-78-90" in md["tax_ids"]


def test_polish_postal_code():
    md = extract_metadata("00-950 Warszawa")
    assert "00-950" in md["postal_codes"]


def test_name_with_title_stripped():
    md = extract_metadata("Dear Mr. John Smith,")
    assert "John Smith" in md["names"]


def test_confidence_weights():
    # full invoice: dates+amounts+names+emails present → ≥ .7/1.1
    md = extract_metadata(
        "Invoice Date: 15/03/2024 Total: $500.00 "
        "Bill To: John Smith Contact: js@x.com")
    assert md["confidence"] >= 0.7 / 1.1 - 1e-12
    assert 0.0 <= md["confidence"] <= 1.0


def test_empty_text():
    md = extract_metadata("")
    assert md["dates"] == [] and md["amounts"] == []
    assert md["confidence"] == 0.0


def test_confidence_function_matches_reference_weights():
    base = {k: [] for k in (
        "dates", "amounts", "names", "emails", "phones", "invoice_numbers",
        "po_numbers", "addresses", "postal_codes", "tax_ids")}
    assert metadata_confidence(base) == 0.0
    full = {k: ["x"] for k in base}
    assert abs(metadata_confidence(full) - 1.0) < 1e-12
    only_dates = dict(base, dates=["x"])
    assert abs(metadata_confidence(only_dates) - 0.2 / 1.1) < 1e-12
