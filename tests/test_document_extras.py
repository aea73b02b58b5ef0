"""Document dispatch extras (taxonomy refinements)."""

def test_encrypted_pdf_taxonomy():
    from docvault_ocr_service_spark.extract.document import (
        PERMANENT_ERROR_KINDS, extract_document)

    pdf = (b"%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> "
           b"endobj\ntrailer << /Root 1 0 R /Encrypt 5 0 R >>\n%%EOF")
    r = extract_document("https://x/enc.pdf", pdf, None, None)
    assert r["status"] == "failed_permanent"
    assert r["error_kind"] == "encrypted_pdf"
    assert "encrypted_pdf" in PERMANENT_ERROR_KINDS
