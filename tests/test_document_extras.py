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


def test_encrypt_token_in_parseable_pdf_is_not_misclassified():
    """A well-parsing PDF whose TEXT merely mentions /Encrypt must
    extract normally (review finding: no substring false positives)."""
    from docvault_ocr_service_spark.extract.document import (
        extract_document)

    body = (b"BT (This document explains the /Encrypt dictionary in "
            b"detail, covering PDF security handlers and key "
            b"derivation across more than one hundred characters of "
            b"real prose.) Tj ET")
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
           b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
           b"3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n"
           b"4 0 obj << /Length " + str(len(body)).encode()
           + b" >> stream\n" + body + b"\nendstream endobj\n"
           b"trailer << /Root 1 0 R >>\n%%EOF")
    r = extract_document("https://x/about-encryption.pdf", pdf,
                         None, None)
    assert r["status"] == "done", r["error_msg"]
    assert "/Encrypt dictionary" in r["text"]
