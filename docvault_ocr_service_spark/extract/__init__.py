"""Pure-Python extraction kernels — zero Spark imports by design.

Everything in this subpackage is a plain function over strings/bytes so the
golden-corpus generator, the unit tests, and the pandas-UDF bindings in
``functions/`` all execute the *same* code path — the precondition for the
byte-identical-text invariant.
"""

from .charset import decode_html_bytes, sniff_declared_charset
from .document import detect_format, extract_document
from .htmltext import extract_main_text
from .metadata import extract_metadata
from .categorize import categorize, categorize_detailed
from .pdftext import extract_pdf_pages, has_native_text

__all__ = [
    "decode_html_bytes", "sniff_declared_charset", "detect_format",
    "extract_document", "extract_main_text", "extract_metadata",
    "categorize", "categorize_detailed", "extract_pdf_pages",
    "has_native_text",
]
