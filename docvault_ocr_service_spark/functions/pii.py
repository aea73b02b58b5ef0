"""PII scrubbing for training corpora — fully columnar.

Standard pretraining-hygiene pass (the C4/Dolma-style redaction stage):
emails, payment-card-like digit runs, IPv4 addresses, and phone numbers
are replaced with typed placeholder tokens, and per-type match counts
are reported for curation dashboards.

Everything is native ``regexp_replace`` / ``regexp_extract_all`` — the
whole pass stays inside whole-stage codegen, no Python.  The patterns
use only RE2-compatible syntax (no lookaround, no backrefs) so the
DuckDB driver-gate oracle applies the byte-identical regexes, and the
replacement ORDER is fixed (email → card → ipv4 → phone) because later
patterns can overlap earlier ones; any engine replaying the same order
reproduces the same output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: (name, pattern, placeholder)
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("card", r"\b(?:\d[ -]?){12}\d{1,4}\b", "<CARD>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d ().-]{7,}\d", "<PHONE>"),
)


def pii_counts(text: Column) -> list[Column]:
    """Per-type match counts on the ORIGINAL text (pre-redaction), so
    overlapping types (a card number is also phone-shaped) are counted
    under every pattern they match — the honest audit number."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), 0))
         .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def scrub_text(text: Column) -> Column:
    """Apply the ordered redactions; placeholders are plain tokens the
    tokenizer pass downstream can keep or drop."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str = "text_clean") -> DataFrame:
    """df + per-type count columns + the scrubbed text column."""
    text = F.col(text_col)
    return df.select(
        "*",
        *pii_counts(text),
        scrub_text(text).alias(out_col),
    )
