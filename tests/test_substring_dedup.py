"""Exact substring (k-gram span) dedup — Lee et al. ExactSubstr
semantics: every token covered by a corpus-duplicated k-gram is removed,
within-doc repeats included."""

from docvault_ocr_service_spark.operators.substring_dedup import (
    dedup_exact_substrings)

SHARED = "alpha bravo charlie delta echo foxtrot golf hotel"   # 8 tokens


def test_cross_doc_shared_span_removed(spark):
    rows = [
        (1, f"one two three {SHARED} four five six"),
        (2, f"seven eight nine ten {SHARED} eleven twelve"),
        (3, "totally unrelated text with no duplicated spans at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           dedup_exact_substrings(df, k=5).collect()}

    # exactly the 8 shared tokens disappear from both docs
    assert got[1]["clean_text"] == "one two three four five six"
    assert got[1]["n_removed"] == 8 and got[1]["n_tokens"] == 14
    assert got[2]["clean_text"] == "seven eight nine ten eleven twelve"
    assert got[2]["n_removed"] == 8
    # untouched doc survives byte-identical (token-normalized == original)
    assert got[3]["clean_text"] == rows[2][1]
    assert got[3]["n_removed"] == 0


def test_within_doc_repeat_removed(spark):
    phrase = "red orange yellow green blue"                    # 5 tokens
    rows = [(1, f"{phrase} unique middle words here {phrase}")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = dedup_exact_substrings(df, k=5).first()
    assert got["clean_text"] == "unique middle words here"
    assert got["n_removed"] == 10


def test_short_null_blank_and_fully_duplicated(spark):
    rows = [
        (1, "tiny doc"),                          # < k tokens: kept
        (2, None),                                # null text
        (3, "   "),                               # blank
        (4, "same ten tokens a b c d e f g"),     # exact dup pair
        (5, "same ten tokens a b c d e f g"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           dedup_exact_substrings(df, k=5).collect()}
    assert got[1]["clean_text"] == "tiny doc" and got[1]["n_removed"] == 0
    assert got[2]["clean_text"] is None and got[2]["n_tokens"] == 0
    assert got[3]["clean_text"] is None
    assert got[4]["clean_text"] == "" and got[4]["n_removed"] == 10
    assert got[5]["clean_text"] == ""


def test_boundary_grams_do_not_leak(spark):
    """Grams spanning the boundary between unique context and the shared
    span are unique (contexts differ), so neighbors of the span are NOT
    removed — coverage is exactly the duplicated span."""
    rows = [(1, f"ctxA1 ctxA2 {SHARED} tailA"),
            (2, f"ctxB1 {SHARED} tailB2 tailB3")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["clean_text"] for r in
           dedup_exact_substrings(df, k=5).collect()}
    assert got[1] == "ctxA1 ctxA2 tailA"
    assert got[2] == "ctxB1 tailB2 tailB3"
