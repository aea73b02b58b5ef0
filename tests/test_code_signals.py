"""Code-vs-prose signals (functions/textstats.py::code_signals)."""

from docvault_ocr_service_spark.functions.textstats import code_signals

CODE = """int sum(int[] arr) {
    int total = 0;
    for (i = 0; i < n; i++) {
        total += arr[i];
    }
    return total;
}"""

PROSE = ("The quick brown fox jumps over the lazy dog and keeps "
         "running through the quiet fields until the evening comes.")


def test_code_signals_discriminates(spark):
    df = spark.createDataFrame(
        [(1, CODE), (2, PROSE), (3, None), (4, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in code_signals(df).collect()}
    assert got[1]["is_code_like"] is True
    assert got[2]["is_code_like"] is False
    assert got[3]["is_code_like"] is False
    assert got[4]["is_code_like"] is False
    assert got[3]["symbol_char_frac_micro"] == 0
    assert got[2]["keyword_count"] == 0


def test_code_signals_values(spark):
    df = spark.createDataFrame([(1, CODE)], "doc_id long, text string")
    r = code_signals(df).collect()[0]
    # 7 non-empty lines, every one ends with ; { or }
    assert r["semicolon_eol_frac_micro"] == 1_000_000
    # 5 of 7 lines start with >= 4 spaces
    assert r["indent_frac_micro"] == round(5 / 7 * 1e6)
    # int x3 + return x1
    assert r["keyword_count"] == 4
    n = len(CODE)
    sym = sum(CODE.count(c) for c in "{}();=<>[]")
    assert r["symbol_char_frac_micro"] == round(sym / n * 1e6)


def test_code_signals_prose_with_punctuation(spark):
    # heavy natural-language punctuation must not trip the gate
    text = ("Wait — really?! She said: 'no'. He answered; the end. "
            "Questions, answers, commas, and periods everywhere!") * 3
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = code_signals(df).collect()[0]
    assert r["is_code_like"] is False


def test_code_signals_crlf_lines(spark):
    # CRLF endings must behave exactly like LF (Java `$` would match
    # before a trailing \r; the explicit last-char test must not)
    df = spark.createDataFrame(
        [(1, CODE), (2, CODE.replace("\n", "\r\n"))],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in code_signals(df).collect()}
    assert (got[1]["semicolon_eol_frac_micro"]
            == got[2]["semicolon_eol_frac_micro"] == 1_000_000)
    assert got[1]["indent_frac_micro"] == got[2]["indent_frac_micro"]
    assert got[2]["is_code_like"] is True
