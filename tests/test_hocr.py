"""hOCR serialization: XML well-formedness, char-offset bbox
invariants, Spark column derivation, golden pin."""

import json
import os
import re
import xml.etree.ElementTree as ET

from docvault_ocr_service_spark.extract.document import extract_document
from docvault_ocr_service_spark.extract.hocr import to_hocr
from docvault_ocr_service_spark import corpus

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "hocr_goldens.json")
NS = "{http://www.w3.org/1999/xhtml}"
BBOX = re.compile(r"bbox (\d+) 0 (\d+) 1")


def _assert_invariants(hocr: str, pages: list[str]):
    root = ET.fromstring(hocr)          # must parse as XML
    page_divs = [d for d in root.iter(f"{NS}div")
                 if d.get("class") == "ocr_page"]
    assert len(page_divs) == len(pages)
    for div, text in zip(page_divs, pages):
        for w in div.iter(f"{NS}span"):
            if w.get("class") != "ocrx_word":
                continue
            m = BBOX.search(w.get("title"))
            s, e = int(m.group(1)), int(m.group(2))
            want = "".join(c if (c >= " " or c in "\t\n\r")
                           else "\ufffd" for c in text[s:e])
            assert want == w.text, (s, e, w.text)
        for ln in div.iter(f"{NS}span"):
            if ln.get("class") != "ocr_line":
                continue
            m = BBOX.search(ln.get("title"))
            s, e = int(m.group(1)), int(m.group(2))
            line = text[s:e]
            assert "\n" not in line and line.strip()


def test_word_bboxes_slice_page_text():
    pages = ["hello  world\n\n  indented line",
             "second <page> & \"quotes\""]
    h = to_hocr("u", pages, 87.4, "en")
    _assert_invariants(h, pages)
    assert "x_wconf 87" in h
    # escaping round-trips through the XML parser (checked above) and
    # raw angle brackets never leak into the markup
    assert "<page>" not in h


def test_empty_and_blank_pages():
    for pages in ([""], ["   "], ["", "x"]):
        _assert_invariants(to_hocr("u", pages, 0.0, None), pages)


def test_extraction_paths_produce_valid_hocr():
    """HTML and native-PDF corpus rows both serialize with intact
    offsets (the pages come from the real extraction kernel)."""
    seen = set()
    for i in range(100):
        row = corpus.generate_row(i)
        res = extract_document(row["url"], row["html"], row.get("text"),
                               row.get("lang"))
        if res["status"] != "done":
            continue
        pages = [p["text"] for p in res["pages"]]
        h = to_hocr(row["url"], pages, res["confidence"], res["lang"])
        _assert_invariants(h, pages)
        seen.add(len(pages) > 1)
    assert seen == {True, False}    # both single- and multi-page covered


def test_with_hocr_column(spark):
    from docvault_ocr_service_spark.functions.udfs import (
        run_extraction, with_hocr)
    from docvault_ocr_service_spark.schemas import INPUT_SCHEMA

    df = spark.createDataFrame(corpus.corpus_pdf(90), schema=INPUT_SCHEMA)
    out = with_hocr(run_extraction(df)).select(
        "url", "status", "hocr", "pages", "confidence", "lang").collect()
    assert any(r["status"] != "done" for r in out)
    for r in out:
        if r["status"] == "done":
            _assert_invariants(r["hocr"],
                               [p["text"] for p in r["pages"]])
        else:
            assert r["hocr"] is None


def test_golden_pin():
    """Byte-identical hOCR for pinned corpus rows — regenerate
    deliberately (see tests/goldens/) when serialization changes."""
    with open(GOLDEN) as f:
        goldens = json.load(f)
    for key, want in goldens.items():
        i = int(key)
        row = corpus.generate_row(i)
        res = extract_document(row["url"], row["html"], row.get("text"),
                               row.get("lang"))
        got = to_hocr(row["url"], [p["text"] for p in res["pages"]],
                      res["confidence"], res["lang"])
        assert got == want, f"hOCR drift for corpus row {i}"


def test_nan_confidence_is_total():
    h = to_hocr("u", ["hello world"], float("nan"), None)
    assert "x_wconf 0" in h
    _assert_invariants(h, ["hello world"])
    assert to_hocr("u", ["x"], None, "en")


def test_ascii_whitespace_model():
    """Tokenization is RE2 \\s ([ \\t\\n\\r\\f]): NBSP and vertical tab
    are word characters, so SQL twins using \\s agree."""
    pages = ["a\tb\rc\fd", "nb\xa0sp v\x0bt"]
    h = to_hocr("u", pages, 50.0, "en")
    _assert_invariants(h, pages)
    root = ET.fromstring(h)
    words = [w.text for w in root.iter(f"{NS}span")
             if w.get("class") == "ocrx_word"]
    assert words == ["a", "b", "c", "d", "nb\xa0sp", "v\ufffdt"]


def test_job_hocr_sink(spark, tmp_path):
    from docvault_ocr_service_spark.plans.extract_job import (
        run_extract_job)
    from docvault_ocr_service_spark.schemas import INPUT_SCHEMA

    df = spark.createDataFrame(corpus.corpus_pdf(40), schema=INPUT_SCHEMA)
    rep = run_extract_job(spark, df, str(tmp_path / "state"),
                          hocr_dir=str(tmp_path / "hocr"))
    out = spark.read.parquet(str(tmp_path / "hocr" / f"run={rep.run_id}"))
    rows = out.collect()
    assert len(rows) == rep.completed
    for r in rows[:5]:
        ET.fromstring(r["hocr"])
