"""The north-rule invariant: byte-identical extracted text per url.

Goldens in tests/goldens/corpus_goldens.json were frozen from the pure
extractor; this test re-runs extraction and asserts identity — catching
any drift in the charset ladder, DOM scorer, PDF parser, joiners, or the
corpus generator itself (fingerprint guard)."""

import hashlib
import json
import os

import pytest

from docvault_ocr_service_spark import corpus
from docvault_ocr_service_spark.extract import extract_document

GOLDENS_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                            "corpus_goldens.json")

with open(GOLDENS_PATH) as f:
    GOLDENS = json.load(f)


def test_corpus_generator_is_frozen():
    assert corpus.fingerprint(120) == GOLDENS["corpus_fingerprint"]


@pytest.mark.parametrize("i", range(120))
def test_extraction_matches_golden(i):
    row = corpus.generate_row(i)
    expected = GOLDENS["rows"][row["url"]]
    res = extract_document(row["url"], row["html"], row["text"], row["lang"])
    assert res["status"] == expected["status"]
    assert res["error_kind"] == expected["error_kind"]
    assert res["category"] == expected["category"]
    assert res["page_count"] == expected["page_count"]
    got_sha = (hashlib.sha256(res["text"].encode()).hexdigest()
               if res["text"] is not None else None)
    assert got_sha == expected["text_sha256"], "extracted text drifted"
    if res["metadata"] is not None:
        assert abs(res["metadata"]["confidence"]
                   - expected["md_confidence"]) < 1e-12


def test_full_text_samples():
    for url, want in GOLDENS["full_text"].items():
        i = GOLDENS["rows"][url]["row"]
        row = corpus.generate_row(i)
        res = extract_document(row["url"], row["html"], row["text"],
                               row["lang"])
        assert res["text"] == want


def test_poison_rows_never_produce_text():
    for i in range(300):
        if corpus.template_for(i) != "poison":
            continue
        row = corpus.generate_row(i)
        res = extract_document(row["url"], row["html"], row["text"],
                               row["lang"])
        assert res["status"] == "failed_permanent" or not res["text"]
