"""Token-window chunking (functions/chunking.py)."""

import pytest

from docvault_ocr_service_spark.functions.chunking import chunk_documents


def _py_chunks(text, chunk, overlap):
    toks = (text or "").strip().split()
    toks = [t for t in toks if t]
    if not toks:
        return []
    n = len(toks)
    stride = chunk - overlap
    k = 0 if n <= chunk else -(-(n - chunk) // stride)
    return [" ".join(toks[i * stride:i * stride + chunk])
            for i in range(k + 1)]


def test_chunking_matches_python(spark):
    texts = ["w" + str(i) for i in range(23)]
    doc = " ".join(texts)
    df = spark.createDataFrame(
        [(1, doc), (2, "short text"), (3, ""), (4, None)],
        "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, chunk_tokens=8, overlap=3).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_idx"]] = \
            (r["chunk_text"], r["n_tokens"])
    want1 = _py_chunks(doc, 8, 3)
    assert [got[1][i][0] for i in range(len(want1))] == want1
    assert 3 not in got and 4 not in got
    assert got[2][0] == ("short text", 2)
    # every chunk except possibly the last is exactly chunk_tokens
    sizes = [got[1][i][1] for i in range(len(want1))]
    assert all(s == 8 for s in sizes[:-1]) and sizes[-1] <= 8


def test_chunking_tail_reaches_end_and_overlap(spark):
    doc = " ".join(f"t{i}" for i in range(20))
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    rows = sorted(chunk_documents(df, chunk_tokens=8, overlap=4)
                  .collect(), key=lambda r: r["chunk_idx"])
    # stride 4: starts 0,4,8,12 — the final token t19 is in the last
    assert rows[-1]["chunk_text"].endswith("t19")
    # consecutive chunks share `overlap` tokens
    a = rows[0]["chunk_text"].split()
    b = rows[1]["chunk_text"].split()
    assert a[-4:] == b[:4]


def test_chunking_exact_boundary_single_chunk(spark):
    doc = " ".join(f"t{i}" for i in range(8))
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=8, overlap=2).collect()
    assert len(rows) == 1 and rows[0]["n_tokens"] == 8


def test_chunking_invalid_overlap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=-1)
