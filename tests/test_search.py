"""BM25 retrieval (operators/search.py) vs a pure-Python reference."""

import math

import pytest

from docvault_ocr_service_spark.operators.search import (
    SCORE_SCALE, bm25_topk, build_postings, doc_lengths)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick brown dog outpaces a quick fox"),
    (3, "lorem ipsum dolor sit amet"),
    (4, "the dog sleeps"),
    (5, "fox fox fox"),
    (6, ""),
    (7, None),
    (8, "   \t  "),
]

QUERIES = [
    (10, "quick fox"),
    (11, "dog"),
    (12, "quick quick quick"),          # dedup → same as "quick"
    (13, "zzz_missing"),                # OOV only → no rows
    (14, "fox zzz_missing"),            # OOV term contributes nothing
]


def _py_bm25(docs, queries, k1=1.2, b=0.75, top_k=10):
    toks = {i: (t or "").lower().split() for i, t in docs}
    dls = {i: len(ts) for i, ts in toks.items()}
    n = len(docs)
    avgdl = sum(dls.values()) / n
    out = {}
    for qid, qtext in queries:
        scores = {}
        for term in sorted(set((qtext or "").lower().split())):
            df = sum(1 for ts in toks.values() if term in ts)
            if df == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for i, ts in toks.items():
                tf = ts.count(term)
                if tf == 0:
                    continue
                norm = tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dls[i] / avgdl))
                c = int(round(idf * norm * SCORE_SCALE))
                scores[i] = scores.get(i, 0) + c
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        out[qid] = [(r + 1, i, s)
                    for r, (i, s) in enumerate(ranked[:top_k])]
    return out


def test_bm25_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        QUERIES, "query_id long, query_text string")
    got = {}
    for r in bm25_topk(docs, queries, top_k=10).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score_micro"]))
    for qid in got:
        got[qid].sort()
    want = {qid: rows for qid, rows in
            _py_bm25(DOCS, QUERIES).items() if rows}
    assert got == want
    assert 13 not in got                      # all-OOV query: no rows
    # dedup: "quick quick quick" scores identically to plain "quick"
    q12 = [(d, s) for _, d, s in got[12]]
    only_quick = _py_bm25(DOCS, [(99, "quick")])[99]
    assert q12 == [(d, s) for _, d, s in only_quick]


def test_bm25_top_k_truncates(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(1, "the quick brown fox dog")], "query_id long, query_text string")
    rows = bm25_topk(docs, queries, top_k=2).collect()
    assert len(rows) == 2
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] \
        == [1, 2]


def test_bm25_tie_breaks_on_doc_id(spark):
    docs = spark.createDataFrame(
        [(7, "same words here"), (3, "same words here")],
        "doc_id long, text string")
    queries = spark.createDataFrame(
        [(1, "same words")], "query_id long, query_text string")
    rows = sorted(bm25_topk(docs, queries).collect(),
                  key=lambda r: r["rank"])
    assert [r["doc_id"] for r in rows] == [3, 7]
    assert rows[0]["score_micro"] == rows[1]["score_micro"]


def test_postings_and_lengths_edge_cases(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    p = build_postings(docs).collect()
    assert all(r["term"] for r in p)           # no empty-string terms
    assert {r["doc_id"] for r in p} == {1, 2, 3, 4, 5}
    tf = {(r["term"], r["doc_id"]): r["tf"] for r in p}
    assert tf[("fox", 5)] == 3
    assert tf[("the", 1)] == 2
    dl = {r["doc_id"]: r["dl"] for r in doc_lengths(docs).collect()}
    assert dl == {1: 9, 2: 8, 3: 5, 4: 3, 5: 3, 6: 0, 7: 0, 8: 0}


def test_bm25_rare_term_outscores_common(spark):
    # "lorem" appears in one doc, "the" in two — for equal tf and dl the
    # rarer term must contribute more (idf monotone in rarity)
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(1, "lorem"), (2, "dog")], "query_id long, query_text string")
    rows = bm25_topk(docs, queries).collect()
    lorem = max(r["score_micro"] for r in rows if r["query_id"] == 1)
    dog = max(r["score_micro"] for r in rows if r["query_id"] == 2)
    assert lorem > dog
