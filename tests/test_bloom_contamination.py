"""Bloom screen-then-verify decontamination vs a pure-Python replica."""

import hashlib

from docvault_ocr_service_spark.operators.contamination import (
    bloom_contamination, bloom_positions)

N = 4          # short grams so small fixtures contaminate
HEX = 2        # tiny 256-slot bit space → false positives LIKELY
K = 2


def _grams(text, n=N):
    toks = (text or "").lower().split()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _pos(gram, salt):
    return hashlib.md5(f"{gram}#{salt}".encode()).hexdigest()[:HEX]


def _py_bloom(corpus, benchmark):
    bench_grams = set().union(*(_grams(t) for t in benchmark)) \
        if benchmark else set()
    bits = {_pos(g, i) for g in bench_grams for i in range(K)}
    out = {}
    for doc, text in corpus:
        flagged = [g for g in _grams(text)
                   if all(_pos(g, i) in bits for i in range(K))]
        if flagged:
            out[doc] = (len(flagged),
                        sum(1 for g in flagged if g in bench_grams))
    return out


BENCH = [
    "the capital of france is paris of course",
    "water boils at one hundred degrees celsius",
]
CORPUS = [
    (1, "we all know the capital of france is paris and more"),
    (2, "totally unrelated text about gardening and soil quality"),
    (3, "water boils at one hundred degrees celsius they say"),
    (4, "short"),
    (5, "the moon is made of rock and dust not cheese at all"),
]


def test_bloom_matches_python_replica(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame([(t,) for t in BENCH], "text string")
    got = {r["doc_id"]: (r["n_flagged_grams"], r["n_exact_grams"])
           for r in bloom_contamination(
               corpus, bench, "doc_id", "text",
               n=N, hex_chars=HEX, k=K).collect()}
    want = _py_bloom(CORPUS, BENCH)
    assert got == want
    # the planted contaminations are found with exact confirmations
    assert got[1][1] >= 1
    assert got[3][1] >= 1


def test_bloom_no_false_negatives(spark):
    # every exact contamination must be flagged regardless of bit-space
    # size (Bloom can only over-flag, never under-flag)
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame([(t,) for t in BENCH], "text string")
    for hx in (1, 2, 4):
        got = {r["doc_id"]: r for r in bloom_contamination(
            corpus, bench, "doc_id", "text",
            n=N, hex_chars=hx, k=K).collect()}
        py = _py_bloom(CORPUS, BENCH)
        exact_docs = {d for d, (_, e) in py.items() if e}
        assert exact_docs <= set(got)
        for d in exact_docs:
            assert got[d]["n_exact_grams"] >= 1
            assert got[d]["n_flagged_grams"] >= got[d]["n_exact_grams"]


def test_bloom_positions_bounded_by_bit_space(spark):
    bench = spark.createDataFrame([(t,) for t in BENCH * 20],
                                  "text string")
    n_pos = bloom_positions(bench, n=N, hex_chars=1, k=K).count()
    assert n_pos <= 16          # 16^1 slots no matter the benchmark


def test_bloom_empty_benchmark(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame([], "text string")
    assert bloom_contamination(corpus, bench, "doc_id", "text",
                               n=N, hex_chars=HEX, k=K).count() == 0
