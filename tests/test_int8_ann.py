"""int8 scalar quantization + quantized top-k (operators/similarity.py)."""

import math

import numpy as np
import pytest

from docvault_ocr_service_spark.operators.similarity import (
    brute_force_topk, int8_topk, quantize_int8)


def _vecs(n, dim, seed=7):
    rng = np.random.RandomState(seed)
    return [(i, [float(x) for x in rng.randn(dim)]) for i in range(n)]


def test_quantize_int8_codes_and_scale(spark):
    rows = [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0]), (3, [127.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: (r["codes"], r["scale"])
           for r in quantize_int8(df).collect()}
    assert got[1][0] == [64, -127, 32]           # round(v/ (1/127))
    assert got[1][1] == pytest.approx(1.0 / 127.0)
    assert got[2] == ([0, 0], 1.0)               # zero vector: scale 1
    assert got[3][0] == [127]
    # codes always within [-127, 127]
    big = spark.createDataFrame(_vecs(50, 16),
                                "vec_id long, embedding array<double>")
    for r in quantize_int8(big).collect():
        assert all(-127 <= c <= 127 for c in r["codes"])


def _py_int8_sim(a, b):
    sa = max(abs(x) for x in a) / 127 or 1.0
    sb = max(abs(x) for x in b) / 127 or 1.0
    qa = [int(math.floor(abs(x / sa) + 0.5) * (1 if x >= 0 else -1))
          for x in a]
    qb = [int(math.floor(abs(x / sb) + 0.5) * (1 if x >= 0 else -1))
          for x in b]
    d = sum(x * y for x, y in zip(qa, qb))
    nq, nc = sum(x * x for x in qa), sum(x * x for x in qb)
    if nq == 0 or nc == 0:
        return 0
    return int(round(d / (math.sqrt(nq) * math.sqrt(nc)) * 1e6))


def test_int8_topk_matches_python(spark):
    data = _vecs(30, 8)
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    queries = df.where("vec_id < 3").withColumnRenamed(
        "vec_id", "query_id")
    corpus = df.where("vec_id >= 3")
    got = {(r["query_id"], r["vec_id"]): (r["sim_micro"], r["rank"])
           for r in int8_topk(corpus, queries, k=5).collect()}
    by_q = {}
    for qid, qv in data[:3]:
        sims = sorted(((_py_int8_sim(qv, cv), -cid)
                       for cid, cv in data[3:]), reverse=True)
        by_q[qid] = [(s, -nid) for s, nid in sims[:5]]
    for qid, want in by_q.items():
        for rank, (s, cid) in enumerate(want, 1):
            assert got[(qid, cid)] == (s, rank)


def test_int8_topk_recall_vs_exact(spark):
    # quantized ranking must agree with exact cosine on ≥ 4 of top 5
    # for well-spread gaussian vectors (scalar int8 keeps ~3 digits)
    data = _vecs(120, 32, seed=11)
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    queries = df.where("vec_id < 5").withColumnRenamed(
        "vec_id", "query_id")
    corpus = df.where("vec_id >= 5")
    approx = int8_topk(corpus, queries, k=5).collect()
    exact = brute_force_topk(corpus, queries, k=5).collect()
    a = {}
    for r in approx:
        a.setdefault(r["query_id"], set()).add(r["vec_id"])
    e = {}
    for r in exact:
        e.setdefault(r["query_id"], set()).add(r["vec_id"])
    for qid in e:
        assert len(a[qid] & e[qid]) >= 4, (qid, a[qid], e[qid])


def test_int8_topk_zero_vector_query(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 2.0]), (2, [3.0, -1.0])],
        "vec_id long, embedding array<double>")
    queries = df.where("vec_id = 0").withColumnRenamed(
        "vec_id", "query_id")
    corpus = df.where("vec_id > 0")
    rows = int8_topk(corpus, queries, k=2).collect()
    assert {r["sim_micro"] for r in rows} == {0}
    assert [r["vec_id"] for r in sorted(rows, key=lambda r: r["rank"])] \
        == [1, 2]                       # tie → id ascending
