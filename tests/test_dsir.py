"""DSIR importance resampling (functions/dsir.py)."""

import math

import pytest
from pyspark.sql import functions as F

from docvault_ocr_service_spark.functions.dsir import (
    dsir_log_ratios, dsir_resample, dsir_scores, hashed_features)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hashed_features_counts_and_shape(spark):
    df = _df(spark, [(1, "a b c"), (2, "a"), (3, ""), (4, None),
                     (5, "  x   y  ")])
    out = {r["doc_id"]: r["f"] for r in df.select(
        "doc_id",
        hashed_features(F.col("text"), hex_chars=2).alias("f")).collect()}
    # 3 unigrams + 2 bigrams
    assert len(out[1]) == 5
    # single token -> unigram only, no bigrams
    assert len(out[2]) == 1
    assert out[3] == [] and out[4] == []
    # whitespace trimmed/collapsed: 2 unigrams + 1 bigram
    assert len(out[5]) == 3
    # buckets are 2-hex-char md5 prefixes
    assert all(len(b) == 2 for b in out[1])


def test_hashed_features_occurrences_kept(spark):
    df = _df(spark, [(1, "a a a")])
    f = df.select(hashed_features(F.col("text"), 2).alias("f")) \
        .collect()[0]["f"]
    # DSIR counts occurrences: 3 unigrams (identical bucket) + 2 bigrams
    assert len(f) == 5
    assert len(set(f)) <= 2


def test_log_ratios_direction(spark):
    """Buckets over-represented in the target get positive log-ratios."""
    raw = _df(spark, [(i, "common filler") for i in range(20)]
              + [(100 + i, "target phrase") for i in range(2)])
    target = _df(spark, [(0, "target phrase")])
    lr = dsir_log_ratios(raw, target, hex_chars=2)
    rows = lr.collect()
    assert rows, "ratio table must be non-empty"
    # bucket for 'target' should score higher than bucket for 'common'
    import hashlib
    b_target = hashlib.md5(b"target").hexdigest()[:2]
    b_common = hashlib.md5(b"common").hexdigest()[:2]
    by = {r["bucket"]: r["log_ratio"] for r in rows}
    assert by[b_target] > by[b_common]


def test_scores_importance_sum_matches_manual(spark):
    """Per-doc importance equals the sum of its buckets' log-ratios."""
    raw = _df(spark, [(1, "aa bb"), (2, "cc"), (3, "")])
    target = _df(spark, [(9, "aa")])
    ratios = dsir_log_ratios(raw, target, hex_chars=2)
    by = {r["bucket"]: r["log_ratio"] for r in ratios.collect()}
    import hashlib

    def bucket(g):
        return hashlib.md5(g.encode()).hexdigest()[:2]

    scored = {r["doc_id"]: r for r in
              dsir_scores(raw, ratios, "doc_id", hex_chars=2).collect()}
    exp1 = by[bucket("aa")] + by[bucket("bb")] + by[bucket("aa bb")]
    assert scored[1]["importance"] == pytest.approx(exp1, rel=1e-9)
    assert scored[2]["importance"] == pytest.approx(by[bucket("cc")],
                                                    rel=1e-9)
    # empty doc: importance 0, score = pure Gumbel key (finite)
    assert scored[3]["importance"] == 0.0
    assert math.isfinite(scored[3]["score"])


def test_resample_prefers_target_like_docs(spark):
    """With a strong signal, the top-k skews hard toward docs sharing
    the target's vocabulary despite Gumbel noise."""
    rows = [(i, "alpha beta gamma delta") for i in range(50)]
    rows += [(100 + i, "zeta eta theta iota") for i in range(50)]
    raw = _df(spark, rows)
    target = _df(spark, [(0, "alpha beta gamma delta alpha beta")])
    picked = dsir_resample(raw, target, "doc_id", k=20, hex_chars=2)
    ids = [r["doc_id"] for r in picked.collect()]
    assert len(ids) == 20
    assert sum(1 for i in ids if i < 100) >= 18


def test_resample_deterministic(spark):
    rows = [(i, f"word{i % 7} word{i % 3}") for i in range(60)]
    raw = _df(spark, rows)
    target = _df(spark, [(0, "word0 word1")])
    a = [r["doc_id"] for r in
         dsir_resample(raw, target, "doc_id", k=10, hex_chars=2).collect()]
    b = [r["doc_id"] for r in
         dsir_resample(raw, target, "doc_id", k=10, hex_chars=2).collect()]
    assert a == b


def test_resample_rejects_string_ids(spark):
    raw = spark.createDataFrame([("u1", "x")], "doc_id string, text string")
    with pytest.raises(ValueError, match="numeric id"):
        dsir_resample(raw, raw, "doc_id")
