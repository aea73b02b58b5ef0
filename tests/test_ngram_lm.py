"""Char-trigram LM perplexity: hand-checkable smoothing math + the
filtering behavior (in-domain text scores lower than gibberish)."""

import math

import pytest
from pyspark.sql import functions as F

from docvault_ocr_service_spark.functions.ngram_lm import (
    filter_by_perplexity, score_perplexity, train_char_trigram_lm)


def test_perplexity_hand_computed(spark):
    # train on one 4-char doc: "abab" -> trigrams aba, bab; contexts
    # ab->1, ba->1; vocab {a, b} = 2
    train = spark.createDataFrame([(1, "abab")], ["doc_id", "text"])
    c3, c2, v = train_char_trigram_lm(train)
    assert v == 2
    score = score_perplexity(
        spark.createDataFrame([(9, "aba")], ["doc_id", "text"]),
        c3, c2, v).first()
    # P(a|ab)... doc 'aba' has one trigram 'aba': c3=1, c2(ab)=1
    want = math.exp(-math.log((1 + 1) / (1 + 2)))
    assert score["n_trigrams"] == 1
    assert score["ppl"] == pytest.approx(want, rel=1e-12)

    # unseen trigram from unseen context: (0+1)/(0+2)
    s2 = score_perplexity(
        spark.createDataFrame([(9, "zzz")], ["doc_id", "text"]),
        c3, c2, v).first()
    assert s2["ppl"] == pytest.approx(math.exp(-math.log(1 / 2)),
                                      rel=1e-12)


def test_in_domain_scores_lower_and_filter(spark):
    english = [(i, "the quick brown fox jumps over the lazy dog and "
                   "then the dog sleeps near the warm fire") * 1
               for i in range(6)]
    train = spark.createDataFrame(english, ["doc_id", "text"])
    c3, c2, v = train_char_trigram_lm(train)

    test = spark.createDataFrame(
        [(1, "the brown dog jumps near the fox"),
         (2, "qxzj wvkq zzqx jjxw qqzv xxjq"),
         (3, "ab")],                               # too short: null ppl
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           score_perplexity(test, c3, c2, v).collect()}
    assert got[1]["ppl"] < got[2]["ppl"]          # gibberish penalized
    assert got[3]["ppl"] is None and got[3]["n_trigrams"] == 0

    kept = filter_by_perplexity(test, c3, c2, v,
                                max_ppl=got[1]["ppl"] + 1e-9)
    assert [r["doc_id"] for r in kept.collect()] == [1]
