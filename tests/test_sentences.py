"""Sentence segmentation (functions/textstats.py::split_sentences)."""

from pyspark.sql import functions as F

from docvault_ocr_service_spark.functions.textstats import (
    sentence_stats, split_sentences)


def _collect(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(split_sentences(F.col("text")).alias("s")) \
        .collect()[0]["s"]


def test_split_sentences_basic(spark):
    got = _collect(spark, "First one. Second here!  Third?No space")
    assert got == ["First one.", "Second here!", "Third?", "No space"]


def test_split_sentences_terminator_runs_and_edges(spark):
    assert _collect(spark, "Wait... what?! done") == \
        ["Wait...", "what?!", "done"]
    assert _collect(spark, "") == []
    assert _collect(spark, None) == []
    assert _collect(spark, "   ") == []
    assert _collect(spark, "no terminator at all") == \
        ["no terminator at all"]
    # documented naive contract: abbreviations split
    assert _collect(spark, "Mr. Smith left.") == ["Mr.", "Smith left."]


def test_sentence_stats(spark):
    df = spark.createDataFrame(
        [(1, "Hi there. A much longer second sentence!"),
         (2, ""), (3, None)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in sentence_stats(df).collect()}
    assert got[1]["n_sentences"] == 2
    # "Hi there." = 9 chars, "A much longer second sentence!" = 30
    assert got[1]["max_sentence_chars"] == 30
    assert got[1]["mean_sentence_chars_micro"] == round((9 + 30) / 2 * 1e6)
    assert (got[2]["n_sentences"], got[2]["mean_sentence_chars_micro"],
            got[2]["max_sentence_chars"]) == (0, 0, 0)
    assert got[3]["n_sentences"] == 0
