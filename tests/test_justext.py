"""jusText paragraph classification (functions/justext.py)."""

import pytest
from pyspark.sql import functions as F

from docvault_ocr_service_spark.functions.justext import (
    justext_classify, justext_extract)

# >200 chars, stopword density ~0.46 -> context-free good
GOOD = ("the quick brown fox jumps over the lazy dog and it was seen in "
        "the park on a sunny day as the crowd watched with delight for "
        "hours and the festival continued into the evening with music "
        "and dancing in the warm summer air of the town square")
# 70..200 chars, stopwordy -> context-free neargood
NEARGOOD = ("the cat sat on the mat in the sun and it was warm there "
            "for a while today")
# long but zero stopwords -> context-free bad
JARGON = ("xyzzy plugh qwerty asdfgh zxcvbn poiuyt lkjhgf mnbvcx qazwsx "
          "edcrfv tgbyhn ujmikl caterpillar dromedary")


def _classify(spark, html):
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    rows = justext_classify(df).orderBy("para_idx").collect()
    return [(r["cf_class"], r["class"], r["text"]) for r in rows]


def test_context_free_ladder(spark):
    html = (f'<div><a href="/">Home</a> <a href="/b">About us now</a>'
            f'</div><p>{GOOD}</p><p>{NEARGOOD}</p><p>{JARGON}</p>'
            f'<p>Tiny</p><p>© 2024 Corp</p>')
    got = _classify(spark, html)
    assert [c for c, _, _ in got] == \
        ["bad", "good", "neargood", "bad", "short", "bad"]


def test_short_between_goods_promotes(spark):
    got = _classify(spark, f"<p>{GOOD}</p><p>Tiny note</p><p>{GOOD}</p>")
    assert got[1][:2] == ("short", "good")


def test_short_between_bads_demotes(spark):
    got = _classify(spark,
                    f"<p>{JARGON}</p><p>Tiny note</p><p>{JARGON}</p>")
    assert got[1][:2] == ("short", "bad")


def test_short_next_to_neargood_then_bad_promotes(spark):
    # prev chain: bad, but the nearest gbn neighbour is a neargood ->
    # the third short rule fires (good)
    got = _classify(spark,
                    f"<p>{JARGON}</p><p>{NEARGOOD}</p><p>Tiny note</p>"
                    f"<p>{GOOD}</p>")
    tiny = got[2]
    assert tiny[:2] == ("short", "good")


def test_neargood_between_bads_demotes(spark):
    got = _classify(spark,
                    f"<p>{JARGON}</p><p>{NEARGOOD}</p><p>{JARGON}</p>")
    assert got[1][:2] == ("neargood", "bad")


def test_neargood_next_to_good_promotes(spark):
    got = _classify(spark, f"<p>{GOOD}</p><p>{NEARGOOD}</p>")
    assert got[1][:2] == ("neargood", "good")


def test_document_edges_count_as_bad(spark):
    # a lone short paragraph: both neighbours are edge -> bad
    got = _classify(spark, "<p>Tiny note</p>")
    assert got[0][:2] == ("short", "bad")


def test_link_density_and_short_with_links(spark):
    # short paragraph containing ANY link chars -> bad, not short
    got = _classify(spark, '<p>See <a href="/x">x</a></p>')
    assert got[0][0] == "bad"


def test_script_style_stripped(spark):
    html = (f"<script>var x = 1;</script><p>{GOOD}</p>"
            f"<style>.a {{ color: red }}</style>")
    got = _classify(spark, html)
    assert len(got) == 1 and got[0][0] == "good"


def test_extract_joins_good_in_order(spark):
    html = (f"<p>{GOOD}</p><p>{JARGON}</p><p>{GOOD}</p>")
    df = spark.createDataFrame([(7, html)], ["doc_id", "html"])
    out = justext_extract(df).collect()[0]
    assert out["n_paragraphs"] == 3
    assert out["n_good"] == 2 and out["n_bad"] == 1
    assert out["main_text"] == GOOD + "\n\n" + GOOD


def test_paragraph_count_invariant(spark):
    """Every non-empty segment appears exactly once, whatever class."""
    html = "".join(f"<p>para number {i} text</p>" for i in range(20))
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    assert justext_classify(df).count() == 20


def test_null_and_empty_html(spark):
    df = spark.createDataFrame([(1, ""), (2, "<p></p><div></div>")],
                               ["doc_id", "html"])
    assert justext_classify(df).count() == 0
    assert justext_extract(df).count() == 0
