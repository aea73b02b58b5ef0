"""Columnar text-stat functions vs plain-Python expectations."""

import pytest
from pyspark.sql import functions as F

from docvault_ocr_service_spark.functions.textstats import (
    detect_lang, fingerprint64, quality_score, stopword_ratio, token_count,
    STOPWORDS_EN, with_text_profile)

ROWS = [
    (1, "the quick brown fox", "en"),
    (2, "to jest bardzo ważny dokument i nie ma w nim nic", "pl"),
    (3, "der Hund ist nicht mit der Katze", "de"),
    (4, "", "en"),
    (5, None, "en"),
    (6, "   ", "en"),
    (7, "12345 !!! ??? ###", "en"),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, ["id", "text", "lang"])


def test_token_count(spark, df):
    got = {r["id"]: r["n"] for r in
           df.select("id", token_count(F.col("text")).alias("n")).collect()}
    assert got == {1: 4, 2: 11, 3: 7, 4: 0, 5: 0, 6: 0, 7: 4}


def test_stopword_ratio(spark, df):
    got = {r["id"]: r["s"] for r in df.select(
        "id", stopword_ratio(F.col("text"), STOPWORDS_EN).alias("s"))
        .collect()}
    assert got[1] == 0.25       # "the" of 4
    assert got[4] == 0.0 and got[5] == 0.0


def test_detect_lang(spark, df):
    got = {r["id"]: r["l"] for r in
           df.select("id", detect_lang(F.col("text")).alias("l")).collect()}
    assert got[1] == "en"
    assert got[2] == "pl"
    assert got[3] == "de"
    assert got[7] == "und"


def test_quality_bounds_and_ordering(spark, df):
    got = {r["id"]: r["q"] for r in
           df.select("id", quality_score(F.col("text")).alias("q"))
           .collect()}
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert got[1] > got[7]  # prose beats symbol soup


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "  hello world "), (3, "different")],
        ["id", "text"])
    got = {r["id"]: r["fp"] for r in
           df.select("id", fingerprint64(F.col("text")).alias("fp"))
           .collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_profile_has_all_columns(spark, df):
    cols = set(with_text_profile(df).columns)
    assert {"n_tokens", "quality", "lang_id", "fingerprint",
            "stopword_ratio", "punct_ratio"} <= cols


def test_bpe_ish_token_count(spark):
    from docvault_ocr_service_spark.functions.textstats import (
        bpe_ish_token_count)

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "abc123def"), (3, "x,y.z"), (4, "")],
        ["id", "text"])
    got = {r["id"]: r["n"] for r in df.select(
        "id", bpe_ish_token_count(F.col("text")).alias("n")).collect()}
    assert got[1] == 2          # plain words
    assert got[2] == 3          # letter/digit boundaries split
    assert got[3] == 5          # punct boundaries split
    assert got[4] == 0


def test_iceberg_store_requires_catalog(spark):
    import pytest as _pytest

    from docvault_ocr_service_spark.operators.iceberg import (
        IcebergCheckpointStore)

    with _pytest.raises(RuntimeError, match="Iceberg"):
        IcebergCheckpointStore(spark, "cp", "res")


def test_repetition_signals(spark):
    from docvault_ocr_service_spark.functions.textstats import (
        repetition_signals)

    docs = spark.createDataFrame(
        [(1, "aaaa\nbbbb\naaaa"),        # 8 of 12 chars in dup lines
         (2, "one two one two one"),     # 'one two' x2 of 4 bigrams
         (3, "all distinct words here"),
         (4, None),
         (5, "")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           repetition_signals(docs, "doc_id", "text").collect()}
    assert abs(got[1]["dup_line_frac"] - 8 / 12) < 1e-9
    assert abs(got[2]["top_bigram_frac"] - 2 / 4) < 1e-9
    assert got[3]["dup_line_frac"] == 0.0
    assert got[3]["top_bigram_frac"] == 1 / 3   # all bigrams unique
    assert got[4]["dup_line_frac"] == 0.0       # null text -> zeros
    assert got[5]["top_bigram_frac"] == 0.0


def test_ngram_contamination_and_decontaminate(spark):
    from docvault_ocr_service_spark.operators.contamination import (
        decontaminate, ngram_contamination)

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "a completely unrelated sentence about spark shuffles"),
         (3, "quick brown fox jumps over the lazy dog tonight again")],
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [("quick brown fox jumps over the lazy dog",)], ["text"])
    hits = {r["doc_id"]: r["n_contaminated_grams"] for r in
            ngram_contamination(corpus, bench, "doc_id", "text",
                                n=8).collect()}
    assert 1 in hits and 3 in hits and 2 not in hits
    clean = decontaminate(corpus, bench, "doc_id", "text", n=8)
    assert {r["doc_id"] for r in clean.collect()} == {2}


def test_stratified_sample(spark):
    from docvault_ocr_service_spark.functions.textstats import (
        stratified_sample)

    rows = [(i, "en" if i % 3 else "pl") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = stratified_sample(df, "lang", F.col("doc_id").cast("string"), 5)
    got = out.collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by_lang["en"]) == 5 and len(by_lang["pl"]) == 5
    # deterministic across partitionings
    again = stratified_sample(df.repartition(7), "lang",
                              F.col("doc_id").cast("string"), 5).collect()
    assert {(r["doc_id"], r["lang"]) for r in again} == \
        {(r["doc_id"], r["lang"]) for r in got}
    # small stratum: returns all of it
    tiny = spark.createDataFrame([(1, "de")], ["doc_id", "lang"])
    assert stratified_sample(df.unionByName(tiny), "lang",
                             F.col("doc_id").cast("string"), 5) \
        .where(F.col("lang") == "de").count() == 1


def test_sample_to_token_budget(spark):
    from docvault_ocr_service_spark.functions.textstats import (
        sample_to_token_budget)

    rows = [(i, "a" if i % 2 else "b", 40) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "n_tok"])
    out = sample_to_token_budget(df, "grp", "n_tok", 100,
                                 F.col("doc_id").cast("string"))
    got = {}
    for r in out.collect():
        got.setdefault(r["grp"], []).append(r["doc_id"])
    # 40+40 < 100, third row crosses the boundary and is included
    assert len(got["a"]) == 3 and len(got["b"]) == 3
    # deterministic under repartitioning
    again = sample_to_token_budget(df.repartition(5), "grp", "n_tok", 100,
                                   F.col("doc_id").cast("string"))
    assert {r["doc_id"] for r in again.collect()} == \
        {d for v in got.values() for d in v}
    # a group smaller than its budget is kept whole
    tiny = spark.createDataFrame([(100, "c", 7)], ["doc_id", "grp", "n_tok"])
    out2 = sample_to_token_budget(df.unionByName(tiny), "grp", "n_tok",
                                  100, F.col("doc_id").cast("string"))
    assert out2.where(F.col("grp") == "c").count() == 1


def test_sitemap_urls(spark):
    from docvault_ocr_service_spark.functions.web import (
        parse_sitemap, sitemap_urls)

    xml = ("<?xml version='1.0'?><sitemapindex>"
           "<sitemap><loc>https://x/maps/1.xml</loc></sitemap>"
           "<sitemap><loc> https://x/maps/2.xml?a=1&amp;b=2 </loc></sitemap>"
           "</sitemapindex>")
    assert parse_sitemap(xml) == [
        "https://x/maps/1.xml", "https://x/maps/2.xml?a=1&b=2"]
    assert parse_sitemap("") == [] and parse_sitemap(None) == []
    df = spark.createDataFrame([("x", xml), ("y", "<urlset></urlset>")],
                               ["host", "sitemap_xml"])
    rows = sitemap_urls(df).collect()
    assert [(r["host"], r["url"]) for r in rows] == [
        ("x", "https://x/maps/1.xml"),
        ("x", "https://x/maps/2.xml?a=1&b=2")]


def test_sitemap_entity_unescape_order():
    from docvault_ocr_service_spark.functions.web import parse_sitemap

    # &amp;lt; is the ESCAPED text '&lt;' — must not double-unescape
    xml = "<loc>https://x/?q=&amp;lt;tag&amp;r=1</loc>"
    assert parse_sitemap(xml) == ["https://x/?q=&lt;tag&r=1"]


def test_temperature_sample_quotas_and_determinism(spark):
    from pyspark.sql import functions as F

    from docvault_ocr_service_spark.functions.textstats import (
        temperature_sample)

    # 90/9/1 natural mix; T=2 flattens toward sqrt shares
    rows = ([(i, "big") for i in range(90)]
            + [(100 + i, "mid") for i in range(9)]
            + [(200, "small")])
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_sample(df, "source",
                             F.col("doc_id").cast("string"),
                             total_rows=40, temperature=2.0)
    got = out.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in got}
    import math
    z = math.sqrt(90) + math.sqrt(9) + math.sqrt(1)
    for src, c in (("big", 90), ("mid", 9), ("small", 1)):
        want = min(c, math.floor(40 * math.sqrt(c) / z + 0.5))
        assert by.get(src, 0) == want, src
    # flattening: big's share shrinks vs natural, small's grows
    assert by["big"] / 40 < 0.9
    # deterministic: second run picks the identical rows
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in temperature_sample(
        df, "source", F.col("doc_id").cast("string"),
        total_rows=40, temperature=2.0).collect())
    assert a == b


def test_gopher_rules(spark):
    from docvault_ocr_service_spark.functions.textstats import gopher_rules

    good = ("the quick brown fox jumps over the lazy dog and that "
            "dog went to sleep with all of the other dogs to have "
            "a very good rest near the warm fire of the old house "
            "and be happy about the long day that had passed with "
            "many fine things to remember and to tell of later on") 
    bullets = "\n".join("• item " + str(i) for i in range(10))
    elly = "\n".join("line " + str(i) + " goes on..." for i in range(10))
    symbols = " ".join("#tag" + str(i) for i in range(60))
    rows = [(1, good), (2, "too short"), (3, bullets), (4, elly),
            (5, symbols), (6, None)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in gopher_rules(df).collect()}

    assert got[1]["gopher_pass"]
    assert all(got[1][c] for c in
               ("r_word_count", "r_mean_word_len", "r_symbol_ratio",
                "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
                "r_stopwords"))
    assert not got[2]["r_word_count"] and not got[2]["gopher_pass"]
    assert not got[3]["r_bullet_lines"]       # 100% bullet lines
    assert not got[4]["r_ellipsis_lines"]     # 100% ellipsis endings
    assert not got[5]["r_symbol_ratio"]       # one '#' per word
    assert not got[6]["gopher_pass"]          # null text fails all
    assert not any(got[6][c] for c in
                   ("r_word_count", "r_alpha_words", "r_stopwords"))


def test_c4_rules(spark):
    """C4 line + page filters (Raffel et al. 2020 §2.2)."""
    from docvault_ocr_service_spark.functions.textstats import c4_rules

    good = ("This is a perfectly normal sentence with words.\n"
            "Another good line follows right here too!\n"
            "Do you see how it keeps going on?\n")
    rows = [
        (1, good + "short line.\nno terminal punctuation here at all"),
        (2, good + "Please enable JavaScript to use this site."),
        (3, good + "some lorem ipsum filler text appears here."),
        (4, good + "a { curly } brace config line appears here."),
        (5, "One sentence only appears on this page."),
        (6, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in c4_rules(df).collect()}

    r1 = got[1]
    assert r1["c4_pass"] and r1["c4_kept_lines"] == 3
    assert r1["c4_sentences"] == 3
    assert "short line." not in r1["c4_text"]          # < 5 words
    assert "no terminal" not in r1["c4_text"]          # unterminated

    r2 = got[2]
    assert "JavaScript" not in r2["c4_text"]           # js line dropped
    assert r2["c4_pass"]                               # page still fine

    assert not got[3]["c4_pass"]                       # lorem ipsum page
    assert "lorem ipsum" in got[3]["c4_text"]          # line itself kept
    assert not got[4]["c4_pass"]                       # curly brace page
    assert not got[5]["c4_pass"]                       # < 3 sentences
    assert got[5]["c4_kept_lines"] == 1
    r6 = got[6]
    assert not r6["c4_pass"] and r6["c4_text"] == "" \
        and r6["c4_kept_lines"] == 0


def test_fix_mojibake(spark):
    from pyspark.sql import functions as F

    from docvault_ocr_service_spark.functions.textstats import (
        fix_mojibake)

    def corrupt(s):
        b = s.encode("utf-8")
        try:
            return b.decode("cp1252")
        except UnicodeDecodeError:
            return b.decode("latin-1")

    orig = "café naïve łódź — “quoted” text…"
    rows = [
        (1, corrupt(orig), orig),              # single mojibake
        (2, corrupt(corrupt(orig)), orig),     # double mojibake
        (3, "plain ascii stays put.", "plain ascii stays put."),
        (4, "déjà vu intact", "déjà vu intact"),  # real accents kept
        (5, None, None),
    ]
    df = spark.createDataFrame([(i, d) for i, d, _ in rows],
                               ["doc_id", "text"])
    got = {r["doc_id"]: r["fixed"] for r in
           df.withColumn("fixed", fix_mojibake(F.col("text"))).collect()}
    for i, _, want in rows:
        assert got[i] == want, (i, got[i])
