"""Extra columnar text ops (textstats.py additions)."""

from pyspark.sql import functions as F




def test_paragraph_language_profile(spark):
    from docvault_ocr_service_spark.functions.textstats import (
        paragraph_language_profile)

    rows = [
        (1, "the cat and the dog are here\n\njest dom się czy dla nas"),
        (2, "the cat and the dog are here"),
        (3, "der hund und die katze nicht\n\n"
            "das haus und der garten ist\n\nthe dog and the cat"),
        (4, "zzz qqq\n\nxxx yyy"),
    ]
    out = {r["doc_id"]: r for r in paragraph_language_profile(
        spark.createDataFrame(rows, ["doc_id", "text"])).collect()}
    assert out[1]["mixed"] and out[1]["n_langs"] == 2
    assert out[1]["dominant_lang"] == "en"      # tie broken by order
    assert not out[2]["mixed"] and out[2]["dominant_lang"] == "en"
    assert out[3]["dominant_lang"] == "de" and out[3]["n_paragraphs"] == 3
    assert out[4]["dominant_lang"] == "und" and out[4]["n_langs"] == 0


def test_fold_confusables_and_collapse_lines(spark):
    from docvault_ocr_service_spark.functions.textstats import (
        collapse_repeated_lines, fold_confusables)

    df = spark.createDataFrame([
        ("раypаl аlert",),            # Cyrillic р/а
        ("ＨＥＬＬＯ ｗｏｒｌｄ １２３",),          # fullwidth
        ("zero​wid­th and nbsp",),     # ZWSP, SHY, NBSP
        ("a\nb\nb\nb\nc\nc\na\n\n\nd",),         # stuttered lines
    ], ["text"])
    out = df.select(
        fold_confusables(F.col("text")).alias("f"),
        collapse_repeated_lines(F.col("text")).alias("c")).collect()
    assert out[0]["f"] == "paypal alert"
    assert out[1]["f"] == "HELLO world 123"
    assert out[2]["f"] == "zerowidth and nbsp"
    assert out[3]["c"] == "a\nb\nc\na\n\nd"


def test_detect_lang_es_fr_zh(spark):
    from docvault_ocr_service_spark.functions.textstats import (
        detect_lang)

    rows = [
        ("el contrato establece las condiciones por las que sus "
         "partes se obligan, pero sin perjuicio de este acuerdo",),
        ("le contrat est dans les conditions pour vous avec ses "
         "clauses, mais sont aux annexes une fois plus",),
        ("这是一份完全使用中文写成的文档，包含合同条款与说明。",),
        ("the quick brown fox and the lazy dog are in the yard",),
        ("krótki tekst po polsku o tym, że nie jest to umowa, ale "
         "dla nas czy dom",),
        ("ein kurzer text auf deutsch über den vertrag, der nicht "
         "mit dem anhang ist",),
        ("mostly english text with one 字 only",),   # CJK below 5%
        ("xyz qqq zzz",),
    ]
    got = [r["l"] for r in spark.createDataFrame(rows, ["text"])
           .select(detect_lang(F.col("text")).alias("l")).collect()]
    assert got == ["es", "fr", "zh", "en", "pl", "de", "en", "und"], got
