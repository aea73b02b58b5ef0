"""Page-level explode + ordered re-aggregation (the oversized-PDF route).

SURVEY §2.2 D3/D5 + §2.4 A1: the reference iterates pages inside one
process (``app/document_processor.py:130-153`` TIFF frames,
``app/worker.py:254-324`` per-page OCR) and joins page texts with
``"\\n\\n"`` preserving page order (``app/worker.py:250,321``).  At scale a
500-page PDF in one row is the skew bomb — this module makes the *page*
the unit of parallelism, in two stages so the expensive work distributes:

    explode_pdf_pages_raw   one input row → one row per page carrying the
                            page's RAW content streams (cheap structural
                            split; no inflate, no text scan)
    decode_pages            per-page inflate + text-operator scan — the
                            expensive pass, run AFTER a repartition on
                            (url, page_no) so a giant's pages spread
                            across tasks
    assemble_pdf_docs       groupBy(url) + sort_array(collect_list(...)):
                            ordered page-text arrays + the native-text
                            character count (A1 as a real aggregation)
    extract_pdf_docs        the full drop-in route: RESULT_SCHEMA rows
                            byte-identical to ``run_extraction`` on the
                            same PDF rows (single shared kernel path)

``explode_pdf_pages``/``reassemble_pages`` remain as the one-stage text
operator (generic page table in, ``concat_ws``-joined docs out).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..extract.document import (
    NATIVE_CONFIDENCE,
    PAGE_JOINER,
    _error,
    _finish,
    page_spans,
)
from ..extract.pdftext import (
    NATIVE_TEXT_MIN_CHARS,
    PdfParseError,
    extract_pdf_pages,
    page_text_from_raw,
    split_pdf_pages_raw,
)
from ..schemas import RESULT_SCHEMA

RAW_PAGE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("lang", T.StringType(), True),
    T.StructField("page_no", T.IntegerType(), False),
    T.StructField("parts", T.ArrayType(T.StructType([
        T.StructField("raw", T.BinaryType()),
        T.StructField("flate", T.BooleanType()),
    ])), True),
    T.StructField("error_kind", T.StringType(), True),
    T.StructField("error_msg", T.StringType(), True),
])

DECODED_PAGE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("lang", T.StringType(), True),
    T.StructField("page_no", T.IntegerType(), False),
    T.StructField("page_text", T.StringType(), True),
    T.StructField("native_chars", T.LongType(), True),
    T.StructField("error_kind", T.StringType(), True),
    T.StructField("error_msg", T.StringType(), True),
])

PAGE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("page_no", T.IntegerType(), False),
    T.StructField("page_text", T.StringType(), True),
    T.StructField("error_kind", T.StringType(), True),
])


def _classify(e: Exception) -> tuple[str, str]:
    """Mirror document.py's taxonomy: parse failures are permanent
    corrupted_file, anything else retryable unexpected."""
    if isinstance(e, PdfParseError):
        return "corrupted_file", str(e)
    return "unexpected", f"{type(e).__name__}: {e}"


def _explode_raw_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        langs = (pdf["lang"] if "lang" in pdf
                 else pd.Series([None] * len(pdf)))
        rows = []
        for url, lang, payload in zip(pdf["url"], langs, pdf["html"]):
            try:
                pages = split_pdf_pages_raw(payload)
            except Exception as e:  # noqa: BLE001 — poison doc ≠ dead task
                kind, msg = _classify(e)
                rows.append((url, lang, -1, None, kind, msg))
                continue
            for i, parts in enumerate(pages):
                rows.append((url, lang, i + 1,
                             [{"raw": raw, "flate": flate}
                              for raw, flate in parts], None, None))
        yield pd.DataFrame(rows, columns=[
            "url", "lang", "page_no", "parts", "error_kind", "error_msg"])


def _decode_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        texts, chars, kinds, msgs = [], [], [], []
        for parts, kind, msg in zip(pdf["parts"], pdf["error_kind"],
                                    pdf["error_msg"]):
            if kind is not None or parts is None:
                texts.append(None)
                chars.append(None)
                kinds.append(kind)
                msgs.append(msg)
                continue
            try:
                text = page_text_from_raw(
                    [(p["raw"], p["flate"]) for p in parts])
            except Exception as e:  # noqa: BLE001 — poison page ≠ dead task
                k, m = _classify(e)
                texts.append(None)
                chars.append(None)
                kinds.append(k)
                msgs.append(m)
                continue
            texts.append(text)
            chars.append(len(text.strip()))
            kinds.append(None)
            msgs.append(None)
        yield pd.DataFrame({
            "url": pdf["url"], "lang": pdf["lang"],
            "page_no": pdf["page_no"], "page_text": texts,
            "native_chars": pd.array(chars, dtype="Int64"),
            "error_kind": kinds, "error_msg": msgs,
        })


def explode_pdf_pages_raw(df: DataFrame) -> DataFrame:
    """(url, lang, html) rows with PDF payloads → one row per page
    carrying the raw content streams (cheap split, no decode)."""
    cols = ["url", "html"] + (["lang"] if "lang" in df.columns else [])
    return df.select(*cols).mapInPandas(_explode_raw_kernel,
                                        schema=RAW_PAGE_SCHEMA)


def decode_pages(raw_pages: DataFrame) -> DataFrame:
    """RAW_PAGE_SCHEMA → DECODED_PAGE_SCHEMA (inflate + text scan)."""
    return raw_pages.mapInPandas(_decode_kernel, schema=DECODED_PAGE_SCHEMA)


def explode_pdf_pages(df: DataFrame) -> DataFrame:
    """(url, html) rows with PDF payloads → one row per page.

    One-stage convenience form (split + decode in the same task).
    Callers should repartition first so page extraction of different
    documents lands on different tasks; for the scale route that also
    spreads one document's pages, use ``extract_pdf_docs``.
    """
    return decode_pages(explode_pdf_pages_raw(df)) \
        .select("url", "page_no", "page_text", "error_kind")


def reassemble_pages(pages: DataFrame) -> DataFrame:
    """Page rows → (url, text, page_count): the order-sensitive A1 agg.

    ``sort_array`` on struct(page_no, ...) restores page order after the
    shuffle; the join separator is the byte-exact "\\n\\n" of the
    reference.  Documents with any error page yield error rows instead.
    """
    ok = pages.where(F.col("error_kind").isNull())
    assembled = (
        ok.groupBy("url")
          .agg(
              F.concat_ws(
                  PAGE_JOINER,
                  F.transform(
                      F.sort_array(F.collect_list(
                          F.struct("page_no", "page_text"))),
                      lambda s: s.getField("page_text"),
                  ),
              ).alias("text"),
              F.count("*").cast("int").alias("page_count"),
          )
    )
    failed = (pages.where(F.col("error_kind").isNotNull())
              .select("url", "error_kind").dropDuplicates(["url"]))
    # no broadcast hint: on a garbage-heavy crawl the failed set can be
    # millions of rows — let AQE pick the join strategy from runtime stats
    ok_docs = (assembled.join(failed, "url", "left_anti")
               .withColumn("error_kind", F.lit(None).cast("string")))
    failed_docs = failed.select(
        "url",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("int").alias("page_count"),
        "error_kind")
    return ok_docs.unionByName(failed_docs)


def assemble_pdf_docs(pages: DataFrame) -> DataFrame:
    """DECODED_PAGE_SCHEMA → one row per url with the ordered page-text
    array, total stripped chars, and the first (lowest page_no) error."""
    return (
        pages.groupBy("url")
        .agg(
            F.max("lang").alias("lang"),
            F.transform(
                F.sort_array(F.collect_list(
                    F.when(F.col("error_kind").isNull(),
                           F.struct("page_no", "page_text")))),
                lambda s: s.getField("page_text"),
            ).alias("page_texts"),
            F.sum("native_chars").alias("native_chars"),
            F.min_by("error_kind", F.when(
                F.col("error_kind").isNotNull(), F.col("page_no")))
             .alias("error_kind"),
            F.min_by("error_msg", F.when(
                F.col("error_kind").isNotNull(), F.col("page_no")))
             .alias("error_msg"),
        )
    )


def _finish_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    from ..functions.udfs import RESULT_COLUMNS

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    for pdf in batches:
        rows = []
        for url, lang, texts, nchars, kind, msg in zip(
                pdf["url"], pdf["lang"], pdf["page_texts"],
                pdf["native_chars"], pdf["error_kind"], pdf["error_msg"]):
            started = time.monotonic()
            if kind is not None:
                rows.append(_error(url, lang, kind, msg or "", started))
            elif nchars is None or nchars < NATIVE_TEXT_MIN_CHARS:
                rows.append(_error(
                    url, lang, "ocr_unavailable",
                    f"native text < {NATIVE_TEXT_MIN_CHARS} chars and no "
                    "OCR runtime in this environment", started))
            else:
                texts = list(texts)
                rows.append(_finish(url, lang, texts,
                                    NATIVE_CONFIDENCE, "native_pdf",
                                    started, page_spans(texts)))
        out = pd.DataFrame(rows, columns=RESULT_COLUMNS[:-1])
        out["partition_id"] = pid
        yield out


def extract_pdf_docs(df: DataFrame,
                     n_partitions: int | None = None) -> DataFrame:
    """PDF input rows → RESULT_SCHEMA rows with the *page* as the unit of
    parallel work (the reference's own choice for oversized documents,
    ``app/worker.py:254-324``).

    Physical shape: cheap structural split → repartition on
    (url, page_no) so one giant's pages spread across tasks → per-page
    inflate/scan → one ordered aggregation per url → per-doc finish
    (metadata + categorization must see the joined text, so they stay
    doc-level).  Output is byte-identical to ``run_extraction`` on the
    same rows: both call the same split/decode/_finish kernels.
    """
    raw = explode_pdf_pages_raw(df)
    if n_partitions is None:
        n_partitions = df.sparkSession.sparkContext.defaultParallelism
    spread = raw.repartition(n_partitions, "url", "page_no")
    assembled = assemble_pdf_docs(decode_pages(spread))
    return assembled.mapInPandas(_finish_kernel, schema=RESULT_SCHEMA)
