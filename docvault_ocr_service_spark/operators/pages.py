"""Page-level explode + ordered re-aggregation (the oversized-PDF route).

SURVEY §2.2 D3/D5 + §2.4 A1: the reference iterates pages inside one
process (``app/document_processor.py:130-153`` TIFF frames,
``app/worker.py:254-324`` per-page OCR) and joins page texts with
``"\\n\\n"`` preserving page order (``app/worker.py:250,321``).  At scale a
500-page PDF in one row is the skew bomb — this module makes the *page*
the unit of parallelism:

    explode_pdf_pages   one input row → one row per page (mapInPandas —
                        a row may yield many rows)
    reassemble_pages    groupBy(url) + sort_array(collect_list(struct)) +
                        concat_ws — the order-sensitive aggregation, done
                        as a real Spark aggregation

Byte-identity: ``reassemble_pages(explode_pdf_pages(df))`` produces
exactly the text the single-row kernel produces (tests pin it).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..extract.document import PAGE_JOINER
from ..extract.pdftext import PdfParseError, extract_pdf_pages

PAGE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("page_no", T.IntegerType(), False),
    T.StructField("page_text", T.StringType(), True),
    T.StructField("error_kind", T.StringType(), True),
])


def _explode_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls, nos, texts, errs = [], [], [], []
        for url, payload in zip(pdf["url"], pdf["html"]):
            try:
                pages = extract_pdf_pages(payload)
            except Exception as e:  # noqa: BLE001 — poison page ≠ dead task
                # mirror document.py's taxonomy: parse failures are
                # permanent corrupted_file, anything else retryable
                kind = ("corrupted_file" if isinstance(e, PdfParseError)
                        else "unexpected")
                urls.append(url)
                nos.append(-1)
                texts.append(None)
                errs.append(f"{kind}:{type(e).__name__}")
                continue
            for i, text in enumerate(pages):
                urls.append(url)
                nos.append(i + 1)
                texts.append(text)
                errs.append(None)
        yield pd.DataFrame({"url": urls, "page_no": nos,
                            "page_text": texts, "error_kind": errs})


def explode_pdf_pages(df: DataFrame) -> DataFrame:
    """(url, html) rows with PDF payloads → one row per page.

    Callers should repartition first so page extraction of different
    documents lands on different tasks; after the explode, pages of one
    giant document spread across downstream stages naturally.
    """
    return df.select("url", "html").mapInPandas(_explode_kernel,
                                                schema=PAGE_SCHEMA)


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
    ok_docs = (assembled.join(F.broadcast(failed), "url", "left_anti")
               .withColumn("error_kind", F.lit(None).cast("string")))
    failed_docs = failed.select(
        "url",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("int").alias("page_count"),
        "error_kind")
    return ok_docs.unionByName(failed_docs)
