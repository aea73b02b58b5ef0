"""Arrow-batched UDF bindings for the extraction kernels.

Thin wrappers: all logic lives in ``extract/`` (pure Python); these
functions only adapt per-batch pandas frames to/from the kernels so the
Spark path and the golden generator execute identical code.

``extract_batches`` is a ``mapInPandas`` function (iterator of input frames
→ iterator of RESULT_SCHEMA frames).  It also stamps the executing
partition id onto each row (via ``TaskContext``) — that column powers the
per-partition lineage table without accumulators or side channels.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import functions as F

from ..extract.document import extract_document
from ..schemas import RESULT_SCHEMA

RESULT_COLUMNS = [f.name for f in RESULT_SCHEMA.fields]


def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: input-table batches → result-table batches."""
    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    for pdf in batches:
        texts = pdf["text"] if "text" in pdf else pd.Series([None] * len(pdf))
        langs = pdf["lang"] if "lang" in pdf else pd.Series([None] * len(pdf))
        rows = [
            extract_document(url, payload, text, lang)
            for url, payload, text, lang in zip(
                pdf["url"], pdf["html"], texts, langs, strict=True)
        ]
        out = pd.DataFrame(rows, columns=RESULT_COLUMNS[:-1])
        out["partition_id"] = pid
        yield out


def run_extraction(df):
    """input DataFrame → result DataFrame (no shuffle added here).

    Partitioning/skew policy is the caller's job (``operators/skew.py``);
    this keeps the map stage composable with whatever physical layout the
    plan chose.
    """
    return df.mapInPandas(extract_batches, schema=RESULT_SCHEMA)


def with_category(df, text_col: str = "text"):
    """Append category/category_confidence columns to a text DataFrame."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.StructType([
        T.StructField("category", T.StringType()),
        T.StructField("category_confidence", T.DoubleType()),
    ]))
    def _cat(texts: pd.Series) -> pd.DataFrame:
        from ..extract.categorize import categorize_fast

        res = [categorize_fast(t or "") for t in texts]
        return pd.DataFrame({
            "category": [r[0] for r in res],
            "category_confidence": [r[1] for r in res],
        })

    struct = _cat(F.col(text_col))
    return (df.withColumn("_c", struct)
              .withColumn("category", F.col("_c.category"))
              .withColumn("category_confidence",
                          F.col("_c.category_confidence"))
              .drop("_c"))


def with_hocr(df, out_col: str = "hocr"):
    """Append an hOCR column serialized from already-extracted result
    rows (url, pages, confidence, lang) — the reference's
    ``output_format="hocr"`` surface (app/ocr_service.py:321,382-384)
    as a derived column instead of a per-request branch.  Error rows
    (no pages) get null.  Pure map stage: no shuffle, no extra scan."""
    from ..extract.hocr import to_hocr

    @F.pandas_udf("string")
    def hocr_udf(url: pd.Series, pages: pd.Series, confidence: pd.Series,
                 lang: pd.Series) -> pd.Series:
        out = []
        for u, pg, conf, lg in zip(url, pages, confidence, lang,
                                   strict=True):
            if pg is None or len(pg) == 0:
                out.append(None)
                continue
            texts = [(p["text"] if isinstance(p, dict) else p.text) or ""
                     for p in pg]
            c = float(conf) if conf is not None else 0.0
            out.append(to_hocr(u or "", texts,
                               c if c == c else 0.0,   # NaN-null from Arrow
                               lg))
        return pd.Series(out)

    return df.withColumn(out_col, hocr_udf(
        F.col("url"), F.col("pages"), F.col("confidence"), F.col("lang")))
