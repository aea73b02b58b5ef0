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

from ..extract.categorize import categorize_detailed
from ..extract.document import extract_document
from ..extract.metadata import extract_metadata
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


def run_extraction(df, *, batch_hint: int | None = None):
    """input DataFrame → result DataFrame (no shuffle added here).

    Partitioning/skew policy is the caller's job (``operators/skew.py``);
    this keeps the map stage composable with whatever physical layout the
    plan chose.
    """
    return df.mapInPandas(extract_batches, schema=RESULT_SCHEMA)


def metadata_udf_frame(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel for text-only metadata extraction:
    (id-ish columns..., text) → same columns + metadata fields flattened.

    Used for corpora that already carry extracted text (e.g. the driver's
    ``documents`` table) where re-running DOM parsing would be wasted work.
    """
    for pdf in pdf_iter:
        metas = [extract_metadata(t or "") for t in pdf["text"]]
        cats = [categorize_detailed(t or "") for t in pdf["text"]]
        out = pdf.copy()
        out["md_confidence"] = [m["confidence"] for m in metas]
        out["n_dates"] = [len(m["dates"]) for m in metas]
        out["n_amounts"] = [len(m["amounts"]) for m in metas]
        out["n_emails"] = [len(m["emails"]) for m in metas]
        out["category"] = [c.primary_category for c in cats]
        out["category_confidence"] = [c.confidence for c in cats]
        yield out


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
