"""DataFrame wrapper for the Arc90-Readability kernel
(extract/readability.py) — the container-scoring complement to
``justext_extract``.

Scale shape: map-only (one Arrow-batched kernel pass per partition,
no shuffle); the kernel is Python because the scoring walks a DOM
lineage (SURVEY §7.1 contract — same as the extraction kernels).  Use
it where jusText's flat paragraph classes lose nested-container
context (link-farm sidebars with prose-like text, comment sections
under ``class="comments"``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

READABILITY_SCHEMA = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("link_density", T.DoubleType()),
    T.StructField("tag", T.StringType()),
    T.StructField("n_paragraphs", T.IntegerType()),
])


def readability_extract_df(df: DataFrame, html_col: str = "html",
                           out_col: str = "readability") -> DataFrame:
    """Adds ``out_col`` (struct: text, score, link_density, tag,
    n_paragraphs) — the Arc90 winner container's extracted content."""

    @F.pandas_udf(READABILITY_SCHEMA)
    def kernel(htmls: pd.Series) -> pd.DataFrame:
        from ..extract.readability import readability_extract

        rows = [readability_extract(h) for h in htmls]
        return pd.DataFrame(rows)

    return df.withColumn(out_col, kernel(F.col(html_col)))
