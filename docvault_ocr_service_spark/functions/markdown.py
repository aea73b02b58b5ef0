"""DataFrame wrapper for the HTML→Markdown kernel
(extract/markdown.py) — structure-preserving serialization for
training corpora that want headings/lists/links/code kept, next to
the flat-text extraction path and the WET exporter.

Map-only (one Arrow-batched kernel pass, no shuffle)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.StringType())
def to_markdown(htmls: pd.Series) -> pd.Series:
    from ..extract.markdown import html_to_markdown

    return pd.Series([html_to_markdown(h) for h in htmls])


def markdown_column(html_col: Column) -> Column:
    """``html`` (string or binary) → markdown string column."""
    return to_markdown(html_col)
