"""HTML <table> extraction — structured rows out of web pages, fully
columnar.

Why it belongs in a training-data engine: tables are the densest
structured content on the web (statistics, specs, schedules);
table-corpus mining is its own published pipeline family (WebTables,
TURL, table-QA pretraining).  The reference's extractor linearizes
tables into text (extract/htmltext.py keeps tr/td as block tags); this
operator instead materializes each table as (table_idx, row_idx,
cells: array<string>) rows for downstream structured use.

Scale shape: one map-only pass — ``regexp_extract_all`` + two
``posexplode``s; no shuffle at all.  Every regex is RE2-compatible
(no lookahead/backreferences), so a DuckDB twin replays the pipeline
byte-for-byte.

Contract / honest limitations (regex-level parsing, like the sibling
columnar modules pagemeta/justext/linkgraph):

- a table's body is taken lazily up to the FIRST ``</table>`` after
  its opening tag, and matches never overlap — a nested table is
  therefore consumed inside the outer match and its cells flatten
  (tag-stripped) into the enclosing cell's text (the RE2-compatible
  behavior both engines share; DOM-accurate nesting needs the kernel
  parser, not this fast path);
- cell text is tag-stripped, entity-unescaped (the XML names +
  ``&nbsp;`` + ``&#39;``, with ``&amp;`` LAST), and
  whitespace-collapsed;
- ``<th>`` and ``<td>`` are both cells (``is_header`` marks rows
  consisting solely of ``<th>`` cells).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TABLE_RE = r"(?is)<table\b[^>]*>(.*?)</table>"
ROW_RE = r"(?is)<tr\b[^>]*>(.*?)</tr>"
CELL_RE = r"(?is)<t[dh]\b[^>]*>(.*?)</t[dh]\s*>"
TH_ONLY_RE = r"(?is)<td\b"


def clean_html_text(c: Column) -> Column:
    """Tag-strip + minimal entity unescape + whitespace collapse —
    the shared cleaning chain of the table and outline extractors
    (both oracles replay it, so changes here must update BOTH twins).
    &amp; is replaced LAST so double-escaped entities survive one
    level (the same ordering rule the kernel parser follows)."""
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    c = F.regexp_replace(c, r"&nbsp;", " ")
    c = F.regexp_replace(c, r"&lt;", "<")
    c = F.regexp_replace(c, r"&gt;", ">")
    c = F.regexp_replace(c, r"&quot;", "\"")
    c = F.regexp_replace(c, r"&#39;", "'")
    c = F.regexp_replace(c, r"&amp;", "&")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def extract_tables(df: DataFrame, url_col: str = "url",
                   html_col: str = "html_text") -> DataFrame:
    """One output row per ``<tr>`` of every ``<table>`` on every page:

        (url, table_idx, row_idx, cells array<string>, n_cells,
         is_header)

    0-based indices in document order; rows with zero ``<td>``/``<th>``
    cells (spacer/malformed ``<tr>``) are dropped.  Map-only."""
    tables = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.regexp_extract_all(
            F.col(html_col), F.lit(TABLE_RE), 1))
        .alias("table_idx", "tbody"))
    rows = tables.select(
        "url", "table_idx",
        F.posexplode(F.regexp_extract_all(
            F.col("tbody"), F.lit(ROW_RE), 1)).alias("row_idx", "trow"))
    cells = F.transform(
        F.regexp_extract_all(F.col("trow"), F.lit(CELL_RE), 1),
        clean_html_text)
    return (rows
            .select("url", "table_idx", "row_idx",
                    cells.alias("cells"),
                    (F.regexp_count(F.col("trow"), F.lit(TH_ONLY_RE))
                     == 0).alias("is_header"))
            .withColumn("n_cells", F.size("cells").cast("long"))
            .where(F.col("n_cells") > 0)
            .select("url", "table_idx", "row_idx", "cells",
                    "n_cells", "is_header"))
