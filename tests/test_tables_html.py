"""HTML table extraction (functions/tables_html.py)."""

from docvault_ocr_service_spark.functions.tables_html import (
    extract_tables)

PAGE = """
<html><body>
<h1>Specs</h1>
<table class="specs">
  <tr><th>Name</th><th>Value</th></tr>
  <tr><td>width</td><td>10 &lt;units&gt;</td></tr>
  <tr><td>depth &amp; height</td><td>7&nbsp;cm</td></tr>
  <tr></tr>
  <tr><td><b>bold</b> text</td><td>it&#39;s fine</td></tr>
</table>
<p>between</p>
<TABLE><TR><TD>second</TD><TD>table</TD></TR></TABLE>
</body></html>
"""


def test_extract_tables_basic(spark):
    df = spark.createDataFrame([("u1", PAGE)], "url string, html_text string")
    got = sorted(
        ((r["table_idx"], r["row_idx"], tuple(r["cells"]),
          r["n_cells"], r["is_header"])
         for r in extract_tables(df).collect()))
    assert got == [
        (0, 0, ("Name", "Value"), 2, True),
        (0, 1, ("width", "10 <units>"), 2, False),
        (0, 2, ("depth & height", "7 cm"), 2, False),
        # the empty <tr></tr> (row_idx 3) is dropped
        (0, 4, ("bold text", "it's fine"), 2, False),
        (1, 0, ("second", "table"), 2, False),
    ]


def test_extract_tables_no_tables_and_nulls(spark):
    df = spark.createDataFrame(
        [("u1", "<p>no tables here</p>"), ("u2", None), ("u3", "")],
        "url string, html_text string")
    assert extract_tables(df).count() == 0


def test_extract_tables_nested_contract(spark):
    # nested table: the outer match stops lazily at the inner
    # </table> and matches never overlap, so the inner table's cells
    # flatten (tag-stripped) into the enclosing cell's text — the
    # documented RE2-compatible contract both engines share
    html = ("<table><tr><td>outer"
            "<table><tr><td>inner</td></tr></table>"
            "</td></tr></table>")
    df = spark.createDataFrame([("u", html)], "url string, html_text string")
    rows = extract_tables(df).collect()
    assert len(rows) == 1
    assert tuple(rows[0]["cells"]) == ("outer inner",)


def test_extract_tables_multirow_page_set(spark):
    pages = [(f"u{i}",
              "<table>" + "".join(
                  f"<tr><td>r{j}c0</td><td>r{j}c1</td><td>r{j}c2</td></tr>"
                  for j in range(i + 1)) + "</table>")
             for i in range(4)]
    df = spark.createDataFrame(pages, "url string, html_text string")
    out = extract_tables(df)
    assert out.count() == 1 + 2 + 3 + 4
    assert out.where("n_cells != 3").count() == 0
    # per-url row indices are dense 0..n
    per = {r["url"]: r["mx"] for r in
           out.groupBy("url").agg(
               {"row_idx": "max"}).withColumnRenamed(
               "max(row_idx)", "mx").collect()}
    assert per == {"u0": 0, "u1": 1, "u2": 2, "u3": 3}
