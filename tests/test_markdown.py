"""HTML → Markdown kernel (extract/markdown.py)."""

from docvault_ocr_service_spark.extract.markdown import html_to_markdown


def test_block_and_inline_elements():
    html = ("<h2>Head</h2><p>One <b>two</b> <i>three</i> "
            '<a href="/x">four</a> <code>five()</code>.</p>')
    assert html_to_markdown(html) == \
        "## Head\n\nOne **two** *three* [four](/x) `five()`."


def test_lists_tight_and_nested():
    html = ("<ul><li>a</li><li>b<ul><li>b1</li></ul></li></ul>"
            "<ol><li>x</li><li>y</li></ol>")
    assert html_to_markdown(html) == \
        "- a\n- b\n  - b1\n1. x\n2. y"


def test_pre_verbatim_and_script_dropped():
    html = ("<pre>line1\n  line2</pre>"
            "<script>var a = 'no';</script><p>after</p>")
    assert html_to_markdown(html) == \
        "```\nline1\n  line2\n```\n\nafter"


def test_table_with_pipe_escape():
    html = ("<table><tr><th>A</th><th>B</th></tr>"
            "<tr><td>1</td><td>x|y</td></tr></table>")
    assert html_to_markdown(html) == \
        "| A | B |\n| --- | --- |\n| 1 | x\\|y |"


def test_blockquote_and_hr_and_img():
    html = ('<blockquote><p>wise words</p></blockquote><hr>'
            '<p><img src="/i.png" alt="an image"> caption</p>')
    assert html_to_markdown(html) == \
        "> wise words\n\n---\n\n![an image](/i.png) caption"


def test_whitespace_collapses_outside_pre():
    html = "<p>a\n   b\t c</p>"
    assert html_to_markdown(html) == "a b c"


def test_totality_on_garbage():
    for bad in (None, b"", "<li>", "</b>text", b"\xff\xfe<p>x</p>",
                "<table><tr><td>open", "<pre>unclosed", "<h9>h</h9>",
                "<ul>" * 100 + "<li>deep</li>"):
        assert isinstance(html_to_markdown(bad), str)


def test_ragged_table_pads():
    html = ("<table><tr><th>A</th><th>B</th></tr>"
            "<tr><td>only</td></tr></table>")
    assert html_to_markdown(html) == \
        "| A | B |\n| --- | --- |\n| only |  |"


def test_stray_close_pre_leaves_prose_alone():
    """Unbalanced </pre> (common in scraped HTML) must not refence
    running prose as a code block (review finding)."""
    assert html_to_markdown("<h1>Title</h1>some text</pre><p>after</p>") \
        == "# Title\n\nsome text\n\nafter"
    # balanced pre still fences
    assert html_to_markdown("<pre>x</pre>") == "```\nx\n```"
