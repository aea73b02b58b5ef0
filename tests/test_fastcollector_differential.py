"""Differential test: _FastCollector ≡ _BlockCollector (HTMLParser).

The production tokenizer in ``extract_main_text`` is the regex-driven
``_FastCollector``; the documented extraction spec is the
``HTMLParser``-driven ``_BlockCollector``.  These tests pin output
identity over (a) the seeded corpus, (b) a curated set of known-nasty
constructs, and (c) randomized malformed-markup fuzz built from
fragments real crawls contain.
"""

from __future__ import annotations

import random

from docvault_ocr_service_spark import corpus
from docvault_ocr_service_spark.extract.charset import decode_html_bytes
from docvault_ocr_service_spark.extract.htmltext import (
    _FastCollector, collect_blocks_reference)


def fast_blocks(html: str):
    c = _FastCollector()
    c.feed(html)
    return c.blocks


def assert_identical(html: str) -> None:
    assert fast_blocks(html) == collect_blocks_reference(html), repr(html)


def test_corpus_identity():
    n_checked = 0
    for row in corpus.generate_rows(0, 400):
        payload = row["html"]
        if not payload or payload[:5] == b"%PDF-":
            continue
        decoded, _ = decode_html_bytes(payload)
        assert_identical(decoded)
        n_checked += 1
    assert n_checked > 100


# -- curated nasties ---------------------------------------------------------

CURATED = [
    # unquoted attr value ending in '/': NOT self-closing (the '/' is
    # part of the bare value per the tolerant grammar)
    '<div><a href=http://x.com/>link farm text</a> body body</div>',
    '<p><a href=http://x.com/>one</a><a href=http://y.com/>two</a></p>',
    '<input value=foo/>after<p>para</p>',
    # raw-text close variants: '</ script>' and '</script >' both end
    # cdata mode; '</scriptx>' does not
    '<p>keep</p><script>var x = "<p>no</p>";</ script><p>also keep</p>',
    '<p>a</p><script>x</script ><p>b</p>',
    '<p>a</p><script>x</scriptx>swallowed<p>b</p>',
    '<p>a</p><style>.x { color: red }</ style ><p>b</p>',
    # self-closing forms
    '<br/><span attr="value" /><p>text</p>',
    '<a href="x"/>notlink<p>y</p>',
    '<a href=x />notlink<p>y</p>',
    '<script/>not swallowed<p>z</p>',
    # unterminated constructs at EOF
    '<p>text<!-- unterminated comment',
    '<p>text<script>unterminated raw',
    '<p>text<div class="unterminated',
    '<p>text<div a=',
    '<p>text</',
    '<p>text<',
    # stray / bogus end tags
    '<p>a</ p>b</p>',
    '<p>a</3>b</p>',
    '<p>a</>b</p>',
    '<p>a</div junk="x">b</p>',
    # declarations, PIs, marked sections
    '<!DOCTYPE html><p>x</p>',
    '<?php echo "hi"; ?><p>x</p>',
    '<![CDATA[ raw <p>not a tag</p> ]]><p>x</p>',
    '<![if !IE]><p>cond</p><![endif]>',
    '<!bogus decl><p>x</p>',
    '<!-->short comment trap<p>x</p>',
    # entities, bare ampersands and angle brackets
    '<p>a &amp; b &lt;c&gt; &unknown; & d</p>',
    '<p>1 < 2 and 3 > 2</p>',
    '<p>x</p>< notatag <p>y</p>',
    # quotes around '>' inside attribute values
    '<div class="a>b">quoted gt</div>',
    "<div class='a>b'>quoted gt</div>",
    '<div "junk>half</div>',
    # misnesting and boilerplate state
    '<nav><p>menu</p><div>deep</nav>after</div><p>body text</p>',
    '<a><b>bold link</a>still linked?</b><p>plain</p>',
    '<table><tr><td>c1<td>c2</tr></table>',
    # multiple '=' and whitespace soup
    '<a href == "x">eq</a>',
    '<a\nhref\t=\n"x"\f>ws</a>',
    '<a href=>empty</a>',
]


def test_curated_nasties():
    for html in CURATED:
        assert_identical(html)


# -- malformed fuzz ----------------------------------------------------------

_FRAGMENTS = [
    "<p>", "</p>", "<div>", "</div>", "<div class=x>", "<div class='y'>",
    '<div class="z w">', "<a href=http://x.com/>", '<a href="http://y.org">',
    "</a>", "<a>", "<br>", "<br/>", "<br />", "<hr>", "<img src=a.png>",
    "<img src=a.png />", "<span>", "</span>", "<b>", "</b>", "<li>", "</li>",
    "<ul>", "</ul>", "<table>", "<tr>", "<td>", "</td>", "</tr>", "</table>",
    "<nav>", "</nav>", "<header>", "</header>", "<footer>", "</footer>",
    "<aside>", "</aside>", "<form>", "</form>", "<h1>", "</h1>", "<h2>",
    "</h2>", "<blockquote>", "</blockquote>", "<pre>", "</pre>",
    "<script>", "</script>", "</ script>", "</script >", "<script/>",
    "<script src=x.js>", "<style>", "</style>", "</ style >",
    "<!-- comment -->", "<!--->", "<!-- unterminated", "<!---->",
    "<!DOCTYPE html>", "<?pi data?>", "<![CDATA[cdata <p> body]]>",
    "<![if gte IE 7]>", "<![endif]>",
    "</>", "</3>", "</ div>", "</div junk>", "<",  "&", "&amp;", "&lt;",
    "&#65;", "&#x41;", "&bogus;", "& loose",
    "< notatag", "<a href=x/>", "<input value=foo/>", "<a href=>",
    '<div "junk>', '<div a=">', "<div a=", '<a href == "x">',
    "<a\nhref\t=\n'q'>", "<em/>", "<wbr>", "<svg><circle/></svg>",
    "<template><p>t</p></template>", "<iframe>inner</iframe>",
    "<noscript><p>ns</p></noscript>",
]

_WORDS = ["lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "x",
          "1<2", "a&b", "café", "zażółć", " ", "\n", "\t", "click here",
          "read more", "—", "…"]


def _fuzz_doc(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randrange(1, 40)):
        if rng.random() < 0.45:
            parts.append(rng.choice(_FRAGMENTS))
        else:
            parts.append(" ".join(rng.choice(_WORDS)
                                  for _ in range(rng.randrange(1, 8))))
    return "".join(parts)


def test_malformed_fuzz():
    rng = random.Random(20260816)
    for i in range(1500):
        html = _fuzz_doc(rng)
        assert fast_blocks(html) == collect_blocks_reference(html), \
            (i, repr(html))


def test_extract_main_text_never_raises_on_fuzz():
    from docvault_ocr_service_spark.extract.htmltext import extract_main_text

    rng = random.Random(77)
    for _ in range(300):
        text, spans = extract_main_text(_fuzz_doc(rng))
        assert isinstance(text, str)
        for s in spans:
            assert text[s.start:s.end] == text[s.start:s.end]
