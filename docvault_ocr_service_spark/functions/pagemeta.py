"""Columnar page-metadata + feed-item extraction.

A crawl-curation engine needs the page's self-description long before
any DOM walk: titles and og: cards feed search/snippet pipelines, the
canonical link is the dedup key the page itself declares, robots meta
gates indexing, and RSS/Atom items are the cheapest structured source of
fresh-document discovery.  All of it is regexp over the raw markup —
native ``regexp_extract``/``regexp_extract_all``, whole-stage codegen,
no Python, RE2-compatible patterns so the DuckDB gate can replay them.

(The DOM block scorer in extract/htmltext.py is the *content* path; this
module is the *metadata* path — the two are independent by design, as a
page with broken body markup still usually carries a well-formed head.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TITLE_RE = r"(?is)<title[^>]*>\s*(.*?)\s*</title>"
_HTML_LANG_RE = r"""(?is)<html[^>]*\slang\s*=\s*["']([A-Za-z-]+)["']"""
_CANONICAL_RE = (r"""(?is)<link[^>]*rel\s*=\s*["']canonical["'][^>]*"""
                 r"""href\s*=\s*["']([^"']+)["']""")


def _meta_content(html: Column, attr: str, key: str) -> Column:
    """<meta {attr}="{key}" content="..."> in either attribute order."""
    a = (rf"""(?is)<meta[^>]*{attr}\s*=\s*["']{key}["'][^>]*"""
         rf"""content\s*=\s*["']([^"']*)["']""")
    b = (rf"""(?is)<meta[^>]*content\s*=\s*["']([^"']*)["'][^>]*"""
         rf"""{attr}\s*=\s*["']{key}["']""")
    first = F.regexp_extract(html, a, 1)
    return F.when(first != "", first).otherwise(
        F.regexp_extract(html, b, 1))


def extract_page_metadata(df: DataFrame,
                          html_col: str = "html_text") -> DataFrame:
    """df + title / description / og_title / og_description / og_image /
    canonical_url / meta_robots / html_lang columns (empty string when
    the tag is absent — regexp_extract's convention, kept so the columns
    stay non-null and groupable)."""
    h = F.col(html_col)
    return df.select(
        "*",
        F.regexp_extract(h, _TITLE_RE, 1).alias("title"),
        _meta_content(h, "name", "description").alias("description"),
        _meta_content(h, "property", "og:title").alias("og_title"),
        _meta_content(h, "property", "og:description")
            .alias("og_description"),
        _meta_content(h, "property", "og:image").alias("og_image"),
        F.regexp_extract(h, _CANONICAL_RE, 1).alias("canonical_url"),
        _meta_content(h, "name", "robots").alias("meta_robots"),
        F.regexp_extract(h, _HTML_LANG_RE, 1).alias("html_lang"),
    )


_ITEM_RE = r"(?is)<item[\s>](.*?)</item>|<entry[\s>](.*?)</entry>"
_ITEM_TITLE_RE = r"(?is)<title[^>]*>\s*(.*?)\s*</title>"
_RSS_LINK_RE = r"(?is)<link[^>]*>\s*([^<\s][^<]*?)\s*</link>"
_ATOM_LINK_RE = r"""(?is)<link[^>]*href\s*=\s*["']([^"']+)["']"""
_DATE_RE = (r"(?is)<(?:pubdate|updated|published)[^>]*>"
            r"\s*(.*?)\s*</(?:pubdate|updated|published)>")


def extract_feed_items(df: DataFrame, xml_col: str = "xml",
                       id_col: str = "url") -> DataFrame:
    """RSS ``<item>`` / Atom ``<entry>`` blocks → one row per item with
    (item_no, item_title, item_link, item_date).  Item links accept both
    the RSS text form and the Atom ``href`` form."""
    x = F.col(xml_col)
    blocks = df.select(
        F.col(id_col).alias("feed"),
        F.posexplode(F.regexp_extract_all(x, F.lit(_ITEM_RE), 0))
         .alias("item_no", "block"))
    b = F.col("block")
    rss_link = F.regexp_extract(b, _RSS_LINK_RE, 1)
    return blocks.select(
        "feed", "item_no",
        F.regexp_extract(b, _ITEM_TITLE_RE, 1).alias("item_title"),
        F.when(rss_link != "", rss_link)
         .otherwise(F.regexp_extract(b, _ATOM_LINK_RE, 1))
         .alias("item_link"),
        F.regexp_extract(b, _DATE_RE, 1).alias("item_date"),
    )


# ---------------------------------------------------------------------------
# heading outline
# ---------------------------------------------------------------------------

_HEADING_RE = r"(?is)<h([1-6])\b[^>]*>(.*?)</h[1-6]\s*>"


def extract_outline(df: DataFrame, url_col: str = "url",
                    html_col: str = "html_text") -> DataFrame:
    """The page's heading outline: one row per ``<h1>``–``<h6>`` in
    document order —

        (url, heading_idx, level int, heading)

    heading text is tag-stripped, entity-unescaped and whitespace-
    collapsed (the same cleaning chain as the table extractor); empty
    headings (decorative/anchor-only) are dropped but keep their slot
    in ``heading_idx``.  RE2-compatible: the closing tag matches ANY
    ``</hN>`` (backreferences don't exist in RE2 — for well-formed
    pages the two are identical, for crossed heading tags the match
    ends at the first close).  Map-only, zero shuffles.

    Why: the outline is the page's own summary — section-aware
    chunking for retrieval, title-vs-body consistency checks, and
    heading-density spam signals all start here.
    """
    from .tables_html import clean_html_text

    pairs = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.regexp_extract_all(
            F.col(html_col), F.lit(_HEADING_RE), 0))
        .alias("heading_idx", "__m"))
    return (pairs
            .select("url", "heading_idx",
                    F.regexp_extract(F.col("__m"), _HEADING_RE, 1)
                    .cast("int").alias("level"),
                    clean_html_text(F.regexp_extract(
                        F.col("__m"), _HEADING_RE, 2)).alias("heading"))
            .where(F.col("heading") != ""))


# JSON-LD (schema.org) structured data — publishers embed article/
# product/org metadata in <script type="application/ld+json"> blocks;
# for a training-data pipeline these are the cleanest source of
# titles, publication dates and authorship for quality/recency
# weighting.  RE2-compatible (no lookahead) block match: a real
# ``type`` attribute (whitespace-anchored, so ``data-type=`` can't
# match) whose value is exactly the ld+json mime (quote/space/``>``
# terminated, so ``application/ld+json-extended`` can't).
_JSONLD_RE = (r"(?is)<script[^>]*\stype\s*=\s*[\"']?"
              r"application/ld\+json[\"']?(?:>|\s[^>]*>)"
              r"(.*?)</script\s*>")

_JSONLD_SCHEMA = ("`@type` string, name string, headline string, "
                  "datePublished string, "
                  "author struct<name: string>, "
                  "_corrupt string")


def extract_jsonld(df, html_col: str = "html_text",
                   url_col: str = "url"):
    """(url, block_idx, ld_type, name, headline, date_published,
    author_name, valid) — one row per JSON-LD block.  ONE strict
    ``from_json`` parse per block (``allowSingleQuotes=false`` etc.,
    so the ``valid`` flag means standard JSON carrying a top-level
    OBJECT — the same verdict the DuckDB oracle's
    ``json_valid AND json_type='OBJECT'`` gives); malformed blocks
    are kept as valid=false rows so parse health is observable.
    Map-only."""
    blocks = F.regexp_extract_all(F.col(html_col),
                                  F.lit(_JSONLD_RE), 1)
    e = df.select(F.col(url_col).alias("url"),
                  F.posexplode(blocks).alias("block_idx", "__raw"))
    parsed = F.from_json(
        F.trim(F.col("__raw")), _JSONLD_SCHEMA,
        {"allowSingleQuotes": "false",
         "allowUnquotedFieldNames": "false",
         "columnNameOfCorruptRecord": "_corrupt"})
    e = e.withColumn("__j", parsed)
    j = F.col("__j")
    valid = j.isNotNull() & j["_corrupt"].isNull()
    nul = F.lit(None).cast("string")
    return e.select(
        "url", "block_idx",
        F.when(valid, j["@type"]).otherwise(nul).alias("ld_type"),
        F.when(valid, j["name"]).otherwise(nul).alias("name"),
        F.when(valid, j["headline"]).otherwise(nul).alias("headline"),
        F.when(valid, j["datePublished"]).otherwise(nul)
        .alias("date_published"),
        F.when(valid, j["author"]["name"]).otherwise(nul)
        .alias("author_name"),
        valid.alias("valid"))


# hreflang alternates — the canonical tag's sibling: publishers list
# per-language versions of a page; a multilingual corpus builder uses
# them to group translations (don't near-dedup across languages, do
# balance per-language budgets from the same source).
_HREFLANG_RE = (r"(?is)<link[^>]*\shreflang\s*=\s*[\"']?"
                r"([a-zA-Z-]+)[\"']?[^>]*>")


def extract_hreflang(df, html_col: str = "html_text",
                     url_col: str = "url"):
    """(url, hreflang, alt_url) — one row per alternate-language link
    (both attribute orders for href; ``x-default`` kept verbatim).
    Map-only columnar regexp."""
    tags = F.regexp_extract_all(F.col(html_col),
                                F.lit(_HREFLANG_RE), 0)
    e = df.select(F.col(url_col).alias("url"),
                  F.explode(tags).alias("__tag"))
    href = F.nullif(
        F.regexp_extract(F.col("__tag"),
                         r"(?is)href\s*=\s*[\"']?([^\"'> ]+)", 1),
        F.lit(""))
    lang = F.lower(F.regexp_extract(F.col("__tag"), _HREFLANG_RE, 1))
    return (e.select("url", lang.alias("hreflang"),
                     href.alias("alt_url"))
            .where(F.col("alt_url").isNotNull()))
