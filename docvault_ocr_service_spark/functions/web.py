"""Columnar URL utilities for crawl tables.

URL-keyed corpora live and die by canonicalization: host/domain rollups,
URL-level dedup, and checkpoint MERGE keys all assume one spelling per
page.  Everything here is native ``pyspark.sql.functions`` composition
(JVM-side, codegen-friendly) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEAD_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)"


def strip_fragment(url: Column) -> Column:
    return F.regexp_replace(url, r"#.*$", "")


def canonicalize_url(url: Column) -> Column:
    """Conservative URL canonicalization: drop the fragment, lowercase
    scheme+authority, strip the scheme's default port.  Path/query are
    left byte-identical — case is significant there.
    """
    no_frag = strip_fragment(url)
    head = F.regexp_extract(no_frag, _HEAD_RE, 1)
    rest = no_frag.substr(F.length(head) + 1, F.length(no_frag))
    lowered = F.lower(head)
    deported = F.when(
        lowered.startswith("http://"),
        F.regexp_replace(lowered, r":80$", ""),
    ).when(
        lowered.startswith("https://"),
        F.regexp_replace(lowered, r":443$", ""),
    ).otherwise(lowered)
    # no scheme://authority prefix → leave the value untouched
    return F.when(head == "", no_frag).otherwise(F.concat(deported, rest))


def url_host(url: Column) -> Column:
    """Hostname (no port), via the native parse_url."""
    return F.parse_url(url, F.lit("HOST"))


def url_path(url: Column) -> Column:
    return F.parse_url(url, F.lit("PATH"))


def url_query(url: Column) -> Column:
    return F.parse_url(url, F.lit("QUERY"))
