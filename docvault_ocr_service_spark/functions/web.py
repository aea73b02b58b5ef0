"""Columnar URL utilities for crawl tables.

URL-keyed corpora live and die by canonicalization: host/domain rollups,
URL-level dedup, and checkpoint MERGE keys all assume one spelling per
page.  Everything here is native ``pyspark.sql.functions`` composition
(JVM-side, codegen-friendly) — no Python in the hot path.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

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


# Public-suffix rules with full PSL semantics (normal rules, ``*.``
# wildcard rules, ``!`` exception rules, longest match wins —
# publicsuffix.org/list/).  The rules live in a packaged DATA file
# (data/public_suffix_list.dat, the PSL's own format) so a verbatim
# upstream list is a drop-in swap; the snapshot shipped here carries
# ~1.3k multi-label rules (all major ccTLD second-level families, US
# state/k12 zones, JP prefectures, wildcard + exception zones, and the
# big multi-tenant hosting platforms).  Unlisted suffixes degrade to
# the PSL's implicit default rule — registrable = last two labels.

def _load_psl() -> tuple[dict[int, tuple[str, ...]],
                         dict[int, tuple[str, ...]],
                         dict[int, tuple[str, ...]]]:
    """Parse the packaged PSL file → ({suffix_len: normal_rules},
    {base_len: wildcard_bases}, {len: exception_rules}), each sorted
    for plan-text determinism.  Pure data, parsed once at import."""
    try:
        # works from a filesystem checkout AND from a --py-files zip
        from importlib.resources import files

        text = files("docvault_ocr_service_spark").joinpath(
            "data/public_suffix_list.dat").read_text(encoding="utf-8")
    except Exception:  # noqa: BLE001 — e.g. loader without reader
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data",
            "public_suffix_list.dat")
        with open(path, encoding="utf-8") as fh:
            text = fh.read()
    normal: dict[int, set] = {}
    wildcard: dict[int, set] = {}
    exception: dict[int, set] = {}
    for line in text.splitlines():
        rule = line.strip().lower()
        if not rule or rule.startswith("//"):
            continue
        if rule.startswith("!"):
            r = rule[1:]
            exception.setdefault(r.count(".") + 1, set()).add(r)
        elif rule.startswith("*."):
            b = rule[2:]
            wildcard.setdefault(b.count(".") + 1, set()).add(b)
        elif "." in rule:               # 1-label rules are the default
            normal.setdefault(rule.count(".") + 1, set()).add(rule)
    tup = lambda d: {k: tuple(sorted(v)) for k, v in d.items()}  # noqa: E731
    return tup(normal), tup(wildcard), tup(exception)


_PSL_NORMAL, _PSL_WILDCARD, _PSL_EXCEPTION = _load_psl()


def registrable_domain(host: Column) -> Column:
    """eTLD+1 (the PSL 'registrable domain') from a hostname column —
    the key politeness budgets, per-site quality stats, and host-level
    dedup should group by ('a.co.uk' and 'b.a.co.uk' are the same
    site; 'a.co.uk' and 'b.co.uk' are not).

    Columnar implementation of the PSL algorithm over the packaged
    rule file, depth-general and longest-match-first: exception rules
    (``!www.ck`` → the exception itself is registrable) beat covering
    wildcards; then, for each public-suffix length s descending, a
    host whose last s labels form a listed suffix — a normal rule
    with s labels OR a wildcard base with s−1 labels — registers at
    s+1 labels; then the default last-two rule.  The rule sets
    compile into the plan as ``isin`` tables (Catalyst converts them
    to hash-set ``InSet`` above the 10-element threshold, so the
    ~1.3k-rule lookup is O(1) per row) — zero shuffles, zero Python.
    Hosts with a single label (or raw IPs — dots but all-numeric
    labels) pass through unchanged; a host that IS a public suffix
    has no registrable domain per the PSL and passes through
    unchanged (grouping-stable).
    """
    parts = F.split(F.lower(host), r"\.")
    n = F.size(parts)

    def last_k(k: int) -> Column:
        return F.concat_ws(
            ".", *[F.element_at(parts, -i) for i in range(k, 0, -1)])

    suffix_lens = sorted(
        {k for k in _PSL_NORMAL}
        | {k + 1 for k in _PSL_WILDCARD}, reverse=True)
    max_k = max([suffix_lens[0] + 1]
                + [k for k in _PSL_EXCEPTION]) if suffix_lens else 2
    last = {k: last_k(k) for k in range(1, max_k + 1)}

    is_ip = ~F.lower(host).rlike("[^0-9.]")
    expr = F.when(host.isNull() | (n <= 1) | is_ip, F.lower(host))
    # exception rules beat the wildcards that would cover them
    for k in sorted(_PSL_EXCEPTION, reverse=True):
        expr = expr.when(
            (n >= k) & last[k].isin(*_PSL_EXCEPTION[k]), last[k])
    for s in suffix_lens:
        conds = []
        if s in _PSL_NORMAL:
            conds.append((n >= s) & last[s].isin(*_PSL_NORMAL[s]))
        if s - 1 in _PSL_WILDCARD:
            # *.base: every label under base is itself a public suffix
            conds.append(
                (n >= s) & last[s - 1].isin(*_PSL_WILDCARD[s - 1]))
        cond = conds[0] if len(conds) == 1 else conds[0] | conds[1]
        # registrable = suffix + one label; a host that IS the suffix
        # passes through unchanged (grouping-stable)
        expr = expr.when(cond & (n >= s + 1), last[s + 1])
        expr = expr.when(cond, last[s])
    return expr.otherwise(last[2])


# -- O(1)-plan variant: the vectorized form of the PSL lookup --------
#
# The Column form above compiles the ~1.3k-rule tables into the plan as
# ``isin`` literal lists; Catalyst ANALYSIS of that ~75 KB tree costs
# ~0.5-1 s per query compile (measured r7: url_registrable_domains wall
# 1.33 s vs 0.17 s of actual job time), the cost recurs on every query
# that derives a domain key, and the InSet execution itself turned out
# noisy at volume (1.8-13 s for 600k rows, interpreter/GC-sensitive).
# Three alternatives were raced at 600k rows (OPTIMIZATION_r07.md):
#
#   isin/InSet when-chain (r6):   1.8-13.4 s, 75 KB plan, ~0.5 s analysis
#   broadcast-join per depth:     ~1.65 s stable, O(1) plan
#   Arrow-vectorized lookup:      ~0.7 s stable, O(1) plan  <-- shipped
#
# The winner keeps the packaged rule sets in worker memory (tiny,
# module-level — imported once per reused worker, guide §4.5) and runs
# the exact decision procedure per host in one vectorized pandas UDF
# over the single host column.  Same values as ``registrable_domain``
# (tests/test_robots.py pins parity on the full edge-case fixture).

# flat rule sets + the depth constants the decision procedure needs —
# derived once at import from the packaged PSL tables
_PSL_NORM_SET = frozenset(r for v in _PSL_NORMAL.values() for r in v)
_PSL_WILD_SET = frozenset(r for v in _PSL_WILDCARD.values() for r in v)
_PSL_EXC_SET = frozenset(r for v in _PSL_EXCEPTION.values() for r in v)
_PSL_EXC_LENS = tuple(sorted(_PSL_EXCEPTION, reverse=True))
_PSL_SUF_LENS = tuple(sorted(
    {k for k in _PSL_NORMAL} | {k + 1 for k in _PSL_WILDCARD},
    reverse=True))


def psl_lookup(host: str | None) -> str | None:
    """The PSL registrable-domain decision procedure as a plain Python
    function — value-identical to the ``registrable_domain`` Column
    (same rule tables, same branch order).  One host in, one domain
    out; the vectorized UDF below maps it over Arrow batches."""
    if host is None:
        return None
    hl = host.lower()
    parts = hl.split(".")
    n = len(parts)
    # single label, or an all-numeric-and-dots raw IP → unchanged
    if n <= 1 or not any(c not in "0123456789." for c in hl):
        return hl

    def last(k: int) -> str:
        return ".".join(parts[-k:])

    for k in _PSL_EXC_LENS:                 # exceptions beat wildcards
        if n >= k and last(k) in _PSL_EXC_SET:
            return last(k)
    for s in _PSL_SUF_LENS:                 # longest suffix match wins
        if (n >= s and last(s) in _PSL_NORM_SET) or \
                (n >= s and last(s - 1) in _PSL_WILD_SET):
            return last(s + 1) if n >= s + 1 else last(s)
    return last(2)                          # the PSL implicit default


@F.pandas_udf(StringType())
def _psl_domain_udf(hosts: pd.Series) -> pd.Series:
    return hosts.map(psl_lookup, na_action=None)


def with_registrable_domain(df: DataFrame, host: Column | str,
                            out_col: str = "registrable_domain"
                            ) -> DataFrame:
    """``df`` + ``out_col`` = the PSL registrable domain of ``host`` —
    value-identical to ``registrable_domain`` but with the rule lookup
    vectorized over Arrow batches instead of plan-inlined ``isin``
    tables (O(1) plan size, ~5x faster at volume; see the module
    comment above).  Use this form in query paths; the Column form
    remains the expression-context / SQL-twinnable reference."""
    if isinstance(host, str):
        host = F.col(host)
    return df.withColumn(out_col, _psl_domain_udf(host))


def url_query(url: Column) -> Column:
    return F.parse_url(url, F.lit("QUERY"))


# rel=canonical / meta-robots extraction — columnar (RE2-compatible
# patterns, both attribute orders), zero Python.  The canonical link
# is how recrawl pipelines group mirror/tracking-parameter variants of
# the same page before dedup; meta-robots noindex is the publisher's
# opt-out signal a polite corpus builder honors alongside robots.txt.
_CANON_RE_1 = (r"(?is)<link[^>]*rel=[\"']?canonical[\"']?[^>]*"
               r"href=[\"']?([^\"'> ]+)")
_CANON_RE_2 = (r"(?is)<link[^>]*href=[\"']?([^\"'> ]+)[\"']?[^>]*"
               r"rel=[\"']?canonical")
_ROBOTS_META_1 = (r"(?is)<meta[^>]*name=[\"']?robots[\"']?[^>]*"
                  r"content=[\"']?([^\"'>]+)")
_ROBOTS_META_2 = (r"(?is)<meta[^>]*content=[\"']?([^\"'>]+)[\"']?"
                  r"[^>]*name=[\"']?robots")


def canonical_url(html: Column) -> Column:
    """``<link rel="canonical" href=...>`` target, either attribute
    order; NULL when absent."""
    return F.nullif(
        F.coalesce(
            F.nullif(F.regexp_extract(html, _CANON_RE_1, 1), F.lit("")),
            F.nullif(F.regexp_extract(html, _CANON_RE_2, 1), F.lit("")),
        ), F.lit(""))


def robots_meta_directives(html: Column) -> Column:
    """``<meta name="robots">`` directives → struct(noindex boolean,
    nofollow boolean).  ``none`` means both (the published
    convention); absent meta → both false."""
    content = F.lower(F.coalesce(
        F.nullif(F.regexp_extract(html, _ROBOTS_META_1, 1), F.lit("")),
        F.nullif(F.regexp_extract(html, _ROBOTS_META_2, 1), F.lit("")),
        F.lit("")))
    return F.struct(
        (content.rlike("noindex") | content.rlike(r"\bnone\b"))
        .alias("noindex"),
        (content.rlike("nofollow") | content.rlike(r"\bnone\b"))
        .alias("nofollow"))


def cap_per_domain(df: DataFrame, url_col: str = "url",
                   max_pages: int = 1000) -> DataFrame:
    """Frequency capping by site owner: at most ``max_pages`` pages
    per registrable domain (the C4/FineWeb anti-SEO-spam measure — a
    single link-farm domain must not dominate the corpus).  Selection
    is md5-deterministic (order-independent across partitionings): the
    kept pages are the ``max_pages`` lowest md5(url) within the
    domain.  One window shuffle on the domain key."""
    from pyspark.sql import Window

    for reserved in ("__domain", "__rn"):
        if reserved in df.columns:
            raise ValueError(
                f"cap_per_domain uses {reserved!r} internally; rename "
                f"the caller's column first")
    host = F.lower(F.regexp_extract(
        F.col(url_col), r"^[a-zA-Z]+://(?:[^/?#@]*@)?([^/?#:]+)", 1))
    w = Window.partitionBy("__domain").orderBy(F.md5(F.col(url_col)))
    return (with_registrable_domain(df, host, "__domain")
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= max_pages)
            .drop("__domain", "__rn"))


def split_by_domain(df: DataFrame, url_col: str = "url",
                    valid_pct: int = 1, test_pct: int = 1,
                    seed: str = "v1") -> DataFrame:
    """Leakage-safe train/valid/test assignment: the split key is the
    REGISTRABLE DOMAIN, not the page — near-duplicate pages from the
    same site (template variants, mirrors, pagination) land in the
    same split, so held-out perplexity is not inflated by train-set
    twins.  Adds ``split`` ('train'|'valid'|'test') from a
    deterministic md5 bucket of (seed, domain) — stable across runs
    and cluster sizes; bump ``seed`` to re-deal.  Map-only (the
    domain function is columnar)."""
    if valid_pct + test_pct >= 100:
        raise ValueError("valid_pct + test_pct must leave room "
                         "for train")
    if "split" in df.columns:
        raise ValueError("split_by_domain writes a 'split' column; "
                         "rename the caller's column first")
    host = F.lower(F.regexp_extract(
        F.col(url_col), r"^[a-zA-Z]+://(?:[^/?#@]*@)?([^/?#:]+)", 1))
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.lit(seed + "|"), F.col("__psl_dom"))),
        1, 8), 16, 10).cast("long") % 100)
    return (with_registrable_domain(df, host, "__psl_dom")
            .withColumn(
                "split",
                F.when(bucket < test_pct, "test")
                .when(bucket < test_pct + valid_pct, "valid")
                .otherwise("train"))
            .drop("__psl_dom"))


def parse_robots(content: str, agent: str = "spark-extract") -> list[dict]:
    """robots.txt → [{prefix, allowed, weight}] for the most specific
    matching user-agent group (RFC 9309 group selection: the longest
    agent token that is a case-insensitive substring match, falling back
    to ``*``).  Path patterns are treated as literal prefixes (the
    overwhelming real-world case; ``*``/``$`` wildcard rules are
    skipped conservatively).  Empty Disallow values (allow-all) are
    dropped per the RFC."""
    groups: dict[str, list[dict]] = {}
    current: list[str] = []
    seen_rule = False
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key, value = key.strip().lower(), value.strip()
        if key == "user-agent":
            if seen_rule:           # a new group starts
                current = []
                seen_rule = False
            current.append(value.lower())
            for a in current:
                groups.setdefault(a, groups.get(a, []))
        elif key == "crawl-delay":
            # not a rule we return here (see parse_crawl_delay), but any
            # non-UA directive ends the agent-line run per RFC 9309 §2.1
            seen_rule = True
        elif key in ("allow", "disallow"):
            seen_rule = True
            if ("*" in value or "$" in value):
                if key == "allow":
                    continue        # never BROADEN allowance via wildcard
                # conservative deny: the literal prefix up to the first
                # wildcard is a superset of the wildcard pattern
                value = value.split("*", 1)[0].split("$", 1)[0]
            if not value:
                continue
            rule = {"prefix": value, "allowed": key == "allow",
                    "weight": len(value)}
            for a in (current or ["*"]):
                groups.setdefault(a, []).append(rule)
    agent_l = agent.lower()
    best = None
    for a in groups:
        if a != "*" and a in agent_l:
            if best is None or len(a) > len(best):
                best = a
    return list(groups.get(best if best is not None else "*", []))


def parse_crawl_delay(content: str,
                      agent: str = "spark-extract") -> float | None:
    """``Crawl-delay`` seconds for the most specific matching
    user-agent group (same group selection as ``parse_robots``:
    longest substring-matching agent token, ``*`` fallback), or None
    when the group declares none.  Non-numeric / negative values are
    ignored (treated as absent) — the de-facto big-crawler behavior
    for the non-standard directive."""
    delays: dict[str, float] = {}
    current: list[str] = []
    seen_rule = False
    groups_seen: set[str] = set()
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key, value = key.strip().lower(), value.strip()
        if key == "user-agent":
            if seen_rule:
                current = []
                seen_rule = False
            current.append(value.lower())
            groups_seen.update(current)
        elif key in ("allow", "disallow"):
            seen_rule = True
        elif key == "crawl-delay":
            seen_rule = True
            try:
                d = float(value)
            except ValueError:
                continue
            if d >= 0:
                for a in (current or ["*"]):
                    delays[a] = d
                    groups_seen.add(a)
    agent_l = agent.lower()
    best = None
    for a in groups_seen:
        if a != "*" and a in agent_l:
            if best is None or len(a) > len(best):
                best = a
    return delays.get(best if best is not None else "*")


def crawl_delay_seconds(robots_df, *, agent: str = "spark-extract"):
    """(host, robots_txt) → (host, crawl_delay_s double, nullable) —
    the columnar binding of ``parse_crawl_delay`` the frontier joins
    on host."""
    @F.pandas_udf("double")
    def _delay(contents: pd.Series) -> pd.Series:
        return contents.map(lambda c: parse_crawl_delay(c, agent))

    return robots_df.select(
        "host", _delay(F.col("robots_txt")).alias("crawl_delay_s"))


def filter_by_robots(urls_df, robots_df, *, url_col: str = "url",
                     agent: str = "spark-extract",
                     keep_denied: bool = False):
    """Politeness filter: annotate (and by default drop) URLs whose path
    a host's robots.txt disallows for ``agent``.

    ``robots_df`` is (host: string, robots_txt: string) — one row per
    host, the shape a crawl frontier stores.  RFC 9309 matching: rule
    prefixes match against **path-plus-query** (``/p?a=1`` — the RFC's
    match target, so ``Disallow: /search?`` rules work); the longest
    matching prefix wins; on equal length, Allow wins.  Hosts with no
    robots row (or no matching rule) are allowed.

    Scale shape: rules explode to (host, prefix, allowed) rows joined on
    host (rules-per-host is small, AQE broadcasts the rule table when it
    fits); winner selection is one window over the matched candidates.
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    rules_schema = T.ArrayType(T.StructType([
        T.StructField("prefix", T.StringType()),
        T.StructField("allowed", T.BooleanType()),
        T.StructField("weight", T.IntegerType()),
    ]))

    @F.pandas_udf(rules_schema)
    def _parse(contents: pd.Series) -> pd.Series:
        return contents.map(
            lambda c: [(r["prefix"], r["allowed"], r["weight"])
                       for r in parse_robots(c or "", agent)])

    rules = (robots_df
             .withColumn("__r", F.explode(_parse(F.col("robots_txt"))))
             .select(F.lower(F.col("host")).alias("__rhost"),
                     F.col("__r.prefix").alias("__prefix"),
                     F.col("__r.allowed").alias("__allowed"),
                     F.col("__r.weight").alias("__weight")))

    urls = (urls_df
            .withColumn("__uid", F.monotonically_increasing_id())
            .withColumn("__host", F.lower(url_host(F.col(url_col))))
            .withColumn("__path", F.concat(
                F.coalesce(url_path(F.col(url_col)), F.lit("/")),
                # RFC 9309 matches path-plus-query; concat() is null when
                # the URL has no query, hence the coalesce to ""
                F.coalesce(F.concat(F.lit("?"), url_query(F.col(url_col))),
                           F.lit("")))))
    # null out non-matching rules instead of filtering them: a URL whose
    # host has rules but none match must survive as allowed, and
    # duplicate input URLs keep their own rows (window keys on __uid)
    match = (F.col("__prefix").isNotNull()
             & F.col("__path").startswith(F.col("__prefix")))
    cand = (urls.join(rules, urls["__host"] == rules["__rhost"], "left")
            .withColumn("__w", F.when(match, F.col("__weight")))
            .withColumn("__a", F.when(match, F.col("__allowed"))))
    w = Window.partitionBy("__uid").orderBy(
        F.col("__w").desc_nulls_last(),
        F.col("__a").desc_nulls_last())
    decided = (cand.withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") == 1)
               .withColumn("robots_allowed",
                           F.coalesce(F.col("__a"), F.lit(True)))
               .drop("__rn", "__prefix", "__allowed", "__weight", "__w",
                     "__a", "__rhost", "__host", "__path", "__uid"))
    if keep_denied:
        return decided
    return decided.where(F.col("robots_allowed")).drop("robots_allowed")


_LOC_RE = __import__("re").compile(r"<loc>\s*([^<]+?)\s*</loc>")


def parse_sitemap(xml: str) -> list[str]:
    """Sitemap / sitemap-index ``<loc>`` URLs (regex-based — no XML lib
    in this container, and real-world sitemaps are too malformed for a
    strict parser anyway).  Entity-unescapes the five XML builtins."""
    out = []
    for m in _LOC_RE.finditer(xml or ""):
        loc = (m.group(1)
               .replace("&lt;", "<").replace("&gt;", ">")
               .replace("&quot;", '"').replace("&apos;", "'")
               .replace("&amp;", "&"))   # &amp; LAST: &amp;lt; → &lt;
        out.append(loc)
    return out


def _xml_unescape(col):
    """Columnar 5-entity XML unescape (&amp; LAST: &amp;lt; → &lt;) —
    the one copy every sitemap scanner shares."""
    return F.replace(F.replace(F.replace(F.replace(F.replace(
        col, F.lit("&lt;"), F.lit("<")),
        F.lit("&gt;"), F.lit(">")),
        F.lit("&quot;"), F.lit('"')),
        F.lit("&apos;"), F.lit("'")),
        F.lit("&amp;"), F.lit("&"))


_LOC_PATTERN = r"<loc>\s*([^<]+?)\s*</loc>"


def sitemap_urls(df, xml_col: str = "sitemap_xml"):
    """(host, sitemap_xml) → one row per discovered URL (host, url).
    Columnar: the <loc> scan is a native regexp_extract_all."""
    locs = F.regexp_extract_all(F.col(xml_col), F.lit(_LOC_PATTERN), 1)
    return (df.withColumn("url",
                          F.explode(F.transform(locs, _xml_unescape)))
              .drop(xml_col))


def sitemap_entries(df, xml_col: str = "sitemap_xml"):
    """(host, sitemap_xml) → (host, url, lastmod timestamp?) — the
    <url> entry scan ``plan_recrawl`` consumes: each ``<url>`` block's
    ``<loc>`` plus its optional ``<lastmod>`` (W3C datetime; date-only
    values parse as midnight, absent/invalid values null).  Columnar:
    one regexp pass per field over exploded ``<url>`` blocks."""
    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"(?s)<url>(.*?)</url>"), 1)
    exploded = df.withColumn("__u", F.explode(blocks)).drop(xml_col)
    loc = F.regexp_extract(F.col("__u"), _LOC_PATTERN, 1)
    unescaped = _xml_unescape(loc)
    raw_mod = F.regexp_extract(
        F.col("__u"), r"<lastmod>\s*([^<]+?)\s*</lastmod>", 1)
    # every W3C-datetime precision level, with and without zone
    lastmod = F.coalesce(*[
        F.try_to_timestamp(raw_mod, F.lit(fmt)) for fmt in (
            "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
            "yyyy-MM-dd'T'HH:mm:ss.SSS",
            "yyyy-MM-dd'T'HH:mm:ssXXX",
            "yyyy-MM-dd'T'HH:mm:ss",
            "yyyy-MM-dd'T'HH:mmXXX",
            "yyyy-MM-dd'T'HH:mm",
            "yyyy-MM-dd",
            "yyyy-MM",
            "yyyy")])
    return (exploded
            .withColumn("url", unescaped)
            .withColumn("lastmod", lastmod)
            .where(F.col("url") != "")
            .drop("__u"))


def robots_sitemap_urls(robots_df, *, host_col: str = "host",
                        txt_col: str = "robots_txt"):
    """(host, sitemap_url) rows from ``Sitemap:`` directives in
    robots.txt — per the sitemaps.org protocol the directive is global
    (not user-agent-group scoped), so this is a plain line extraction:
    case-insensitive key, one URL per directive line.  The crawl story
    closes robots → sitemaps → frontier seeds.  Fully columnar."""
    urls = F.expr(
        f"regexp_extract_all({txt_col}, "
        r"'(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\\S+)', 1)")
    return (robots_df.select(F.col(host_col).alias("host"),
                             F.explode(urls).alias("sitemap_url")))


def derive_domain_blocklist(df, *, domain_col: str = "domain",
                            pass_col: str = "passed",
                            min_docs: int = 5,
                            max_fail_rate: float = 0.5):
    """(domain, n_docs, n_pass, fail_rate, blocked) from per-document
    quality verdicts — the curation step that turns page-level filters
    (Gopher/C4/LM perplexity) into a DOMAIN-level decision: a domain
    whose pages fail more than ``max_fail_rate`` of the time (with at
    least ``min_docs`` observed) is spam/boilerplate farm territory and
    gets blocked wholesale; sparse domains are never blocked on thin
    evidence.  One shuffle on domain; the output is broadcast-sized by
    construction (domains, not pages)."""
    agg = (df.groupBy(F.col(domain_col).alias("domain"))
           .agg(F.count("*").cast("long").alias("n_docs"),
                F.sum(F.when(F.col(pass_col), 1).otherwise(0))
                 .cast("long").alias("n_pass")))
    fail_rate = (F.col("n_docs") - F.col("n_pass")) / F.col("n_docs")
    return agg.select(
        "domain", "n_docs", "n_pass",
        F.round(fail_rate, 6).alias("fail_rate"),
        ((F.col("n_docs") >= F.lit(min_docs))
         & (fail_rate > F.lit(max_fail_rate))).alias("blocked"))
