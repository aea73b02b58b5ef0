"""Columnar URL utilities for crawl tables.

URL-keyed corpora live and die by canonicalization: host/domain rollups,
URL-level dedup, and checkpoint MERGE keys all assume one spelling per
page.  Everything here is native ``pyspark.sql.functions`` composition
(JVM-side, codegen-friendly) — no Python in the hot path.
"""

from __future__ import annotations

import pandas as pd
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


# Public-suffix snapshot with full PSL rule semantics (normal rules,
# ``*.`` wildcard rules, ``!`` exception rules, longest match wins —
# publicsuffix.org/list/).  A curated snapshot, not the full 15k-line
# list: unknown multi-label suffixes degrade to the naive
# last-two-labels rule, the right conservative default for grouping
# politeness/stats by site owner.  To upgrade to the complete PSL, swap
# these tuples for the parsed list — the keying logic below already
# implements the algorithm; the rule tables are data.
_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "com.au", "net.au", "org.au", "edu.au",
    "gov.au", "id.au", "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "ad.jp", "ed.jp", "gr.jp", "lg.jp", "com.br", "org.br", "net.br",
    "gov.br", "edu.br", "com.cn", "org.cn", "net.cn", "gov.cn",
    "edu.cn", "ac.cn", "com.mx", "org.mx", "gob.mx", "edu.mx",
    "co.in", "org.in", "net.in", "ac.in", "gov.in", "edu.in", "co.nz",
    "org.nz", "net.nz", "govt.nz", "ac.nz", "co.kr", "or.kr", "ne.kr",
    "go.kr", "ac.kr", "re.kr", "com.tw", "org.tw", "edu.tw", "gov.tw",
    "com.hk", "org.hk", "edu.hk", "gov.hk", "com.sg", "org.sg",
    "edu.sg", "gov.sg", "com.my", "org.my", "edu.my", "gov.my",
    "co.th", "or.th", "ac.th", "go.th", "com.vn", "org.vn", "edu.vn",
    "gov.vn", "com.ua", "org.ua", "net.ua", "gov.ua", "edu.ua",
    "co.za", "org.za", "ac.za", "gov.za", "web.za", "com.ar",
    "org.ar", "net.ar", "edu.ar", "gob.ar", "com.tr", "org.tr",
    "net.tr", "edu.tr", "gov.tr", "com.co", "org.co", "edu.co",
    "gov.co", "com.pl", "org.pl", "net.pl", "edu.pl", "gov.pl",
    "waw.pl", "com.ru", "org.ru", "net.ru", "com.eg", "org.eg",
    "com.sa", "org.sa", "edu.sa", "com.pk", "org.pk", "edu.pk",
    "com.bd", "org.bd", "com.ng", "org.ng", "gov.ng", "co.id",
    "or.id", "ac.id", "go.id", "web.id", "com.ph", "org.ph",
    "gov.ph", "edu.ph", "co.il", "org.il", "ac.il", "gov.il",
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "appspot.com", "herokuapp.com", "cloudfront.net", "web.app",
    "pages.dev", "netlify.app", "vercel.app", "azurewebsites.net",
    "firebaseapp.com", "readthedocs.io", "fly.dev",
    "co.ke", "or.ke", "go.ke", "ac.ke", "co.tz", "go.tz", "ac.tz",
    "co.ug", "or.ug", "go.ug", "ac.ug", "com.gh", "org.gh", "gov.gh",
    "co.zw", "org.zw", "com.do", "org.do", "com.uy", "org.uy",
    "edu.uy", "gub.uy", "com.pe", "org.pe", "edu.pe", "gob.pe",
    "com.ec", "org.ec", "gob.ec", "com.ve", "org.ve", "gob.ve",
    "com.bo", "org.bo", "gob.bo", "com.py", "org.py", "com.gt",
    "org.gt", "com.sv", "com.ni", "com.hn", "com.pa", "co.cr",
    "ac.cr", "com.kz", "org.kz", "com.lk", "org.lk", "edu.lk",
    "gov.lk", "com.kh", "org.kh", "com.mo", "org.mo", "co.mz",
    "org.mz", "ac.mz", "gov.mz", "co.ma", "org.ma", "net.ma",
    "ac.ma", "gov.ma", "com.tn", "org.tn", "com.jo", "org.jo",
    "edu.jo", "gov.jo", "com.lb", "org.lb", "edu.lb", "gov.lb",
    "com.sy", "org.sy", "com.iq", "org.iq", "edu.iq", "gov.iq",
    "co.ir", "org.ir", "ac.ir", "gov.ir", "com.af", "org.af",
    "com.qa", "org.qa", "edu.qa", "gov.qa", "com.om", "org.om",
    "com.ye", "ac.ae", "co.ae", "gov.ae", "net.ae", "org.ae",
    "sch.ae", "com.bh", "org.bh", "co.at", "or.at", "ac.at", "gv.at",
    "co.hu", "org.hu", "info.hu", "com.gr", "org.gr", "edu.gr",
    "net.gr", "com.ro", "org.ro", "com.pt", "edu.pt", "gov.pt",
    "org.pt", "net.pt", "com.es", "org.es", "nom.es", "edu.es",
    "gob.es", "com.mt", "org.mt", "edu.mt", "gov.mt", "com.cy",
    "org.cy", "co.gg", "org.gg", "net.gg", "co.je", "co.im",
    "org.im", "co.rs", "org.rs", "edu.rs", "ac.rs", "gov.rs",
    "in.rs", "com.mk", "org.mk", "com.al", "org.al", "edu.al",
    "gov.al", "net.al", "com.ba", "org.ba", "co.me", "net.me",
    "org.me", "edu.me", "ac.me", "gov.me", "com.ge", "org.ge",
    "edu.ge", "gov.ge", "net.ge",
)

# 3-label normal rules (registrable = 4 labels)
_MULTI_SUFFIXES_3 = (
    "s3.amazonaws.com",
)

# wildcard rules "*.X" with a 1-label X: EVERY 2-label suffix under X
# is a public suffix (registrable = 3 labels)
_WILDCARD_TLDS = ("ck", "jm", "bd", "kw", "mm", "np", "er", "fk")

# wildcard rules "*.X" with a 2-label X (the Japanese city zones):
# every 3-label suffix under X is public (registrable = 4 labels)
_WILDCARD_2LABEL = (
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
)

# exception rules "!X": X itself IS a registrable domain despite a
# covering wildcard
_PSL_EXCEPTIONS_2 = ("www.ck",)
_PSL_EXCEPTIONS_3 = tuple(
    f"city.{c}" for c in _WILDCARD_2LABEL)


def registrable_domain(host: Column) -> Column:
    """eTLD+1 (the PSL 'registrable domain') from a hostname column —
    the key politeness budgets, per-site quality stats, and host-level
    dedup should group by ('a.co.uk' and 'b.a.co.uk' are the same
    site; 'a.co.uk' and 'b.co.uk' are not).

    Columnar implementation of the PSL algorithm over the snapshot rule
    tables above, longest match first: exception rules (``!www.ck`` →
    the exception itself is registrable), 2-label wildcards
    (``*.kawasaki.jp`` → last four labels), 3-label normal rules,
    1-label wildcards (``*.ck`` → last three), 2-label normal rules,
    then the default last-two rule.  The rule sets compile into the
    plan as literal ``isin`` tables — zero shuffles, zero Python.
    Hosts with a single label (or raw IPs — dots but all-numeric
    labels) pass through unchanged; a host that IS a public suffix has
    no registrable domain per the PSL and passes through unchanged
    (grouping-stable).
    """
    parts = F.split(F.lower(host), r"\.")
    n = F.size(parts)

    def last_k(k: int) -> Column:
        return F.concat_ws(
            ".", *[F.element_at(parts, -i) for i in range(k, 0, -1)])

    last2, last3, last4 = last_k(2), last_k(3), last_k(4)
    is_ip = ~F.lower(host).rlike("[^0-9.]")
    return (
        F.when(host.isNull() | (n <= 1) | is_ip, F.lower(host))
        # exception rules beat the wildcards that would cover them
        .when(last2.isin(*_PSL_EXCEPTIONS_2)
              | ((n >= 3) & last3.isin(*_PSL_EXCEPTIONS_3)),
              F.when(last2.isin(*_PSL_EXCEPTIONS_2), last2)
              .otherwise(last3))
        # *.kawasaki.jp: x.kawasaki.jp is a public suffix
        .when((n >= 4) & last2.isin(*_WILDCARD_2LABEL), last4)
        # host IS the public suffix -> no registrable domain; pass
        # through unchanged (grouping-stable)
        .when((n == 3) & last2.isin(*_WILDCARD_2LABEL), last3)
        .when((n >= 4) & last3.isin(*_MULTI_SUFFIXES_3), last4)
        .when((n == 3) & last3.isin(*_MULTI_SUFFIXES_3), last3)
        # *.ck: x.ck is a public suffix
        .when((n >= 3) & F.element_at(parts, -1).isin(*_WILDCARD_TLDS),
              last3)
        .when((n >= 3) & last2.isin(*_MULTI_SUFFIXES), last3)
        .otherwise(last2)
    )


def url_query(url: Column) -> Column:
    return F.parse_url(url, F.lit("QUERY"))


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
