"""Crawl-frontier expansion: the next politeness-capped fetch batch.

Composes the tested pieces — link extraction, URL canonicalization,
seen-set anti-join, RFC 9309 robots filtering, host PageRank — into the
operator a continuous crawler actually runs: "given what we just
crawled, what do we fetch next?".

Scale shape: link explode and canonicalization are map-only; the
seen-set anti-join is the only corpus-scale shuffle (on the url key the
checkpoint is already bucketed by); robots rules join on host; the
politeness cap is one window per host; the final global top-N is a
TakeOrdered (no full sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.web import canonicalize_url, filter_by_robots, url_host
from ..operators.linkgraph import extract_links


def build_frontier(pages: DataFrame, seen: DataFrame,
                   robots: DataFrame | None = None,
                   host_ranks: DataFrame | None = None,
                   per_host_limit: int = 10,
                   limit: int = 10_000,
                   batch_window_s: float | None = None) -> DataFrame:
    """→ (url, host, rank) — the next fetch batch.

    ``pages``: (url, html_text) rows just extracted; ``seen``: (url)
    already-crawled set (the checkpoint's url column); ``robots``:
    (host, agent rules) as ``functions.web.filter_by_robots`` expects,
    or None to skip; ``host_ranks``: (host, rank) authority scores
    (e.g. ``operators.linkgraph.pagerank`` output), unknown hosts rank
    0.  Within a host, candidates are md5-ordered (deterministic spread,
    no crawl-order bias); across hosts, higher-ranked hosts win the
    global ``limit``.

    ``batch_window_s`` (with ``robots``) turns robots ``Crawl-delay``
    into a per-host budget: a host declaring delay d gets at most
    ``floor(batch_window_s / d)`` URLs this batch (0 when d exceeds the
    window — the host waits; callers rotating batches faster than their
    largest delay should carry such hosts across batches), still capped
    by ``per_host_limit``.  Hosts with no delay keep the flat cap.
    Scale shape unchanged: the delay table is host-keyed and tiny.
    """
    cand = (extract_links(pages)
            .select(canonicalize_url(F.col("dst")).alias("url"))
            .where(F.col("url").rlike("^https?://"))
            .distinct())
    cand = cand.join(seen.select("url"), "url", "left_anti")
    if robots is not None:
        cand = filter_by_robots(cand, robots).select("url")
    cand = cand.withColumn("host", url_host(F.col("url")))
    if host_ranks is not None:
        cand = (cand.join(host_ranks, "host", "left")
                .withColumn("rank", F.coalesce("rank", F.lit(0.0))))
    else:
        cand = cand.withColumn("rank", F.lit(0.0))
    cap = F.lit(per_host_limit)
    if robots is not None and batch_window_s is not None:
        from ..functions.web import crawl_delay_seconds

        delays = crawl_delay_seconds(robots)
        cand = cand.join(delays, "host", "left")
        cap = F.when(
            F.col("crawl_delay_s") > 0,
            # stay in long: a cast to int wraps negative for tiny
            # delays (60/1e-9 > INT_MAX) and would starve the host
            F.least(F.lit(per_host_limit).cast("long"),
                    F.floor(F.lit(float(batch_window_s))
                            / F.col("crawl_delay_s"))),
        ).otherwise(F.lit(per_host_limit).cast("long"))
    w = Window.partitionBy("host").orderBy(F.md5("url"), "url")
    capped = (cand.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") <= cap).drop("__rn"))
    return (capped.orderBy(F.desc("rank"), "url").limit(limit)
            .select("url", "host", "rank"))


def plan_recrawl(sitemap_entries: DataFrame, crawl_state: DataFrame,
                 now, *, default_ttl_days: float = 30.0,
                 limit: int = 10_000) -> DataFrame:
    """→ (url, reason) — the RE-crawl half of the crawl loop
    (``build_frontier`` discovers new URLs; this schedules stale known
    ones).  ``sitemap_entries``: (url, lastmod timestamp nullable) from
    sitemap parsing; ``crawl_state``: (url, last_crawled timestamp) —
    the checkpoint's done rows.  A URL re-crawls when:

    - ``modified``: its sitemap lastmod is newer than the last crawl
      (the explicit freshness signal);
    - ``expired``: it was last crawled more than ``default_ttl_days``
      ago (no/stale lastmod — age-based fallback);
    - ``new``: the sitemap lists it but the state has no row (belt and
      braces with the frontier's anti-join; dedup upstream).

    Deterministic: md5-ordered within the global ``limit`` so reruns
    pick identical batches.  Scale shape: one join on url (the key the
    checkpoint is already bucketed by); everything else is map-side.
    """
    s = sitemap_entries.select("url", F.col("lastmod"))
    c = crawl_state.select("url", F.col("last_crawled"))
    j = s.join(c, "url", "left")
    ttl = F.lit(float(default_ttl_days) * 86400.0)
    age = F.unix_timestamp(F.lit(now)) - F.unix_timestamp("last_crawled")
    reason = (
        F.when(F.col("last_crawled").isNull(), F.lit("new"))
        .when(F.col("lastmod").isNotNull()
              & (F.col("lastmod") > F.col("last_crawled")),
              F.lit("modified"))
        .when(age > ttl, F.lit("expired")))
    return (j.withColumn("reason", reason)
            .where(F.col("reason").isNotNull())
            .orderBy(F.md5("url"), "url").limit(limit)
            .select("url", "reason"))
