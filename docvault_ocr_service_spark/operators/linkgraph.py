"""Link-graph extraction + PageRank over crawl corpora.

Why it belongs in a training-data engine: host-level link authority is a
standard crawl-curation signal (seed-list expansion, spam-host
down-weighting, crawl-frontier prioritization — the role OPIC/PageRank
plays in production crawlers).  The reference service has no graph stage
(it is per-document); this is one of the web-scale additions layered on
top of its extraction semantics.

Scale shape:

- link extraction is a native ``regexp_extract_all`` + ``explode`` —
  JVM-side, no Python;
- the host edge list aggregates once (map-side partial), and every
  PageRank iteration shuffles only (src_host → dst_host) contributions —
  rank state is one slim row per node, re-partitioned consistently by
  the join key, so iterations reuse the same hash partitioning;
- dangling mass is a single scalar agg per iteration (no collect of
  vectors, just one double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.web import url_host

HREF_RE = (r"""(?i)<a\s[^>]*?href\s*=\s*["']([^"'#][^"']*)["']""")


def extract_links(df: DataFrame, url_col: str = "url",
                  html_col: str = "html_text") -> DataFrame:
    """(page url, href) pairs from ANCHOR tags only — ``<link>`` hrefs
    (stylesheets, canonical, favicons) are navigation metadata, not
    outlinks, and would pollute the link graph's authority signal and
    burn frontier politeness slots.

    Columnar: ``regexp_extract_all`` runs in the JVM; one output row per
    href; tag name matched case-insensitively.  Relative links are kept
    verbatim (callers can resolve against ``src`` if needed);
    fragment-only links never match.
    """
    return df.select(
        F.col(url_col).alias("src"),
        F.explode(F.regexp_extract_all(
            F.col(html_col), F.lit(HREF_RE), 1)).alias("dst"),
    )


def host_edges(links: DataFrame) -> DataFrame:
    """(src, dst) url pairs → weighted host multigraph
    (src_host, dst_host, n_links), self-loops dropped (a host linking to
    itself carries no authority signal)."""
    e = links.select(
        url_host(F.col("src")).alias("src_host"),
        url_host(F.col("dst")).alias("dst_host"),
    ).where(F.col("src_host").isNotNull()
            & F.col("dst_host").isNotNull()
            & (F.col("src_host") != F.col("dst_host")))
    return e.groupBy("src_host", "dst_host") \
        .agg(F.count("*").alias("n_links"))


def pagerank(edges: DataFrame, damping: float = 0.85,
             iters: int = 5, node_col_out: str = "host") -> DataFrame:
    """Weighted PageRank over (src_host, dst_host, n_links) edges.

    Exact fixed-iteration form (the driver-gate oracle unrolls the same
    ``iters`` steps in SQL):

        r'(v) = (1-d)/N + d * ( Σ_{u→v} r(u)·w(u,v)/deg(u)
                                + Σ_{dangling u} r(u)/N )

    deg(u) = Σ_v w(u,v).  One scalar agg (dangling mass) + one slim
    (node, contribution) shuffle per iteration; rank state is a single
    row per node.  ``iters`` is fixed rather than convergence-tested so
    results are deterministic and SQL-twinnable; production callers loop
    to an L1-delta threshold instead.
    """
    spark = edges.sparkSession
    edges = edges.select(
        F.col("src_host").alias("src"),
        F.col("dst_host").alias("dst"),
        F.col("n_links").cast("double").alias("w")).persist()
    deg = edges.groupBy("src").agg(F.sum("w").alias("deg"))
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct().persist())
    n = nodes.count()
    if n == 0:
        edges.unpersist()
        nodes.unpersist()
        return spark.createDataFrame(
            [], f"{node_col_out} string, rank double")
    base = (1.0 - damping) / n

    # (src, dst, w/deg): the per-link share of the source's rank
    shares = (edges.join(deg, "src")
              .select("src", "dst", (F.col("w") / F.col("deg"))
                      .alias("share"))).persist()
    shares.count()
    edges.unpersist()

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).persist()
    sources = shares.select("src").distinct()
    # dangling NODE SET is fixed across iterations (only the mass on it
    # changes): compute it once, and skip the per-iteration scalar agg
    # entirely for graphs without dangling nodes (the common case)
    dangling_nodes = (nodes.join(sources,
                                 nodes["node"] == sources["src"],
                                 "left_anti").persist())
    any_dangling = dangling_nodes.limit(1).count() > 0
    for _ in range(iters):
        dangling = 0.0
        if any_dangling:
            dangling = (ranks.join(dangling_nodes, "node", "left_semi")
                        .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                        .first()[0])
        contribs = (shares.join(ranks, shares["src"] == ranks["node"])
                    .groupBy("dst")
                    .agg(F.sum(F.col("rank") * F.col("share"))
                         .alias("contrib")))
        new_ranks = (nodes.join(contribs,
                                nodes["node"] == contribs["dst"], "left")
                     .select(
                         "node",
                         (F.lit(base)
                          + F.lit(damping)
                          * (F.coalesce(F.col("contrib"), F.lit(0.0))
                             + F.lit(dangling / n))).alias("rank"))
                     # localCheckpoint, not persist: truncates the
                     # per-iteration plan (linear growth here, but the
                     # same AQE plan-string cost hits() documents)
                     .localCheckpoint(eager=True))
        ranks.unpersist()
        ranks = new_ranks

    out = ranks.select(F.col("node").alias(node_col_out), "rank")
    shares.unpersist()
    nodes.unpersist()
    dangling_nodes.unpersist()
    return out


def hits(edges: DataFrame, iters: int = 5,
         node_col_out: str = "host") -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the weighted host
    multigraph (src_host, dst_host, n_links) — the complementary
    authority signal to ``pagerank`` (good hubs find good content;
    good authorities deserve crawl priority).

    Fixed-iteration, L1-normalized form (each vector divided by its
    SUM rather than the classical L2 norm — identical ranking, and
    the SQL oracle can replay the arithmetic without sqrt):

        auth'(v) = Σ_{u→v} w(u,v) · hub(u)     then auth' /= Σ auth'
        hub'(u)  = Σ_{u→v} w(u,v) · auth'(v)   then hub'  /= Σ hub'

    Scale shape mirrors ``pagerank``: per iteration two slim
    (node, score) shuffles plus two scalar norm aggs; state is one
    row per node, starting from uniform hub = 1/N.  Each half-step is
    ``localCheckpoint``-ed — hits alternates TWO mutually-recursive
    join+agg layers per iteration (vs pagerank's one), and without
    truncation the nested adaptive plans make plan-string generation
    (emitted with every execution event) super-linear in iteration
    count; checkpointing keeps the per-step plan O(1) like the BPE
    trainer's round loop.
    """
    spark = edges.sparkSession
    e = edges.select(F.col("src_host").alias("src"),
                     F.col("dst_host").alias("dst"),
                     F.col("n_links").cast("double").alias("w")) \
        .persist()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        e.unpersist()
        return spark.createDataFrame(
            [], f"{node_col_out} string, hub double, auth double")

    hub = nodes.select("node", F.lit(1.0 / n).alias("hub")) \
        .localCheckpoint(eager=True)
    auth = hub.select("node", F.lit(0.0).alias("auth"))
    for _ in range(iters):
        raw_a = (e.join(hub, e["src"] == hub["node"])
                 .groupBy("dst")
                 .agg(F.sum(F.col("w") * F.col("hub")).alias("s")))
        auth_un = (nodes.join(raw_a, nodes["node"] == raw_a["dst"],
                              "left")
                   .select("node",
                           F.coalesce(F.col("s"), F.lit(0.0))
                           .alias("s"))
                   .localCheckpoint(eager=True))
        tot_a = auth_un.agg(F.sum("s")).first()[0]
        auth = auth_un.select(
            "node",
            (F.col("s") / F.lit(tot_a if tot_a else 1.0)).alias("auth"))
        raw_h = (e.join(auth, e["dst"] == auth["node"])
                 .groupBy("src")
                 .agg(F.sum(F.col("w") * F.col("auth")).alias("s")))
        hub_un = (nodes.join(raw_h, nodes["node"] == raw_h["src"],
                             "left")
                  .select("node",
                          F.coalesce(F.col("s"), F.lit(0.0))
                          .alias("s"))
                  .localCheckpoint(eager=True))
        tot_h = hub_un.agg(F.sum("s")).first()[0]
        hub = hub_un.select(
            "node",
            (F.col("s") / F.lit(tot_h if tot_h else 1.0)).alias("hub"))

    out = (hub.join(auth, "node")
           .select(F.col("node").alias(node_col_out), "hub", "auth"))
    e.unpersist()
    return out


# backreference covers both quote styles, matching HREF_RE's behavior
ANCHOR_RE = (r"(?is)<a\b[^>]*href\s*=\s*([\"'])([^\"'#][^\"']*)\1"
             r"[^>]*>(.*?)</a>")


def extract_links_with_text(df: DataFrame, url_col: str = "url",
                            html_col: str = "html_text") -> DataFrame:
    """(src, dst, anchor) triples — like ``extract_links`` but keeping
    the anchor's inner text (tags stripped, entities left as-is,
    whitespace collapsed).  Anchor text is the classic inlink
    description signal: search indexing, label propagation, and
    link-context training data all aggregate it per target.

    Columnar: two regexp_extract_all passes over the same pattern
    (href group, text group) zipped positionally — no Python."""
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 2)
    texts = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 3)
    pairs = F.zip_with(hrefs, texts,
                       lambda h, t: F.struct(h.alias("dst"),
                                             t.alias("raw")))
    out = df.select(F.col(url_col).alias("src"),
                    F.explode(pairs).alias("p"))
    anchor = F.btrim(F.regexp_replace(F.regexp_replace(
        F.col("p.raw"), r"(?s)<[^>]*>", " "), r"\s+", " "))
    return out.select("src", F.col("p.dst").alias("dst"),
                      anchor.alias("anchor"))


def anchor_text_index(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html_text",
                      top_k: int = 3) -> DataFrame:
    """Per-target inlink anchor index: (dst, n_inlinks,
    n_distinct_anchors, top_anchors array) — aggregated over every
    page's outlinks, self-links excluded, empty anchors dropped.

    Scale shape: one shuffle on (dst, anchor) for the phrase counts,
    one on dst for the rollup; anchor strings are short, rows slim.
    Top-k per target via a count-desc window (deterministic
    lexicographic tie-break)."""
    from pyspark.sql import Window

    links = (extract_links_with_text(pages, url_col, html_col)
             .where((F.col("anchor") != "")
                    & (F.col("src") != F.col("dst"))))
    counts = (links.groupBy("dst", "anchor")
              .agg(F.count("*").alias("n")))
    w = Window.partitionBy("dst").orderBy(F.desc("n"), "anchor")
    top = (counts.withColumn("__rk", F.row_number().over(w))
           .where(F.col("__rk") <= top_k)
           .groupBy("dst")
           .agg(F.array_sort(F.collect_list(
                F.struct("__rk", "anchor"))).alias("__t"))
           .select("dst", F.transform("__t", lambda s: s["anchor"])
                   .alias("top_anchors")))
    roll = (links.groupBy("dst")
            .agg(F.count("*").alias("n_inlinks"),
                 F.count_distinct("anchor").alias("n_distinct_anchors")))
    return roll.join(top, "dst")
