"""jusText-style main-content extraction (Pomikálek 2011).

The published paragraph-classification algorithm used by corpus
builders to strip web boilerplate before training-data curation: pages
split into block-level paragraphs, each scored on length, stopword
density, and link density, classified context-free into good / bad /
short / near-good, then revised context-sensitively from the nearest
good/bad neighbours.  The reference engine has no counterpart (its
HTML path keeps full page text); this operator exists for the
training-data pipeline tier, next to the C4/Gopher rule sets in
``textstats.py``.

Everything is native columnar Spark — regexp splits, higher-order
array functions, and two window passes; no Python in the hot path, so
the plan stays in whole-stage codegen and scales to a full crawl.  At
100 TB the only exchange is the per-document window (partitioned by
the document id, which the extraction output is already bucketed by).

Deviations from the reference implementation, stated honestly:
- paragraph segmentation is a block-tag regex over the raw HTML, not
  a DOM walk (no lxml in this environment); <script>/<style> blocks
  are removed first;
- the stopword list is the engine's embedded ``STOPWORDS_EN`` (the
  original ships large per-language lists) — callers may pass any
  list;
- heading-specific handling (``MAX_HEADING_DISTANCE``) is out of
  scope: headings classify through the same paragraph rules.

Thresholds are the jusText defaults: LENGTH_LOW=70, LENGTH_HIGH=200,
STOPWORDS_LOW=0.30, STOPWORDS_HIGH=0.32, MAX_LINK_DENSITY=0.2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import STOPWORDS_EN

LENGTH_LOW = 70
LENGTH_HIGH = 200
STOPWORDS_LOW = 0.30
STOPWORDS_HIGH = 0.32
MAX_LINK_DENSITY = 0.2

# block-level boundaries (opening OR closing tag starts a new segment)
_BLOCK_RE = (r"(?is)<(?:p|div|h[1-6]|li|t[dh]|tr|blockquote|pre|"
             r"section|article|br\s*/?)(?:\s[^>]*)?>"
             r"|</(?:p|div|h[1-6]|li|t[dh]|tr|blockquote|pre|"
             r"section|article)>")
# no backreference: the oracle twin replays this in RE2 (DuckDB)
_SCRIPT_RE = (r"(?is)<script(?:\s[^>]*)?>.*?</script\s*>"
              r"|<style(?:\s[^>]*)?>.*?</style\s*>")
_ANCHOR_RE = r"(?is)<a(?:\s[^>]*)?>(.*?)</a>"
_TAG_RE = r"(?s)<[^>]*>"


def _clean(col: Column) -> Column:
    """Strip tags and collapse whitespace (applied identically to
    paragraph text and anchor text so link density is consistent)."""
    return F.trim(F.regexp_replace(
        F.regexp_replace(col, _TAG_RE, " "), r"\s+", " "))


def justext_classify(df: DataFrame, html_col: str = "html",
                     id_col: str = "doc_id",
                     stopwords: tuple = STOPWORDS_EN) -> DataFrame:
    """Paragraph table with context-free and final jusText classes.

    Output: (id, para_idx, text, length, link_density,
    stopword_density, cf_class, class) — one row per NON-EMPTY
    paragraph, ``para_idx`` the paragraph's position in the original
    segmentation (order-preserving across the empty-segment drop).
    """
    stops = F.array(*[F.lit(w) for w in stopwords])
    no_script = F.regexp_replace(F.col(html_col), _SCRIPT_RE, " ")
    segs = F.split(no_script, _BLOCK_RE)

    p = (df
         .select(F.col(id_col).alias("id"),
                 F.posexplode(segs).alias("para_idx", "raw"))
         .withColumn("text", _clean(F.col("raw")))
         .withColumn("length", F.length("text"))
         .where(F.col("length") > 0)
         .withColumn("link_chars", F.aggregate(
             F.transform(
                 F.regexp_extract_all("raw", F.lit(_ANCHOR_RE), 1),
                 lambda a: F.length(_clean(a))),
             F.lit(0), lambda acc, x: acc + x))
         .withColumn("words", F.filter(
             F.split(F.lower(F.col("text")), r"\s+"),
             lambda w: F.length(w) > 0))
         .withColumn("stopword_density", F.when(
             F.size("words") > 0,
             F.size(F.filter(F.col("words"),
                             lambda w: F.array_contains(stops, w)))
             / F.size("words")).otherwise(F.lit(0.0)))
         .withColumn("link_density",
                     F.col("link_chars") / F.col("length"))
         .drop("raw", "words"))

    cf = (F.when(F.col("link_density") > MAX_LINK_DENSITY, "bad")
          .when(F.col("text").contains("©")
                | F.col("text").contains("&copy;"), "bad")
          .when(F.col("length") < LENGTH_LOW,
                F.when(F.col("link_chars") > 0, "bad").otherwise("short"))
          .when(F.col("stopword_density") >= STOPWORDS_HIGH,
                F.when(F.col("length") > LENGTH_HIGH, "good")
                .otherwise("neargood"))
          .when(F.col("stopword_density") >= STOPWORDS_LOW, "neargood")
          .otherwise("bad"))
    p = p.withColumn("cf_class", cf)

    # context-sensitive revision: nearest good/bad neighbour on each
    # side (document edges count as 'bad'), plus whether a near-good
    # paragraph sits between this one and that bad neighbour
    gb = F.when(F.col("cf_class").isin("good", "bad"), F.col("cf_class"))
    gbn = F.when(F.col("cf_class").isin("good", "bad", "neargood"),
                 F.col("cf_class"))
    wp = (Window.partitionBy("id").orderBy("para_idx")
          .rowsBetween(Window.unboundedPreceding, -1))
    wn = (Window.partitionBy("id").orderBy("para_idx")
          .rowsBetween(1, Window.unboundedFollowing))
    p = (p
         .withColumn("prev_gb",
                     F.coalesce(F.last(gb, ignorenulls=True).over(wp),
                                F.lit("bad")))
         .withColumn("next_gb",
                     F.coalesce(F.first(gb, ignorenulls=True).over(wn),
                                F.lit("bad")))
         .withColumn("prev_gbn",
                     F.coalesce(F.last(gbn, ignorenulls=True).over(wp),
                                F.lit("bad")))
         .withColumn("next_gbn",
                     F.coalesce(F.first(gbn, ignorenulls=True).over(wn),
                                F.lit("bad"))))

    short_cls = (
        F.when((F.col("prev_gb") == "good")
               & (F.col("next_gb") == "good"), "good")
        .when((F.col("prev_gb") == "bad")
              & (F.col("next_gb") == "bad"), "bad")
        .when(((F.col("prev_gb") == "bad")
               & (F.col("prev_gbn") == "neargood"))
              | ((F.col("next_gb") == "bad")
                 & (F.col("next_gbn") == "neargood")), "good")
        .otherwise("bad"))
    neargood_cls = F.when((F.col("prev_gb") == "bad")
                          & (F.col("next_gb") == "bad"),
                          "bad").otherwise("good")
    final = (F.when(F.col("cf_class").isin("good", "bad"),
                    F.col("cf_class"))
             .when(F.col("cf_class") == "short", short_cls)
             .otherwise(neargood_cls))
    return (p.withColumn("class", final)
            .select("id", "para_idx", "text", "length", "link_density",
                    "stopword_density", "cf_class", "class"))


def justext_extract(df: DataFrame, html_col: str = "html",
                    id_col: str = "doc_id",
                    stopwords: tuple = STOPWORDS_EN) -> DataFrame:
    """Per-document main text: final-good paragraphs joined in
    order with blank lines, plus the class tally.  One groupBy on the
    document id — the array_sort(collect_list(struct)) idiom keeps
    paragraph order without a second window exchange."""
    paras = justext_classify(df, html_col, id_col, stopwords)
    good = F.when(F.col("class") == "good",
                  F.struct("para_idx", "text"))
    return (paras.groupBy("id")
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(good)),
                         lambda s: s.getField("text")),
                     "\n\n").alias("main_text"),
                 F.count("*").alias("n_paragraphs"),
                 F.sum(F.when(F.col("class") == "good", 1)
                       .otherwise(0)).cast("long").alias("n_good"),
                 F.sum(F.when(F.col("class") == "bad", 1)
                       .otherwise(0)).cast("long").alias("n_bad")))
