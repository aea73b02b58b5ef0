"""BM25 full-text retrieval over the corpus — inverted index build +
query scoring.

Why it belongs in a training-data engine: corpus-scale retrieval is the
workhorse behind several curation stages that pure filtering can't do —
nearest-benchmark probes ("which training docs answer eval questions
almost verbatim"), targeted quality audits ("pull the top docs for
medical queries"), and retrieval-based data selection.  The reference
service is per-document and has no search stage; this is part of the
web-scale surface layered on top (SURVEY §2 "beyond the reference").

Scale shape:

- the inverted index is ONE shuffle: explode(tokens) → groupBy
  (term, doc_id) with map-side partial aggregation; postings rows are
  slim (term, doc_id, tf, dl) tuples — the doc length rides along
  from the same scan, so scoring never rejoins a corpus-sized table;
- queries are broadcast (a query workload is KB-sized next to a corpus);
  every join in the scoring path is a broadcast join on ``term``; the
  only other corpus touch is the scalar (N, Σdl) reduction;
- document frequencies are computed from the postings restricted to
  query terms (semi-join first), never over the full vocabulary;
- corpus-level scalars (N, total token length) reduce to one row and
  are attached with a scalar crossJoin (broadcast, no driver loop).

Determinism (driver-gate contract): per (query, doc, term)
contributions are quantized to micro-units (BIGINT) BEFORE the
cross-row sum, so the final score is an exact integer sum — immune to
float reassociation across partitionings — and DuckDB can replay it
value-for-value.  Ranking ties break on doc_id.

Tokenization is the corpus-wide convention (lowercased ``\\s+`` split,
empty tokens dropped) shared with the dedup/shingle/DSIR stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import lower_tokens as _tokens

SCORE_SCALE = 1_000_000      # micro-unit quantization for contributions


def build_postings(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Inverted index: one (term, doc_id, tf) row per distinct term per
    document, carrying the document's token length ``dl`` (computed in
    the SAME scan, so the scoring path never has to rejoin a separate
    corpus-sized lengths table).  One shuffle (map-side combined
    groupBy)."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       _tokens(F.col(text_col)).alias("__toks"))
    return (toks
            .select("doc_id",
                    F.size("__toks").cast("long").alias("dl"),
                    F.explode("__toks").alias("term"))
            .groupBy("term", "doc_id")
            .agg(F.count("*").alias("tf"),
                 F.first("dl").alias("dl")))


def doc_lengths(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, dl): token count per document (empties excluded) —
    map-only."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_tokens(F.col(text_col))).cast("long").alias("dl"))


def bm25_topk(docs: DataFrame, queries: DataFrame, *,
              id_col: str = "doc_id", text_col: str = "text",
              query_id_col: str = "query_id",
              query_text_col: str = "query_text",
              k1: float = 1.2, b: float = 0.75,
              top_k: int = 10) -> DataFrame:
    """Top-``top_k`` documents per query under BM25.

    Lucene-shaped formulation (idf is always positive):

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        norm(t) = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
        score   = Σ_{distinct query terms} idf·norm

    Query terms are deduplicated (classic BM25 ignores query-side term
    multiplicity).  Returns (query_id, rank, doc_id, score_micro) where
    score_micro is the exact BIGINT sum of per-term micro-quantized
    contributions; rank ties break on doc_id ascending.
    """
    postings = build_postings(docs, id_col, text_col)

    qterms = (queries
              .select(F.col(query_id_col).alias("query_id"),
                      F.explode(F.array_distinct(
                          _tokens(F.col(query_text_col)))).alias("term")))

    # corpus scalars: N and avgdl (exact long sum / long count → double)
    stats = doc_lengths(docs, id_col, text_col).agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl"))

    # restrict postings to query terms before computing df — work is
    # proportional to the matched postings, not the vocabulary; dl
    # rides along in the postings rows, so no corpus-sized rejoin.
    # df comes from a count over Window.partitionBy(term) on the SAME
    # frame: a separate groupBy+join would make `matched` (and the
    # whole postings build under it) execute twice — Spark does not
    # reuse uncached subtrees — i.e. two full corpus index builds.
    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term")
    matched = matched.withColumn(
        "df", F.count("*").over(Window.partitionBy("term")))

    hits = (matched
            .join(F.broadcast(qterms), "term")
            .crossJoin(F.broadcast(stats)))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    norm = (F.col("tf") * F.lit(k1 + 1.0)
            / (F.col("tf")
               + F.lit(k1) * (F.lit(1.0 - b)
                              + F.lit(b) * F.col("dl") / avgdl)))
    contrib = F.round(idf * norm * F.lit(float(SCORE_SCALE)), 0) \
        .cast("long")

    scored = (hits
              .select("query_id", "doc_id", contrib.alias("c"))
              .groupBy("query_id", "doc_id")
              .agg(F.sum("c").alias("score_micro")))

    w = Window.partitionBy("query_id") \
        .orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_k)
            .select("query_id", "rank", "doc_id", "score_micro"))
