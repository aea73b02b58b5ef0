"""Exact substring (k-gram span) deduplication.

The ExactSubstr pass of Lee et al., "Deduplicating Training Data Makes
Language Models Better" (2022): any token span of length ≥ k that occurs
more than once in the corpus is removed from every document.  The paper
builds a suffix array on one machine; the distributed restatement is the
standard k-gram formulation — a span is duplicated iff every k-gram in
it is duplicated, so removing tokens covered by a duplicated k-gram
removes exactly the ≥k-token duplicated spans.

Scale shape (all columnar, no Python):

- tokenize: one ``posexplode`` of the regexp split;
- k-grams: ONE window (rowsBetween(0, k-1) over pos per doc) — no
  self-join of the token table;
- duplicated-gram set: groupBy on a 16-byte gram hash with map-side
  partial counts — the only corpus-wide shuffle, and it carries hashes,
  not text;
- coverage: duplicated gram starts explode to ≤ k positions each and
  anti-join the token table on (doc, pos);
- reassembly: sort_array(collect_list(...)) per doc — same ordered-agg
  pattern as the PDF page concat.

Output text is token-normalized (single-space joined): the unit of
dedup is the token stream, which is what the downstream tokenizer sees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, pos, tok) for non-empty docs."""
    nonempty = docs.where(
        F.col(text_col).isNotNull()
        & (F.length(F.trim(F.col(text_col))) > 0))
    return nonempty.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.trim(F.col(text_col)), TOKEN_SPLIT_RE))
         .alias("pos", "tok"))


def dedup_exact_substrings(docs: DataFrame, *, k: int = 20,
                           min_count: int = 2,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Remove every token covered by a k-gram occurring ≥ ``min_count``
    times corpus-wide (within-doc repeats count, as in the paper).

    Returns (``id_col``, clean_text, n_tokens, n_removed); docs with
    null/blank text keep a null clean_text and zero counts.
    """
    # NOT cached: the token table is a multiple of the corpus size, so
    # at 100 TB recomputing the columnar split per consumer is cheaper
    # than materializing it — the three consumers each re-scan parquet
    toks = _tokens(docs, id_col, text_col)

    w = Window.partitionBy("doc").orderBy("pos").rowsBetween(0, k - 1)
    grams = (toks
             .withColumn("_window", F.collect_list("tok").over(w))
             .where(F.size("_window") == k)
             .select("doc", "pos",
                     F.unhex(F.md5(F.concat_ws("\x1f", "_window")))
                      .alias("gh")))

    dup = (grams.groupBy("gh").agg(F.count("*").alias("c"))
           .where(F.col("c") >= min_count)
           .select("gh"))

    # covered token positions: every duplicated gram start covers k slots
    covered = (grams.join(dup, "gh")
               .select("doc",
                       F.explode(F.sequence(
                           F.col("pos"), F.col("pos") + (k - 1)))
                        .alias("pos"))
               .distinct())

    kept = toks.join(covered, ["doc", "pos"], "left_anti")
    rebuilt = (kept.groupBy("doc")
               .agg(F.concat_ws(
                        " ",
                        F.transform(
                            F.sort_array(F.collect_list(
                                F.struct("pos", "tok"))),
                            lambda s: s.getField("tok"))).alias("clean_text"),
                    F.count("*").alias("n_kept")))
    totals = toks.groupBy("doc").agg(F.count("*").alias("n_tokens"))

    out = (docs.select(F.col(id_col))
           .join(totals, F.col(id_col) == totals["doc"], "left")
           .drop("doc")
           .join(rebuilt, F.col(id_col) == rebuilt["doc"], "left")
           .drop("doc")
           .select(
               id_col,
               # fully-deduplicated docs have no kept rows: '' not null
               # (null stays reserved for docs with no text at all)
               F.when(F.col("n_tokens").isNull(),
                      F.lit(None).cast("string"))
                .otherwise(F.coalesce("clean_text", F.lit("")))
                .alias("clean_text"),
               F.coalesce("n_tokens", F.lit(0)).cast("long")
                .alias("n_tokens"),
               (F.coalesce("n_tokens", F.lit(0))
                - F.coalesce("n_kept", F.lit(0))).cast("long")
                .alias("n_removed")))
    return out
