"""Benchmark decontamination: flag corpus documents that share word
n-grams with an evaluation set (the GPT-3 appendix-C recipe — 13-gram
collision screening — applied Spark-first).

Scale shape: the benchmark side is small (eval suites are thousands of
documents), so its distinct gram hashes broadcast; the corpus side is a
map-only explode into 8-byte gram hashes joined against that broadcast —
NO corpus shuffle.  The only aggregation is the per-doc hit count, which
shuffles (doc, gram_hash) pairs for contaminated docs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles


def _gram_hashes(df: DataFrame, id_col: str | None, text_col: str,
                 n: int) -> DataFrame:
    grams = F.explode(word_shingles(F.col(text_col), n)).alias("__gram")
    cols = ([F.col(id_col).alias("__doc"), grams]
            if id_col is not None else [grams])
    return df.select(*cols).withColumn("__gh", F.xxhash64("__gram")) \
        .drop("__gram")


def ngram_contamination(corpus: DataFrame, benchmark: DataFrame,
                        id_col: str, text_col: str,
                        bench_text_col: str = "text",
                        n: int = 13) -> DataFrame:
    """→ (doc, n_contaminated_grams) for corpus docs sharing ≥1 word
    n-gram with the benchmark.

    ``n=13`` is the published decontamination choice for web-scale
    pretraining; lower it for short benchmark items.  Gram identity is
    xxhash64 of the lowercased word n-gram (collision odds at 64 bits
    are negligible against eval-suite sizes).
    """
    bench = _gram_hashes(benchmark, None, bench_text_col, n) \
        .select("__gh").distinct()
    grams = _gram_hashes(corpus, id_col, text_col, n)
    hits = grams.join(F.broadcast(bench), "__gh")
    return (hits.groupBy("__doc")
            .agg(F.count_distinct("__gh").alias("n_contaminated_grams"))
            .withColumnRenamed("__doc", id_col))


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  id_col: str, text_col: str,
                  bench_text_col: str = "text", n: int = 13,
                  min_hits: int = 1) -> DataFrame:
    """Corpus minus contaminated docs (≥ ``min_hits`` shared n-grams)."""
    bad = ngram_contamination(corpus, benchmark, id_col, text_col,
                              bench_text_col, n) \
        .where(F.col("n_contaminated_grams") >= min_hits) \
        .select(id_col)
    return corpus.join(bad, id_col, "left_anti")
