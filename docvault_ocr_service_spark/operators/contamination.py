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


def fuzzy_contamination(corpus: DataFrame, benchmark: DataFrame,
                        id_col: str, text_col: str,
                        bench_id_col: str = "bench_id",
                        bench_text_col: str = "text",
                        num_perm: int = 64, bands: int = 16,
                        shingle_n: int = 3,
                        min_jaccard: float = 0.8) -> DataFrame:
    """→ (doc, bench_id, est_jaccard) for corpus docs NEAR-duplicating
    a benchmark item — the fuzzy sibling of the 13-gram screen: exact
    n-gram collision misses lightly paraphrased/reformatted eval items
    (whitespace, punctuation, field reordering), MinHash similarity
    does not.

    Scale shape: both sides get MinHash signatures (one vectorized pass
    each); the benchmark's banded keys are TINY (eval suites are
    thousands of rows × bands) and broadcast, so the corpus side stays
    map-only until the per-candidate-pair signature compare — no
    corpus self-join, no corpus shuffle beyond the candidate set.
    """
    from .dedup import (minhash_band_keys, minhash_signatures,
                        _est_jaccard)

    for df_, col_ in ((corpus, id_col), (benchmark, bench_id_col)):
        t = dict(df_.dtypes)[col_]
        if t not in ("tinyint", "smallint", "int", "bigint", "long"):
            # the signature kernel casts ids to long; a url id would
            # silently null out and drop every row — fail loudly
            raise ValueError(
                f"fuzzy_contamination needs numeric ids "
                f"(got {col_}: {t}); derive one first, e.g. "
                f"xxhash64(url)")
    from pyspark import StorageLevel

    from .dedup import _MAX_HASH

    # texts shorter than shingle_n words get the all-_MAX_HASH sentinel
    # signature; two sentinels band-collide everywhere and would score
    # est_jaccard 1.0 between unrelated short texts — exclude them on
    # both sides (a <3-word doc cannot meaningfully contaminate)
    not_sentinel = F.element_at("signature", 1) != F.lit(int(_MAX_HASH))
    c_sig = minhash_signatures(corpus, id_col, text_col,
                               num_perm, shingle_n) \
        .where(not_sentinel).persist(StorageLevel.MEMORY_AND_DISK)
    b_sig = minhash_signatures(benchmark, bench_id_col, bench_text_col,
                               num_perm, shingle_n).where(not_sentinel)
    c_keys = minhash_band_keys(c_sig, num_perm, bands)
    b_keys = minhash_band_keys(b_sig, num_perm, bands) \
        .withColumnRenamed("doc", "__bench")
    cand = (c_keys.join(F.broadcast(b_keys), ["band", "band_hash"])
            .select("doc", "__bench").distinct())
    scored = (cand
              .join(c_sig.withColumnRenamed("signature", "sig_a"), "doc")
              .join(b_sig.select(F.col("doc").alias("__bench"),
                                 F.col("signature").alias("sig_b")),
                    "__bench")
              .withColumn("est_jaccard", _est_jaccard(num_perm))
              .where(F.col("est_jaccard") >= min_jaccard))
    out = scored.select(F.col("doc").alias(id_col),
                        F.col("__bench").alias(bench_id_col),
                        F.round("est_jaccard", 6).alias("est_jaccard"))
    # the hit set is small by contract (near-dupes of a broadcast-sized
    # benchmark), so materialize it eagerly and release the cached
    # corpus signatures — otherwise repeated calls in one session pin
    # MEMORY_AND_DISK partitions for the session lifetime
    out = out.localCheckpoint(eager=True)
    c_sig.unpersist(blocking=False)
    return out


def decontaminate_fuzzy(corpus: DataFrame, benchmark: DataFrame,
                        id_col: str, text_col: str,
                        bench_id_col: str = "bench_id",
                        bench_text_col: str = "text",
                        min_jaccard: float = 0.8) -> DataFrame:
    """Corpus minus near-duplicates of benchmark items."""
    bad = fuzzy_contamination(
        corpus, benchmark, id_col, text_col, bench_id_col,
        bench_text_col, min_jaccard=min_jaccard) \
        .select(F.col(id_col)).distinct()
    return corpus.join(bad, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Bloom-filter screen — memory-bounded contamination pre-filter
# ---------------------------------------------------------------------------

def bloom_positions(benchmark: DataFrame, bench_text_col: str = "text",
                    n: int = 13, hex_chars: int = 5,
                    k: int = 3) -> DataFrame:
    """The Bloom filter's set-bit table: one row per DISTINCT position
    touched by any benchmark n-gram under ``k`` salted hashes.

    Positions are md5 hex prefixes (``hex_chars`` chars → a
    16^hex_chars-slot bit space), so the table is bounded by the bit
    space REGARDLESS of benchmark size — that is the point of the
    Bloom screen over the exact broadcast of ``ngram_contamination``:
    a 16^5 = 1M-slot filter stays ~30 MB as a position table even for
    an eval corpus whose distinct 13-gram set would not broadcast.
    md5-prefix hashing is bit-identical across engines (the same
    scheme as functions/dsir.py), so a SQL twin can rebuild the exact
    filter, false positives included.
    """
    grams = _bench_grams(benchmark, bench_text_col, n)
    return _positions_from_grams(grams, hex_chars, k)


def _bench_grams(benchmark: DataFrame, bench_text_col: str,
                 n: int) -> DataFrame:
    """The benchmark's distinct n-gram set — the single source both
    the position table and the exact-verify side derive from."""
    return benchmark.select(
        F.explode(word_shingles(F.col(bench_text_col), n))
        .alias("__gram")).distinct()


def _positions_from_grams(grams: DataFrame, hex_chars: int,
                          k: int) -> DataFrame:
    salted = grams.select(F.explode(F.array(
        *[F.substring(F.md5(F.concat(F.col("__gram"), F.lit(f"#{i}"))),
                      1, hex_chars) for i in range(k)])).alias("pos"))
    return salted.distinct()


def bloom_contamination(corpus: DataFrame, benchmark: DataFrame,
                        id_col: str, text_col: str,
                        bench_text_col: str = "text",
                        n: int = 13, hex_chars: int = 5,
                        k: int = 3) -> DataFrame:
    """Two-phase screen-then-verify decontamination:

    1. **Screen** (Bloom): a corpus n-gram is *flagged* iff all ``k``
       of its salted md5-prefix positions are set in the benchmark's
       filter.  Implemented as ``k`` successive broadcast semi-joins
       against the position table — the corpus side stays MAP-ONLY
       (no corpus-scale shuffle; each join prunes further, so join 2
       sees only join 1's survivors).  False positives are possible
       (that is the Bloom trade-off), false negatives are not.
    2. **Verify** (exact): flagged grams — a tiny slice by contract —
       join the benchmark's true distinct gram set to split true hits
       from filter noise.

    Returns (id_col, n_flagged_grams, n_exact_grams) per corpus doc
    with ≥1 flagged gram: ``n_exact_grams`` ≤ ``n_flagged_grams``;
    rows with ``n_exact_grams = 0`` are pure false positives (the
    observable FP rate of the chosen ``hex_chars``/``k``).  Both
    counts are deterministic — the filter's bit layout is a pure
    function of the benchmark text.
    """
    # one benchmark scan: the distinct gram set is materialized once
    # (bench-bounded by contract) and feeds BOTH the position table
    # and the exact-verify join.  Lazy checkpoint: the first consumer
    # (the screen's broadcast build) materializes it — no standalone
    # upfront job
    bench_grams = _bench_grams(benchmark, bench_text_col, n) \
        .localCheckpoint(eager=False)
    positions = _positions_from_grams(bench_grams, hex_chars, k)

    g = corpus.select(
        F.col(id_col).alias("__doc"),
        F.explode(word_shingles(F.col(text_col), n)).alias("__gram"))
    for i in range(k):
        pos_i = F.substring(
            F.md5(F.concat(F.col("__gram"), F.lit(f"#{i}"))),
            1, hex_chars)
        g = g.join(F.broadcast(positions),
                   pos_i == positions["pos"], "left_semi")

    verified = g.join(bench_grams.withColumn("__exact", F.lit(1)),
                      "__gram", "left")
    return (verified
            .groupBy("__doc")
            .agg(F.count("*").cast("long").alias("n_flagged_grams"),
                 F.coalesce(F.sum("__exact"), F.lit(0)).cast("long")
                 .alias("n_exact_grams"))
            .withColumnRenamed("__doc", id_col))
