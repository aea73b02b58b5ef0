"""Bigram collocation mining (pointwise mutual information) — corpus
vocabulary analytics.

Why it belongs in a training-data engine: collocation tables are the
standard corpus-diagnostics artifact (tokenizer-vocabulary candidates,
boilerplate-phrase discovery, domain drift between crawl snapshots —
"which word pairs are glued together in THIS corpus").  The reference
service is per-document; this is part of the corpus-analytics surface
layered on top (SURVEY §2 "beyond the reference").

Scale shape: two aggregations (unigram counts, bigram counts — both
map-side combined) + two joins of the bigram table against the
unigram table on a single word key.  Every shuffled row is a slim
(word, count) or (w1, w2, count) tuple; the ``min_count`` filter is
applied BEFORE the joins so the join input is the candidate set, not
the full bigram universe.  Global top-k goes through orderBy+limit
(Spark's distributed TakeOrdered — no single-partition window).

Determinism: PMI is evaluated as ONE fixed expression over exact
integer counts

    pmi = ln( (c_xy · T1 · T1) / (T2 · c_x · c_y) )     [doubles]

then quantized to micro-units; ordering uses the quantized value with
(w1, w2) tie-breaks, so a SQL replay selects the identical top-k.
(The products are formed in doubles — exact for counts below 2^53,
which covers any corpus this engine will see; the log argument is a
ratio near 1e-6..1e6, far from double range limits.)

Tokenization is the corpus-wide convention (lowercased ``\\s+`` split,
empty tokens dropped) shared with the dedup/shingle/DSIR/BM25 stack.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import lower_tokens as _tokens

PMI_SCALE = 1_000_000


def bigram_pmi(docs: DataFrame, text_col: str = "text", *,
               min_count: int = 5, top_k: int = 50) -> DataFrame:
    """Top-``top_k`` adjacent-word collocations by PMI, among bigrams
    occurring at least ``min_count`` times corpus-wide.

    Returns (w1, w2, pair_count, pmi_micro) ordered by
    (pmi_micro desc, w1, w2).  Bigrams never cross document
    boundaries.
    """
    toks = docs.select(_tokens(F.col(text_col)).alias("toks"))

    # the unigram table is consumed three times (t1 total + both join
    # sides); Spark re-executes uncached subtrees per consumer, so
    # cache the vocab-bounded aggregate — the cache is released below
    # after the (≤ top_k-row) result is materialized, following the
    # fuzzy_contamination precedent
    uni = (toks.select(F.explode("toks").alias("w"))
           .groupBy("w").agg(F.count("*").alias("c"))
           .persist())
    # bigrams as explode(positions) + element_at in whole-stage
    # codegen rather than explode(transform(...)): the interpreted
    # per-pair lambda was the dominant per-row cost (same rewrite as
    # the char-trigram pass in functions/ngram_lm.py, r7) — byte-
    # identical "w1 w2" strings
    bi = (toks.where(F.size("toks") >= 2)
          .select("toks", F.explode(F.sequence(
              F.lit(1), F.size("toks") - 1)).alias("__i"))
          .select(F.concat_ws(
              " ", F.element_at("toks", F.col("__i")),
              F.element_at("toks", F.col("__i") + F.lit(1)))
              .alias("p"))
          .groupBy("p").agg(F.count("*").alias("c_xy"))
          .where(F.col("c_xy") >= min_count))

    # totals are sums over the already-aggregated count tables
    t1 = uni.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("t1"))
    t2 = (toks.select((F.greatest(F.size("toks") - 1, F.lit(0)))
                      .cast("long").alias("n"))
          .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("t2")))

    cand = bi.select(
        F.split_part(F.col("p"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("p"), F.lit(" "), F.lit(2)).alias("w2"),
        "c_xy")
    joined = (cand
              .join(uni.withColumnRenamed("w", "w1")
                    .withColumnRenamed("c", "c_x"), "w1")
              .join(uni.withColumnRenamed("w", "w2")
                    .withColumnRenamed("c", "c_y"), "w2")
              .crossJoin(F.broadcast(t1))
              .crossJoin(F.broadcast(t2)))

    pmi = F.log((F.col("c_xy").cast("double") * F.col("t1")
                 * F.col("t1"))
                / (F.col("t2").cast("double") * F.col("c_x")
                   * F.col("c_y")))
    out = (joined
           .select("w1", "w2",
                   F.col("c_xy").alias("pair_count"),
                   F.round(pmi * F.lit(float(PMI_SCALE)), 0)
                   .cast("long").alias("pmi_micro"))
           .orderBy(F.col("pmi_micro").desc(), "w1", "w2")
           .limit(top_k)
           .localCheckpoint(eager=True))
    uni.unpersist(blocking=False)
    return out


def vocab_stats(docs: DataFrame, text_col: str = "text", *,
                zipf_top: int = 1000) -> DataFrame:
    """One-row corpus vocabulary diagnostics:

        (n_tokens, vocab_size, hapax_frac_micro,
         top100_coverage_micro, zipf_slope_micro)

    - hapax fraction: share of vocabulary seen exactly once (the
      classic crawl-health signal — OCR noise and spam inflate it);
    - top-100 coverage: token mass captured by the 100 most frequent
      terms;
    - Zipf slope: least-squares slope of ln(freq) over ln(rank) for
      the ``zipf_top`` most frequent terms (clean natural-language
      corpora sit near −1; templated/spammy corpora flatten).

    Determinism: the regression's cross-row sums are taken over
    PER-TERM micro-quantized longs (exact integer sums), and the
    final slope is one fixed double expression over those five
    integers — partitioning cannot reorder any float accumulation,
    and the SQL twin replays it value-for-value.

    Scale shape: one unigram aggregation (vocab-bounded output), a
    distributed TakeOrdered for the top-``zipf_top`` slice, and
    scalar reductions; the rank window runs on the ≤ ``zipf_top``-row
    slice only.
    """
    toks = docs.select(_tokens(F.col(text_col)).alias("toks"))
    uni = (toks.select(F.explode("toks").alias("w"))
           .groupBy("w").agg(F.count("*").alias("c"))
           .persist())

    totals = uni.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("n_tokens"),
        F.count("*").alias("vocab_size"),
        F.coalesce(F.sum((F.col("c") == 1).cast("long")), F.lit(0))
        .alias("hapax"))

    # ONE TakeOrdered pass feeds both the coverage prefix and the
    # regression slice; the (≤ max(100, zipf_top))-row result is
    # materialized so its two consumers don't re-run the pass
    slice_ = (uni.orderBy(F.col("c").desc(), "w")
              .limit(max(100, zipf_top))
              .localCheckpoint(eager=True))
    top100 = (slice_.orderBy(F.col("c").desc(), "w").limit(100)
              .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("top_c")))

    top = slice_.orderBy(F.col("c").desc(), "w").limit(zipf_top)
    w_rank = Window.orderBy(F.col("c").desc(), "w")
    S = 1_000_000
    ranked = top.withColumn("r", F.row_number().over(w_rank))
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("c").cast("double"))
    q = (ranked.select(
        F.round(x * S, 0).cast("long").alias("xq"),
        F.round(y * S, 0).cast("long").alias("yq"),
        F.round(x * y * S, 0).cast("long").alias("xyq"),
        F.round(x * x * S, 0).cast("long").alias("xxq"))
        .agg(F.count("*").alias("n"), F.sum("xq").alias("sx"),
             F.sum("yq").alias("sy"), F.sum("xyq").alias("sxy"),
             F.sum("xxq").alias("sxx")))

    num = (F.col("n").cast("double") * F.col("sxy") * F.lit(float(S))
           - F.col("sx").cast("double") * F.col("sy"))
    den = (F.col("n").cast("double") * F.col("sxx") * F.lit(float(S))
           - F.col("sx").cast("double") * F.col("sx"))
    slope = F.when(den != 0, num / den).otherwise(F.lit(0.0))

    out = (totals.crossJoin(top100).crossJoin(
        q.select(F.round(slope * S, 0).cast("long")
                 .alias("zipf_slope_micro")))
        .select(
            "n_tokens", "vocab_size",
            F.when(F.col("vocab_size") > 0,
                   F.round(F.col("hapax").cast("double")
                           / F.col("vocab_size") * S, 0).cast("long"))
            .otherwise(F.lit(0).cast("long")).alias("hapax_frac_micro"),
            F.when(F.col("n_tokens") > 0,
                   F.round(F.col("top_c").cast("double")
                           / F.col("n_tokens") * S, 0).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            .alias("top100_coverage_micro"),
            "zipf_slope_micro")
        .localCheckpoint(eager=True))
    uni.unpersist(blocking=False)
    return out


DRIFT_SCALE = 1_000_000_000_000      # per-term KL quantization (1e-12)


def corpus_drift(a: DataFrame, b: DataFrame,
                 text_col: str = "text", *, top_k: int = 5) -> DataFrame:
    """One-row drift diagnostics between two corpus snapshots —
    "did this crawl change, and how":

        (n_terms, kl_ab_micro, kl_ba_micro, rising, falling)

    KL divergences are over add-1-smoothed unigram distributions on
    the union vocabulary (both directions — KL is asymmetric);
    ``rising`` = the ``top_k`` terms most OVER-represented in the new
    snapshot ``b`` relative to ``a`` (growth = ln(q/p) descending),
    ``falling`` = the reverse, comma-joined in rank order.

    Determinism: per-term KL contributions quantize to 1e-12-resolution
    longs before the cross-row sum (KL values are O(1), so the exact
    integer sum fits a long with room to spare); the term lists come
    from TakeOrdered slices sorted via array_sort over structs, never
    from collect_list order.

    Scale shape: one unigram aggregation per side (vocab-bounded),
    one full-outer join of the two count tables on term, scalar
    reductions, and two TakeOrdered slices.
    """
    def counts(df: DataFrame, name: str) -> DataFrame:
        return (df.select(F.explode(
            _tokens(F.col(text_col))).alias("term"))
            .groupBy("term").agg(F.count("*").alias(name)))

    ua = counts(a, "c_a")
    ub = counts(b, "c_b")
    joined = (ua.join(ub, "term", "full_outer")
              .select("term",
                      F.coalesce(F.col("c_a"), F.lit(0)).alias("c_a"),
                      F.coalesce(F.col("c_b"), F.lit(0)).alias("c_b"))
              .persist())

    tot = joined.agg(
        F.count("*").alias("v"),
        F.coalesce(F.sum("c_a"), F.lit(0)).alias("ta"),
        F.coalesce(F.sum("c_b"), F.lit(0)).alias("tb"))

    w = joined.crossJoin(F.broadcast(tot))
    p = (F.col("c_a") + 1).cast("double") / (F.col("ta") + F.col("v"))
    q = (F.col("c_b") + 1).cast("double") / (F.col("tb") + F.col("v"))
    lr = F.log(p / q)
    scored = w.select(
        "term", "c_a", "c_b",
        F.round(p * lr * DRIFT_SCALE, 0).cast("long").alias("kab_q"),
        F.round(q * -lr * DRIFT_SCALE, 0).cast("long").alias("kba_q"),
        F.round(lr * 1e6, 0).cast("long").alias("lr_micro"))

    kl = scored.agg(
        F.count("*").alias("n_terms"),
        F.round(F.coalesce(F.sum("kab_q"), F.lit(0)).cast("double")
                / 1e6, 0).cast("long").alias("kl_ab_micro"),
        F.round(F.coalesce(F.sum("kba_q"), F.lit(0)).cast("double")
                / 1e6, 0).cast("long").alias("kl_ba_micro"))

    def ranked_terms(frame: DataFrame, alias: str) -> DataFrame:
        # the slice is ≤ top_k rows; order is enforced by sorting the
        # collected structs, not by collect order
        return frame.agg(F.array_join(F.transform(
            F.array_sort(F.collect_list(
                F.struct(F.col("__key").alias("k"),
                         F.col("term").alias("term")))),
            lambda x: x["term"]), ",").alias(alias))

    # lr = ln(p/q) is a-heaviness: terms RISING into b have the most
    # NEGATIVE lr, so rising sorts ascending and falling descending
    rising = ranked_terms(
        scored.orderBy(F.col("lr_micro").asc(), "term").limit(top_k)
        .select("term", F.col("lr_micro").alias("__key")), "rising")
    falling = ranked_terms(
        scored.orderBy(F.col("lr_micro").desc(), "term").limit(top_k)
        .select("term", (-F.col("lr_micro")).alias("__key")), "falling")

    out = (kl.crossJoin(rising).crossJoin(falling)
           .localCheckpoint(eager=True))
    joined.unpersist(blocking=False)
    return out
