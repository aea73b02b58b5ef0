"""Training-data curation plan: the full pipeline a 100 TB pretraining
corpus runs after extraction.

    results (done rows) →
      1. quality profile (columnar: tokens, stopword/punct ratios, score)
      2. quality gate (score ≥ min_quality, token bounds)
      3. language filter (marker-vote lang id ∈ allowed)
      4. exact dedup (content-hash groupBy, keep min-url doc)
      5. near dedup (MinHash-LSH; drop the higher-id side of each pair)

    Optional stages: ``gopher_gate=True`` adds the full Gopher A1.1
    rule set to the quality gate (stage 2); ``scrub_pii=True`` redacts
    emails/cards/IPs/phones AFTER dedup (hashes and pair sets are
    computed on raw text) and ships the scrubbed text downstream.

Everything before (5) is shuffle-free column work + one hash groupBy;
(5) adds the banded self-join.  Returns the surviving corpus plus a
per-stage funnel count DataFrame for lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import detect_lang, quality_score, token_count
from ..operators.dedup import minhash_lsh_pairs


def curate_corpus(results: DataFrame, *,
                  id_col: str = "url", text_col: str = "text",
                  min_quality: float = 0.35,
                  min_tokens: int = 10, max_tokens: int = 1_000_000,
                  allowed_langs: tuple[str, ...] = ("en", "pl", "de"),
                  near_dup_jaccard: float = 0.85,
                  gopher_gate: bool = False,
                  scrub_pii: bool = False
                  ) -> tuple[DataFrame, DataFrame]:
    """→ (curated DataFrame, funnel counts DataFrame).

    One-pass discipline: ``results``' lineage (typically the extraction
    job itself) runs exactly ONCE — the profiled frame is persisted and
    every later stage and every funnel count derives from that cache or
    from the other persisted frames.  The profile columns are all native
    columnar expressions, null-safe, so null-text rows ride through and
    are gated out by ``__keep`` instead of a separate pre-filter scan.
    """
    from pyspark import StorageLevel

    keep = (F.col(text_col).isNotNull()
            & (F.col("__quality") >= min_quality)
            & F.col("__tokens").between(min_tokens, max_tokens)
            & F.col("__lang").isin(*allowed_langs))
    base = results
    if gopher_gate:
        from ..functions.textstats import gopher_rules

        rule_cols = ("r_word_count", "r_mean_word_len", "r_symbol_ratio",
                     "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
                     "r_stopwords")
        base = gopher_rules(base, text_col)
        keep = keep & F.col("gopher_pass")
        base = base.drop(*rule_cols)
    profiled = (base
                .withColumn("__tokens", token_count(F.col(text_col)))
                .withColumn("__quality", quality_score(F.col(text_col)))
                .withColumn("__lang", detect_lang(F.col(text_col)))
                .withColumn("__keep", F.coalesce(keep, F.lit(False)))
                .withColumn("__h", F.md5(F.col(text_col)))
                .persist(StorageLevel.MEMORY_AND_DISK))

    gated = profiled.where(F.col("__keep"))

    # exact dedup: keep the minimum id per content hash
    keepers = (gated.groupBy("__h")
               .agg(F.min(id_col).alias(id_col)))
    # exact_unique feeds three consumers (minhash, anti-join, funnel
    # count) — persist so the dedup shuffle runs once, not three times
    exact_unique = gated.join(keepers, ["__h", id_col], "left_semi") \
        .persist(StorageLevel.MEMORY_AND_DISK)

    # near dedup: longs for the pair join, then map back
    with_key = exact_unique.withColumn(
        "__k", F.xxhash64(F.col(id_col)))
    pairs = minhash_lsh_pairs(with_key, "__k", text_col,
                              min_jaccard=near_dup_jaccard)
    drop_side = pairs.select(F.col("b").alias("__k")).distinct()
    curated = with_key.join(drop_side, "__k", "left_anti") \
        .drop("__k", "__h", "__tokens", "__quality", "__lang", "__keep")
    drop_cols = []
    if scrub_pii:
        # redact AFTER dedup (hashes/pair sets computed on raw text) and
        # replace the text column with the scrubbed form downstream
        from ..functions.pii import scrub_text

        curated = (curated
                   .withColumn("__clean", scrub_text(F.col(text_col)))
                   .withColumn(text_col, F.col("__clean")))
        drop_cols = ["__clean", "gopher_pass"] if gopher_gate \
            else ["__clean"]
    elif gopher_gate:
        drop_cols = ["gopher_pass"]
    if drop_cols:
        curated = curated.drop(*drop_cols)
    curated = curated.persist(StorageLevel.MEMORY_AND_DISK)

    # funnel: the first three stages are ONE aggregation over the cached
    # profile; the last two are counts of already-persisted frames
    head = profiled.agg(
        F.count("*").alias("input"),
        F.count(text_col).alias("non_null"),
        F.sum(F.col("__keep").cast("long")).alias("quality_gated"))
    funnel = head.selectExpr(
        "stack(3, 'input', input, 'non_null', non_null, "
        "'quality_gated', quality_gated) AS (stage, n)")
    for stage, df in (("exact_unique", exact_unique),
                      ("near_unique", curated)):
        row = df.select(F.count("*").alias("n")) \
            .withColumn("stage", F.lit(stage)).select("stage", "n")
        funnel = funnel.unionByName(row)
    return curated, funnel
