"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169), the standard recipe for skewing a web-scale raw
corpus toward a target domain before pretraining:

1. hash word unigrams+bigrams into a fixed bucket space,
2. fit smoothed bag-of-ngrams models on the TARGET sample and the RAW
   corpus (two count tables over the bucket space),
3. per raw document, importance = Σ over feature occurrences of
   log p_target(bucket) − log p_raw(bucket),
4. sample without replacement via Gumbel-top-k over
   importance + Gumbel noise.

Scale shape: the bucket space is fixed (16^hex_chars rows — a
broadcast table no matter the corpus size); the corpus side is one
map-only explode + a broadcast join + one per-doc sum, so the only
corpus-wide shuffle is the per-doc aggregation, and the final top-k is
Spark's TakeOrdered (no global sort materialization).  Everything is
engine-portable arithmetic (md5-prefix bucketing, multiplicative-hash
Gumbel keys), so a SQL oracle can replay it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# golden-ratio multiplicative hash modulus/multiplier for the
# deterministic Gumbel keys (portable integer arithmetic)
_GUMBEL_MULT = 2654435761
_GUMBEL_MOD = 4294967296


def _tokens(text: Column) -> Column:
    """Lowercased whitespace tokens — the corpus-wide tokenization the
    dedup/shingle stack uses (split on \\s+ after btrim(lower()))."""
    return F.split(F.btrim(F.lower(text)), r"\s+")


def hashed_features(text: Column, hex_chars: int = 3) -> Column:
    """Word unigram+bigram occurrences → md5-prefix bucket keys
    (array<string>, duplicates kept — DSIR counts occurrences).  The
    bucket space is the 16^hex_chars md5 prefixes; md5-prefix hashing
    is bit-identical across engines, unlike xxhash64/murmur."""
    toks = _tokens(text)
    n1 = F.size(toks)
    bigrams = F.transform(
        F.sequence(F.lit(0), F.greatest(n1 - 2, F.lit(-1))),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, (i + 1).cast("int")),
            F.element_at(toks, (i + 2).cast("int"))))
    grams = F.when(n1 >= 2, F.concat(toks, bigrams)) \
        .when(n1 >= 1, toks) \
        .otherwise(F.array().cast("array<string>"))
    empty = text.isNull() | (F.btrim(text) == "")
    grams = F.when(empty, F.array().cast("array<string>")) \
        .otherwise(grams)
    return F.transform(
        grams, lambda g: F.substring(F.md5(g), 1, hex_chars))


def dsir_log_ratios(raw: DataFrame, target: DataFrame,
                    text_col: str = "text", hex_chars: int = 3,
                    alpha: float = 1.0) -> DataFrame:
    """(bucket, log_ratio) over every bucket seen in EITHER corpus,
    with add-``alpha`` smoothing over the full 16^hex_chars space.
    Output is bucket-space-bounded — broadcast it."""
    n_space = 16 ** hex_chars

    def counts(df: DataFrame, name: str) -> DataFrame:
        feats = df.select(F.explode(
            hashed_features(F.col(text_col), hex_chars)).alias("bucket"))
        return feats.groupBy("bucket").agg(F.count("*").alias(name))

    t = counts(target, "t_n")
    r = counts(raw, "r_n")
    # totals are the sums of the already-aggregated (bucket-space-
    # bounded) count tables — no second pass over either corpus
    t_total = t.select(F.coalesce(F.sum("t_n"), F.lit(0))
                       .alias("t_total"))
    r_total = r.select(F.coalesce(F.sum("r_n"), F.lit(0))
                       .alias("r_total"))
    joined = (t.join(r, "bucket", "full_outer")
              .select("bucket",
                      F.coalesce("t_n", F.lit(0)).alias("t_n"),
                      F.coalesce("r_n", F.lit(0)).alias("r_n"))
              .crossJoin(F.broadcast(t_total))
              .crossJoin(F.broadcast(r_total)))
    lr = (F.log(F.col("t_n") + alpha)
          - F.log(F.col("t_total") + alpha * n_space)
          - F.log(F.col("r_n") + alpha)
          + F.log(F.col("r_total") + alpha * n_space))
    return joined.select("bucket", lr.alias("log_ratio"),
                         "t_total", "r_total")


def dsir_scores(raw: DataFrame, ratios: DataFrame, id_col: str,
                text_col: str = "text", hex_chars: int = 3,
                alpha: float = 1.0) -> DataFrame:
    """raw + (importance, score) columns.  importance = Σ log-ratios of
    the doc's feature occurrences (unseen buckets coalesce to the
    smoothed default); score adds the deterministic Gumbel key for
    Gumbel-top-k sampling without replacement."""
    n_space = 16 ** hex_chars
    totals = ratios.select("t_total", "r_total").limit(1)
    default_lr = (F.log(F.lit(alpha))
                  - F.log(F.col("t_total") + alpha * n_space)
                  - F.log(F.lit(alpha))
                  + F.log(F.col("r_total") + alpha * n_space))

    feats = raw.select(
        F.col(id_col).alias("__id"),
        F.explode(hashed_features(F.col(text_col), hex_chars))
        .alias("bucket"))
    per_doc = (feats
               .join(F.broadcast(ratios.select("bucket", "log_ratio")),
                     "bucket", "left")
               .crossJoin(F.broadcast(
                   totals.select(default_lr.alias("__def"))))
               .groupBy("__id")
               .agg(F.sum(F.coalesce("log_ratio", F.col("__def")))
                    .alias("importance")))
    u = ((F.pmod(F.col(id_col).cast("long") * _GUMBEL_MULT,
                 F.lit(_GUMBEL_MOD)) + 0.5) / _GUMBEL_MOD)
    gumbel = -F.log(-F.log(u))
    return (raw.join(per_doc, raw[id_col] == per_doc["__id"], "left")
            .drop("__id")
            .withColumn("importance",
                        F.coalesce("importance", F.lit(0.0)))
            .withColumn("score", F.col("importance") + gumbel))


def dsir_resample(raw: DataFrame, target: DataFrame, id_col: str,
                  text_col: str = "text", k: int = 1000,
                  hex_chars: int = 3, alpha: float = 1.0) -> DataFrame:
    """Top-``k`` raw docs by importance + Gumbel (sampling without
    replacement from the softmax of importance weights — the DSIR
    selection rule).  ``id_col`` must be numeric (the Gumbel key is
    integer arithmetic on it)."""
    t = dict(raw.dtypes)[id_col]
    if t not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise ValueError(f"dsir_resample needs a numeric id column "
                         f"(got {id_col}: {t}); derive one first, "
                         f"e.g. xxhash64(url)")
    # the ratio table is bucket-space-bounded (16^hex_chars rows) but
    # its lineage is BOTH full-corpus counting passes; two broadcasts
    # consume it (the log-ratio join and the totals row), so without
    # materialization the corpus is counted twice more than the DSIR
    # two-pass design requires.  Lazy localCheckpoint: the first
    # broadcast build materializes it, the second reuses it.
    ratios = dsir_log_ratios(raw, target, text_col, hex_chars, alpha) \
        .localCheckpoint(eager=False)
    scored = dsir_scores(raw, ratios, id_col, text_col, hex_chars, alpha)
    return (scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(k))
