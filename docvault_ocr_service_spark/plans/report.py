"""Corpus datasheet — the one-call statistics report a dataset release
ships with (the "datasheets for datasets" practice): size, token
distribution, language mix, duplication rate and domain concentration,
computed from the same primitives the curation stages use.

One wide row out; every value is exactly replayable (token counts are
whitespace tokens, ratios are 1e-4-quantized longs so FP sum order
can't flip a hash).  Scale shape: a handful of full-corpus aggregates
(token/length sums, one md5 grouping for the dup rate, one domain
grouping for concentration) — no window over the whole corpus, no
driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_datasheet(df: DataFrame, text_col: str = "text",
                     lang_col: str | None = "lang",
                     url_col: str | None = None) -> DataFrame:
    """→ one row:

        n_docs, total_tokens, total_chars, p50_tokens, p90_tokens,
        n_langs, top_lang, top_lang_share_q,
        exact_dup_rate_q,
        [n_domains, top_domain_share_q when url_col given]

    ``*_q`` ratios are pure-floor ``n * 10000 // n_docs`` longs.
    NULL languages are excluded from the language stats (error rows
    are not a language); NULL texts count toward ``n_docs`` but not
    toward the dup rate.
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..functions.textstats import token_count

    c = F.col(text_col)
    base = df.withColumn("__tok", token_count(c).cast("long")) \
             .withColumn("__len", F.coalesce(F.length(c), F.lit(0)))
    base = base.persist()
    try:
        # the three report sections are independent jobs over the same
        # cached frame — submit them from a small thread pool so the
        # later jobs back-fill the earlier jobs' task tails
        # (guide §2.6) instead of running strictly one after another

        def _scalars():
            # one pass for every whole-corpus scalar (incl. the md5
            # dup counts — no second full scan)
            return base.agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("__tok").cast("long").alias("total_tokens"),
                F.sum("__len").cast("long").alias("total_chars"),
                F.percentile(F.col("__tok"), F.lit(0.5))
                .alias("__p50"),
                F.percentile(F.col("__tok"), F.lit(0.9))
                .alias("__p90"),
                F.count(F.md5(c)).cast("long").alias("__nn"),
                F.countDistinct(F.md5(c)).cast("long").alias("__nd"),
            ).first()

        def _langs():
            if lang_col is None:
                return None
            # one bounded collect: rows = distinct languages
            return (base.where(F.col(lang_col).isNotNull())
                    .groupBy(lang_col)
                    .agg(F.count("*").alias("n"))
                    .collect())

        def _domains():
            if url_col is None:
                return None
            from ..functions.web import with_registrable_domain

            host = F.lower(F.regexp_extract(
                F.col(url_col),
                r"^[a-zA-Z]+://(?:[^/?#@]*@)?([^/?#:]+)", 1))
            doms = (with_registrable_domain(base, host, "__d")
                    .groupBy("__d").agg(F.count("*").alias("n")))
            doms = doms.persist()
            try:
                n_domains = doms.count()
                top_dom = doms.orderBy(F.col("n").desc(),
                                       F.col("__d").asc()).first()
            finally:
                doms.unpersist()
            return n_domains, top_dom

        with ThreadPoolExecutor(max_workers=3) as pool:
            f_scalars = pool.submit(_scalars)
            f_langs = pool.submit(_langs)
            f_domains = pool.submit(_domains)
            agg = f_scalars.result()
            lang_rows = f_langs.result()
            dom_res = f_domains.result()
        n_docs = agg["n_docs"] or 0

        row = {
            "n_docs": n_docs,
            "total_tokens": agg["total_tokens"] or 0,
            "total_chars": agg["total_chars"] or 0,
            "p50_tokens": float(agg["__p50"] or 0.0),
            "p90_tokens": float(agg["__p90"] or 0.0),
        }

        if lang_rows and n_docs:
            # ties: highest n, then lexically first language
            best_n = max(r["n"] for r in lang_rows)
            top = min((r for r in lang_rows if r["n"] == best_n),
                      key=lambda r: r[lang_col])
            row |= {
                "n_langs": len(lang_rows),
                "top_lang": top[lang_col],
                "top_lang_share_q": int(
                    top["n"] * 10000 // n_docs),
            }
        else:
            row |= {"n_langs": 0, "top_lang": None,
                    "top_lang_share_q": 0}

        if n_docs:
            # non-null-text docs only on both counts (null-payload
            # rows are error rows, not duplicates of each other)
            row["exact_dup_rate_q"] = int(
                (agg["__nn"] - agg["__nd"]) * 10000 // n_docs)
        else:
            row["exact_dup_rate_q"] = 0

        if dom_res is not None and n_docs:
            n_domains, top_dom = dom_res
            row |= {
                "n_domains": int(n_domains),
                "top_domain_share_q": int(
                    top_dom["n"] * 10000 // n_docs),
            }
        else:
            row |= {"n_domains": 0, "top_domain_share_q": 0}
    finally:
        base.unpersist()

    spark = df.sparkSession
    return spark.createDataFrame(
        [tuple(row.values())],
        "n_docs long, total_tokens long, total_chars long, "
        "p50_tokens double, p90_tokens double, n_langs int, "
        "top_lang string, top_lang_share_q long, "
        "exact_dup_rate_q long, n_domains int, "
        "top_domain_share_q long")
