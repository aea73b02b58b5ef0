"""The full crawl-to-training-data pipeline — every stage of the engine
composed end-to-end, the way a 100 TB pretraining build runs:

    WARC archives  (or CDX-planned slices: index → latest captures →
                    digest anti-join → seek-reads, sources/cdx.py)
      → robots politeness filter          (functions/web.py)
      → resumable extraction + media      (plans/extract_job.py)
      → quality/lang/dedup curation       (plans/curate.py)
      → benchmark decontamination         (operators/contamination.py)
      → sequence packing                  (operators/packing.py)
      → curated parquet + packing manifest

Each stage is the already-tested operator; this plan only wires them,
so the scale properties (skew routing, MERGE checkpointing, broadcast
discipline, windowed packing) are inherited, not re-implemented.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class PipelineReport:
    run_id: str
    pages_in: int
    robots_blocked: int
    extracted_done: int
    curated: int
    decontaminated: int
    total_tokens: int
    n_windows: int
    # CDX-planned runs only: captures fetched vs skipped as unchanged
    cdx_planned: int = 0
    cdx_skipped: int = 0
    # publisher-signal stages (opt-in)
    noindex_dropped: int = 0
    canonical_collapsed: int = 0


def _has_parquet(spark: SparkSession, path: str) -> bool:
    """True when ``path`` holds a readable parquet dataset (fs-agnostic
    probe — works for local, HDFS and object-store URIs alike)."""
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:  # noqa: BLE001 — missing path/any fs error = no
        return False


def run_crawl_pipeline(spark: SparkSession, warc_dir: str, state_dir: str,
                       out_dir: str, *,
                       robots_df: DataFrame | None = None,
                       benchmark_df: DataFrame | None = None,
                       window: int = 2048,
                       min_quality: float = 0.35,
                       allowed_langs: tuple[str, ...] = ("en", "pl", "de"),
                       contamination_ngram: int = 8,
                       fix_encoding: bool = False,
                       host_boilerplate: bool = False,
                       fuzzy_decontaminate: bool = False,
                       wet_export: bool = False,
                       cdx_dir: str | None = None,
                       seen_digests_dir: str | None = None,
                       warc_base_dir: str | None = None,
                       honor_noindex: bool = False,
                       canonical_collapse: bool = False
                       ) -> PipelineReport:
    """One end-to-end run.  Resumable: extraction state lives in
    ``state_dir`` (MERGE checkpoint), so re-running after a crash only
    processes unclaimed pages.

    Opt-in round-4 stages (defaults off keep historical outputs
    byte-stable): ``fix_encoding`` repairs UTF-8-as-latin1 mojibake
    before curation; ``host_boilerplate`` strips per-host template
    chrome (nav/footer lines on > half a host's pages);
    ``fuzzy_decontaminate`` adds the MinHash near-dup screen on top of
    the exact n-gram one (needs ``benchmark_df``); ``wet_export``
    additionally writes the curated corpus as Common Crawl WET shards
    under ``out_dir/wet``.

    Round-6 opt-in: ``cdx_dir`` switches the input stage to
    CDX-planned reads — the index under ``cdx_dir`` is parsed, the
    latest eligible capture per urlkey is planned MINUS captures whose
    digest is already in ``seen_digests_dir`` (the don't-refetch-
    unchanged loop), only the planned (filename, offset, length)
    slices of the archives under ``warc_base_dir`` (default:
    ``warc_dir``) are read, and after a successful run the fetched
    digests are appended to ``seen_digests_dir`` — so the next run
    over a fresh crawl's index fetches only genuinely new content.

    ``honor_noindex`` drops pages whose ``<meta name=robots>`` carries
    noindex/none BEFORE extraction (the publisher opt-out, honored
    like robots.txt); ``canonical_collapse`` keeps one page per
    rel=canonical target (md5-deterministic pick) so mirror and
    tracking-parameter variants never reach extraction — at corpus
    scale this prunes work, not just output."""
    from ..functions.textstats import token_count
    from ..functions.web import filter_by_robots
    from ..operators.checkpoint import ParquetCheckpointStore
    from ..operators.contamination import decontaminate
    from ..operators.packing import pack_sequences, packing_stats
    from ..plans.curate import curate_corpus
    from ..plans.extract_job import run_extract_job
    from ..sources.warc import read_warc

    cdx_planned = cdx_skipped = 0
    fetched_digests = None
    if cdx_dir is not None:
        from ..sources.cdx import (
            eligible_captures, latest_captures, read_cdxj)
        from ..sources.warc import read_warc_records

        latest = latest_captures(
            eligible_captures(read_cdxj(spark, cdx_dir))).persist()
        if seen_digests_dir is not None \
                and _has_parquet(spark, seen_digests_dir):
            seen = spark.read.parquet(seen_digests_dir)
        else:
            seen = spark.createDataFrame([], "digest string")
        plan = latest.join(seen.select("digest").distinct(),
                           "digest", "left_anti").persist()
        cdx_planned = plan.count()
        cdx_skipped = latest.count() - cdx_planned
        # both counts are in; everything downstream reads `plan` only
        latest.unpersist()
        fetched = read_warc_records(
            spark, plan, base_dir=warc_base_dir or warc_dir)
        pages = fetched.drop("digest")
        fetched_digests = plan.select("url", "digest")
    else:
        # one WARC parse: annotate with keep_denied and persist, so the
        # two report counters and the extraction input share one pass
        pages = read_warc(spark, warc_dir)
    if robots_df is not None:
        annotated = filter_by_robots(pages, robots_df,
                                     keep_denied=True).persist()
        pages_in = annotated.count()
        pages = annotated.where(F.col("robots_allowed")) \
            .drop("robots_allowed")
        polite_n = pages.count()
        cached_pages = annotated
    else:
        pages = pages.persist()
        pages_in = polite_n = pages.count()
        cached_pages = pages

    # persisted page frames supersede each other down the funnel
    # (cached_pages tracks the live one); unpersist each once its
    # successor (or the extraction run) has materialized, so a long
    # pipeline run does not pin every intermediate in executor
    # storage for its remaining lifetime
    noindex_dropped = canonical_collapsed = 0
    if honor_noindex or canonical_collapse:
        from ..functions.web import canonical_url, \
            robots_meta_directives

        # best-effort utf-8 view of the payload: the head tags these
        # signals live in are ASCII in practice
        html_s = F.col("html").cast("string")
        if honor_noindex:
            pages = pages.withColumn(
                "__noindex",
                F.coalesce(robots_meta_directives(html_s)["noindex"],
                           F.lit(False))).persist()
            noindex_dropped = pages.where(F.col("__noindex")).count()
            if cached_pages is not pages:
                cached_pages.unpersist()
            cached_pages = pages
            pages = pages.where(~F.col("__noindex")).drop("__noindex")
        if canonical_collapse:
            from pyspark.sql import Window

            for reserved in ("__canon", "__rn"):
                if reserved in pages.columns:
                    raise ValueError(
                        f"canonical_collapse uses {reserved!r} "
                        f"internally; input pages must not carry it")
            key = F.coalesce(canonical_url(html_s), F.col("url"))
            w = Window.partitionBy("__canon").orderBy(
                F.md5(F.col("url")))
            before = pages.count()
            pages = (pages.withColumn("__canon", key)
                     .withColumn("__rn", F.row_number().over(w))
                     .where(F.col("__rn") == 1)
                     .drop("__canon", "__rn").persist())
            canonical_collapsed = before - pages.count()
            if cached_pages is not pages:
                cached_pages.unpersist()
            cached_pages = pages

    report = run_extract_job(spark, pages, state_dir,
                             media_dir=os.path.join(out_dir, "media"))
    cached_pages.unpersist()

    store = ParquetCheckpointStore(spark, state_dir)
    results = store.read_results_current()
    if results is None:
        # every page blocked/failed on a fresh state: report, don't crash
        return PipelineReport(run_id=report.run_id, pages_in=pages_in,
                              robots_blocked=pages_in - polite_n,
                              extracted_done=0, curated=0,
                              decontaminated=0, total_tokens=0,
                              n_windows=0, cdx_planned=cdx_planned,
                              cdx_skipped=cdx_skipped,
                              noindex_dropped=noindex_dropped,
                              canonical_collapsed=canonical_collapsed)
    done = results.where(F.col("status") == "done")
    extracted_done_n = done.count()

    if fetched_digests is not None and seen_digests_dir is not None:
        # mark only SUCCESSFULLY extracted captures as seen — a page
        # that failed this run stays fetchable on the next index pass
        (fetched_digests
         .join(done.select("url"), "url", "left_semi")
         .select("digest").distinct()
         .write.mode("append").parquet(seen_digests_dir))
    if fetched_digests is not None:
        # the digest bank (or nothing) was the last consumer of `plan`
        plan.unpersist()

    if fix_encoding:
        from ..functions.textstats import fix_mojibake

        done = done.withColumn("text", fix_mojibake(F.col("text")))
    if host_boilerplate:
        from ..functions.web import url_host
        from ..operators.dedup import strip_host_boilerplate

        # join the cleaned text back by url so every other result
        # column (confidence, category, metadata, spans, …) survives
        stripped = strip_host_boilerplate(
            done.select("url", url_host(F.col("url")).alias("__host"),
                        "text"),
            "url", "__host", "text").select(
            "url", F.col("clean_text").alias("__clean"))
        done = (done.join(stripped, "url", "left")
                .withColumn("text", F.coalesce("__clean", "text"))
                .drop("__clean"))

    curated, funnel = curate_corpus(
        done, min_quality=min_quality, allowed_langs=allowed_langs)
    curated_n = curated.count()

    if benchmark_df is not None:
        curated = decontaminate(curated, benchmark_df, "url", "text",
                                n=contamination_ngram)
        if fuzzy_decontaminate:
            from ..operators.contamination import fuzzy_contamination

            # numeric ids for the signature kernel: hash urls/bench rows
            keyed = curated.withColumn("__uid", F.xxhash64("url"))
            bench = benchmark_df.withColumn("bench_id",
                                            F.xxhash64("text"))
            bad = (fuzzy_contamination(keyed, bench, "__uid", "text")
                   .select("__uid").distinct())
            curated = keyed.join(bad, "__uid", "left_anti") \
                .drop("__uid")
        clean_n = curated.count()
    else:
        clean_n = curated_n          # no recount of the curation lineage

    with_tokens = curated.withColumn(
        "n_tokens", token_count(F.col("text")).cast("long"))
    packed = pack_sequences(with_tokens, "url", "n_tokens", window=window)
    packed.write.mode("overwrite").parquet(
        os.path.join(out_dir, "curated"))
    stats = packing_stats(
        spark.read.parquet(os.path.join(out_dir, "curated")),
        "n_tokens", window).first()
    funnel.write.mode("overwrite").parquet(
        os.path.join(out_dir, "funnel"))
    if wet_export:
        from ..sources.warc import write_wet

        write_wet(curated.select("url", "text"),
                  os.path.join(out_dir, "wet"))

    return PipelineReport(
        run_id=report.run_id,
        pages_in=pages_in,
        robots_blocked=pages_in - polite_n,
        extracted_done=extracted_done_n,
        curated=curated_n,
        decontaminated=curated_n - clean_n,
        total_tokens=int(stats["total_tokens"] or 0),
        n_windows=int(stats["n_windows"] or 0),
        cdx_planned=cdx_planned,
        cdx_skipped=cdx_skipped,
        noindex_dropped=noindex_dropped,
        canonical_collapsed=canonical_collapsed,
    )
