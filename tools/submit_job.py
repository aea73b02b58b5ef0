"""Cluster submission entrypoint + --py-files packaging.

Build the dependency zip and submit the flagship pipeline to a real
cluster:

    python tools/submit_job.py --make-zip /tmp/docvault_spark.zip
    spark-submit --master yarn --deploy-mode cluster \\
        --py-files /tmp/docvault_spark.zip \\
        tools/submit_job.py \\
        --input s3://bucket/pages-iceberg-or-parquet \\
        --state s3://bucket/state --out s3://bucket/out

The job body is the same ``run_extract_job`` (or, with --full-pipeline,
``run_crawl_pipeline``) the local tests drive — no cluster-only code
path.  Executors need only this zip (pyspark/pandas/numpy ship with the
cluster runtime; the engine's codecs are pure Python).
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile

# local runs resolve the package from the repo; cluster runs get it from
# the --py-files zip instead (this insert is then harmless)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_zip(out_path: str) -> str:
    """Zip the package for --py-files (source only, no tests)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "docvault_ocr_service_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg):
            for name in sorted(files):
                if not name.endswith((".py", ".dat")):
                    continue
                full = os.path.join(dirpath, name)
                zf.write(full, os.path.relpath(full, root))
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--make-zip", metavar="PATH",
                    help="write the --py-files zip and exit")
    ap.add_argument("--input", help="pages table/path (INPUT_SCHEMA)")
    ap.add_argument("--warc", help="WARC directory (alternative input)")
    ap.add_argument("--state", help="checkpoint/results state dir")
    ap.add_argument("--out", help="output dir (media / curated)")
    ap.add_argument("--full-pipeline", action="store_true",
                    help="run the crawl→training-data pipeline instead "
                         "of extraction only")
    ap.add_argument("--robots", metavar="PARQUET",
                    help="(host, robots_txt) table for the politeness "
                         "filter; WITHOUT it robots.txt is NOT honored")
    ap.add_argument("--benchmark", metavar="PARQUET",
                    help="(text) table for decontamination; WITHOUT it "
                         "no benchmark screening runs")
    ap.add_argument("--hocr", action="store_true",
                    help="additionally write hOCR serializations of "
                         "done rows to <out>/hocr/run=<id>")
    ap.add_argument("--fix-encoding", action="store_true",
                    help="(pipeline) repair UTF-8-as-latin1 mojibake "
                         "before curation")
    ap.add_argument("--host-boilerplate", action="store_true",
                    help="(pipeline) strip per-host template chrome")
    ap.add_argument("--fuzzy-decontaminate", action="store_true",
                    help="(pipeline) MinHash near-dup screen on top of "
                         "the exact n-gram one (needs --benchmark)")
    ap.add_argument("--wet", action="store_true",
                    help="(pipeline) export the curated corpus as "
                         "Common Crawl WET shards under <out>/wet")
    ap.add_argument("--cdx", metavar="DIR",
                    help="(pipeline) CDX-J index dir: plan reads from "
                         "the index instead of scanning --warc; only "
                         "planned (filename,offset,length) slices are "
                         "fetched")
    ap.add_argument("--honor-noindex", action="store_true",
                    help="(pipeline) drop pages whose <meta "
                         "name=robots> says noindex/none before "
                         "extraction")
    ap.add_argument("--canonical-collapse", action="store_true",
                    help="(pipeline) keep one page per rel=canonical "
                         "target before extraction")
    ap.add_argument("--seen-digests", metavar="DIR",
                    help="(pipeline, with --cdx) parquet digest store: "
                         "captures whose digest is present are never "
                         "fetched; successfully extracted digests are "
                         "appended after the run")
    args = ap.parse_args()
    if args.hocr and not args.out:
        ap.error("--hocr requires --out (hOCR lands in <out>/hocr)")
    if args.fuzzy_decontaminate and not args.benchmark:
        ap.error("--fuzzy-decontaminate requires --benchmark")
    pipeline_flags = (args.fix_encoding or args.host_boilerplate
                      or args.fuzzy_decontaminate or args.wet
                      or args.cdx or args.seen_digests
                      or args.honor_noindex or args.canonical_collapse)
    if pipeline_flags and not args.full_pipeline:
        ap.error("--fix-encoding/--host-boilerplate/"
                 "--fuzzy-decontaminate/--wet/--cdx/--seen-digests/"
                 "--honor-noindex/--canonical-collapse "
                 "require --full-pipeline")
    if args.seen_digests and not args.cdx:
        ap.error("--seen-digests requires --cdx")

    if args.make_zip:
        print(make_zip(args.make_zip))
        return
    if not args.state or not (args.input or args.warc):
        ap.error("--state and one of --input/--warc are required")

    from pyspark.sql import SparkSession

    # on a cluster, master/memory/shuffle conf come from spark-submit;
    # getOrCreate just attaches to the session the launcher built
    spark = SparkSession.builder.appName("docvault-extract").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    if args.full_pipeline:
        from docvault_ocr_service_spark.plans.pipeline import (
            run_crawl_pipeline)

        if not args.warc:
            ap.error("--full-pipeline needs --warc input")
        robots_df = (spark.read.parquet(args.robots)
                     if args.robots else None)
        bench_df = (spark.read.parquet(args.benchmark)
                    if args.benchmark else None)
        if robots_df is None:
            print("WARNING: no --robots table; robots.txt NOT honored",
                  file=sys.stderr)
        if bench_df is None:
            print("WARNING: no --benchmark table; decontamination "
                  "skipped", file=sys.stderr)
        report = run_crawl_pipeline(
            spark, args.warc, args.state,
            args.out or args.state + "/out",
            robots_df=robots_df, benchmark_df=bench_df,
            fix_encoding=args.fix_encoding,
            host_boilerplate=args.host_boilerplate,
            fuzzy_decontaminate=args.fuzzy_decontaminate,
            wet_export=args.wet,
            cdx_dir=args.cdx,
            seen_digests_dir=args.seen_digests,
            honor_noindex=args.honor_noindex,
            canonical_collapse=args.canonical_collapse)
        print(report)
        return

    if args.warc:
        from docvault_ocr_service_spark.sources.warc import read_warc

        pages = read_warc(spark, args.warc)
    else:
        from docvault_ocr_service_spark.sources.tables import read_corpus

        pages = read_corpus(spark, args.input)

    from docvault_ocr_service_spark.plans.extract_job import (
        run_extract_job)

    report = run_extract_job(
        spark, pages, args.state,
        media_dir=(os.path.join(args.out, "media") if args.out else None),
        hocr_dir=(os.path.join(args.out, "hocr")
                  if (args.out and args.hocr) else None))
    print(report)


if __name__ == "__main__":
    main()
