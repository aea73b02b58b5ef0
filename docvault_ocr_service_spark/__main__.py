"""spark-submit entry point.

    spark-submit --py-files docvault_ocr_service_spark.zip \
        -m docvault_ocr_service_spark run \
        --input /data/pages --state /data/state [--partitions 4096]

or locally:

    python -m docvault_ocr_service_spark run --input ... --state ...
    python -m docvault_ocr_service_spark gen --rows 100000 --out /tmp/corpus
    python -m docvault_ocr_service_spark status --state /data/state
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_run(args) -> int:
    from .plans.extract_job import run_extract_job
    from .session import get_spark
    from .sources.tables import read_corpus

    spark = get_spark(app_name="docvault-extract")
    report = run_extract_job(
        spark, read_corpus(spark, args.input), args.state,
        n_partitions=args.partitions,
        size_threshold=args.size_threshold)
    print(json.dumps(report.__dict__))
    return 0 if report.failed == 0 or not args.strict else 1


def _cmd_gen(args) -> int:
    from .corpus import materialize
    from .session import get_spark

    spark = get_spark(app_name="docvault-gen")
    materialize(spark, args.rows, args.out)
    print(json.dumps({"rows": args.rows, "out": args.out}))
    return 0


def _cmd_status(args) -> int:
    from .operators.checkpoint import ParquetCheckpointStore
    from .operators.lineage import batch_status, error_summary
    from .session import get_spark

    spark = get_spark(app_name="docvault-status")
    store = ParquetCheckpointStore(spark, args.state)
    cp = store.read_checkpoint()
    batch_status(cp).show(50, truncate=False)
    error_summary(cp).show(20, truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="docvault_ocr_service_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run the resumable extraction job")
    run.add_argument("--input", required=True)
    run.add_argument("--state", required=True)
    run.add_argument("--partitions", type=int, default=None)
    run.add_argument("--size-threshold", type=int, default=256 * 1024)
    run.add_argument("--strict", action="store_true",
                     help="exit nonzero if any row failed")
    run.set_defaults(fn=_cmd_run)

    gen = sub.add_parser("gen", help="generate a seeded corpus")
    gen.add_argument("--rows", type=int, default=10000)
    gen.add_argument("--out", required=True)
    gen.set_defaults(fn=_cmd_gen)

    status = sub.add_parser("status", help="show checkpoint status")
    status.add_argument("--state", required=True)
    status.set_defaults(fn=_cmd_status)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
