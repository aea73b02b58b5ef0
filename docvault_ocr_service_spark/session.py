"""SparkSession factory with the engine's scale-oriented defaults.

The knobs below are the ones SURVEY §4 flags as *explicit engineering*:

- ``spark.sql.execution.arrow.maxRecordsPerBatch=128``: each record can be
  megabytes of ``html`` binary; the 10k-row Arrow default would balloon the
  Python worker (SURVEY §4 item 2).
- AQE on: post-shuffle coalescing and runtime re-planning are free wins.
- ``spark.sql.shuffle.partitions`` sized to cores, not the 200 default —
  on a real cluster this is set to ~2-3× total cores by the submitter.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 128


def get_spark(app_name: str = "docvault_ocr_service_spark",
              cores: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a local session; cores default to $SPARK_GRAFT_CPUS."""
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_BATCH_ROWS))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "64m")
        # keep exactly one Python worker per task slot alive across
        # stages: a fresh fork per stage both pays startup again and
        # briefly doubles the Python process count — on a taskset-pinned
        # core budget that oversubscription is measurable at 32 cores
        .config("spark.python.worker.reuse", "true")
        .config("spark.python.worker.idleTimeoutSeconds", "0")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
