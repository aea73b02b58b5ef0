"""Table readers for the driver-provided parquet testdata + generic sinks.

On a production cluster these become Iceberg catalog reads
(``spark.read.table``) with partition pruning on e.g. ``days(warc_ts)``;
locally they are plain parquet scans — Catalyst still does column pruning
and predicate pushdown into the parquet reader either way (check
``PushedFilters`` in ``.explain``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TPCH_TABLES) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a generated CC-style corpus (INPUT_SCHEMA parquet)."""
    from ..schemas import INPUT_SCHEMA

    return spark.read.schema(INPUT_SCHEMA).parquet(path)
