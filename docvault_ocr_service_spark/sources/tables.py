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


def read_binary_corpus(spark: SparkSession, path: str,
                       glob: str | None = None) -> DataFrame:
    """S2 path ingest: scan a directory tree of raw document files
    (.html/.pdf/images) with Spark's ``binaryFile`` source and adapt to
    INPUT_SCHEMA (the reference's filesystem upload route,
    ``app/routes.py:92-138``, minus the HTTP hop).

    The file path becomes ``url`` and the filesystem mtime ``warc_ts``.
    No extension trust: format identification happens downstream via
    magic bytes in ``extract_document`` — exactly the reference's
    validation order.  ``binaryFile`` rows are unsplittable (one file =
    one row), so oversized-blob skew is handled by the same size-routing
    the extraction plan applies to any corpus.
    """
    from pyspark.sql import functions as F

    from ..schemas import INPUT_SCHEMA

    reader = (spark.read.format("binaryFile")
              .option("recursiveFileLookup", "true"))
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast(INPUT_SCHEMA["text"].dataType).alias("text"),
        F.lit(None).cast(INPUT_SCHEMA["lang"].dataType).alias("lang"),
    )
