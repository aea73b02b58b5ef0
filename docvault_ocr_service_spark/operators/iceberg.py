"""Iceberg-backed checkpoint/results store (production catalogs).

The sandbox has no Iceberg catalog (plain parquet testdata), so the
engine's tests run on ``ParquetCheckpointStore`` — but the production
contract of the north rule is a literal ``MERGE INTO`` keyed on ``url``.
This class emits that SQL against a configured catalog; constructing it
without Iceberg support raises immediately, so misconfiguration fails
fast instead of silently writing parquet.

Semantics are identical to ParquetCheckpointStore (same claim rule, same
attempt escalation, same results-before-checkpoint ordering); the tests
pin the shared semantics through the parquet implementation.

Table DDL (created on first use):

    CREATE TABLE <cp> (url string, status string, attempt int,
      error_kind string, error_msg string, updated_at timestamp,
      run_id string) USING iceberg PARTITIONED BY (bucket(64, url))

    CREATE TABLE <res> (... RESULT_SCHEMA ..., run_id string)
      USING iceberg PARTITIONED BY (bucket(256, url))

Partitioning rationale: bucket(url) co-locates the MERGE join on both
sides and keeps the claim anti-join storage-pruned; ``days(warc_ts)``
belongs on the *input* table, not the state tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import MAX_ATTEMPTS


class IcebergCheckpointStore:
    """MERGE-INTO-based state store for Iceberg catalogs."""

    def __init__(self, spark: SparkSession, checkpoint_table: str,
                 results_table: str) -> None:
        if not any("iceberg" in str(v).lower() for k, v in
                   spark.sparkContext.getConf().getAll()
                   if "catalog" in k or "extensions" in k):
            raise RuntimeError(
                "no Iceberg catalog/extension configured on this session; "
                "use ParquetCheckpointStore locally")
        self.spark = spark
        self.checkpoint_table = checkpoint_table
        self.results_table = results_table

    def ensure_tables(self, results_like: DataFrame) -> None:
        self.spark.sql(f"""
            CREATE TABLE IF NOT EXISTS {self.checkpoint_table} (
              url string, status string, attempt int, error_kind string,
              error_msg string, updated_at timestamp, run_id string)
            USING iceberg PARTITIONED BY (bucket(64, url))
        """)
        # IF-NOT-EXISTS for the results table too — createOrReplace would
        # truncate accumulated results on every call.  merge_results appends
        # with a run_id column, so the created schema must carry it.
        if not self.spark.catalog.tableExists(self.results_table):
            results_like.limit(0) \
                .withColumn("run_id", F.lit("").cast("string")) \
                .writeTo(self.results_table) \
                .partitionedBy(F.bucket(256, F.col("url"))).create()

    def claimable(self, input_df: DataFrame) -> DataFrame:
        cp = self.spark.table(self.checkpoint_table)
        settled = cp.where(
            (F.col("status") == "done")
            | (F.col("status") == "failed_permanent")
            | ((F.col("status") == "failed_retryable")
               & (F.col("attempt") >= MAX_ATTEMPTS))
        ).select("url")
        return input_df.join(settled, "url", "left_anti")

    def merge_results(self, results: DataFrame, run_id: str) -> None:
        """Results append + checkpoint MERGE, same ordering contract as
        the parquet store (results land first)."""
        results.where(F.col("status") == "done") \
            .withColumn("run_id", F.lit(run_id)) \
            .writeTo(self.results_table).append()

        results.select(
            "url", "status", "error_kind", "error_msg",
            F.lit(run_id).alias("run_id"),
        ).createOrReplaceTempView("__new_results")

        self.spark.sql(f"""
            MERGE INTO {self.checkpoint_table} t
            USING __new_results s
            ON t.url = s.url
            WHEN MATCHED THEN UPDATE SET
              t.status = CASE
                WHEN s.status = 'failed_retryable'
                     AND t.attempt + 1 >= {MAX_ATTEMPTS}
                THEN 'failed_permanent' ELSE s.status END,
              t.attempt = t.attempt + 1,
              t.error_kind = s.error_kind,
              t.error_msg = s.error_msg,
              t.updated_at = current_timestamp(),
              t.run_id = s.run_id
            WHEN NOT MATCHED THEN INSERT
              (url, status, attempt, error_kind, error_msg, updated_at,
               run_id)
              VALUES (s.url, s.status, 1, s.error_kind, s.error_msg,
                      current_timestamp(), s.run_id)
        """)
