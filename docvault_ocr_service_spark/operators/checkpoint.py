"""Idempotent MERGE-on-url checkpointing + retry/DLQ semantics.

Replaces the reference's Redis task state machine
(``/root/reference/app/redis_queue.py:99-127`` hashes,
``:464-527`` retry, ``:667-758`` DLQ) with one table keyed on ``url``:

    checkpoint(url, status, attempt, error_kind, error_msg, updated_at, run_id)
    status ∈ {done, failed_retryable, failed_permanent}

Claim rule (the reference's recovery invariant, ``app/redis_queue.py:509-527``
and ``tests/test_task_recovery.py``): a run processes exactly the input urls
that are *absent* from the checkpoint or sitting at ``failed_retryable`` with
``attempt < MAX_ATTEMPTS``; rows at attempt ≥ 3 flip to ``failed_permanent``
(dead letter).  Re-running a completed job is a no-op.

Storage: on an Iceberg catalog this is a literal ``MERGE INTO ... ON url``;
the sandbox has no catalog, so ``ParquetCheckpointStore`` implements the
same contract as read-union-overwrite with last-writer-wins on
``(url, updated_at)`` — the semantics the tests pin down are identical.
"""

from __future__ import annotations

import os
import shutil
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schemas import CHECKPOINT_SCHEMA

MAX_ATTEMPTS = 3  # app/redis_queue.py:45


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


class ParquetCheckpointStore:
    """Checkpoint + results persistence rooted at ``base_dir``."""

    def __init__(self, spark: SparkSession, base_dir: str) -> None:
        self.spark = spark
        self.base_dir = base_dir
        self.checkpoint_dir = os.path.join(base_dir, "checkpoint")
        self.results_dir = os.path.join(base_dir, "results")
        os.makedirs(base_dir, exist_ok=True)

    # -- reads ---------------------------------------------------------------
    def read_checkpoint(self) -> DataFrame:
        self._recover_interrupted_swap(self.checkpoint_dir)
        if not os.path.isdir(self.checkpoint_dir):
            return self.spark.createDataFrame([], CHECKPOINT_SCHEMA)
        return self.spark.read.schema(CHECKPOINT_SCHEMA).parquet(
            self.checkpoint_dir)

    @staticmethod
    def _recover_interrupted_swap(target: str) -> None:
        """A crash between the two renames in _overwrite_atomic leaves the
        previous table at ``.old`` and no ``target`` — restore it rather
        than silently treating the checkpoint as empty."""
        backup = target + ".old"
        if os.path.isdir(backup) and not os.path.isdir(target):
            os.rename(backup, target)

    def read_results(self) -> DataFrame | None:
        if not os.path.isdir(self.results_dir):
            return None
        # mergeSchema: results files written before a schema addition
        # (e.g. merged_at) must still read alongside new ones
        return (self.spark.read.option("mergeSchema", "true")
                .parquet(self.results_dir))

    def read_results_current(self) -> DataFrame | None:
        """Results view with exactly one row per url (latest run wins).

        Results are appended *before* the checkpoint swap, so a crash in
        the window between them can leave an orphan result row that a
        retry run duplicates; this view is the consumer-facing dedup, the
        same role an Iceberg MERGE's target table would play.
        """
        raw = self.read_results()
        if raw is None:
            return None
        # order by wall-clock merge time (run_id is a random uuid and
        # carries no recency; run_id desc only breaks exact-tie stamps)
        order = [F.col("merged_at").desc(), F.col("run_id").desc()] \
            if "merged_at" in raw.columns else [F.col("run_id").desc()]
        w = Window.partitionBy("url").orderBy(*order)
        return (raw.withColumn("_rank", F.row_number().over(w))
                   .where(F.col("_rank") == 1).drop("_rank"))

    # -- claim ---------------------------------------------------------------
    def claimable(self, input_df: DataFrame) -> DataFrame:
        """Input rows this run must process (left-anti on settled urls)."""
        cp = self.read_checkpoint()
        settled = cp.where(
            (F.col("status") == "done")
            | (F.col("status") == "failed_permanent")
            | ((F.col("status") == "failed_retryable")
               & (F.col("attempt") >= MAX_ATTEMPTS))
        ).select("url")
        return input_df.join(settled, "url", "left_anti")

    def prior_attempts(self) -> DataFrame:
        """url → attempts so far (for attempt accounting on retries)."""
        return (self.read_checkpoint()
                .groupBy("url")
                .agg(F.max("attempt").alias("prior_attempt")))

    # -- merge ---------------------------------------------------------------
    def merge_results(self, results: DataFrame, run_id: str) -> None:
        """MERGE new result rows into results + checkpoint tables.

        ``results`` must already be materialized (the job runner stages
        each run's raw output to parquet first) — this method consumes it
        twice and must not recompute the extraction.

        Order matters: result rows land *before* the checkpoint flips to
        done (the reference stores the result then flips status,
        app/redis_queue.py:265-304).  A crash between the two re-runs the
        url and appends a second result row; ``read_results_current``
        dedupes by latest run.
        """
        now = datetime.now(timezone.utc)

        done = (results.where(F.col("status") == "done")
                .withColumn("run_id", F.lit(run_id))
                .withColumn("merged_at", F.lit(now).cast("timestamp")))
        done.write.mode("append").parquet(self.results_dir)

        # no broadcast hint: Catalyst broadcasts while the checkpoint is
        # small and switches to a shuffled join once it isn't — forcing a
        # broadcast here would OOM at 10^12-url state
        new_cp = (
            results
            .join(self.prior_attempts(), "url", "left")
            .withColumn("attempt",
                        F.coalesce(F.col("prior_attempt"), F.lit(0)) + 1)
            .withColumn(
                "status",
                F.when(
                    (F.col("status") == "failed_retryable")
                    & (F.col("attempt") >= MAX_ATTEMPTS),
                    F.lit("failed_permanent"),
                ).otherwise(F.col("status")),
            )
            .select(
                "url", "status",
                F.col("attempt").cast("int"),
                "error_kind", "error_msg",
                F.lit(now).cast("timestamp").alias("updated_at"),
                F.lit(run_id).alias("run_id"),
            )
        )

        # upsert: old rows lose to new rows on the same url
        old_cp = self.read_checkpoint()
        merged = old_cp.unionByName(new_cp)
        w = Window.partitionBy("url").orderBy(
            F.col("updated_at").desc(), F.col("attempt").desc())
        merged = (merged
                  .withColumn("_rank", F.row_number().over(w))
                  .where(F.col("_rank") == 1)
                  .drop("_rank"))

        self._overwrite_atomic(merged, self.checkpoint_dir)

    def cleanup(self, older_than, *, dry_run: bool = False) -> int:
        """Drop settled checkpoint rows older than a cutoff — the
        reference's old-task cleanup (app/redis_queue.py:760-868),
        including its dry-run mode.  Returns the number of rows that
        were (or would be) removed."""
        cp = self.read_checkpoint()
        doomed = cp.where(
            (F.col("status") != "failed_retryable")
            & (F.col("updated_at") < F.lit(older_than)))
        n = doomed.count()
        if not dry_run and n:
            survivors = cp.where(
                (F.col("status") == "failed_retryable")
                | (F.col("updated_at") >= F.lit(older_than)))
            self._overwrite_atomic(survivors, self.checkpoint_dir)
        return n

    def _overwrite_atomic(self, df: DataFrame, target: str) -> None:
        """Write to a staging dir, then swap — a crash mid-write leaves the
        previous checkpoint intact (Iceberg gives this via snapshots)."""
        staging = target + ".staging"
        df.write.mode("overwrite").parquet(staging)
        backup = target + ".old"
        if os.path.isdir(backup):  # stale backup from an interrupted swap
            shutil.rmtree(backup)
        if os.path.isdir(target):
            os.rename(target, backup)
        os.rename(staging, target)
        if os.path.isdir(backup):
            shutil.rmtree(backup)
