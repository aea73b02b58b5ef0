"""The flagship end-to-end extraction job (batch, resumable).

Spark restatement of the reference's whole service loop (SURVEY §3.1):
scan → claim (MERGE-checkpoint anti-join) → size-routed salted
repartition → one ``mapInPandas`` extraction stage → staged run output →
MERGE into results/checkpoint → lineage + metrics appends.

Physical shape (why this survives 100×): a single wide map stage with no
shuffle except the explicit repartitions; the only aggregations are the
tiny lineage/metrics rollups.  The claim anti-join broadcasts when the
checkpoint is small and sort-merges when it isn't — Catalyst's call.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extract.document import MAX_PAYLOAD_BYTES
from ..functions.udfs import run_extraction
from ..operators.checkpoint import ParquetCheckpointStore, new_run_id
from ..operators.lineage import append_observability
from ..operators.pages import extract_pdf_docs
from ..operators.skew import route_by_size


@dataclass
class RunReport:
    run_id: str
    claimed: int
    completed: int
    failed: int


_IMAGE_HEADS_4 = (b"\x89PNG", b"II*\x00", b"MM\x00*", b"GIF8")


def is_image_payload(col: Column) -> Column:
    """Columnar magic-byte image sniff (the JVM-side twin of
    extract/images.py::sniff_image_format)."""
    h4 = F.substring(col, 1, 4)
    h3 = F.substring(col, 1, 3)
    out = h3 == F.lit(b"\xff\xd8\xff")
    for magic in _IMAGE_HEADS_4:
        out = out | (h4 == F.lit(magic))
    return out


def run_extract_job(spark: SparkSession, input_df: DataFrame,
                    state_dir: str, *, n_partitions: int | None = None,
                    size_threshold: int = 256 * 1024,
                    media_dir: str | None = None,
                    hocr_dir: str | None = None) -> RunReport:
    """One resumable run over ``input_df`` (INPUT_SCHEMA shape).

    With ``media_dir`` set, image payloads additionally flow through the
    real decode path — features to ``media_dir/features/run=<id>`` and
    thumbnails to ``media_dir/thumbnails/run=<id>``.  Semantics are
    at-least-once across CRASHED runs (a retry claims the same urls
    under a fresh run id): consumers read via
    ``multimodal.read_media_latest`` which dedups per media_id by
    newest run — the same crash-dup discipline as
    ``read_results_current``.  The text-results taxonomy is unchanged:
    image rows still land as ``unsupported_format:image/*`` in the
    checkpoint (no OCR runtime turns pixels into text).

    With ``hocr_dir`` set, done rows additionally serialize as hOCR
    (the reference's ``output_format="hocr"`` surface) to
    ``hocr_dir/run=<id>`` as (url, hocr) parquet — a separate
    run-partitioned sink like media, so the MERGE'd results table keeps
    its fixed schema."""
    if n_partitions is None:
        n_partitions = spark.sparkContext.defaultParallelism

    store = ParquetCheckpointStore(spark, state_dir)
    run_id = new_run_id()

    claimed = store.claimable(input_df)

    if media_dir is not None:
        from ..functions.multimodal import (
            extract_media_features,
            generate_thumbnails,
        )

        raw_imgs = (claimed.where(F.col("html").isNotNull()
                                  & is_image_payload(F.col("html")))
                    .select(F.col("url").alias("media_id"),
                            F.lit("image").alias("kind"),
                            F.col("html").alias("payload")))
        # size-route before the decode map stage (the skew contract the
        # media functions document): giants go to their own thin
        # partitions instead of straggling a dense one
        m_normal, m_giants = route_by_size(raw_imgs, n_partitions,
                                           size_threshold=size_threshold,
                                           payload_col="payload")
        imgs = m_normal.unionByName(m_giants).persist()
        try:
            extract_media_features(imgs, fake=False) \
                .write.mode("overwrite").parquet(
                    os.path.join(media_dir, "features", f"run={run_id}"))
            generate_thumbnails(imgs.select("media_id", "payload")) \
                .write.mode("overwrite").parquet(
                    os.path.join(media_dir, "thumbnails",
                                 f"run={run_id}"))
        finally:
            imgs.unpersist()

    normal, giants = route_by_size(claimed, n_partitions,
                                   size_threshold=size_threshold)
    # Oversized PDFs take the page-explode route (the reference's own
    # unit-of-work choice for big documents, app/worker.py:254-324): a
    # 500-page giant becomes 500 distributable page rows instead of one
    # straggler task.  Giant HTML (no page structure), admission-cap
    # violations, and precomputed-text rows keep the whole-doc kernel.
    giant_pdf = (
        (F.col("text").isNull() | (F.col("text") == ""))
        & (F.substring("html", 1, 5) == F.lit(b"%PDF-"))
        & (F.octet_length("html") <= MAX_PAYLOAD_BYTES)
    )
    extracted = (
        run_extraction(normal)
        .unionByName(run_extraction(giants.where(~giant_pdf)))
        .unionByName(extract_pdf_docs(giants.where(giant_pdf),
                                      n_partitions))
    )

    # Stage the raw run output once — everything downstream (merge, lineage,
    # metrics) reads the staged parquet instead of re-running extraction.
    run_dir = os.path.join(state_dir, "runs", run_id)
    extracted.write.mode("overwrite").parquet(run_dir)
    staged = spark.read.parquet(run_dir)

    if hocr_dir is not None:
        from ..functions.udfs import with_hocr

        (with_hocr(staged.where(F.col("status") == "done"))
         .select("url", "hocr")
         .write.mode("overwrite")
         .parquet(os.path.join(hocr_dir, f"run={run_id}")))

    store.merge_results(staged, run_id)
    checkpoint = store.read_checkpoint()
    append_observability(spark, state_dir, staged, checkpoint, run_id)

    counts = staged.agg(
        F.count("*").alias("total"),
        F.coalesce(F.sum(F.when(F.col("status") == "done", 1)
                         .otherwise(0)), F.lit(0)).alias("done"),
    ).first()
    return RunReport(run_id=run_id, claimed=counts["total"],
                     completed=counts["done"],
                     failed=counts["total"] - counts["done"])
