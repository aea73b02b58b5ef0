"""Plan-hygiene regression tests: pushdown, pruning, broadcast.

These pin the physical-plan properties docs/PLANS.md documents — a
regression here is a silent 100×-scale performance bug even when results
stay correct.
"""

import io
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushed_to_scan(spark):
    plan = plan_of(entrymod.q1_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in plan


def test_q6_all_filters_pushed(spark):
    plan = plan_of(entrymod.q6_forecast_revenue(spark, SF))
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity,24" in plan


def test_q3_broadcasts_filtered_dimension(spark):
    plan = plan_of(entrymod.q3_segment_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # pushed before join


def test_doc_queries_prune_columns(spark):
    plan = plan_of(entrymod.doc_token_stats(spark, SF))
    # only text+lang read — never the rest of the documents table
    scan_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_schemas and all(
        "text" in l and "lang" in l and "doc_id" not in l
        for l in scan_schemas)


def test_extraction_plan_has_single_map_stage(spark):
    import pandas as pd

    from docvault_ocr_service_spark import corpus
    from docvault_ocr_service_spark.functions.udfs import run_extraction
    from docvault_ocr_service_spark.operators.skew import route_by_size
    from docvault_ocr_service_spark.schemas import INPUT_SCHEMA

    df = spark.createDataFrame(corpus.corpus_pdf(20), schema=INPUT_SCHEMA)
    normal, giants = route_by_size(df, 4)
    out = run_extraction(normal).unionByName(run_extraction(giants))
    plan = plan_of(out)
    # formatted explain lists each node twice (tree + detail):
    # two MapInPandas branches (normal + giants), at most the two
    # explicit route_by_size exchanges, and nothing else shuffle-shaped
    assert plan.count("MapInPandas") == 4
    assert plan.count("Exchange") <= 4


def test_extract_job_media_branch(spark, tmp_path):
    """With media_dir set, image payloads get real features + thumbnails
    while the text-results taxonomy stays unchanged."""
    from docvault_ocr_service_spark import corpus
    from docvault_ocr_service_spark.plans.extract_job import (
        run_extract_job)
    from docvault_ocr_service_spark.schemas import INPUT_SCHEMA

    state, media = str(tmp_path / "state"), str(tmp_path / "media")
    df = spark.createDataFrame(corpus.corpus_pdf(200), schema=INPUT_SCHEMA)
    report = run_extract_job(spark, df, state, media_dir=media)
    assert report.claimed > 0

    feats = spark.read.parquet(media + "/features")
    thumbs = spark.read.parquet(media + "/thumbnails")
    n_images = df.where(
        "substring(html, 1, 4) IN (X'89504E47', X'49492A00', "
        "X'4D4D002A') OR substring(html, 1, 3) = X'FFD8FF' "
        "OR substring(html, 1, 4) = X'47494638'").count()
    assert feats.count() == n_images > 0
    assert thumbs.count() == n_images
    # corpus PNGs are real -> decoded ok with stats; thumbnails too
    ok = feats.where("decode_status = 'ok'").count()
    assert ok > 0
    # image rows still land as unsupported_format in the checkpoint
    ckpt = spark.read.parquet(state + "/checkpoint")
    assert ckpt.where(
        "error_kind LIKE 'unsupported_format:image/%'").count() == n_images
    # retry of the same run id semantics: second job claims nothing new
    report2 = run_extract_job(spark, df, state, media_dir=media)
    assert report2.claimed == 0
