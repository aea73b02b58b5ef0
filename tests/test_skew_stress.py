"""Skew stress: multi-MB rows must route to the giant path and extract
without ballooning Arrow batches or stalling the job."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from docvault_ocr_service_spark.functions.udfs import run_extraction
from docvault_ocr_service_spark.operators.skew import route_by_size
from docvault_ocr_service_spark.schemas import INPUT_SCHEMA


def _giant_html(mb: int) -> bytes:
    para = "<p>" + ("lorem ipsum dolor sit amet " * 40) + "</p>"
    n = (mb * 1024 * 1024) // len(para) + 1
    return ("<html><body>" + para * n + "</body></html>").encode()


@pytest.fixture(scope="module")
def skewed_df(spark):
    rows = [{"url": f"https://small.example/{i}", "warc_ts": None,
             "html": b"<html><body><p>tiny page body text here</p></body></html>",
             "text": None, "lang": "en"} for i in range(50)]
    rows.append({"url": "https://giant.example/5mb", "warc_ts": None,
                 "html": _giant_html(5), "text": None, "lang": "en"})
    return spark.createDataFrame(pd.DataFrame(rows), schema=INPUT_SCHEMA)


def test_giant_routed_separately(spark, skewed_df):
    normal, giants = route_by_size(skewed_df, 8, size_threshold=256 * 1024)
    assert giants.count() == 1
    assert giants.first()["url"] == "https://giant.example/5mb"
    assert normal.count() == 50


def test_giant_extracts_fully(spark, skewed_df):
    normal, giants = route_by_size(skewed_df, 8, size_threshold=256 * 1024)
    out = run_extraction(normal).unionByName(run_extraction(giants))
    rows = {r["url"]: r for r in
            out.select("url", "status", F.length("text").alias("n"))
               .collect()}
    assert len(rows) == 51
    giant = rows["https://giant.example/5mb"]
    assert giant["status"] == "done"
    assert giant["n"] > 1_000_000  # multi-MB text survived Arrow
    assert all(r["status"] == "done" for r in rows.values())


def test_oversized_payload_rejected(spark):
    over = spark.createDataFrame(pd.DataFrame([{
        "url": "u://over", "warc_ts": None,
        "html": b"x" * (51 * 1024 * 1024), "text": None, "lang": "en"}]),
        schema=INPUT_SCHEMA)
    row = run_extraction(over).first()
    assert row["status"] == "failed_permanent"
    assert row["error_kind"] == "file_too_large"
