"""Page-explode route byte-identity + batch-status/error/cleanup ops."""

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from docvault_ocr_service_spark import corpus
from docvault_ocr_service_spark.extract import extract_document
from docvault_ocr_service_spark.operators.lineage import (
    batch_status, error_summary)
from docvault_ocr_service_spark.operators.pages import (
    explode_pdf_pages, reassemble_pages)
from docvault_ocr_service_spark.schemas import INPUT_SCHEMA


@pytest.fixture(scope="module")
def pdf_rows(spark):
    rows = [corpus.generate_row(i) for i in range(400)
            if corpus.template_for(i) in ("pdf_native", "multipage_pdf")]
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(rows), schema=INPUT_SCHEMA)


def test_exploded_route_is_byte_identical(spark, pdf_rows):
    """A1 as a distributed aggregation == the in-kernel page join."""
    pages = explode_pdf_pages(pdf_rows.repartition(8))
    docs = reassemble_pages(pages)
    got = {r["url"]: (r["text"], r["page_count"])
           for r in docs.collect()}
    for row in pdf_rows.collect():
        want = extract_document(row["url"], row["html"], row["text"],
                                row["lang"])
        assert got[row["url"]][0] == want["text"]
        assert got[row["url"]][1] == want["page_count"]


def test_explode_handles_corrupt_pdf(spark):
    import pandas as pd

    bad = spark.createDataFrame(pd.DataFrame([{
        "url": "u://bad", "warc_ts": None,
        "html": b"%PDF-1.4 truncated", "text": None, "lang": "en"}]),
        schema=INPUT_SCHEMA)
    docs = reassemble_pages(explode_pdf_pages(bad))
    row = docs.first()
    assert row["text"] is None
    assert row["error_kind"].startswith("corrupted_file")


def test_batch_status_pivot(spark):
    cp = spark.createDataFrame(
        [("u1", "done", 1, None, None, datetime.now(timezone.utc), "r1"),
         ("u2", "done", 1, None, None, datetime.now(timezone.utc), "r1"),
         ("u3", "failed_permanent", 3, "x", "boom",
          datetime.now(timezone.utc), "r1")],
        schema="url string, status string, attempt int, error_kind string,"
               " error_msg string, updated_at timestamp, run_id string")
    row = batch_status(cp).first()
    assert row["done"] == 2
    assert row["failed_permanent"] == 1
    assert row["failed_retryable"] == 0


def test_error_summary_ordering(spark):
    now = datetime.now(timezone.utc)
    rows = [(f"u{i}", "failed_permanent", 1, "corrupted_file",
             "bad header", now, "r1") for i in range(5)]
    rows += [("u9", "failed_permanent", 1, "empty_payload", "empty",
              now, "r1")]
    cp = spark.createDataFrame(
        rows, schema="url string, status string, attempt int, "
        "error_kind string, error_msg string, updated_at timestamp, "
        "run_id string")
    top = error_summary(cp).collect()
    assert top[0]["error_msg"] == "bad header" and top[0]["n"] == 5


def test_checkpoint_cleanup(spark, tmp_path):
    from docvault_ocr_service_spark.operators.checkpoint import (
        ParquetCheckpointStore)
    from docvault_ocr_service_spark.functions.udfs import run_extraction
    from docvault_ocr_service_spark.plans.extract_job import run_extract_job

    state = str(tmp_path / "state")
    df = spark.createDataFrame(corpus.corpus_pdf(60), schema=INPUT_SCHEMA)
    run_extract_job(spark, df, state)
    store = ParquetCheckpointStore(spark, state)
    before = store.read_checkpoint().count()
    cutoff = datetime.now(timezone.utc) + timedelta(days=1)
    would = store.cleanup(cutoff, dry_run=True)
    assert would == before  # everything is settled and old enough
    assert store.read_checkpoint().count() == before  # dry run: untouched
    removed = store.cleanup(cutoff)
    assert removed == before
    assert store.read_checkpoint().count() == 0


def test_asof_join_semantics(spark):
    from docvault_ocr_service_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d")],
        ["k", "t", "tag"])
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 50, 500.0)],
        ["k", "t", "v"])
    out = {r["tag"]: r["v_asof"] for r in
           asof_join(left, right, key="k", order="t",
                     payload_cols=("v",)).collect()}
    assert out["c"] is None        # before any right row
    assert out["a"] == 100.0       # equal timestamp is inclusive
    assert out["b"] == 150.0       # latest prior
    assert out["d"] is None        # right row is in the future


def _drop_volatile(row):
    d = row.asDict(recursive=True)
    d.pop("processing_time", None)
    d.pop("partition_id", None)
    return d


def test_extract_pdf_docs_matches_whole_doc_kernel(spark, pdf_rows):
    """The two-stage page route yields RESULT_SCHEMA rows identical to
    run_extraction (same kernels by construction — pinned here)."""
    from docvault_ocr_service_spark.functions.udfs import run_extraction
    from docvault_ocr_service_spark.operators.pages import extract_pdf_docs

    want = {r["url"]: _drop_volatile(r)
            for r in run_extraction(pdf_rows).collect()}
    got = {r["url"]: _drop_volatile(r)
           for r in extract_pdf_docs(pdf_rows, n_partitions=8).collect()}
    assert set(got) == set(want)
    for url, row in got.items():
        assert row == want[url], url


def test_extract_pdf_docs_scant_and_corrupt(spark):
    """ocr_unavailable and corrupted_file taxonomy survives the route."""
    import pandas as pd

    from docvault_ocr_service_spark.operators.pages import extract_pdf_docs

    rows = [
        {"url": "u://scant", "warc_ts": None,
         "html": corpus.make_pdf(["tiny"]), "text": None, "lang": "en"},
        {"url": "u://bad", "warc_ts": None,
         "html": b"%PDF-1.4 truncated", "text": None, "lang": "en"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=INPUT_SCHEMA)
    got = {r["url"]: r for r in extract_pdf_docs(df, 4).collect()}
    assert got["u://scant"]["error_kind"] == "ocr_unavailable"
    assert got["u://scant"]["status"] == "failed_permanent"
    assert got["u://bad"]["error_kind"] == "corrupted_file"


def test_giant_pdf_pages_spread_across_partitions(spark):
    """One 120-page giant must not stay one task's unit of work: after
    the (url, page_no) repartition its pages occupy many partitions."""
    import pandas as pd

    from docvault_ocr_service_spark.operators.pages import (
        decode_pages, explode_pdf_pages_raw)

    pages = [f"Giant page {i} with some body text to extract " * 30
             for i in range(120)]
    df = spark.createDataFrame(pd.DataFrame([{
        "url": "u://giant", "warc_ts": None,
        "html": corpus.make_pdf(pages, compress=True),
        "text": None, "lang": "en"}]), schema=INPUT_SCHEMA)
    raw = explode_pdf_pages_raw(df).repartition(8, "url", "page_no")
    decoded = decode_pages(raw)
    parts = (decoded.select(F.spark_partition_id().alias("pid"))
             .distinct().count())
    assert parts >= 6, "giant's pages still concentrated in few tasks"
    assert decoded.count() == 120


def test_job_routes_giant_pdf_through_page_explode(spark, tmp_path):
    """Flagship-job parity: a multipage giant goes through the explode
    route and its stored result matches the whole-doc kernel."""
    import pandas as pd

    from docvault_ocr_service_spark.operators.checkpoint import (
        ParquetCheckpointStore)
    from docvault_ocr_service_spark.plans.extract_job import run_extract_job

    pages = [" ".join(f"Invoice page {i} line {j}: Amount Due: $1{j}.00 "
                      f"on 2024-03-15" for j in range(40))
             for i in range(40)]
    giant_pdf = corpus.make_pdf(pages, compress=True)
    assert len(giant_pdf) > 16 * 1024
    rows = [{"url": f"https://normal.example/{i}", "warc_ts": None,
             "html": b"<html><body><p>small page body</p></body></html>",
             "text": None, "lang": "en"} for i in range(20)]
    rows.append({"url": "https://giant.example/pdf", "warc_ts": None,
                 "html": giant_pdf, "text": None, "lang": "en"})
    df = spark.createDataFrame(pd.DataFrame(rows), schema=INPUT_SCHEMA)

    report = run_extract_job(spark, df, str(tmp_path / "state"),
                             n_partitions=8, size_threshold=16 * 1024)
    assert report.claimed == 21
    assert report.failed == 0

    store = ParquetCheckpointStore(spark, str(tmp_path / "state"))
    res = {r["url"]: r for r in store.read_results_current().collect()}
    giant = res["https://giant.example/pdf"]
    want = extract_document("https://giant.example/pdf", giant_pdf,
                            None, "en")
    assert giant["text"] == want["text"]
    assert giant["page_count"] == 40
    assert giant["source"] == "native_pdf"
