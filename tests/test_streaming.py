"""Structured Streaming tests (availableNow trigger: drain-and-stop)."""

import pytest
from pyspark.sql import functions as F

from docvault_ocr_service_spark import corpus
from docvault_ocr_service_spark.schemas import INPUT_SCHEMA
from docvault_ocr_service_spark.streaming.stream import (
    stream_event_metrics, stream_extract)

N = 80


def test_stream_extract_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(corpus.corpus_pdf(N), schema=INPUT_SCHEMA) \
        .write.parquet(src)

    q = stream_extract(spark, src, out, ckpt)
    q.awaitTermination(300)

    res = spark.read.parquet(out)
    assert res.count() == N
    from docvault_ocr_service_spark.functions.udfs import run_extraction
    batch = run_extraction(
        spark.read.schema(INPUT_SCHEMA).parquet(src))
    stream_texts = {r["url"]: r["text"]
                    for r in res.select("url", "text").collect()}
    batch_texts = {r["url"]: r["text"]
                   for r in batch.select("url", "text").collect()}
    assert stream_texts == batch_texts  # stream path == batch path


def test_stream_extract_is_exactly_once_on_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(corpus.corpus_pdf(N), schema=INPUT_SCHEMA) \
        .write.parquet(src)

    stream_extract(spark, src, out, ckpt).awaitTermination(300)
    # restart with the same checkpoint: nothing new to process
    stream_extract(spark, src, out, ckpt).awaitTermination(300)
    assert spark.read.parquet(out).count() == N

    # new data arrives → only the delta is processed
    spark.createDataFrame(
        corpus.corpus_pdf(N + 20).iloc[N:], schema=INPUT_SCHEMA
    ).write.mode("append").parquet(src)
    stream_extract(spark, src, out, ckpt).awaitTermination(300)
    assert spark.read.parquet(out).count() == N + 20


def test_stream_event_metrics(spark, tmp_path):
    src = str(tmp_path / "ev")
    out = str(tmp_path / "evout")
    ckpt = str(tmp_path / "evckpt")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.parquet(src)

    q = stream_event_metrics(spark, src, out, ckpt)
    q.awaitTermination(300)

    agg = spark.read.parquet(out)
    batch = (events.groupBy(F.window("ts", "1 hour"), "event_type")
             .agg(F.count("*").alias("n")))
    # append mode emits only windows sealed by the watermark; every
    # emitted row must match the batch computation
    emitted = {(r["window_start"], r["event_type"]): r["n_events"]
               for r in agg.collect()}
    truth = {(r["window"]["start"], r["event_type"]): r["n"]
             for r in batch.collect()}
    assert emitted, "no sealed windows emitted"
    for key, n in emitted.items():
        assert truth[key] == n


def test_stream_session_windows(spark, tmp_path):
    from docvault_ocr_service_spark.streaming.stream import (
        stream_session_windows)

    src = str(tmp_path / "sev")
    out = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sckpt")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.parquet(src)

    q = stream_session_windows(spark, src, out, ckpt)
    q.awaitTermination(300)

    sessions = spark.read.parquet(out)
    assert sessions.count() > 0
    # every emitted session must match the batch session_window agg
    batch = (events.groupBy(F.session_window("ts", "30 minutes")
                            .alias("win"), "user_id")
             .agg(F.count("*").alias("n")))
    truth = {(r["win"]["start"], r["user_id"]): r["n"]
             for r in batch.collect()}
    for r in sessions.collect():
        key = (r["session_start"], r["user_id"])
        assert truth[key] == r["n_events"]


def test_stream_extract_merge_updates_not_duplicates(spark, tmp_path):
    """foreachBatch MERGE sink: a re-crawled url updates its result."""
    from docvault_ocr_service_spark.operators.checkpoint import (
        ParquetCheckpointStore)
    from docvault_ocr_service_spark.streaming.stream import (
        stream_extract_merge)

    src = str(tmp_path / "msrc")
    state = str(tmp_path / "mstate")
    ckpt = str(tmp_path / "mckpt")
    first = corpus.corpus_pdf(40)
    spark.createDataFrame(first, schema=INPUT_SCHEMA).write.parquet(src)

    q = stream_extract_merge(spark, src, state, ckpt)
    q.awaitTermination(300)
    store = ParquetCheckpointStore(spark, state)
    assert store.read_checkpoint().count() == 40

    # re-crawl of an existing url with NEW pre-extracted text
    recrawl = first.iloc[:1].copy()
    recrawl["text"] = "recrawled fresh content for this url"
    spark.createDataFrame(recrawl, schema=INPUT_SCHEMA) \
        .write.mode("append").parquet(src)
    q2 = stream_extract_merge(spark, src, state, ckpt)
    q2.awaitTermination(300)

    url = recrawl.iloc[0]["url"]
    cp = store.read_checkpoint()
    assert cp.count() == 40  # still one checkpoint row per url
    cur = store.read_results_current()
    row = cur.where(F.col("url") == url).first()
    assert row["text"] == "recrawled fresh content for this url"


def test_stream_dedup_incremental_index(spark, tmp_path):
    from datetime import datetime

    from docvault_ocr_service_spark.streaming.stream import stream_dedup

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ts = datetime(2024, 1, 1)
    body = ("a perfectly ordinary web page body with enough words to "
            "shingle into a stable minhash signature for the test")

    def page(url, text):
        return (url, ts, None, text, "en")

    # batch 1: two distinct pages + an in-batch near-identical copy
    spark.createDataFrame(
        [page("https://x/1", body),
         page("https://x/2", body),             # same text, other url
         page("https://x/3", "a second distinct document about parquet "
                             "row groups and column chunk statistics")],
        schema=INPUT_SCHEMA).write.mode("append").parquet(src)
    stream_dedup(spark, src, idx, out, ckpt).awaitTermination(300)

    kept1 = {r.url for r in spark.read.parquet(out).select("url").collect()}
    assert len(kept1) == 2 and "https://x/3" in kept1
    assert len({"https://x/1", "https://x/2"} & kept1) == 1

    # batch 2: a re-crawl of batch-1 content (dropped vs index) + fresh
    spark.createDataFrame(
        [page("https://y/recrawl", body),
         page("https://y/new", "a genuinely new page mentioning iceberg "
                               "manifest lists and snapshot expiry")],
        schema=INPUT_SCHEMA).write.mode("append").parquet(src)
    stream_dedup(spark, src, idx, out, ckpt).awaitTermination(300)

    kept = {r.url for r in spark.read.parquet(out).select("url").collect()}
    assert kept == kept1 | {"https://y/new"}
    # index grew by exactly the kept docs
    assert spark.read.parquet(idx).count() == 3


def test_stream_dedup_batch_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch must not self-match against the rows it
    wrote before a crash (would overwrite its partitions with nothing)."""
    from datetime import datetime

    from docvault_ocr_service_spark.schemas import INPUT_SCHEMA
    from docvault_ocr_service_spark.streaming.stream import (
        _stream_dedup_batch)

    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    batch = spark.createDataFrame(
        [("https://r/1", datetime(2024, 1, 1), None,
          "some replayed page body words enough for shingles", "en")],
        schema=INPUT_SCHEMA)
    _stream_dedup_batch(batch, 0, idx, out, 0.85)
    first = spark.read.parquet(out).count()
    _stream_dedup_batch(batch, 0, idx, out, 0.85)   # replay same batch id
    assert spark.read.parquet(out).count() == first == 1
    assert spark.read.parquet(idx).count() == 1
