"""End-to-end crawl pipeline: WARC → robots → extract → curate →
decontaminate → pack."""

from datetime import datetime, timezone

from docvault_ocr_service_spark import corpus
from docvault_ocr_service_spark.plans.pipeline import run_crawl_pipeline
from docvault_ocr_service_spark.sources.warc import encode_warc

TS = datetime(2024, 3, 1, tzinfo=timezone.utc)


def _warc_corpus(tmp_path, n=120):
    recs = []
    for i in range(n):
        r = corpus.generate_row(i)
        recs.append({"url": r["url"], "warc_ts": TS,
                     "html": r["html"] or (r["text"] or "").encode()})
    # a blocked-path page and a re-crawl duplicate of row 1
    r1 = corpus.generate_row(1)
    recs.append({"url": "https://blocked.example/private/x",
                 "warc_ts": TS,
                 "html": b"<html><body><p>"
                         + b"should never be fetched " * 20
                         + b"</p></body></html>"})
    recs.append({"url": "https://mirror.example/copy-of-1", "warc_ts": TS,
                 "html": r1["html"] or (r1["text"] or "").encode()})
    d = tmp_path / "warc"
    d.mkdir()
    half = len(recs) // 2
    (d / "a.warc.gz").write_bytes(encode_warc(recs[:half],
                                              gzip_members=True))
    (d / "b.warc.gz").write_bytes(encode_warc(recs[half:],
                                              gzip_members=True))
    return str(d)


def test_full_pipeline(spark, tmp_path):
    warc_dir = _warc_corpus(tmp_path)
    robots = spark.createDataFrame(
        [("blocked.example", "User-agent: *\nDisallow: /private\n")],
        ["host", "robots_txt"])
    # phase 1: no benchmark — discover what survives curation
    rep0 = run_crawl_pipeline(
        spark, warc_dir, str(tmp_path / "state0"), str(tmp_path / "out0"),
        robots_df=robots, window=512)
    assert rep0.decontaminated == 0
    survivor = spark.read.parquet(str(tmp_path / "out0" / "curated")) \
        .select("text").first()["text"]
    # phase 2: benchmark = a curated doc's text -> it must decontaminate
    bench = spark.createDataFrame([(survivor,)], ["text"])

    rep = run_crawl_pipeline(
        spark, warc_dir, str(tmp_path / "state"), str(tmp_path / "out"),
        robots_df=robots, benchmark_df=bench, window=512)

    assert rep.pages_in == 122
    assert rep.robots_blocked == 1
    assert rep.extracted_done > 80
    assert 0 < rep.curated <= rep.extracted_done
    assert rep.decontaminated >= 1
    assert rep.total_tokens > 0 and rep.n_windows >= 1

    curated = spark.read.parquet(str(tmp_path / "out" / "curated"))
    # packing invariants hold on the written manifest
    assert curated.where("first_win > last_win").count() == 0
    assert curated.where("n_tokens <= 0").count() == 0
    # the blocked URL never made it into the corpus
    assert curated.where(
        "url = 'https://blocked.example/private/x'").count() == 0
    # funnel table written
    funnel = spark.read.parquet(str(tmp_path / "out" / "funnel"))
    assert {r["stage"] for r in funnel.collect()} == {
        "input", "non_null", "quality_gated", "exact_unique",
        "near_unique"}

    # resumability: a second run claims nothing new and still reports
    rep2 = run_crawl_pipeline(
        spark, warc_dir, str(tmp_path / "state"), str(tmp_path / "out"),
        robots_df=robots, benchmark_df=bench, window=512)
    assert rep2.extracted_done == rep.extracted_done
