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


def test_pipeline_round4_stages(spark, tmp_path):
    """Opt-in stages: mojibake repair + host boilerplate strip + fuzzy
    decontamination + WET export, end to end."""
    import glob

    from docvault_ocr_service_spark.sources.warc import parse_warc

    warc_dir = _warc_corpus(tmp_path, n=60)
    out = tmp_path / "out_r4"
    rep0 = run_crawl_pipeline(
        spark, warc_dir, str(tmp_path / "state_r4a"), str(out),
        window=512)
    survivor = spark.read.parquet(str(out / "curated")) \
        .select("text").first()["text"]
    # paraphrase the survivor: exact 8-gram screen may or may not catch
    # it, the fuzzy screen must
    words = survivor.split()
    words[len(words) // 2] = "REPLACED"
    bench = spark.createDataFrame([(" ".join(words),)], ["text"])

    rep = run_crawl_pipeline(
        spark, warc_dir, str(tmp_path / "state_r4b"),
        str(tmp_path / "out_r4b"), benchmark_df=bench, window=512,
        fix_encoding=True, host_boilerplate=True,
        fuzzy_decontaminate=True, wet_export=True)
    assert rep.extracted_done > 30
    assert rep.decontaminated >= 1           # the paraphrase was caught
    curated = spark.read.parquet(str(tmp_path / "out_r4b" / "curated"))
    assert survivor not in {r["text"] for r in
                            curated.select("text").collect()}
    wet_files = glob.glob(str(tmp_path / "out_r4b" / "wet" / "*.gz"))
    assert wet_files
    n_wet = sum(1 for f in wet_files
                for _ in parse_warc(open(f, "rb").read()))
    assert n_wet == curated.count()


def test_pipeline_publisher_signals(spark, tmp_path):
    """honor_noindex drops opted-out pages before extraction;
    canonical_collapse keeps one page per rel=canonical target."""
    from datetime import datetime, timezone

    from docvault_ocr_service_spark import corpus
    from docvault_ocr_service_spark.sources.warc import encode_warc

    ts = datetime(2024, 3, 1, tzinfo=timezone.utc)
    recs = []
    for i in range(10):
        r = corpus.generate_row(i)
        recs.append({"url": r["url"], "warc_ts": ts,
                     "html": r["html"] or (r["text"] or "").encode()})
    body = b"<p>" + b"meaningful prose here " * 30 + b"</p>"
    recs.append({"url": "https://optout.example/a", "warc_ts": ts,
                 "html": b'<html><head><meta name="robots" '
                         b'content="noindex"></head><body>'
                         + body + b"</body></html>"})
    for k in range(3):   # three variants, one canonical target
        recs.append({
            "url": f"https://mirror{k}.example/v?utm={k}",
            "warc_ts": ts,
            "html": b'<html><head><link rel="canonical" '
                    b'href="https://canon.example/master"></head>'
                    b"<body>" + body + b"</body></html>"})
    warc_dir = tmp_path / "warc_ps"
    warc_dir.mkdir()
    (warc_dir / "a.warc.gz").write_bytes(
        encode_warc(recs, gzip_members=True))

    rep = run_crawl_pipeline(
        spark, str(warc_dir), str(tmp_path / "state_ps"),
        str(tmp_path / "out_ps"), window=512,
        honor_noindex=True, canonical_collapse=True)
    assert rep.noindex_dropped == 1
    assert rep.canonical_collapsed == 2      # 3 variants -> 1 kept
    assert rep.pages_in == 14
    assert rep.extracted_done == 14 - 1 - 2
