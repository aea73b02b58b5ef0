"""Crawl-frontier composition + small-file compaction."""

from pyspark.sql import functions as F

from docvault_ocr_service_spark.operators.maintenance import (
    compact_parquet)
from docvault_ocr_service_spark.plans.frontier import build_frontier


def test_build_frontier_end_to_end(spark):
    pages = spark.createDataFrame(
        [("https://a.example/p1",
          '<a href="https://b.example/x1">1</a>'
          '<a href="https://b.example/x2#frag">2</a>'
          '<a href="https://c.example/y1">3</a>'
          '<a href="https://c.example/private/z">4</a>'
          '<a href="https://seen.example/old">5</a>'
          '<a href="mailto:someone@x">skip</a>'
          + "".join(f'<a href="https://b.example/bulk{i}">b</a>'
                    for i in range(20)))],
        ["url", "html_text"])
    seen = spark.createDataFrame([("https://seen.example/old",)], ["url"])
    robots = spark.createDataFrame(
        [("c.example", "User-agent: *\nDisallow: /private/")],
        ["host", "robots_txt"])
    ranks = spark.createDataFrame(
        [("c.example", 0.9), ("b.example", 0.2)], ["host", "rank"])

    out = build_frontier(pages, seen, robots, ranks,
                         per_host_limit=3, limit=100).collect()
    urls = [r["url"] for r in out]
    assert "https://seen.example/old" not in urls          # seen dropped
    assert "https://c.example/private/z" not in urls       # robots
    assert "mailto:someone@x" not in urls                  # scheme gate
    assert "https://b.example/x2" in urls or any(
        u.startswith("https://b.example/") for u in urls)  # canonicalized
    per_host = {}
    for r in out:
        per_host[r["host"]] = per_host.get(r["host"], 0) + 1
    assert all(v <= 3 for v in per_host.values())          # politeness
    # higher-ranked host sorts first
    assert out[0]["host"] == "c.example"
    # fragment stripped by canonicalization
    assert all("#" not in u for u in urls)


def test_compact_parquet(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for i in range(6):                      # 6 appends => many files
        spark.range(i * 100, (i + 1) * 100) \
            .withColumn("v", F.col("id") * 2) \
            .repartition(4).write.mode("append").parquet(path)
    import os

    before = sum(f.endswith(".parquet") for _, _, fs in os.walk(path)
                 for f in fs)
    assert before >= 12
    rows_before = sorted(r["id"] for r in
                         spark.read.parquet(path).collect())

    rep = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert rep["compacted"] and rep["files_after"] == 1
    rows_after = sorted(r["id"] for r in
                        spark.read.parquet(path).collect())
    assert rows_after == rows_before        # data byte-identical

    rep2 = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert not rep2["compacted"]            # idempotent no-op
