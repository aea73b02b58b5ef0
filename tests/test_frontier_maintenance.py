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


def test_compaction_crash_recovery(spark, tmp_path):
    """A crash between the two renames must not lose the table: entry
    recovery and the results read path both restore the .old backup."""
    import os

    from docvault_ocr_service_spark.operators.maintenance import (
        recover_compaction)

    path = str(tmp_path / "t2")
    spark.range(100).write.parquet(path)
    os.rename(path, path + ".old")           # simulate mid-swap crash

    recover_compaction(path)
    assert os.path.isdir(path) and not os.path.isdir(path + ".old")
    assert spark.read.parquet(path).count() == 100

    # compact_parquet on the crashed state must recover, never delete
    os.rename(path, path + ".old")
    rep = compact_parquet(spark, path)
    assert spark.read.parquet(path).count() == 100

    # read_results also recovers (results_dir is a compaction target)
    from docvault_ocr_service_spark.operators.checkpoint import (
        ParquetCheckpointStore)
    state = str(tmp_path / "state")
    store = ParquetCheckpointStore(spark, state)
    spark.range(5).selectExpr("cast(id as string) as url",
                              "'done' as status") \
        .write.parquet(store.results_dir)
    os.rename(store.results_dir, store.results_dir + ".old")
    assert store.read_results().count() == 5


def test_checkpoint_flat_layout_migration(spark, tmp_path):
    """A pre-bucketing (flat) checkpoint dir migrates on first read:
    rows preserved, bucket dirs created, flat files removed."""
    import glob
    import os
    from datetime import datetime, timezone

    from docvault_ocr_service_spark.operators.checkpoint import (
        ParquetCheckpointStore)
    from docvault_ocr_service_spark.schemas import CHECKPOINT_SCHEMA

    state = str(tmp_path / "legacy")
    os.makedirs(os.path.join(state, "checkpoint"))
    now = datetime.now(timezone.utc)
    rows = [(f"https://x.example/{i}", "done", 1, None, None, now, "r0")
            for i in range(30)]
    # write the OLD flat layout directly at the checkpoint root
    spark.createDataFrame(rows, CHECKPOINT_SCHEMA).coalesce(2) \
        .write.mode("overwrite").parquet(os.path.join(state, "checkpoint"))
    assert glob.glob(os.path.join(state, "checkpoint", "*.parquet"))

    store = ParquetCheckpointStore(spark, state)
    cp = store.read_checkpoint()
    assert cp.count() == 30                       # nothing lost
    assert not glob.glob(os.path.join(state, "checkpoint", "*.parquet"))
    assert glob.glob(os.path.join(state, "checkpoint", "_b=*"))
    # settled urls stay settled after migration
    from docvault_ocr_service_spark.schemas import INPUT_SCHEMA
    inp = spark.createDataFrame(
        [(u, now, None, "x", "en") for u, *_ in rows], schema=INPUT_SCHEMA)
    assert store.claimable(inp).count() == 0
