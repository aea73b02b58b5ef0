"""Curation plan, IVF ANN, and stateful-streaming totals."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from docvault_ocr_service_spark.plans.curate import curate_corpus


@pytest.fixture(scope="module")
def raw_docs(spark):
    import random

    rng = random.Random(17)
    vocab = ("sun moon river stone forest meadow harbor lantern copper "
             "window garden thunder velvet marble autumn ember glacier "
             "the a and of with under over into about while").split()
    # 20 genuinely distinct documents (disjoint-ish shuffled content)
    rows = [(f"u://{i}",
             " ".join(rng.choice(vocab) for _ in range(40)))
            for i in range(20)]
    good = ("the quick brown fox jumps over the lazy dog and then the "
            "dog naps in the warm sun for a while longer than usual")
    rows += [("u://dup1", good), ("u://dup2", good)]          # exact dups
    rows += [("u://near1", good + " extra"),                   # near pair
             ("u://near2", good + " bonus")]
    rows += [("u://short", "too short"),
             ("u://junk", "!!! ### 12345 $$$ %% ^^ && ** (( ))"),
             ("u://null", None)]
    return spark.createDataFrame(rows, ["url", "text"])


def test_curation_funnel(spark, raw_docs):
    curated, funnel = curate_corpus(
        raw_docs, min_quality=0.25, min_tokens=5, near_dup_jaccard=0.7)
    counts = {r["stage"]: r["n"] for r in funnel.collect()}
    assert counts["input"] == 27
    assert counts["non_null"] == 26
    assert counts["quality_gated"] < counts["non_null"]  # junk dropped
    assert counts["exact_unique"] == counts["quality_gated"] - 1
    assert counts["near_unique"] < counts["exact_unique"]  # near pair cut
    urls = {r["url"] for r in curated.select("url").collect()}
    assert "u://junk" not in urls and "u://short" not in urls
    # exact dedup keeps at most one of the identical pair; the near-dup
    # cluster {dup*, near1, near2} then collapses to exactly one survivor
    assert not ("u://dup1" in urls and "u://dup2" in urls)
    cluster = {u for u in urls if u.startswith(("u://dup", "u://near"))}
    assert len(cluster) == 1
    # distinct documents survive
    assert sum(1 for u in urls if u.startswith("u://") and
               u[4:].isdigit()) >= 15


def test_ivf_topk_recall(spark):
    from docvault_ocr_service_spark.operators.similarity import (
        brute_force_topk, ivf_topk)

    rng = np.random.RandomState(5)
    centers = rng.normal(size=(4, 16))
    vecs = np.vstack([centers[i // 10] + 0.1 * rng.normal(size=16)
                      for i in range(40)])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        ["vec_id", "embedding"])
    q = df.where(F.col("vec_id").isin(0, 10, 20)).select(
        F.col("vec_id").alias("query_id"), "embedding")
    corpus = df.where(~F.col("vec_id").isin(0, 10, 20))
    exact = {(r["query_id"], r["vec_id"])
             for r in brute_force_topk(corpus, q, k=3).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in ivf_topk(corpus, q, k=3, dim=16, n_centroids=4,
                                nprobe=2).collect()}
    assert len(exact & approx) / len(exact) >= 0.8


def test_stream_user_totals_stateful(spark, tmp_path):
    from docvault_ocr_service_spark.streaming.stream import (
        stream_user_totals)

    src = str(tmp_path / "ev")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.parquet(src)

    q = stream_user_totals(spark, src, query_name="totals_t")
    q.awaitTermination(300)

    emitted = spark.sql("select * from totals_t")
    # cumulative updates: the max per user is the final state
    final = (emitted.groupBy("user_id")
             .agg(F.max("n_events").alias("n"),
                  F.max("sum_value").alias("v")))
    truth = (events.groupBy("user_id")
             .agg(F.count("*").alias("n"),
                  F.round(F.sum("value"), 6).alias("v")))
    f = {r["user_id"]: (r["n"], r["v"]) for r in final.collect()}
    t = {r["user_id"]: (r["n"], r["v"]) for r in truth.collect()}
    assert set(f) == set(t)
    for u in t:
        assert f[u][0] == t[u][0]
        assert abs(f[u][1] - t[u][1]) < 1e-6


def test_curation_gopher_and_pii_stages(spark):
    long_good = ("the quick brown fox jumps over the lazy dog and that "
                 "dog went to sleep with all of the other dogs to have "
                 "a very long rest near the warm fire of the old house "
                 "and be happy about the day that had passed with many "
                 "fine things to remember and to tell of later on "
                 "write to me at jan@firma.pl or call +48 22 123 45 67")
    bullets = "\n".join("• item " + str(i) + " of the list of things"
                        for i in range(12))
    rows = [("u://good", long_good), ("u://bullets", bullets)]
    df = spark.createDataFrame(rows, ["url", "text"])

    curated, funnel = curate_corpus(
        df, min_quality=0.2, min_tokens=5,
        gopher_gate=True, scrub_pii=True)
    got = {r["url"]: r["text"] for r in curated.collect()}
    assert "u://bullets" not in got          # gopher bullet rule
    assert "u://good" in got
    assert "<EMAIL>" in got["u://good"] and "<PHONE>" in got["u://good"]
    assert "jan@firma.pl" not in got["u://good"]
    assert "gopher_pass" not in curated.columns
