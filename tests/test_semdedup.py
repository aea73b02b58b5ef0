"""SemDeDup: semantic dedup by embedding clusters
(operators/similarity.py::semdedup)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from docvault_ocr_service_spark.operators.similarity import semdedup


def _vec(d: int, k_dim: int = 8) -> list[float]:
    return [float(int(hashlib.md5(f"{d}:{k}".encode())
                      .hexdigest()[:8], 16) % 2001 - 1000)
            for k in range(k_dim)]


def test_fixture_distinct_cosine_bound():
    """The oracle's clustering-independence argument rests on distinct
    fixture vectors never crossing the 0.9999 dup threshold — pin the
    actual bound."""
    v = np.array([_vec(d) for d in range(200)])
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    s = vn @ vn.T
    np.fill_diagonal(s, -1)
    assert float(s.max()) < 0.99      # measured 0.9678


def test_semdedup_keeps_one_per_clone_group(spark):
    rows = []
    for d in range(60):
        rows.append((d, _vec(d)))
        if d % 3 == 0:
            rows.append((d + 100000, _vec(d)))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = sorted(r["vec_id"] for r in
                  semdedup(df, dim=8, n_centroids=4,
                           min_cosine=0.9999).collect())
    # exact-clone ties keep the lowest id -> all originals survive
    assert kept == list(range(60))


def test_semdedup_keep_far_policy(spark):
    """Non-tied groups: keep='far' keeps the member FARTHEST from the
    cluster centroid (the paper's rule), 'near' the closest."""
    # one tight cluster of three near-identical vectors, plus spread
    # rows so k-means has something to chew on; vector 2 is scaled
    # (same direction = same cosine-to-anything) with a tiny rotation
    base = np.array([100.0, 0, 0, 0, 0, 0, 0, 0])
    tight = [
        (0, (base + [0, 0.1, 0, 0, 0, 0, 0, 0]).tolist()),
        (1, (base + [0, 0, 0.1, 0, 0, 0, 0, 0]).tolist()),
        (2, (base + [0, 3.0, 0, 0, 0, 0, 0, 0]).tolist()),
    ]
    spread = [(10 + i, _vec(900 + i)) for i in range(30)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in tight + spread],
        "vec_id long, embedding array<float>")
    kept_far = {r["vec_id"] for r in
                semdedup(df, dim=8, n_centroids=2,
                         min_cosine=0.999, keep="far").collect()}
    kept_near = {r["vec_id"] for r in
                 semdedup(df, dim=8, n_centroids=2,
                          min_cosine=0.999, keep="near").collect()}
    # exactly one of the tight trio survives under each policy
    assert len(kept_far & {0, 1, 2}) == 1
    assert len(kept_near & {0, 1, 2}) == 1
    # and every spread row survives under both
    assert {10 + i for i in range(30)} <= kept_far
    assert {10 + i for i in range(30)} <= kept_near


def test_semdedup_rejects_string_ids(spark):
    df = spark.createDataFrame([("u1", [1.0, 0.0])],
                               "vec_id string, embedding array<float>")
    with pytest.raises(ValueError, match="numeric id"):
        semdedup(df, dim=2)


def test_semdedup_oversized_clusters_kept_asis(spark):
    """Clusters above max_cluster are excluded from pairing (kept
    as-is), never silently paired quadratically."""
    rows = [(d, _vec(d)) for d in range(40)]
    rows += [(d + 100000, _vec(d)) for d in range(0, 40, 2)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # max_cluster=1 -> every cluster oversized -> nothing dropped
    kept = semdedup(df, dim=8, n_centroids=2, min_cosine=0.9999,
                    max_cluster=1)
    assert kept.count() == len(rows)
