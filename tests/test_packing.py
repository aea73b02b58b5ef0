"""Sequence-packing operator: prefix-sum window assignment."""

from docvault_ocr_service_spark.operators.packing import (
    pack_sequences, packing_stats)


def test_pack_sequences_basic(spark):
    docs = spark.createDataFrame(
        [(1, 100), (2, 400), (3, 20), (4, 0), (5, 600), (6, 4)],
        ["doc_id", "n"])
    packed = {r["doc_id"]: r for r in
              pack_sequences(docs, "doc_id", "n", window=512).collect()}
    assert 4 not in packed                      # zero-token doc dropped
    assert packed[1]["start_tok"] == 0
    assert (packed[1]["first_win"], packed[1]["last_win"]) == (0, 0)
    # doc 2: tokens 100..499 → window 0 only
    assert (packed[2]["first_win"], packed[2]["last_win"]) == (0, 0)
    # doc 3: tokens 500..519 → spans windows 0-1
    assert (packed[3]["first_win"], packed[3]["last_win"]) == (0, 1)
    assert packed[3]["n_windows_spanned"] == 2
    # doc 5: tokens 520..1119 → windows 1-2
    assert (packed[5]["first_win"], packed[5]["last_win"]) == (1, 2)
    assert packed[6]["start_tok"] == 1120

    stats = packing_stats(
        pack_sequences(docs, "doc_id", "n", window=512), "n", 512).first()
    assert stats["n_docs"] == 5
    assert stats["total_tokens"] == 1124
    assert stats["n_windows"] == 3
    assert stats["n_spanning"] == 2             # docs 3 and 5
    # last window holds tokens 1024..1123 of 1124 → 100/512 full
    assert abs(stats["last_fill"] - 100 / 512) < 1e-12


def test_pack_sequences_sharded(spark):
    """shard_col keeps the sort partition-local: windows are numbered
    per shard and each shard's stream starts at offset 0."""
    docs = spark.createDataFrame(
        [("a", 1, 300), ("a", 2, 300), ("b", 1, 500), ("b", 2, 100)],
        ["shard", "doc_id", "n"])
    packed = {(r["shard"], r["doc_id"]): r for r in
              pack_sequences(docs, "doc_id", "n", window=512,
                             shard_col="shard").collect()}
    assert packed[("a", 1)]["start_tok"] == 0
    assert packed[("b", 1)]["start_tok"] == 0
    assert packed[("a", 2)]["start_tok"] == 300
    assert packed[("a", 2)]["last_win"] == 1    # 300..599 spans boundary
    assert packed[("b", 2)]["first_win"] == 0   # 500..599
