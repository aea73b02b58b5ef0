"""Distributed BPE: vocab-table training, merge determinism, encode/
decode roundtrip identity."""

from pyspark.sql import functions as F

from docvault_ocr_service_spark.functions.bpe import (
    EOW, decode_bpe, encode_bpe, train_bpe)


def test_train_learns_frequent_pairs(spark):
    # classic Sennrich toy corpus: 'lo' dominates
    rows = [(1, "low low low lower lower lowest"),
            (2, "low slow glow lower flow")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = train_bpe(df, n_merges=5)
    assert len(merges) == 5
    assert merges[0] == ("l", "o")          # 9 weighted occurrences
    # merges are deterministic across re-runs
    assert train_bpe(df, n_merges=5) == merges


def test_encode_decode_roundtrip(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "  spaced   out\ttext\nacross lines  "),
            (4, None)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = train_bpe(df, n_merges=20)
    enc = encode_bpe(df, merges)
    out = enc.select(
        "doc_id", "text",
        decode_bpe(F.col("bpe_tokens")).alias("decoded"),
        F.size("bpe_tokens").alias("n_tok")).collect()
    by = {r["doc_id"]: r for r in out}
    for i in (1, 2, 3):
        want = " ".join(by[i]["text"].split())
        assert by[i]["decoded"] == want, i
    assert by[4]["decoded"] == ""           # concat_ws of null → ''
    # merging actually compresses: fewer tokens than chars
    assert by[1]["n_tok"] < len(by[1]["text"])


def test_encode_matches_training_segmentation(spark):
    """A word seen in training segments identically at encode time
    (merges applied in the same order)."""
    rows = [(1, "banana bandana banana banana bandana")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = train_bpe(df, n_merges=8)
    enc = encode_bpe(df, merges).first()
    toks = list(enc["bpe_tokens"])
    # decode identity implies consistency; also no token is empty
    assert all(t for t in toks)
    assert "".join(toks).replace(EOW, " ").strip() == \
        "banana bandana banana banana bandana"


def test_early_stop_when_pairs_exhaust(spark):
    df = spark.createDataFrame([(1, "ab ab")], ["doc_id", "text"])
    merges = train_bpe(df, n_merges=50)
    # 'ab' + eow: only 2 mergeable pairs exist -> early stop well below 50
    assert 0 < len(merges) <= 3
