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


def _train_roundgreedy_quadratic(rows, n_merges, min_count, topk):
    """Straight-line reference of the round-greedy algorithm (full
    recount per round, independent accept-rule re-implementation) —
    the byte-identity oracle for both production trainers."""
    vocab = [(int(f), list(s)) for f, s in rows]
    merges = []
    while len(merges) < n_merges:
        counts = {}
        for f, s in vocab:
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + f
        elig = sorted((kv for kv in counts.items() if kv[1] >= min_count),
                      key=lambda kv: (-kv[1], kv[0]))
        page = [p for p, _ in elig[:topk]]
        acc, syms = [], set()
        for a, b in page:
            if a in syms or b in syms or a + b in syms:
                continue
            acc.append((a, b))
            syms.update((a, b, a + b))
            if len(acc) >= n_merges - len(merges):
                break
        if not acc:
            break
        merges.extend(acc)
        lookup = {p: p[0] + p[1] for p in acc}
        for k, (f, s) in enumerate(vocab):
            r, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) in lookup:
                    r.append(lookup[(s[i], s[i + 1])])
                    i += 2
                else:
                    r.append(s[i])
                    i += 1
            vocab[k] = (f, r)
    return merges


def _fuzz_corpora():
    import random
    rng = random.Random(20260817)
    corpora = [
        ["low low low lower lower lowest", "low slow glow lower flow"],
        ["aaaa aaa aa a aab aab abab abab abab"],
        ["banana bandana cabana banana banana bandana"] * 3,
    ]
    for _ in range(6):
        words = ["".join(rng.choice("abcde")
                         for _ in range(rng.randint(1, 7)))
                 for _ in range(rng.randint(5, 40))]
        docs = [" ".join(rng.choice(words)
                         for _ in range(rng.randint(3, 30)))
                for _ in range(rng.randint(1, 6))]
        corpora.append(docs)
    return corpora


def test_incremental_local_matches_quadratic(spark):
    from docvault_ocr_service_spark.functions.bpe import (
        _train_local, _word_symbols)
    for docs in _fuzz_corpora():
        df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)],
                                   ["doc_id", "text"])
        rows = [(r["freq"], r["s"])
                for r in _word_symbols(df, "text").collect()]
        for mc in (1, 2):
            for topk in (3, 256):
                got = _train_local(list(rows), 60, mc, topk)
                want = _train_roundgreedy_quadratic(list(rows), 60, mc,
                                                    topk)
                assert got == want, (docs, mc, topk)


def test_batched_distributed_matches_local(spark):
    """Force the distributed path (driver_vocab_limit=0) and require
    byte-identical merges vs the driver path at the same page size
    (topk_per_round is part of the training semantics)."""
    for docs in _fuzz_corpora()[:5]:
        df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)],
                                   ["doc_id", "text"])
        for topk in (2, 7, 256):
            want = train_bpe(df, n_merges=25, min_count=1,
                             topk_per_round=topk)
            got = train_bpe(df, n_merges=25, min_count=1,
                            driver_vocab_limit=0, topk_per_round=topk)
            assert got == want, (docs, topk)


def _segment_word_replay(word, merges):
    """The pre-round-5 encoder: full in-order merge-list replay.  Kept
    here as the semantic pin for the pair-rank encoder."""
    from docvault_ocr_service_spark.functions.bpe import EOW, _merge_pass
    syms = list(word) + [EOW]
    for a, b in merges:
        syms = _merge_pass(syms, a, b)
        if len(syms) == 1:
            break
    return syms


def test_rank_encoder_matches_replay(spark):
    """The O(len^2)-per-word pair-rank encoder must segment every word
    byte-identically to the full merge-list replay, for merge lists
    trained at several batch widths over the fuzz corpora."""
    from docvault_ocr_service_spark.functions.bpe import (
        _segment_word, _train_local, _word_symbols)
    for docs in _fuzz_corpora():
        df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)],
                                   ["doc_id", "text"])
        rows = [(r["freq"], r["s"])
                for r in _word_symbols(df, "text").collect()]
        words = {w for t in docs for w in t.split()}
        for topk in (1, 3, 256):
            merges = _train_local(list(rows), 60, 1, topk)
            ranks = {p: i for i, p in enumerate(merges)}
            for w in sorted(words):
                assert _segment_word(w, merges, ranks) == \
                    _segment_word_replay(w, merges), (w, topk)


def test_merge_list_save_load_roundtrip(tmp_path):
    from docvault_ocr_service_spark.functions.bpe import (
        load_merges, save_merges)
    merges = [("l", "o"), ("lo", "w"), ("e", "r</w>")]
    p = str(tmp_path / "merges.json")
    save_merges(p, merges, topk_per_round=256)
    assert load_merges(p) == merges
    assert load_merges(p, expect_topk_per_round=256) == merges


def test_merge_list_load_rejects_mismatch(tmp_path):
    import json

    import pytest

    from docvault_ocr_service_spark.functions.bpe import (
        load_merges, save_merges)
    p = str(tmp_path / "merges.json")
    save_merges(p, [("a", "b")], topk_per_round=64)
    with pytest.raises(ValueError, match="topk_per_round"):
        load_merges(p, expect_topk_per_round=256)
    legacy = str(tmp_path / "legacy.json")
    with open(legacy, "w") as f:
        json.dump({"algorithm": "sequential-top1-v1",
                   "merges": [["a", "b"]]}, f)
    with pytest.raises(ValueError, match="sequential-top1-v1"):
        load_merges(legacy)
