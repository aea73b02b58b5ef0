"""Distributed byte-pair-encoding tokenizer (train + encode).

Sennrich et al. (2016) BPE, restated for Spark:

- **Training iterates over the WORD-FREQUENCY table, not the corpus.**
  The (word, freq) table is bounded by vocabulary size (≈10⁷ rows for a
  web corpus), so merge rounds of shuffle + top-K on it are cheap
  regardless of corpus bytes — the corpus is scanned exactly once to
  build it.  Training is ROUND-GREEDY BPE (the standard batched
  tokenizer-trainer scheme): each round ranks adjacent pairs by
  (count desc, then lexicographic — reruns pick identical merges),
  accepts every pair in rank order whose symbols AND concatenation are
  disjoint from the pairs already accepted this round, and applies the
  whole batch in one Arrow pass.  Disjointness means occurrences cannot
  overlap and no in-batch merge feeds another, so the batch equals
  applying its merges one at a time in any order; conflicting pairs
  just wait a round (their counts re-rank against the newly derived
  pairs).  Rounds, not merges, bound the Spark job count — a 32k-merge
  train is ~a few hundred jobs, not 32k.
- **Encoding** broadcasts the merge list and runs one mapInPandas-style
  kernel over documents, memoizing per-word segmentations per batch
  (Zipf makes the word cache hit rate ~99%).
- The end-of-word marker is a private-use codepoint (U+E000), so
  ``decode(encode(text)) == whitespace-normalized text`` holds for any
  text that doesn't itself use the PUA — the roundtrip identity the
  driver-gate oracle checks corpus-wide.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "\ue000"    # end-of-word marker (private use area)

_PAIRS_EXPR = (
    "transform(slice(s, 1, size(s) - 1), "
    "(x, i) -> struct(x AS a, element_at(s, i + 2) AS b))")


def _word_symbols(df: DataFrame, text_col: str) -> DataFrame:
    """(s: array<string>, freq) — per distinct word, its character
    symbols with the EOW marker appended as a standalone symbol."""
    words = (df.select(F.explode(
                 F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"))
             .where(F.col("w") != "")
             .groupBy("w").agg(F.count("*").alias("freq")))
    # split on the zero-width boundary strictly BETWEEN chars ((?=.)
    # keeps Spark's limit=-1 split from emitting a trailing empty)
    return words.select(
        "freq",
        F.concat(F.split(F.col("w"), "(?!^)(?=.)"),
                 F.array(F.lit(EOW))).alias("s"))


def _merge_word(s: list, a: str, b: str) -> list:
    """One left-to-right merge pass of (a, b) -> a+b over a symbol list."""
    r: list[str] = []
    i = 0
    n = len(s)
    while i < n:
        if i + 1 < n and s[i] == a and s[i + 1] == b:
            r.append(a + b)
            i += 2
        else:
            r.append(s[i])
            i += 1
    return r


def _accept_batch(ranked: list[tuple[str, str]],
                  budget: int) -> list[tuple[str, str]]:
    """The round-greedy acceptance rule, shared verbatim by the local
    and distributed trainers (that sharing is what makes the two paths
    byte-identical): walk the round's ranked pair page in order,
    accepting every pair whose two symbols AND concatenation are
    disjoint from the symbols/concatenations accepted earlier this
    round; conflicting pairs are skipped and re-rank next round."""
    accepted: list[tuple[str, str]] = []
    syms: set[str] = set()
    for a, b in ranked:
        if a in syms or b in syms or (a + b) in syms:
            continue
        accepted.append((a, b))
        syms.update((a, b, a + b))
        if len(accepted) >= budget:
            break
    return accepted


def _train_local(rows: list, n_merges: int, min_count: int,
                 topk_per_round: int) -> list[tuple[str, str]]:
    """In-memory round-greedy trainer for bounded vocabularies —
    byte-identical to the distributed loop: same per-round ranked page
    (top ``topk_per_round`` by count desc, then lexicographic), same
    ``_accept_batch`` rule.

    Incremental: a pair -> {word index} inverted index means each merge
    only re-counts the words that actually contain it (Zipf: a shrinking
    handful after the first few hundred merges), instead of re-scanning
    the whole vocab table per merge."""
    vocab = [(int(freq), list(s)) for freq, s in rows]
    counts: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set] = {}
    for k, (freq, s) in enumerate(vocab):
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            counts[p] = counts.get(p, 0) + freq
            index.setdefault(p, set()).add(k)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        eligible = [kv for kv in counts.items() if kv[1] >= min_count]
        if not eligible:
            break
        eligible.sort(key=lambda kv: (-kv[1], kv[0]))
        page = [p for p, _ in eligible[:topk_per_round]]
        batch = _accept_batch(page, n_merges - len(merges))
        if not batch:
            break
        merges.extend(batch)
        for a, b in batch:
            touched = index.pop((a, b), set())
            counts.pop((a, b), None)
            for k in touched:
                freq, s = vocab[k]
                for i in range(len(s) - 1):
                    p = (s[i], s[i + 1])
                    c = counts.get(p)
                    if c is not None:
                        if c - freq <= 0:
                            counts.pop(p)
                        else:
                            counts[p] = c - freq
                    ix = index.get(p)
                    if ix is not None:
                        ix.discard(k)
                r = _merge_word(s, a, b)
                vocab[k] = (freq, r)
                for i in range(len(r) - 1):
                    p = (r[i], r[i + 1])
                    counts[p] = counts.get(p, 0) + freq
                    index.setdefault(p, set()).add(k)
    return merges


def _apply_merges_kernel(df: DataFrame,
                         batch: list[tuple[str, str]]) -> DataFrame:
    """Apply a disjoint merge batch in one Arrow pass over the vocab
    table.  Disjointness (symbols + concatenations) means occurrences
    cannot overlap and no merge output feeds another in-batch merge, so
    a single left-to-right scan with a combined lookup equals applying
    the merges one at a time in any order."""
    lookup = {(a, b): a + b for a, b in batch}

    @F.pandas_udf("array<string>")
    def apply_all(ss: pd.Series) -> pd.Series:
        out = []
        for s in ss:
            s = list(s)
            r: list[str] = []
            i = 0
            n = len(s)
            while i < n:
                if i + 1 < n:
                    m = lookup.get((s[i], s[i + 1]))
                    if m is not None:
                        r.append(m)
                        i += 2
                        continue
                r.append(s[i])
                i += 1
            out.append(r)
        return pd.Series(out)

    return df.select("freq", apply_all(F.col("s")).alias("s"))


def train_bpe(df: DataFrame, text_col: str = "text",
              n_merges: int = 30, min_count: int = 2,
              checkpoint_every: int = 1,
              driver_vocab_limit: int = 2_000_000,
              topk_per_round: int = 256) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges (round-greedy BPE; see module
    docstring); stops early when no adjacent pair reaches ``min_count``
    weighted occurrences.

    Small vocabularies (<= ``driver_vocab_limit`` distinct words) train
    on the driver — the same bounded-collect hybrid the IVF index uses
    for k-means.  The word-FREQUENCY table is vocab-bounded (~10⁷
    distinct words for a web corpus, ≈1 GB as (freq, symbols) rows), so
    even a 100 TB corpus usually fits the driver path; the corpus
    itself is scanned exactly once to build the table.

    The distributed loop runs the SAME round-greedy algorithm: one
    count job per round fetches the top ``topk_per_round`` eligible
    pairs (count desc, then lexicographic), ``_accept_batch`` — the
    function the local path also calls — picks the disjoint subset,
    and one Arrow pass applies the whole batch.  Driver round-trips
    scale with rounds (tens), not merges (thousands).  Both paths pick
    byte-identical merges (fuzzed in tests/test_bpe.py);
    ``topk_per_round`` is part of the training semantics, so use the
    same value when comparing runs."""
    base = _word_symbols(df, text_col)
    if driver_vocab_limit > 0:
        # one probe job: limit+1 rows decide the path AND deliver the
        # vocab when it is small enough
        probe = base.limit(driver_vocab_limit + 1).collect()
        if len(probe) <= driver_vocab_limit:
            return _train_local([(r["freq"], r["s"]) for r in probe],
                                n_merges, min_count, topk_per_round)
    cur = base.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    rounds_since_ckpt = 0
    while len(merges) < n_merges:
        pairs = (cur.select("freq", F.explode(F.expr(_PAIRS_EXPR))
                            .alias("p"))
                 .select("freq", "p.a", "p.b")
                 .groupBy("a", "b").agg(F.sum("freq").alias("c"))
                 .where(F.col("c") >= min_count))
        top = (pairs.orderBy(F.desc("c"), "a", "b")
               .limit(topk_per_round).collect())
        batch = _accept_batch([(r["a"], r["b"]) for r in top],
                              n_merges - len(merges))
        if not batch:
            break
        merges.extend(batch)
        cur = _apply_merges_kernel(cur, batch)
        rounds_since_ckpt += 1
        if rounds_since_ckpt >= checkpoint_every:
            cur = cur.localCheckpoint(eager=True)
            rounds_since_ckpt = 0
    return merges


def _merge_pass(syms: list[str], a: str, b: str) -> list[str]:
    """One left-to-right pass replacing every adjacent (a, b) — the
    identical pass the trainer's ``_merge_word`` performs."""
    i = 0
    r: list[str] = []
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            r.append(a + b)
            i += 2
        else:
            r.append(syms[i])
            i += 1
    return r


def _segment_word(word: str, merges: list[tuple[str, str]],
                  ranks: dict[tuple[str, str], int] | None = None
                  ) -> list[str]:
    """Pair-rank encoder (the GPT-2 ``bpe()`` shape): repeatedly apply
    the lowest-ranked merge present in the word until none applies —
    O(len²) per word, INDEPENDENT of vocab size, vs the old full
    merge-list replay's O(n_merges × len).

    Byte-identical to sequential replay for any merge list this trainer
    produces (fuzz-pinned in tests/test_bpe.py): a pair ranked r can
    only become adjacent through merges ranked < r (its two components
    are formed strictly earlier in the list and nothing between them
    can be consumed by a later merge first), so picking the globally
    lowest applicable rank replays the same passes the in-order walk
    would."""
    if ranks is None:
        ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best = None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        syms = _merge_pass(syms, *merges[best])
    return syms


def encode_bpe(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """df + ``out_col`` array<string> (null text → null), applying the
    trained merges in order — identical segmentation to training."""
    mg = list(merges)
    rk = {p: i for i, p in enumerate(mg)}

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        # ASCII-whitespace split, matching Java's \s in the training
        # path (Python str.split()/re \s are unicode-wide and would
        # segment NBSP-bearing docs differently than training did)
        ws = re.compile(r"[ \t\n\r\f\x0b]+")
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list[str] = []
            for w in ws.split(t.strip(" \t\n\r\f\x0b")):
                if not w:
                    continue
                seg = cache.get(w)
                if seg is None:
                    seg = _segment_word(w, mg, rk)
                    cache[w] = seg
                toks.extend(seg)
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, enc(F.col(text_col)))


def decode_bpe(tokens):
    """Inverse of encode: concat subwords, EOW → space, trim — equals
    the whitespace-normalized source text."""
    return F.btrim(F.regexp_replace(
        F.concat_ws("", tokens), EOW, " "))


# ---------------------------------------------------------------------------
# Merge-list persistence.  Round-greedy training is parameterized by
# topk_per_round (the batch width is part of the semantics — see
# train_bpe), so persisted merge lists carry the trainer tag + params;
# loading a list trained under a different scheme raises instead of
# silently comparing apples to oranges.

TRAINER_ALGORITHM = "round-greedy-v2"


def save_merges(path: str, merges: list[tuple[str, str]], *,
                topk_per_round: int, min_count: int = 2) -> None:
    """Persist a trained merge list as JSON with the trainer contract
    (algorithm tag, topk_per_round, min_count) in the header."""
    import json

    with open(path, "w", encoding="utf-8") as f:
        json.dump({"algorithm": TRAINER_ALGORITHM,
                   "topk_per_round": topk_per_round,
                   "min_count": min_count,
                   "n_merges": len(merges),
                   "merges": [[a, b] for a, b in merges]}, f,
                  ensure_ascii=False)


def load_merges(path: str, *, expect_topk_per_round: int | None = None
                ) -> list[tuple[str, str]]:
    """Load a persisted merge list; raises ValueError if the artifact
    was trained under a different algorithm (e.g. the pre-round-4
    sequential top-1 trainer) or, when ``expect_topk_per_round`` is
    given, a different batch width."""
    import json

    with open(path, encoding="utf-8") as f:
        art = json.load(f)
    algo = art.get("algorithm")
    if algo != TRAINER_ALGORITHM:
        raise ValueError(
            f"merge list at {path} was trained by {algo!r}, this "
            f"trainer is {TRAINER_ALGORITHM!r} — retrain or load with "
            f"the matching engine version")
    if (expect_topk_per_round is not None
            and art.get("topk_per_round") != expect_topk_per_round):
        raise ValueError(
            f"merge list at {path} was trained with topk_per_round="
            f"{art.get('topk_per_round')}, expected "
            f"{expect_topk_per_round}")
    return [(a, b) for a, b in art["merges"]]
