"""Distributed byte-pair-encoding tokenizer (train + encode).

Sennrich et al. (2016) BPE, restated for Spark:

- **Training iterates over the WORD-FREQUENCY table, not the corpus.**
  The (word, freq) table is bounded by vocabulary size (≈10⁷ rows for a
  web corpus), so 30-50 merge iterations of shuffle + top-1 on it are
  cheap regardless of corpus bytes — the corpus is scanned exactly once
  to build it.  Each iteration: columnar adjacent-pair explode →
  freq-weighted groupBy → deterministic top-1 (count desc, then
  lexicographic — reruns pick identical merges) → apply the merge to
  the symbol arrays (one Arrow-batched kernel over the vocab table).
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


def _merge_expr(a: str, b: str):
    """Columnar left-to-right pair merge: fold the symbol array with an
    accumulator, replacing the tail symbol when (last, current) == (a, b).
    Equivalent to the lookahead-skip scan because a merged token a+b can
    never equal a (b is nonempty), so a merge can't re-trigger itself.
    Pure JVM (no Python worker round-trip per iteration); literals go in
    as Columns, so symbols containing quotes can't inject."""
    return F.aggregate(
        F.col("s"),
        F.expr("cast(array() as array<string>)"),
        lambda r, x: F.when(
            (F.size(r) > 0)
            & (F.element_at(r, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(r, 1, F.size(r) - 1),
                     F.array(F.lit(a + b))),
        ).otherwise(F.concat(r, F.array(x))),
    )


def _train_local(rows: list, n_merges: int,
                 min_count: int) -> list[tuple[str, str]]:
    """In-memory trainer for bounded vocabularies — byte-identical
    merge choices to the distributed loop (same count-desc then
    lexicographic tie-break)."""
    vocab = [(int(freq), list(s)) for freq, s in rows]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for freq, s in vocab:
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        a, b = best[0]
        merges.append((a, b))
        for k, (freq, s) in enumerate(vocab):
            r: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    r.append(a + b)
                    i += 2
                else:
                    r.append(s[i])
                    i += 1
            vocab[k] = (freq, r)
    return merges


def train_bpe(df: DataFrame, text_col: str = "text",
              n_merges: int = 30, min_count: int = 2,
              checkpoint_every: int = 4,
              driver_vocab_limit: int = 200_000) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges; stops early when no adjacent
    pair reaches ``min_count`` weighted occurrences.

    One top-1 job per iteration; the merged symbol arrays stay a lazy
    column expression and are eagerly ``localCheckpoint``-ed every
    ``checkpoint_every`` merges — the compromise between plan-nesting
    (one aggregate per un-checkpointed merge; analysis cost grows with
    depth) and job count (each checkpoint is an extra materialization of
    the vocab table).

    Small vocabularies (<= ``driver_vocab_limit`` distinct words) train
    on the driver instead — the same bounded-collect hybrid the IVF
    index uses for k-means: the distributed loop's per-iteration job
    latency only pays off once the vocab table stops fitting in driver
    memory.  Both paths pick byte-identical merges."""
    base = _word_symbols(df, text_col)
    if driver_vocab_limit > 0:
        # one probe job: limit+1 rows decide the path AND deliver the
        # vocab when it is small enough
        probe = base.limit(driver_vocab_limit + 1).collect()
        if len(probe) <= driver_vocab_limit:
            return _train_local([(r["freq"], r["s"]) for r in probe],
                                n_merges, min_count)
    cur = base.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    since_ckpt = 0
    for _ in range(n_merges):
        pairs = (cur.select("freq", F.explode(F.expr(_PAIRS_EXPR))
                            .alias("p"))
                 .select("freq", "p.a", "p.b")
                 .groupBy("a", "b").agg(F.sum("freq").alias("c")))
        top = (pairs.orderBy(F.desc("c"), "a", "b").limit(1).collect())
        if not top or top[0]["c"] < min_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        cur = cur.select("freq", _merge_expr(a, b).alias("s"))
        since_ckpt += 1
        if since_ckpt >= checkpoint_every:
            cur = cur.localCheckpoint(eager=True)
            since_ckpt = 0
    return merges


def _segment_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word) + [EOW]
    for a, b in merges:
        i = 0
        r: list[str] = []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                r.append(a + b)
                i += 2
            else:
                r.append(syms[i])
                i += 1
        syms = r
        if len(syms) == 1:
            break
    return syms


def encode_bpe(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """df + ``out_col`` array<string> (null text → null), applying the
    trained merges in order — identical segmentation to training."""
    mg = list(merges)

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
                    seg = _segment_word(w, mg)
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
