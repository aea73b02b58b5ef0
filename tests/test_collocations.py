"""Bigram PMI collocations vs a pure-Python reference."""

import math
from collections import Counter

from docvault_ocr_service_spark.functions.collocations import (
    PMI_SCALE, bigram_pmi)

DOCS = [
    "new york is a big city",
    "new york new york",
    "the city is big",
    "a trip to new york",
    "big city lights in the big city",
    "",
    None,
    "single",
]


def _py_pmi(docs, min_count, top_k):
    uni, bi = Counter(), Counter()
    t2 = 0
    for t in docs:
        ts = (t or "").lower().split()
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
        t2 += max(len(ts) - 1, 0)
    t1 = sum(uni.values())
    rows = []
    for (w1, w2), c in bi.items():
        if c < min_count:
            continue
        pmi = math.log((c * t1 * t1) / (t2 * uni[w1] * uni[w2]))
        rows.append((w1, w2, c, int(round(pmi * PMI_SCALE))))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:top_k]


def test_pmi_matches_python_reference(spark):
    df = spark.createDataFrame([(t,) for t in DOCS], "text string")
    got = [(r["w1"], r["w2"], r["pair_count"], r["pmi_micro"])
           for r in bigram_pmi(df, min_count=2, top_k=10).collect()]
    assert got == _py_pmi(DOCS, 2, 10)
    # "new york" is the strongest collocation in this corpus
    assert got[0][:2] == ("new", "york")


def test_pmi_min_count_filters(spark):
    df = spark.createDataFrame([(t,) for t in DOCS], "text string")
    got = bigram_pmi(df, min_count=3, top_k=10).collect()
    assert all(r["pair_count"] >= 3 for r in got)
    pairs = {(r["w1"], r["w2"]) for r in got}
    assert ("new", "york") in pairs
    assert ("big", "city") in pairs


def test_pmi_no_cross_document_bigrams(spark):
    # "alpha" ends doc 1 and "beta" starts doc 2: the pair must not count
    df = spark.createDataFrame(
        [("x alpha",), ("beta y",)] * 3, "text string")
    got = bigram_pmi(df, min_count=1, top_k=20).collect()
    assert ("alpha", "beta") not in {(r["w1"], r["w2"]) for r in got}


def test_pmi_empty_and_short_docs(spark):
    df = spark.createDataFrame(
        [("",), (None,), ("  ",), ("one",)], "text string")
    assert bigram_pmi(df, min_count=1).count() == 0


def _py_vocab_stats(docs, zipf_top=1000):
    import math
    from collections import Counter
    uni = Counter()
    for t in docs:
        uni.update((t or "").lower().split())
    n_tokens = sum(uni.values())
    vocab = len(uni)
    hapax = sum(1 for c in uni.values() if c == 1)
    by = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))
    top_c = sum(c for _, c in by[:100])
    S = 1_000_000
    sx = sy = sxy = sxx = 0
    n = 0
    for r, (_, c) in enumerate(by[:zipf_top], 1):
        x, y = math.log(r), math.log(c)
        sx += int(round(x * S)); sy += int(round(y * S))
        sxy += int(round(x * y * S)); sxx += int(round(x * x * S))
        n += 1
    den = float(n) * sxx * S - float(sx) * sx
    slope = (float(n) * sxy * S - float(sx) * sy) / den if den else 0.0
    return (n_tokens, vocab,
            int(round(hapax / vocab * S)) if vocab else 0,
            int(round(top_c / n_tokens * S)) if n_tokens else 0,
            int(round(slope * S)))


def test_vocab_stats_matches_python(spark):
    from docvault_ocr_service_spark.functions.collocations import (
        vocab_stats)
    docs = [" ".join(["zipf"] * 16 + ["law"] * 8 + ["word"] * 4
                     + ["rare", "rarer"]),
            "zipf law again and again", "one-off hapax token here",
            "", None]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    r = vocab_stats(df, zipf_top=50).collect()[0]
    got = (r["n_tokens"], r["vocab_size"], r["hapax_frac_micro"],
           r["top100_coverage_micro"], r["zipf_slope_micro"])
    assert got == _py_vocab_stats(docs, 50)
    # a frequency-skewed corpus has a negative slope
    assert r["zipf_slope_micro"] < 0


def test_vocab_stats_empty_corpus(spark):
    from docvault_ocr_service_spark.functions.collocations import (
        vocab_stats)
    df = spark.createDataFrame([("",), (None,)], "text string")
    r = vocab_stats(df).collect()[0]
    assert (r["n_tokens"], r["vocab_size"], r["hapax_frac_micro"],
            r["top100_coverage_micro"], r["zipf_slope_micro"]) \
        == (0, 0, 0, 0, 0)


def _py_drift(a_docs, b_docs, top_k=5):
    import math
    from collections import Counter
    ca, cb = Counter(), Counter()
    for t in a_docs:
        ca.update((t or "").lower().split())
    for t in b_docs:
        cb.update((t or "").lower().split())
    vocab = sorted(set(ca) | set(cb))
    v, ta, tb = len(vocab), sum(ca.values()), sum(cb.values())
    S = 1_000_000_000_000
    kab = kba = 0
    lrs = {}
    for w in vocab:
        p = (ca[w] + 1) / (ta + v)
        q = (cb[w] + 1) / (tb + v)
        lr = math.log(p / q)
        kab += int(round(p * lr * S))
        kba += int(round(q * -lr * S))
        lrs[w] = int(round(lr * 1e6))
    # lr = ln(p/q) measures a-heaviness: rising-into-b = most
    # negative lr first
    rising = [w for w, _ in sorted(lrs.items(),
                                   key=lambda kv: (kv[1], kv[0]))[:top_k]]
    falling = [w for w, _ in sorted(lrs.items(),
                                    key=lambda kv: (-kv[1], kv[0]))[:top_k]]
    return (v, int(round(kab / 1e6)), int(round(kba / 1e6)),
            ",".join(rising), ",".join(falling))


def test_corpus_drift_matches_python(spark):
    from docvault_ocr_service_spark.functions.collocations import (
        corpus_drift)
    a_docs = ["alpha beta gamma common words here", "alpha alpha beta",
              "common words appear twice"]
    b_docs = ["delta epsilon common words here", "delta delta beta",
              "common words appear twice and drifted tokens grew"]
    a = spark.createDataFrame([(t,) for t in a_docs], "text string")
    b = spark.createDataFrame([(t,) for t in b_docs], "text string")
    r = corpus_drift(a, b, top_k=3).collect()[0]
    got = (r["n_terms"], r["kl_ab_micro"], r["kl_ba_micro"],
           r["rising"], r["falling"])
    assert got == _py_drift(a_docs, b_docs, 3)
    assert r["kl_ab_micro"] > 0 and r["kl_ba_micro"] > 0
    # delta/drifted grew INTO snapshot b; alpha declined
    assert "delta" in r["rising"] and "drifted" in r["rising"]
    assert "alpha" in r["falling"]


def test_corpus_drift_identical_corpora(spark):
    from docvault_ocr_service_spark.functions.collocations import (
        corpus_drift)
    docs = [("same text here",), ("more same text",)]
    a = spark.createDataFrame(docs, "text string")
    b = spark.createDataFrame(docs, "text string")
    r = corpus_drift(a, b).collect()[0]
    assert r["kl_ab_micro"] == 0 and r["kl_ba_micro"] == 0
