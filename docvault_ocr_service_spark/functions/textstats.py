"""Text-analysis column functions — JVM-side, whole-stage-codegen friendly.

Everything here is built from ``pyspark.sql.functions`` (no Python in the
hot path): token counting, quality scoring, n-gram-heuristic language ID,
and document fingerprinting.  These are the "training-data pipeline"
operators the 100 TB use case needs on top of the reference's extraction
surface; each has a DuckDB-SQL oracle twin in ``__spark_entry__.py``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny embedded stopword lists for ratio features + language ID.
STOPWORDS_EN: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that", "be",
)
STOPWORDS_PL: tuple[str, ...] = (
    "i", "w", "z", "na", "do", "się", "jest", "nie", "to", "że", "o",
    "jak", "po", "dla", "przy", "od", "za", "ale", "czy", "być",
)
STOPWORDS_DE: tuple[str, ...] = (
    "der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine",
    "zu", "den", "von", "für", "auf", "im", "des", "dem", "sich",
)
# r6: the corpus carries es/fr/zh documents too — markers chosen
# DISJOINT from the en/pl/de lists and from each other, so existing
# en/pl/de vote outcomes are unchanged on marker-free text
STOPWORDS_ES: tuple[str, ...] = (
    "el", "los", "las", "una", "este", "esta", "por", "pero", "como",
    "más", "sus", "muy", "sin", "sobre", "entre", "cuando", "hasta",
    "también",
)
STOPWORDS_FR: tuple[str, ...] = (
    "le", "les", "une", "est", "dans", "pas", "pour", "vous", "avec",
    "sur", "mais", "aux", "ses", "cette", "sont", "nous", "plus",
    "été",
)

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": STOPWORDS_EN,
    "pl": STOPWORDS_PL,
    "de": STOPWORDS_DE,
    "es": STOPWORDS_ES,
    "fr": STOPWORDS_FR,
}


def tokens(text: Column) -> Column:
    """Whitespace tokens; empty/blank text → empty array (not [''])."""
    trimmed = F.btrim(text)
    return F.when(
        trimmed.isNull() | (trimmed == ""), F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, r"\s+"))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def verbatim_tokens(text: Column) -> Column:
    """Case-preserving whitespace tokens with empties dropped — the
    corpus-wide split convention where the token TEXT must survive
    verbatim (chunking, anything that re-joins tokens); null or
    whitespace-only text yields an empty array, never ``[""]``."""
    raw = F.split(F.btrim(text), r"\s+")
    out = F.filter(raw, lambda t: t != "")
    return F.when(text.isNull(), F.array().cast("array<string>")) \
        .otherwise(out)


def lower_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens with empties dropped — the
    corpus-wide tokenization convention shared by the BM25 /
    collocation / dedup-shingle / DSIR stack
    (``split(btrim(lower(text)), \\s+)``)."""
    return verbatim_tokens(F.lower(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish count: split on whitespace AND letter/digit/punct
    boundaries (a cheap, deterministic BPE stand-in for budget estimates)."""
    trimmed = F.btrim(text)
    pieces = F.split(
        trimmed, r"(?:\s+|(?<=[0-9])(?=[^0-9\s])|(?<=[^0-9\s])(?=[0-9])|(?<=[\p{L}])(?=[^\p{L}\s0-9])|(?<=[^\p{L}\s0-9])(?=[\p{L}]))"
    )
    return F.when(
        trimmed.isNull() | (trimmed == ""), F.lit(0)
    ).otherwise(F.size(F.filter(pieces, lambda p: p != "")))


def stopword_ratio(text: Column, stopwords: tuple[str, ...]) -> Column:
    toks = tokens(F.lower(text))
    stops = F.array(*[F.lit(w) for w in stopwords])
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    # count of non-alnum, non-space chars / total chars
    stripped = F.regexp_replace(text, r"[\p{L}\p{N}\s]", "")
    return F.when(n > 0, F.length(stripped).cast("double") / n) \
            .otherwise(F.lit(0.0))


def digit_ratio(text: Column) -> Column:
    n = F.length(text)
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    return F.when(n > 0, digits.cast("double") / n).otherwise(F.lit(0.0))


def mean_word_len(text: Column) -> Column:
    toks = tokens(text)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0),
                        lambda acc, t: acc + F.length(t)).cast("double")
    return F.when(n > 0, total / n).otherwise(F.lit(0.0))


def quality_score(text: Column,
                  stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Composite [0,1] web-text quality heuristic (Gopher-rules flavored):
    rewards stopword presence and sane word lengths, penalizes punctuation
    and digit soup and ultra-short docs.  Deterministic, fully columnar."""
    n_tok = token_count(text).cast("double")
    len_component = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    stop_component = F.least(stopword_ratio(text, stopwords) * 4, F.lit(1.0))
    wl = mean_word_len(text)
    wordlen_component = F.when((wl >= 3) & (wl <= 10), F.lit(1.0)) \
                         .otherwise(F.lit(0.3))
    punct_penalty = F.greatest(F.lit(0.0),
                               F.lit(1.0) - punct_ratio(text) * 3)
    digit_penalty = F.greatest(F.lit(0.0),
                               F.lit(1.0) - digit_ratio(text) * 2)
    return (len_component * 0.25 + stop_component * 0.25
            + wordlen_component * 0.2 + punct_penalty * 0.15
            + digit_penalty * 0.15)


def lang_votes(text: Column, lang: str) -> Column:
    """Stopword-hit count for one language over lowered tokens."""
    toks = tokens(F.lower(text))
    stops = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))


def detect_lang(text: Column) -> Column:
    """Marker-word-vote language ID →
    'en'|'pl'|'de'|'es'|'fr'|'zh'|'und'.

    Chinese is detected first by CJK-codepoint density (>5% of
    characters in U+4E00–U+9FFF — whitespace tokens don't exist in
    zh); the rest vote on marker words, ties broken by vote count
    then fixed language order (en, pl, de, es, fr); zero votes →
    'und'.
    """
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    total = F.length(text)
    pairs = [
        F.struct(lang_votes(text, code).alias("votes"),
                 F.lit(rank).alias("rank"),
                 F.lit(code).alias("code"))
        for rank, code in enumerate(("en", "pl", "de", "es", "fr"))
    ]
    # max by (votes, -rank): array_max on struct compares fields in order,
    # so negate rank to prefer earlier languages on equal votes.
    best = F.array_max(F.array(*[
        F.struct(p.votes.alias("votes"), (-p.rank).alias("neg_rank"),
                 p.code.alias("code")) for p in pairs
    ]))
    return (F.when((total > 0) & (cjk * 20 > total), F.lit("zh"))
            .when(best.votes > 0, best.code)
            .otherwise(F.lit("und")))


def fingerprint64(text: Column) -> Column:
    """Stable 64-bit content fingerprint of whitespace-normalized text."""
    normalized = F.regexp_replace(F.lower(F.btrim(text)), r"\s+", " ")
    return F.xxhash64(normalized)


def deterministic_sample(df: DataFrame, key: Column, rate_denominator: int,
                         bucket: int = 0) -> DataFrame:
    """Reproducible 1/k sampling by content hash — the training-data
    sampler that survives re-runs, backfills, and engine swaps (md5 is
    portable; seeded RNG sampling is not).  Rows where
    ``md5(key)[0:8] as int % k == bucket``."""
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return df.where(h % rate_denominator == bucket)


def with_text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the full profile column set (the 'quality scoring' operator)."""
    c = F.col(text_col)
    return (
        df.withColumn("n_chars_m", F.length(c))
          .withColumn("n_tokens", token_count(c))
          .withColumn("mean_word_len", mean_word_len(c))
          .withColumn("stopword_ratio", stopword_ratio(c, STOPWORDS_EN))
          .withColumn("punct_ratio", punct_ratio(c))
          .withColumn("digit_ratio", digit_ratio(c))
          .withColumn("quality", quality_score(c))
          .withColumn("lang_id", detect_lang(c))
          .withColumn("fingerprint", fingerprint64(c))
    )


def nfc_normalize_text(text: Column) -> Column:
    """Unicode NFC normalization — the corpus-hygiene step before any
    hashing/dedup (the same page crawled twice can differ only in
    composed vs decomposed accents).  Spark has no native normalizer, so
    this is the one Arrow-batched pandas UDF in this module; null-safe.
    """
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda t: unicodedata.normalize("NFC", t)
                     if t is not None else None)

    return _nfc(text)


def word_ngrams(text: Column, n: int) -> Column:
    """Non-distinct lowercase word n-grams (counting variant of
    dedup.word_shingles — repetition metrics need multiplicities)."""
    toks = F.split(F.btrim(F.lower(text)), r"\s+")
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k - 1, F.lit(-1))),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1)
                                                  .cast("int"))
                                     for j in range(n)]),
    )
    return F.when(k > 0, grams).otherwise(F.array().cast("array<string>"))


def repetition_signals(df: DataFrame, id_col: str,
                       text_col: str = "text") -> DataFrame:
    """Gopher-flavor within-document repetition metrics:

    - ``dup_line_frac`` — fraction of line characters belonging to lines
      that occur more than once within the document;
    - ``top_bigram_frac`` — occurrences of the document's most frequent
      word 2-gram over all 2-gram occurrences.

    Pure explode/groupBy composition (two keyed shuffles, map-side
    partial aggregation); docs with no lines/bigrams report 0.0.
    """
    base = df.select(F.col(id_col).alias("__doc"), F.col(text_col))

    lines = base.where(F.col(text_col).isNotNull()).select(
        "__doc", F.explode(F.split(F.col(text_col), "\n")).alias("__line"))
    per_line = (lines.groupBy("__doc", "__line")
                .agg(F.count("*").alias("__c"))
                .select("__doc", "__c",
                        (F.length("__line") * F.col("__c"))
                        .alias("__chars")))
    line_stats = per_line.groupBy("__doc").agg(
        (F.sum(F.when(F.col("__c") > 1, F.col("__chars")).otherwise(0))
         / F.greatest(F.sum("__chars"), F.lit(1)).cast("double"))
        .alias("dup_line_frac"))

    bigrams = base.where(F.col(text_col).isNotNull()).select(
        "__doc", F.explode(word_ngrams(F.col(text_col), 2)).alias("__g"))
    per_gram = bigrams.groupBy("__doc", "__g").agg(
        F.count("*").alias("__c"))
    gram_stats = per_gram.groupBy("__doc").agg(
        (F.max("__c") / F.sum("__c").cast("double"))
        .alias("top_bigram_frac"))

    return (base.select("__doc")
            .join(line_stats, "__doc", "left")
            .join(gram_stats, "__doc", "left")
            .select(F.col("__doc").alias(id_col),
                    F.coalesce("dup_line_frac", F.lit(0.0))
                     .alias("dup_line_frac"),
                    F.coalesce("top_bigram_frac", F.lit(0.0))
                     .alias("top_bigram_frac")))


def stratified_sample(df: DataFrame, strata_col: str, key: Column,
                      n_per_stratum: int) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum
    is smaller), chosen by md5-of-key order — the deterministic,
    engine-portable cousin of ``deterministic_sample`` for building
    balanced eval/inspection sets (per language, per source, per
    domain).  One shuffle on the stratum key."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(F.md5(key), key)
    return (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") <= n_per_stratum)
              .drop("__rn"))


GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that",
                             "have", "with")
GOPHER_BULLETS = ("•", "‣", "▪", "-", "*")


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher document-quality rule set (Rae et al. 2021, A1.1) as
    per-rule boolean columns + ``gopher_pass`` — all native columnar:

    - ``r_word_count``: 50 ≤ words ≤ 100 000
    - ``r_mean_word_len``: mean word length in [3, 10]
    - ``r_symbol_ratio``: BOTH #'#'/words ≤ 0.1 AND #'...'/words ≤ 0.1
      (two independent per-symbol tests, as the paper specifies)
    - ``r_bullet_lines``: < 90 % of lines start with a bullet
    - ``r_ellipsis_lines``: ≤ 30 % of lines end with '...'
    - ``r_alpha_words``: ≥ 80 % of words contain a letter
    - ``r_stopwords``: ≥ 2 of the 8 required English stop words

    Null/blank text fails every rule (the curation-side convention)."""
    t = F.col(text_col)
    words = F.when(
        t.isNotNull() & (F.length(F.trim(t)) > 0),
        F.split(F.trim(t), r"\s+")).otherwise(
        F.expr("cast(array() as array<string>)"))
    lines = F.when(
        t.isNotNull(), F.split(t, "\n")).otherwise(
        F.expr("cast(array() as array<string>)"))
    d = (df.withColumn("__w", words)
           .withColumn("__lines", lines)
           .withColumn("__n", F.size("__w"))
           .withColumn("__nl", F.greatest(F.size("__lines"), F.lit(1))))
    n = F.col("__n").cast("double")
    mean_len = F.when(
        F.col("__n") > 0,
        F.expr("aggregate(__w, 0L, (a, x) -> a + length(x))")
        .cast("double") / n)
    n_hash = (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit(""))))
    n_ell = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\."), 0))
    bullet_lines = F.size(F.filter(
        "__lines",
        lambda ln: F.trim(ln).substr(1, 1).isin(*GOPHER_BULLETS)))
    ell_lines = F.size(F.filter(
        "__lines", lambda ln: F.rtrim(ln).endswith("...")))
    alpha_words = F.size(F.filter(
        "__w", lambda w: w.rlike("[A-Za-z]")))
    stop_hits = F.size(F.filter(
        F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS]),
        lambda sw: F.array_contains(
            F.transform("__w", lambda w: F.lower(w)), sw)))
    out = (d
           .withColumn("r_word_count",
                       (F.col("__n") >= 50) & (F.col("__n") <= 100_000))
           .withColumn("r_mean_word_len",
                       F.coalesce((mean_len >= 3.0) & (mean_len <= 10.0),
                                  F.lit(False)))
           .withColumn(
               "r_symbol_ratio",
               F.when(F.col("__n") > 0,
                      (n_hash.cast("double") / n <= 0.1)
                      & (n_ell.cast("double") / n <= 0.1))
                .otherwise(F.lit(False)))
           .withColumn("r_bullet_lines",
                       bullet_lines.cast("double")
                       / F.col("__nl").cast("double") < 0.9)
           .withColumn("r_ellipsis_lines",
                       ell_lines.cast("double")
                       / F.col("__nl").cast("double") <= 0.3)
           .withColumn(
               "r_alpha_words",
               F.when(F.col("__n") > 0,
                      alpha_words.cast("double") / n >= 0.8)
                .otherwise(F.lit(False)))
           .withColumn("r_stopwords", stop_hits >= 2))
    rules = ["r_word_count", "r_mean_word_len", "r_symbol_ratio",
             "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
             "r_stopwords"]
    expr = F.col(rules[0])
    for r in rules[1:]:
        expr = expr & F.col(r)
    return (out.withColumn("gopher_pass", expr)
            .drop("__w", "__lines", "__n", "__nl"))


def temperature_sample(df: DataFrame, group_col: str, key: Column,
                       total_rows: int,
                       temperature: float = 2.0) -> DataFrame:
    """Temperature-flattened mixture sampling — the multilingual/source
    rebalancing rule p_i ∝ f_i^(1/T) (Conneau & Lample 2019 §3.1;
    Raffel et al. 2020 §3.4.2): big groups are down-sampled toward a
    flatter mix, T=1 keeps the natural distribution, T→∞ approaches
    uniform.  Per-group integer quotas (min(count, round(total·share)))
    are filled in md5-of-key order, so the draw is deterministic and
    engine-portable, and no per-row float comparison can drift between
    engines.  Cost: one count agg + one window shuffle; the quota table
    (one row per group) broadcasts."""
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count("*").alias("__c"))
    share = F.pow(F.col("__c").cast("double"), 1.0 / temperature)
    z = counts.agg(F.sum(F.pow(F.col("__c").cast("double"),
                                1.0 / temperature)).alias("__z"))
    quotas = (counts.crossJoin(F.broadcast(z))
              .select(group_col,
                      F.least(
                          F.col("__c"),
                          F.floor(F.lit(float(total_rows)) * share
                                  / F.col("__z") + 0.5).cast("long"))
                       .alias("__quota")))
    w = Window.partitionBy(group_col).orderBy(F.md5(key), key)
    return (df.withColumn("__rn", F.row_number().over(w))
              .join(F.broadcast(quotas), group_col)
              .where(F.col("__rn") <= F.col("__quota"))
              .drop("__rn", "__quota"))


def sample_to_token_budget(df: DataFrame, group_col: str, tokens_col: str,
                           budget: int, key: Column) -> DataFrame:
    """Pretraining-mix sampler: per group, take rows in md5-of-key order
    until the group's cumulative token count reaches ``budget`` (the
    boundary-crossing row is included, so every nonempty group attains
    its quota).  Deterministic, engine-portable, one shuffle on the
    group key — how a 100 TB corpus is cut down to a target mixture
    (e.g. N tokens per language/source)."""
    from pyspark.sql import Window

    w = (Window.partitionBy(group_col).orderBy(F.md5(key), key)
         .rowsBetween(Window.unboundedPreceding, -1))
    before = F.coalesce(F.sum(F.col(tokens_col).cast("long")).over(w),
                        F.lit(0))
    return (df.withColumn("__before", before)
              .where(F.col("__before") < budget)
              .drop("__before"))


# words whose presence drops the whole page (the C4 paper uses the full
# "List of Dirty, Naughty ..." list; this compact stand-in keeps the
# operator's shape — swap the tuple for the full list in production)
C4_PAGE_DROP_PHRASES = ("lorem ipsum",)
C4_LINE_MIN_WORDS = 5
C4_MIN_SENTENCES = 3
_C4_TERMINALS = (".", "!", "?", '"')


def c4_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The C4 cleaning rule set (Raffel et al. 2020 §2.2) — all native
    columnar, no Python in the hot path:

    line filter (kept lines must satisfy ALL):
    - end in terminal punctuation (. ! ? ");
    - contain ≥ 5 words;
    - not contain 'javascript' (case-insensitive).

    page filter (post line-filter):
    - ``c4_pass`` false when the page holds a curly brace, any
      ``C4_PAGE_DROP_PHRASES`` entry, or fewer than 3 sentences
      (sentence ≈ terminal-punctuation occurrence in kept text, the
      columnar stand-in for the paper's nltk splitter).

    Adds ``c4_text`` (kept lines re-joined), ``c4_kept_lines``,
    ``c4_total_lines``, ``c4_sentences``, ``c4_pass``.  Null text →
    empty c4_text, c4_pass false."""
    t = F.col(text_col)
    lines = F.when(t.isNotNull(), F.split(t, "\n")) \
        .otherwise(F.expr("cast(array() as array<string>)"))

    def line_ok(l):
        trimmed = F.trim(l)
        ends_ok = F.lit(False)
        for p in _C4_TERMINALS:
            ends_ok = ends_ok | trimmed.endswith(p)
        enough_words = F.size(F.split(trimmed, r"\s+")) >= \
            F.lit(C4_LINE_MIN_WORDS)
        no_js = ~F.lower(l).contains("javascript")
        return (F.length(trimmed) > 0) & ends_ok & enough_words & no_js

    kept = F.filter(lines, line_ok)
    c4_text = F.array_join(F.transform(kept, F.trim), "\n")
    sentences = F.size(F.split(c4_text, r"[.!?]")) - 1
    page_clean = ~t.contains("{") & ~t.contains("}")
    for phrase in C4_PAGE_DROP_PHRASES:
        page_clean = page_clean & ~F.lower(t).contains(phrase)
    out = (df
           .withColumn("c4_total_lines", F.size(lines))
           .withColumn("c4_kept_lines", F.size(kept))
           .withColumn("c4_text", c4_text)
           .withColumn("c4_sentences",
                       F.when(F.length(c4_text) > 0, sentences)
                       .otherwise(F.lit(0)))
           .withColumn("c4_pass",
                       t.isNotNull() & page_clean
                       & (F.col("c4_sentences")
                          >= F.lit(C4_MIN_SENTENCES))))
    return out


def fix_mojibake(text: Column, max_passes: int = 3) -> Column:
    """Repair UTF-8-as-latin1 mojibake ('Ã©' → 'é'), the ftfy-core
    transform every web-text pipeline needs: text whose codepoints all
    fit latin-1/cp1252 AND re-decode as valid UTF-8 was double-encoded —
    undo it (up to ``max_passes`` nested layers), else leave the text
    alone.  The re-encode uses cp1252 with latin-1 fallback for the
    0x80-0x9F gap, matching how the damage happens in the wild.

    Conservative by construction: pure-ASCII text round-trips to
    itself untouched, and a failed decode at any pass returns the last
    good string.  Null-safe Arrow-batched kernel (byte-level transcode
    — not expressible in native columnar functions)."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _fix(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            for _ in range(max_passes):
                if not t or all(ord(c) < 0x80 for c in t):
                    return t
                try:
                    raw = t.encode("cp1252")
                except UnicodeEncodeError:
                    try:
                        raw = t.encode("latin-1")
                    except UnicodeEncodeError:
                        return t
                try:
                    fixed = raw.decode("utf-8")
                except UnicodeDecodeError:
                    return t
                if fixed == t:
                    return t
                t = fixed
            return t

        return s.map(one)

    return _fix(text)


# ---------------------------------------------------------------------------
# code-vs-prose signals
# ---------------------------------------------------------------------------

_CODE_KEYWORD_RE = (r"(?m)\b(def|class|import|return|function|var|let|"
                    r"const|void|int|float|public|private|static|"
                    r"include|struct|impl|fn|elif|lambda)\b")


def code_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document code-vs-prose signals — the curation axis that
    separates source code from natural language before language-ID or
    quality scoring runs (both misbehave on code):

    - ``symbol_char_frac``: ``{}();=<>[]`` characters per char
    - ``semicolon_eol_frac``: non-empty lines ending ``;`` ``{`` ``}``
    - ``indent_frac``: lines starting with ≥4 spaces or a tab
    - ``keyword_count``: hits of the common code-keyword set
    - ``is_code_like``: the composite gate (≥2 of: symbol frac >
      0.03, eol frac > 0.2, indent frac > 0.3, keywords ≥ 5)

    Fractions are micro-quantized BIGINTs (driver-gate convention).
    Fully columnar, map-only; every regex RE2-compatible, so a SQL
    twin replays the exact values.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t)
    lines = F.filter(F.split(t, r"\r?\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    sym = F.length(t) - F.length(
        F.regexp_replace(t, r"[{}();=<>\[\]]", ""))
    # last-char test instead of `$`: Java's `$` matches before a
    # trailing line terminator, RE2's does not — an explicit substring
    # compare is engine-identical (and CRLF is stripped by the split)
    eol = F.size(F.filter(
        lines,
        lambda l: F.substring(F.rtrim(l), -1, 1).isin(";", "{", "}")))
    ind = F.size(F.filter(
        lines, lambda l: l.rlike(r"^(    |\t)")))
    kw = F.regexp_count(t, F.lit(_CODE_KEYWORD_RE))

    def frac_micro(num, den):
        return F.when(den > 0,
                      F.round(num.cast("double") / den * 1e6, 0)
                      .cast("long")).otherwise(F.lit(0).cast("long"))

    sym_f = frac_micro(sym, n_chars)
    eol_f = frac_micro(eol, n_lines)
    ind_f = frac_micro(ind, n_lines)
    votes = ((sym_f > 30000).cast("int") + (eol_f > 200000).cast("int")
             + (ind_f > 300000).cast("int") + (kw >= 5).cast("int"))
    return df.withColumns({
        "symbol_char_frac_micro": sym_f,
        "semicolon_eol_frac_micro": eol_f,
        "indent_frac_micro": ind_f,
        "keyword_count": kw.cast("long"),
        "is_code_like": votes >= 2,
    })


# ---------------------------------------------------------------------------
# sentence segmentation
# ---------------------------------------------------------------------------

# one sentence = a run without terminators followed by a terminator
# run, OR a trailing terminator-less fragment.  No lookarounds — RE2
# (the DuckDB twin) has none, and Java agrees on this alternation.
_SENTENCE_RE = r"[^.!?]+[.!?]+|[^.!?]+$"


def split_sentences(text: Column) -> Column:
    """Rule-based sentence segmentation → trimmed non-empty sentence
    array.  Deliberately naive (splits after any ``.!?`` run, so
    abbreviations like "Mr." split — the standard cheap-segmenter
    trade-off; the terminators stay attached to their sentence).
    Engine-replayable: the regex is RE2-compatible and the cleanup is
    trim + empty-drop."""
    pieces = F.regexp_extract_all(
        F.coalesce(text, F.lit("")), F.lit(_SENTENCE_RE), 0)
    # NB: the lambda must take exactly one arg — F.trim itself has an
    # optional second parameter, so transform would feed it the
    # element INDEX as the trim-character set
    return F.filter(F.transform(pieces, lambda s: F.trim(s)),
                    lambda s: s != "")


def sentence_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document sentence diagnostics: sentence count, mean/max
    sentence length in chars (micro-quantized mean — exact long sums
    first, one division after).  Map-only."""
    sents = split_sentences(F.col(text_col))
    lens = F.transform(sents, F.length)
    n = F.size(sents)
    total = F.aggregate(lens, F.lit(0).cast("long"),
                        lambda acc, v: acc + v)
    return df.withColumns({
        "n_sentences": n.cast("long"),
        "mean_sentence_chars_micro": F.when(
            n > 0,
            F.round(total.cast("double") / n * 1e6, 0).cast("long"))
        .otherwise(F.lit(0).cast("long")),
        "max_sentence_chars": F.coalesce(
            F.array_max(lens), F.lit(0)).cast("long"),
    })


def paragraph_language_profile(df: DataFrame, id_col: str = "doc_id",
                               text_col: str = "text") -> DataFrame:
    """Mixed-language detection — the segmentation pass monolingual
    doc-level language ID gets wrong on real web pages (boilerplate in
    one language, content in another; bilingual articles): paragraphs
    (blank-line separated) are language-ID'd INDIVIDUALLY, then rolled
    up per document:

        (id, n_paragraphs, dominant_lang, n_langs, mixed)

    ``dominant_lang`` = the language of the most paragraphs (ties by
    the fixed en/pl/de/und order), ``n_langs`` counts distinct
    identified (non-'und') paragraph languages, ``mixed`` = n_langs ≥
    2 — route mixed docs to per-paragraph filtering instead of
    dropping them whole.  All columnar; one explode + one two-level
    aggregation (shuffles on the doc id the extraction output is
    already bucketed by)."""
    c = F.col(text_col)
    paras = (df.select(F.col(id_col).alias("__id"),
                       F.posexplode(F.split(c, r"\n\s*\n"))
                       .alias("para_idx", "ptext"))
             .where(F.btrim("ptext") != ""))
    lp = paras.withColumn("plang", detect_lang(F.col("ptext")))
    per_lang = lp.groupBy("__id", "plang").agg(
        F.count("*").alias("n_paras"))
    rank = (F.when(F.col("plang") == "en", 0)
            .when(F.col("plang") == "pl", 1)
            .when(F.col("plang") == "de", 2)
            .when(F.col("plang") == "es", 3)
            .when(F.col("plang") == "fr", 4)
            .when(F.col("plang") == "zh", 5).otherwise(6))
    rolled = (per_lang
              .groupBy("__id")
              .agg(F.sum("n_paras").cast("long").alias("n_paragraphs"),
                   F.max(F.struct(F.col("n_paras").alias("n"),
                                  (-rank).alias("neg_rank"),
                                  F.col("plang").alias("code")))
                   .alias("__best"),
                   F.sum(F.when(F.col("plang") != "und", 1)
                         .otherwise(0)).cast("long").alias("n_langs")))
    return rolled.select(
        F.col("__id").alias(id_col), "n_paragraphs",
        F.col("__best")["code"].alias("dominant_lang"),
        "n_langs",
        (F.col("n_langs") >= 2).alias("mixed"))


# Unicode confusable folding — the anti-homoglyph pass: SEO spam and
# benchmark-contamination evasion routinely swap Latin letters for
# identical-looking Cyrillic/Greek/fullwidth codepoints, which breaks
# hash-based dedup and n-gram decontamination.  A curated high-
# confidence skeleton subset of Unicode TR39's confusables (1:1
# mappings only, so the whole fold is one native ``translate``).
_CONFUSABLE_FROM = (
    # Cyrillic lowercase / uppercase look-alikes
    "аеорсухіѕј"
    "АВЕКМНОРСТУХ"
    # Greek look-alikes
    "οΑΒΕΖΗΙΚΜΝΟΡΤΥΧ"
    # fullwidth ASCII letters and digits
    + "".join(chr(0xFF21 + i) for i in range(26))
    + "".join(chr(0xFF41 + i) for i in range(26))
    + "".join(chr(0xFF10 + i) for i in range(10))
)
_CONFUSABLE_TO = (
    "aeopcyxisj"
    "ABEKMHOPCTYX"
    "oABEZHIKMNOPTYX"
    + "".join(chr(ord("A") + i) for i in range(26))
    + "".join(chr(ord("a") + i) for i in range(26))
    + "".join(chr(ord("0") + i) for i in range(10))
)
assert len(_CONFUSABLE_FROM) == len(_CONFUSABLE_TO)
# zero-width / joiner codepoints that hide inside words
_ZERO_WIDTH_RE = "[​‌‍⁠﻿­]"


def fold_confusables(text: Column) -> Column:
    """Homoglyph skeleton: map look-alike Cyrillic/Greek/fullwidth
    codepoints to their ASCII targets, strip zero-width characters,
    and normalize NBSP to space — run this BEFORE hashing for dedup
    or building decontamination n-grams so 'раypal' (Cyrillic р/а)
    collides with 'paypal'.  One native translate + one regexp, zero
    Python."""
    folded = F.translate(text, _CONFUSABLE_FROM, _CONFUSABLE_TO)
    folded = F.regexp_replace(folded, _ZERO_WIDTH_RE, "")
    return F.regexp_replace(folded, " ", " ")


def collapse_repeated_lines(text: Column) -> Column:
    """Adjacent duplicate lines collapse to one — the cheap intra-doc
    cleanup for scraped pages that stutter a nav/footer line many
    times in a row (corpus-wide line dedup is ``dedup_lines``; this
    one needs no shuffle at all).  Columnar: zip the line array with
    itself shifted by one and keep lines that differ from their
    predecessor — the split evaluates O(1) times per row, not once
    per element (an ``element_at(lines, i)`` formulation would inline
    a fresh split per line and go quadratic on long documents)."""
    lines = F.split(text, r"\n")
    prev = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(lines, 1, F.greatest(F.size(lines) - 1, F.lit(0))))
    pairs = F.zip_with(
        lines, prev,
        lambda cur, pv: F.struct(
            cur.alias("c"), (pv.isNull() | (cur != pv)).alias("k")))
    kept = F.filter(pairs, lambda s: s["k"])
    return F.array_join(F.transform(kept, lambda s: s["c"]), "\n")
