"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (JVM-side, codegen'd) so they hold up at
100 TB: language-ID (marker-word heuristic), quality scoring, token
counting, and document fingerprinting. Normalization mirrors the
reference's ``clean_string`` (georef_ar_etl/utils.py:190-195).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Deterministic marker-word sets for the language-ID heuristic. Word-boundary
# regex counts per language; argmax wins, ties broken by list order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def norm_text(col: Column) -> Column:
    """Lowercase + collapse whitespace + trim — canonical form for
    fingerprinting and token ops."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for empty/blank text) = the number of
    maximal non-whitespace runs. ``regexp_count('\\S+')`` computes it
    without lowercasing, whitespace-collapsing or materializing a split
    array — A/B-measured ~30% faster than the norm+split formulation and
    value-identical over the whole corpus (blank/empty text counts 0 with
    no special case)."""
    return F.regexp_count(col, F.lit(r"\S+"))


def marker_hits(col: Column, words: list[str]) -> Column:
    """Total occurrences of any marker word, word-bounded. Counting only
    needs lowercasing — whitespace collapsing/trimming cannot change
    word-boundary matches, and skipping the regexp_replace is ~20% faster
    per call (A/B-measured, value-identical over the corpus); language_id
    calls this once per language, so the saving multiplies."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(col), F.lit(pat))


def language_id(col: Column) -> Column:
    """Predicted language = argmax of marker-word hits ('und' if all zero).
    Deterministic tie-break: earlier entry in LANG_MARKERS wins."""
    scores = [(lang, marker_hits(col, words)) for lang, words in LANG_MARKERS.items()]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    for lang, s in reversed(scores):  # build CASE so earliest lang wins ties
        pred = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(pred)
    return pred


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length —
    the standard cheap quality filters for pretraining corpora."""
    t = F.col(text_col)
    n_char = F.length(t)
    n_tok = token_count(t)
    n_punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    n_stop = marker_hits(t, STOPWORDS)
    return df.select(
        "*",
        n_char.alias("q_n_chars"),
        n_tok.alias("q_n_tokens"),
        F.round(n_punct / F.greatest(n_char, F.lit(1)), 6).alias("q_punct_ratio"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 6).alias("q_stopword_ratio"),
        F.round(
            (F.length(F.regexp_replace(norm_text(t), " ", "")))
            / F.greatest(n_tok, F.lit(1)),
            6,
        ).alias("q_mean_word_len"),
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition ratios — the Gopher/MassiveText repetition
    filters for pretraining corpora (Rae et al. 2021 §A1.1): documents
    dominated by repeated words or n-grams are boilerplate/spam.

    * ``dup_word_frac``   — 1 - distinct_words/total_words
    * ``top_word_frac``   — occurrences of the most frequent word / total
    * ``dup_2gram_frac``  — 1 - distinct_2grams/total_2grams

    All pure Catalyst higher-order functions; the most-frequent-word count
    is an O(n log n) sort + one O(n) ``aggregate`` run-length scan (NOT the
    naive O(n^2) count-each-distinct-word-in-array), so it holds up on
    book-length documents.

    PERF: the word array is materialized as a real column in its own
    projection FIRST — expressions referenced inside ``transform`` /
    ``aggregate`` lambdas are re-evaluated PER ELEMENT (no CSE across the
    lambda boundary), so inlining the split into the 2-gram lambda re-split
    the whole document once per gram: measured 25.9 s -> sub-second at
    sf0.1. CollapseProject keeps the projections separate because the
    column is referenced many times."""
    t = norm_text(F.col(text_col))
    words_expr = F.when(
        F.length(t) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(t, " "))
    staged = df.select("*", words_expr.alias("_rep_words"))
    words = F.col("_rep_words")
    total = F.size(words)
    distinct = F.size(F.array_distinct(words))
    sw = F.array_sort(words)
    longest_run = F.aggregate(
        sw,
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    grams = (
        # null text → null words → null grams, so all three output ratios
        # are null together (the when().otherwise(empty) alone would
        # swallow the null and emit an inconsistent 0.0 for the gram frac)
        F.when(words.isNull(), F.lit(None).cast("array<string>"))
        .when(
            total >= 2,
            F.transform(
                F.sequence(F.lit(1), total - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(words, i), F.element_at(words, i + 1)
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
    )
    gt = F.size(grams)
    one = F.greatest(total, F.lit(1))
    return staged.select(
        *df.columns,
        F.round((total - distinct) / one, 6).alias("dup_word_frac"),
        F.round(longest_run / one, 6).alias("top_word_frac"),
        F.round(
            (gt - F.size(F.array_distinct(grams))) / F.greatest(gt, F.lit(1)), 6
        ).alias("dup_2gram_frac"),
    )


# deliberately simple, RE2-compatible patterns (no backtracking constructs):
# the same strings work in Spark (Java regex) and any re2-based scrubber.
# ORDER MATTERS: IP must run before PHONE — dotted IPv4s with 3-digit
# octets (10.120.130.140) otherwise match the phone shape and get the
# wrong placeholder.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IP": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "PHONE": r"\+?\d{1,3}[-. (]{0,2}\d{3}[-. )]{0,2}\d{3}[-. ]?\d{2,4}",
}


def redact_pii(col: Column) -> Column:
    """Replace common PII shapes (emails, phone numbers, IPv4 addresses)
    with typed placeholders — the standard scrub pass before pretraining.
    Chained JVM ``regexp_replace`` (codegen'd, no UDF); patterns are
    intentionally high-recall — scrubbing is the cheap, safe direction."""
    out = col
    for tag, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{tag}>")
    return out


DEFAULT_QUALITY_RULES: list[tuple[str, str]] = [
    # (reason, fail predicate over quality/repetition feature columns) —
    # evaluated IN ORDER, first failing rule wins (the quarantine-reason
    # pattern of operators/validate.py applied to documents). Thresholds
    # follow the C4/Gopher family: length bounds, symbol density,
    # stopword floor, repetition ceilings.
    # no_text MUST lead: null text nulls every feature, every numeric
    # predicate then evaluates to NULL (three-valued logic) and no later
    # rule can fire — without this rule a null document passes the gate
    ("no_text", "q_n_chars IS NULL"),
    ("too_short", "q_n_tokens < 5"),
    ("too_long", "q_n_chars > 20000"),
    ("high_punct", "q_punct_ratio > 0.3"),
    ("low_stopword", "q_stopword_ratio < 0.01"),
    ("repetitive_words", "dup_word_frac > 0.6"),
    ("repetitive_top_word", "top_word_frac > 0.3"),
    ("repetitive_2grams", "dup_2gram_frac > 0.5"),
]


def quality_gate(
    df: DataFrame,
    text_col: str = "text",
    rules: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """The document quality FILTER stage: compute the quality + repetition
    features, evaluate the ordered rule list, and tag each document with
    ``keep`` (boolean) and ``reason`` (first failing rule, null when kept)
    — the corpus twin of the engine's validate→quarantine split
    (operators/validate.py; reference: per-row validation with reported
    reasons, georef_ar_etl/transformers.py:96-101). Downstream:
    ``filter(keep)`` for the corpus, ``groupBy(reason)`` for the drop
    report. Pure Catalyst end to end (features + one CASE chain)."""
    rules = DEFAULT_QUALITY_RULES if rules is None else rules
    feats = repetition_features(quality_features(df, text_col), text_col)
    reason = F.lit(None).cast("string")
    for name, pred in reversed(rules):
        reason = F.when(F.expr(pred), F.lit(name)).otherwise(reason)
    return feats.select(
        *df.columns,
        reason.alias("reason"),
        reason.isNull().alias("keep"),
    )


def hash_tokenize(col: Column, vocab_size: int = 32768) -> Column:
    """Deterministic vocabulary-free tokenizer (the feature-hashing trick,
    Weinberger et al. 2009): whitespace words → ``md5(word) mod
    vocab_size`` ids. Not BPE — the point is a reproducible featurizer
    whose ids are identical across engines and runs with NO vocabulary
    artifact to ship, the standard baseline for hashing-based text
    features. Pure Catalyst higher-order functions; md5-derived on purpose
    so a DuckDB oracle reproduces every id (q42)."""
    words = F.filter(F.split(F.lower(col), r"\s+"), lambda w: w != "")
    return F.transform(
        words,
        lambda w: (
            F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long") % vocab_size
        ).cast("int"),
    )


def vocabulary(df: DataFrame, text_col: str = "text", k: int = 50) -> DataFrame:
    """Corpus vocabulary histogram: the ``k`` most frequent whitespace
    words (lowercased), ties broken lexicographically. The canonical
    word-count plan — explode → hash aggregate with map-side partial
    combine → one small top-k — so it scales like grep|sort|uniq -c done
    right: the shuffle carries one (word, partial_count) row per word per
    map task, never the corpus."""
    toks = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.col("tok"))
        .limit(k)
    )


def unigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style LM quality proxy WITHOUT an external model artifact:
    mean negative log-probability of each document's words under an
    add-one-smoothed unigram model trained on the corpus itself. High
    score = rare-word-heavy / gibberish documents — the perplexity-filter
    shape (Wenzek et al., CCNet) in its simplest self-contained form.

    Plan: the word-count aggregate (map-side combine) builds the model;
    the 1-row (N, V) totals and the vocab table broadcast onto the token
    stream; one per-doc average. No Python, no iterative training, and
    the model is a DataFrame — persist it to score OTHER corpora against
    this one's distribution. Documents with no tokens score null."""
    toks = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    totals = vocab.agg(
        F.sum("c").alias("N"), F.count(F.lit(1)).alias("V")
    )
    scored = (
        # vocab is NOT broadcast-hinted: at corpus scale the distinct-token
        # table is unbounded (typos/numbers/URLs) and a forced broadcast
        # would hit the 8 GB limit — AQE broadcasts it when it is small;
        # only the 1-row totals frame is unconditionally broadcastable
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.avg(-F.log((F.col("c") + 1) / (F.col("N") + F.col("V")))).alias("_s")
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col, F.round("_s", 4).alias("lm_score")
    )


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """Interpolated bigram LM quality score — the next step up from
    ``unigram_lm_score`` on the CCNet perplexity-filter ladder: mean
    negative log-probability of each document's word BIGRAMS under
    ``lam * p_ML(w2|w1) + (1-lam) * p_add1(w2)`` trained on the corpus
    itself (Jelinek-Mercer interpolation with the add-one unigram as the
    backoff floor, so unseen-history pairs never hit log 0). Bigram
    surprise separates shuffled-word salad from fluent text, which a
    unigram model scores identically.

    Plan: two word-count-shaped aggregates build the model (bigram and
    unigram tables, map-side combinable); scoring joins the pair stream
    to them by key (AQE broadcasts when small — at corpus scale both are
    unbounded, same non-hint policy as unigram_lm_score) plus the 1-row
    broadcast totals. Pairs come from per-doc arrays (transform over
    sequence — zero shuffle to FORM them). ``lam`` should be an exactly-
    representable binary fraction (default 0.75) so the interpolation
    arithmetic is bit-identical in the DuckDB oracle (q114). Documents
    with fewer than two tokens score null."""
    w = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("ws"),
    )
    toks = w.select(id_col, F.explode("ws").alias("tok"))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c1"))
    totals = uni.agg(F.sum("c1").alias("N"), F.count(F.lit(1)).alias("V"))
    pairs = (
        w.filter(F.size("ws") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(ws[i - 1] AS w1, ws[i] AS w2))"
                )
            ).alias("p"),
        )
        .select(id_col, "p.w1", "p.w2")
    )
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    p_big = F.col("c2") / F.col("h1")
    p_uni = (F.col("c_w2") + 1) / (F.col("N") + F.col("V"))
    scored = (
        pairs.join(big, ["w1", "w2"])
        .join(
            uni.select(F.col("tok").alias("w1"), F.col("c1").alias("h1")),
            "w1",
        )
        .join(
            uni.select(F.col("tok").alias("w2"), F.col("c1").alias("c_w2")),
            "w2",
        )
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.avg(
                -F.log(F.lit(lam) * p_big + F.lit(1.0 - lam) * p_uni)
            ).alias("_s")
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col, F.round("_s", 4).alias("bigram_score")
    )


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (md5 so the DuckDB oracle computes the identical value.)"""
    return F.md5(norm_text(col))


def char_shingles(col: Column, k: int = 3, pre_normalized: bool = False) -> Column:
    """Distinct character k-gram shingle set of the normalized text —
    input to MinHash / Jaccard dedup. Pure higher-order functions:
    transform over a position sequence, then distinct.

    PERF: expressions referenced inside a ``transform`` lambda are evaluated
    PER ELEMENT — normalize the text into a real column first (and pass
    ``pre_normalized=True``), otherwise the regexp in norm_text runs once per
    shingle position.

    PERF (guide §1.2 per-task work): ``substring`` on a STRING walks UTF8
    codepoints from offset 0 to find position i — O(i) per shingle, O(L²)
    per document. For single-byte rows (length == octet_length, i.e. pure
    ASCII — the common case for normalized web text) the same grams are
    byte slices: bind the binary ONCE per row as a lambda variable (the
    1-element-array let-binding, so the cast isn't re-evaluated per
    element) and slice bytes — O(L·k) per row, measured 16.3 s → 5.0 s
    for the sf1.0 corpus shingle pass with bit-identical output. Rows
    with multibyte chars keep the exact char-walk path via a per-row
    CASE, so semantics are unchanged for ANY input."""
    t = col if pre_normalized else norm_text(col)
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), n), lambda i: t.substr(i, F.lit(k)))
    n_b = F.greatest(F.octet_length(t) - F.lit(k - 1), F.lit(1))
    grams_b = F.flatten(
        F.transform(
            F.array(t.cast("binary")),
            lambda tb: F.transform(
                F.sequence(F.lit(1), n_b),
                lambda i: tb.substr(i, F.lit(k)).cast("string"),
            ),
        )
    )
    return F.array_distinct(
        F.when(F.length(t) == F.octet_length(t), grams_b).otherwise(grams)
    )


POLY_B = np.uint64(257)
POLY_MASK = np.uint64((1 << 61) - 1)


def poly_powers(k: int) -> np.ndarray:
    """Powers for the 61-bit polynomial k-gram hash (B=257, masked per step).
    Shared by winnowing and the MinHash verify kernel; the DuckDB oracles
    inline the same values (uint64 wrap + mask ≡ plain mod 2^61 because
    2^64 is a multiple of 2^61)."""
    powers = np.empty(k, dtype=np.uint64)
    powers[k - 1] = np.uint64(1)
    for j in range(k - 2, -1, -1):
        powers[j] = (powers[j + 1] * POLY_B) & POLY_MASK
    return powers


def poly_kgram_hashes(b: np.ndarray, k: int, powers: np.ndarray) -> np.ndarray:
    """All k-gram rolling hashes of a uint64 byte array (vectorized).
    Returns an empty array when len(b) < k."""
    if len(b) < k:
        return np.zeros(0, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(b, k)
    return (win * powers[None, :]).sum(axis=1) & POLY_MASK


P31 = np.uint64((1 << 31) - 1)  # Mersenne prime 2^31-1


def poly_powers_p31(k: int) -> np.ndarray:
    """Base-257 power ladder mod p=2^31-1. With 31-bit values, every
    intermediate in the k-gram hash AND in the affine minhash transforms
    stays below 2^63 — exact in numpy uint64 and in DuckDB BIGINT alike,
    no HUGEINT, no md5."""
    powers = np.empty(k, dtype=np.uint64)
    powers[k - 1] = np.uint64(1)
    for j in range(k - 2, -1, -1):
        powers[j] = (powers[j + 1] * POLY_B) % P31
    return powers


def poly_kgram_hashes_p31(b: np.ndarray, k: int, powers: np.ndarray) -> np.ndarray:
    """All k-gram rolling hashes mod 2^31-1 of a uint64 byte array
    (vectorized; byte·power products < 2^39, k-term sums < 2^42 — exact)."""
    if len(b) < k:
        return np.zeros(0, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(b, k)
    return (win * powers[None, :]).sum(axis=1) % P31


def winnow_series(text: pd.Series, k: int, window: int, powers: np.ndarray) -> pd.Series:
    """Winnowing fingerprints for a whole Series at once — the flattened-
    buffer segment technique (same as functions/tokens.normalize_series):
    all documents' bytes concatenate into ONE buffer, the k-gram rolling
    hash and the window-min run as single sliding-window ops over it with
    document-boundary-crossing windows masked out, per-doc short-doc minima
    come from one ``minimum.reduceat``, and the per-doc unique+sort is one
    global lexsort + adjacent-dedup. No per-document Python on any path —
    the only O(rows) Python is the utf-8 encode and the final array split.

    Per-document semantics (identical to the scalar definition):
    null → null; fewer than k bytes → empty set; fewer than ``window``
    k-grams → the single global-min hash; else the deduplicated set of
    window minima, sorted ascending."""
    n = len(text)
    out = np.empty(n, dtype=object)
    notnull = text.notna().to_numpy()
    out[~notnull] = None
    docs = [s.lower().encode("utf-8", "ignore") for s in text[notnull]]
    nd = len(docs)
    if nd == 0:
        return pd.Series(out, dtype=object, index=text.index)
    lens = np.fromiter((len(b) for b in docs), dtype=np.int64, count=nd)
    flat = np.frombuffer(b"".join(docs), dtype=np.uint8).astype(np.uint64)
    offsets = np.zeros(nd + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    hcounts = np.maximum(lens - (k - 1), 0)
    hoffsets = np.zeros(nd + 1, dtype=np.int64)
    np.cumsum(hcounts, out=hoffsets[1:])

    # valid k-gram hashes, concatenated in doc order (boundary-crossers cut)
    if flat.size >= k:
        all_h = poly_kgram_hashes(flat, k, powers)
        npos = flat.size - k + 1
        doc_of_pos = np.repeat(np.arange(nd), lens)[:npos]
        valid = np.arange(npos) + k <= offsets[doc_of_pos + 1]
        vh = all_h[valid]
    else:
        vh = np.empty(0, dtype=np.uint64)

    # per-doc global min (consecutive nonempty segments → one reduceat)
    nonempty_idx = np.flatnonzero(hcounts > 0)
    doc_min = (
        np.minimum.reduceat(vh, hoffsets[:-1][nonempty_idx])
        if nonempty_idx.size
        else np.empty(0, dtype=np.uint64)
    )

    # window minima for docs with >= window hashes, again one sliding op
    if vh.size >= window:
        nmpos = vh.size - window + 1
        doc_of_h = np.repeat(np.arange(nd), hcounts)[:nmpos]
        mvalid = np.arange(nmpos) + window <= hoffsets[doc_of_h + 1]
        mrows = doc_of_h[mvalid]
        mins = np.lib.stride_tricks.sliding_window_view(vh, window).min(axis=1)[mvalid]
    else:
        mrows = np.empty(0, dtype=np.int64)
        mins = np.empty(0, dtype=np.uint64)

    # short docs (0 < hashes < window) contribute their single global min
    short_rows = np.flatnonzero((hcounts > 0) & (hcounts < window))
    short_mins = doc_min[np.searchsorted(nonempty_idx, short_rows)]

    rows_all = np.concatenate([mrows, short_rows])
    vals_all = np.concatenate([mins, short_mins])
    order = np.lexsort((vals_all, rows_all))
    r, v = rows_all[order], vals_all[order]
    keep = np.ones(len(r), dtype=bool)
    keep[1:] = (r[1:] != r[:-1]) | (v[1:] != v[:-1])
    r, v = r[keep], v[keep]
    counts = np.bincount(r, minlength=nd)
    pieces = np.split(v.astype(np.int64), np.cumsum(counts)[:-1])
    results = np.empty(nd, dtype=object)
    results[:] = pieces
    out[notnull] = results
    return pd.Series(out, dtype=object, index=text.index)


def winnow_fingerprints_udf(k: int = 8, window: int = 4):
    """Factory for a winnowing document-fingerprint UDF (rolling hash).

    Classic winnowing (Schleimer et al., MOSS): polynomial rolling hash over
    all k-grams, then the minimum hash of every ``window`` consecutive grams,
    deduplicated — a position-robust fingerprint set for near-dup detection.
    Fully vectorized across the Arrow batch (winnow_series): no per-document
    Python loop remains on the data path.
    """
    powers = poly_powers(k)

    @pandas_udf(T.ArrayType(T.LongType()))
    def winnow(text: pd.Series) -> pd.Series:
        return winnow_series(text, k, window, powers)

    return winnow


def tf_idf(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Per-(document, term) TF-IDF over whitespace words (lowercased) —
    the classic relevance/keyword-extraction featurizer, self-contained
    (no fitted vocabulary artifact): ``idf = ln((N+1)/(df+1)) + 1``
    (sklearn's smooth idf), ``tfidf = tf * idf`` with raw-count tf.

    Plan shape (the one that survives 100 TB): two word-count-shaped hash
    aggregates with map-side partial combine — (doc, term) counts, then
    term document frequencies off the ALREADY-aggregated tf frame (never a
    second corpus scan) — a shuffle join back on term (AQE broadcasts the
    df side when small; unbounded in general, so never hinted), and the
    1-row corpus total as an explicit broadcast. No Python in the path.

    ``min_df`` drops hapax/noise terms early (df < min_df), which is also
    the knob that bounds the join's term dictionary in adversarial
    corpora. Output: (id_col, term, tf, df, tfidf).
    """
    toks = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col, "term", "tf", "df",
            (F.col("tf") * idf).alias("tfidf"),
        )
    )

def to_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 8,
) -> DataFrame:
    """Explode documents into deterministic fixed-width 'lines' of
    ``words_per_line`` whitespace words — (id_col, line_no, line), one row
    per line, empty documents contributing none.

    Web corpora carry natural newlines; this synthetic corpus does not, so
    the line boundary is derived (word-chunking) rather than parsed — the
    downstream dedup is boundary-agnostic. Pure Catalyst (split/ transform/
    slice/ posexplode), no Python, no shuffle: line derivation is embarrassingly
    parallel and stays inside whole-stage codegen.
    """
    wpl = int(words_per_line)
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )
    w = F.col("_words")
    n = F.size(w)
    # n <= 0 guard matters: sequence(0, -1) would DESCEND, not be empty
    lines_arr = F.when(n <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), (F.ceil(n / F.lit(wpl)) - 1).cast("int")),
            lambda i: F.array_join(F.slice(w, i * wpl + 1, wpl), " "),
        )
    )
    return (
        df.select(F.col(id_col), words.alias("_words"))
        .select(F.col(id_col), F.posexplode(lines_arr).alias("line_no", "line"))
    )


def line_dedup(
    lines: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-wide exact LINE dedup (the C4 three-sentence-span rule's
    mechanism, Raffel et al. 2020 §2.2, applied at line granularity): every
    duplicate line keeps exactly ONE occurrence — the minimum (id_col,
    line_no) — and documents are reassembled from their surviving lines
    (docs that lose every line drop out).

    Input: (id_col, line_no, line) from ``to_lines`` (or a real
    newline-split). Output: (id_col, text, n_lines) with surviving lines
    re-joined by '\\n' in original order.

    Plan shape at 100 TB: the winner per line is ``groupBy(line).agg(min(
    struct(id, line_no)))`` — map-side combinable, so a boilerplate line
    occurring a billion times ships ONE partial per map task rather than a
    billion rows into one window partition (a row_number() over
    PARTITION BY line would hot-key exactly there). The winner rows ARE
    the surviving lines — each distinct line keeps exactly its min
    (id, line_no) occurrence — so no join back to the corpus is needed
    (an earlier left-semi formulation re-shuffled the full line set on
    the composite key and measured 2.8x slower than even the window
    variant; BENCH/line_dedup_ab.py tracks all three). Two shuffles
    total: line, then id over survivors only.

    Reference analogue: none (the reference dedups whole rows by pk on
    conflict, georef_ar_etl/loaders.py); this is the training-corpus
    boilerplate-removal pass.
    """
    kept = (
        lines.groupBy("line")
        .agg(F.min(F.struct(F.col(id_col), F.col("line_no"))).alias("w"))
        .select(
            "line",
            F.col(f"w.{id_col}").alias(id_col),
            F.col("w.line_no").alias("line_no"),
        )
    )
    ordered = F.array_sort(F.collect_list(F.struct("line_no", "line")))
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(ordered, lambda s: s["line"]), "\n"
        ).alias("text"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def posting_search(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Conjunctive (AND) keyword search via posting intersection: docs
    containing EVERY term in ``terms``. The inverted-index query shape —
    postings (doc, term) are probed with a BROADCAST term list (never a
    shuffle on the corpus side beyond the per-doc count), and the AND is
    a count-distinct-equals-k filter, not an N-way self-join.

    Here postings derive inline from the text (array_distinct BEFORE the
    explode caps the per-doc fan-out at unique terms); in a maintained
    deployment they come from a changelog-refreshed index — the
    FingerprintIndex in operators/index_maintenance.py is that machinery
    for fingerprint postings, the query shape is identical.

    Reference analogue: name-token search against loaded entities
    (georef_ar_etl street/locality lookups by normalized name).
    """
    if not terms:
        raise ValueError("posting_search requires at least one term")
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != F.lit(""),
                )
            )
        ).alias("term"),
    )
    probe = df.sparkSession.createDataFrame(
        [(t.lower(),) for t in set(terms)], "term string"
    )
    return (
        toks.join(F.broadcast(probe), "term")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("term")).alias("n_hit"))
        .filter(F.col("n_hit") == len(set(t.lower() for t in terms)))
        .select(id_col)
    )


def bm25_rank(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a keyword query —
    the standard ranking function behind Lucene/Elasticsearch scoring,
    using Lucene's always-positive idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Plan shape (the one that survives 100 TB): per-doc length and the
    (doc, term) term frequencies are ONE word-count-shaped pass each with
    map-side combine; the tf shuffle is pre-filtered to the query terms
    (an in-set predicate — the dictionary never shuffles); df and the
    corpus stats (N, avgdl) are tiny 1-row/`len(terms)`-row broadcasts.

    Determinism: per-(doc, term) partial scores are rounded then summed as
    exact decimals (the q68 money-sum pattern), so the final score never
    depends on double summation order across partitions. avgdl is
    ``sum(dl)::double / N`` — an exact integer sum, not a double avg.

    Output: (id_col, bm25) for documents matching ≥1 query term.
    Reference analogue: ranked name search over normalized entity names
    (georef_ar_etl street/locality search is exact-match; this is the
    scored generalization).
    """
    if not terms:
        raise ValueError("bm25_rank requires at least one term")
    tset = sorted({t.lower() for t in terms})
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("term"),
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    tf = (
        toks.filter(F.col("term").isin(tset))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    part = idf * (
        (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.round(part, 9).cast("decimal(18,9)").alias("part"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("part"), round_to).cast("double").alias("bm25"))
    )


def pmi_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_vocab: int = 200,
    min_pair_count: int = 5,
) -> DataFrame:
    """Pointwise mutual information of term PAIRS by document
    co-occurrence: ``pmi = ln(c_xy * N / (c_x * c_y))`` over per-doc
    distinct terms — the classic collocation/topic-signal statistic
    (Church & Hanks 1990).

    The quadratic trap and its bound: naive co-occurrence is a self-join
    of the posting list — O(sum of df²) pairs, unbounded on stopwords.
    Here the pair space is RESTRICTED to the ``top_vocab`` most frequent
    terms (ties broken lexicographically; the broadcastable dictionary),
    and pairs expand per document from its sorted in-vocab term array via
    an array-combinations expression — pure Catalyst, NO self-join, no
    shuffle beyond the final (term_a, term_b) count: per-doc work is
    ≤ C(V, 2) and the shuffle carries map-side-combined pair partials.

    Output: (term_a, term_b, c_xy, c_x, c_y, pmi) for pairs with
    ``c_xy >= min_pair_count``, term_a < term_b.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != F.lit(""),
                )
            )
        ).alias("term"),
    )
    dfreq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    vocab = dfreq.orderBy(F.desc("c"), F.col("term")).limit(top_vocab)
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))

    invocab = toks.join(F.broadcast(vocab.select("term")), "term")
    arrs = invocab.groupBy(id_col).agg(
        F.array_sort(F.collect_list("term")).alias("ts")
    )
    a = F.col("ts")
    pairs_arr = F.flatten(
        F.transform(
            a,
            lambda x, i: F.transform(
                F.slice(a, i + 2, F.size(a)),
                lambda y: F.struct(x.alias("term_a"), y.alias("term_b")),
            ),
        )
    )
    cxy = (
        arrs.select(F.explode(pairs_arr).alias("p"))
        .groupBy(F.col("p.term_a").alias("term_a"), F.col("p.term_b").alias("term_b"))
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_pair_count)
    )
    cx = vocab.select(F.col("term").alias("term_a"), F.col("c").alias("c_x"))
    cy = vocab.select(F.col("term").alias("term_b"), F.col("c").alias("c_y"))
    return (
        cxy.join(F.broadcast(cx), "term_a")
        .join(F.broadcast(cy), "term_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term_a", "term_b", "c_xy", "c_x", "c_y",
            F.log(
                (F.col("c_xy") * F.col("n_docs")).cast("double")
                / (F.col("c_x") * F.col("c_y"))
            ).alias("pmi"),
        )
    )


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG/embedding preprocessing
    step: each document becomes ceil(n/stride) chunks of up to
    ``chunk_tokens`` whitespace tokens starting every ``stride`` tokens
    (stride < chunk_tokens ⇒ overlap of chunk_tokens - stride). The tail
    chunk may be short; documents with zero tokens emit no chunks. Case
    and token text are preserved verbatim.

    Pure Catalyst (split → sequence of starts → posexplode → slice):
    chunking is embarrassingly parallel, stays in whole-stage codegen,
    and adds NO shuffle — the chunk frame inherits the scan's
    partitioning, which is exactly what the downstream embedding UDF
    wants. Output: (id_col, chunk_id, n_tokens, chunk).
    """
    if chunk_tokens < 1 or stride < 1:
        raise ValueError(
            f"chunk_tokens ({chunk_tokens}) and stride ({stride}) must be >= 1"
        )
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )
    staged = df.select(F.col(id_col), words.alias("_w"))
    n = F.size(F.col("_w"))
    starts = F.when(n >= 1, F.sequence(F.lit(1), n, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    return staged.select(
        F.col(id_col), F.col("_w"), F.posexplode(starts).alias("_pos", "_start")
    ).select(
        F.col(id_col),
        F.col("_pos").cast("long").alias("chunk_id"),
        F.size(F.slice("_w", F.col("_start"), chunk_tokens))
        .cast("long")
        .alias("n_tokens"),
        F.array_join(F.slice("_w", F.col("_start"), chunk_tokens), " ").alias("chunk"),
    )


def dedup_lines_in_doc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 8,
) -> DataFrame:
    """WITHIN-document duplicate-line removal — the per-page half of the
    C4 cleanup (Raffel et al. 2020 §2.2: boilerplate lines repeat inside a
    page, nav/footer spans): each document keeps only the FIRST occurrence
    of every distinct line and is reassembled in original order; documents
    with zero tokens emit nothing. Output: (id_col, text, n_lines,
    n_dropped).

    Zero-shuffle by construction: corpus-wide line dedup (``line_dedup``)
    must shuffle on the line value, but within-doc dedup is row-local —
    the whole pass is array higher-order functions (split → fixed-width
    line array, same boundary rule as ``to_lines`` → keep-first dedup)
    inside whole-stage codegen, so it inherits the scan's partitioning and
    adds NO exchange at any scale. Keep-first IS ``array_distinct``: it
    returns each distinct element at its first occurrence, in order —
    O(lines) with a hash set, replacing the earlier
    ``array_position(lines, x) == i+1`` filter that rescanned the array
    per element (O(lines²) per document — measured 28.8 s for the corpus
    at sf1.0 vs 4 s with the hash-set form, same output bit-for-bit).

    Reference analogue: none (the reference dedups whole rows by pk,
    georef_ar_etl/loaders.py); this is the in-page boilerplate pass.
    """
    wpl = int(words_per_line)
    if wpl < 1:
        raise ValueError(f"words_per_line must be >= 1, got {words_per_line}")
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )
    w = F.col("_w")
    n = F.size(w)
    # n <= 0 guard: sequence(0, -1) would DESCEND, not be empty
    lines_arr = F.when(n <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), (F.ceil(n / F.lit(wpl)) - 1).cast("int")),
            lambda i: F.array_join(F.slice(w, i * wpl + 1, wpl), " "),
        )
    )
    kept = F.array_distinct(F.col("_lines"))
    # the zero-token filter runs on the RAW text (has ≥1 non-whitespace
    # char ⇔ the split yields ≥1 word ⇔ ≥1 line): filtering on
    # size(_lines) pushed the predicate below the projections with every
    # alias inlined — the split re-executed inside the transform lambda,
    # i.e. O(lines) full-text re-splits per document (measured 17 s of
    # the 28 s sf1.0 wall before the rewrite)
    return (
        df.filter(F.col(text_col).rlike(r"\S"))
        .select(F.col(id_col), words.alias("_w"))
        .select(F.col(id_col), lines_arr.alias("_lines"))
        .select(F.col(id_col), kept.alias("_kept"), F.size("_lines").alias("_tot"))
        .select(
            F.col(id_col),
            F.array_join("_kept", "\n").alias("text"),
            F.size("_kept").cast("long").alias("n_lines"),
            (F.col("_tot") - F.size("_kept")).cast("long").alias("n_dropped"),
        )
    )


def mask_tokens(
    text_col: Column,
    doc_id_col: Column,
    vocab_size: int = 32768,
    mask_pct: int = 15,
) -> Column:
    """Deterministic MLM-style token masking (the BERT/T5 pretraining
    corruption step, Devlin et al. 2019): position i of a doc is replaced
    by the sentinel id ``vocab_size`` iff ``md5(doc_id ':' i) mod 100 <
    mask_pct``. Seeding by (doc, position) hash — not an RNG — makes the
    corrupted corpus a pure function of the data: reproducible across
    engines, runs, partitionings and retries (an executor retry re-masks
    identically, which a stateful RNG cannot guarantee). Pure Catalyst
    higher-order functions over hash_tokenize ids; md5-derived on purpose
    so a DuckDB oracle replays every mask decision (q107)."""
    ids = hash_tokenize(text_col, vocab_size)
    did = doc_id_col.cast("string")
    return F.transform(
        ids,
        lambda x, i: F.when(
            F.conv(
                F.substring(F.md5(F.concat(did, F.lit(":"), i.cast("string"))), 1, 8),
                16,
                10,
            ).cast("long")
            % 100
            < mask_pct,
            F.lit(vocab_size),
        ).otherwise(x),
    )


def _merge_pair_expr(syms: Column, left: str, right: str) -> Column:
    """One greedy left-to-right non-overlapping BPE merge pass over a
    symbol array: adjacent (left, right) -> left||right. A linear fold —
    the merged symbol participates in LATER pairs (merge (a,a) turns
    'a a a a' into 'aa aa', and 'a a a' into 'aa a') exactly like the
    reference BPE replacement scan."""
    lit_l, lit_r = F.lit(left), F.lit(right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lit_l)
            & (x == lit_r),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_pair_count: int = 2,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Byte-pair-encoding merge-table training (Sennrich et al. ACL'16) —
    the tokenizer-training step of a pretraining pipeline, run as a
    distributed iterative job. Words are symbol sequences (characters
    plus a terminal '</w>' symbol); each round counts adjacent symbol
    pairs weighted by word frequency, promotes the most frequent pair
    (ties broken (count desc, left asc, right asc) — fully deterministic,
    so the merge table is a pure function of the corpus), and rewrites
    the vocabulary with the greedy non-overlapping merge.

    Scale posture: after ONE corpus pass (word count, map-side
    combinable), every iteration runs on the VOCABULARY frame — corpus
    text is never touched again, which is why classic BPE trainers
    operate on the word-frequency table. Per round: one pair-count
    shuffle (combinable, ≤ |vocab|·avg_len rows in, |pairs| out) and one
    single-row TakeOrdered to the driver (the argmax — metadata-sized,
    the same driver-loop shape as the seeded-kmeans centroid step);
    lineage is truncated by localCheckpoint every ``checkpoint_every``
    rounds so the per-word fold expressions don't nest across rounds.

    Returns (rank, left, right, pair_count), rank = 0..k-1 in merge
    order. Stops early when no pair reaches ``min_pair_count``.
    """
    spark = df.sparkSession
    words = (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = words.select(
        F.concat(F.split(F.col("w"), ""), F.array(F.lit("</w>"))).alias("syms"),
        "cnt",
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            vocab.select(
                F.explode(
                    # guard: sequence(1, 0) DESCENDS in Spark — a fully
                    # merged single-symbol word must yield no pairs
                    F.when(
                        F.size("syms") > 1,
                        F.transform(
                            F.sequence(F.lit(1), F.size("syms") - 1),
                            lambda i: F.struct(
                                F.element_at("syms", i).alias("l"),
                                F.element_at("syms", i + 1).alias("r"),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
                ).alias("p"),
                "cnt",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("pc"))
        )
        top = pairs.orderBy(F.desc("pc"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not top or top[0]["pc"] < min_pair_count:
            break
        left, right, pc = top[0]["l"], top[0]["r"], int(top[0]["pc"])
        merges.append((rank, left, right, pc))
        vocab = vocab.select(
            _merge_pair_expr(F.col("syms"), left, right).alias("syms"), "cnt"
        )
        if (rank + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rank: int, left: string, right: string, pair_count: bigint"
    )


def bpe_encode(text_col: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply a trained merge table to text → symbol arrays: chain the
    greedy merge passes in rank order (merge priority = training order,
    the BPE contract). Columnar chained folds, fine for the k ≲ 100
    merges a test vocabulary carries; a production encoder with 10^4+
    merges would switch to a pandas-UDF priority-queue encode — the
    TRAINING side above is the distributed-scale path."""
    words = F.filter(F.split(F.lower(text_col), r"\s+"), lambda w: w != "")
    syms = F.flatten(
        F.transform(
            words, lambda w: F.concat(F.split(w, ""), F.array(F.lit("</w>")))
        )
    )
    for left, right in merges:
        syms = _merge_pair_expr(syms, left, right)
    return syms


def dup_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Per-document duplicated-span coverage — the corpus-diagnostics
    metric behind exact-substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): how many of a document's
    tokens sit inside a k-token n-gram that ALSO appears in another
    document. ``dup_frac`` ~ 1 flags boilerplate/mirrored pages that
    survive whole-doc dedup because their remainder differs.

    Plan: one n-gram explode (grams hashed to 60-bit ints before the
    shuffle — the q104 trick: the aggregate and join move 8-byte keys,
    never 8-word strings; at 60 bits a trillion-gram corpus has ~3e-13
    collision probability per pair, and the oracle applies the SAME hash
    so verification is exact), one distinct-doc-count per gram (map-side
    combinable), one join back, then per-doc interval-union coverage
    computed INSIDE an array aggregate: consecutive duplicated start
    positions s_j cover min(k, s_{j+1} - s_j) new tokens (+k for the
    last) — no per-position explode of the coverage itself. Docs shorter
    than k tokens have no grams: dup_tokens 0.

    Output: (id, n_tok, dup_tokens, dup_frac), dup_frac rounded to 6.
    """
    w = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("ws"),
    )
    grams = (
        w.filter(F.size("ws") >= k)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(ws) - {k - 1}), i -> "
                    f"struct(i AS s, conv(substring(md5(concat_ws(' ', "
                    f"slice(ws, i, {k}))), 1, 15), 16, 10) AS g))"
                )
            ).alias("sg"),
        )
        .select(id_col, F.col("sg.s").alias("s"), F.col("sg.g").cast("long").alias("g"))
    )
    dup_grams = (
        grams.groupBy("g")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") > 1)
        .select("g")
    )
    starts = (
        grams.join(dup_grams, "g", "left_semi")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("s")).alias("ss"))
    )
    gaps_sum = F.aggregate(
        F.zip_with(
            F.slice(F.col("ss"), 1, F.size("ss") - 1),
            F.slice(F.col("ss"), 2, F.size("ss") - 1),
            lambda a, b: F.least(b - a, F.lit(k)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    covered = F.when(F.size("ss") == 0, F.lit(0)).otherwise(
        F.when(F.size("ss") == 1, F.lit(k)).otherwise(gaps_sum + F.lit(k))
    )
    n_tok = F.size("ws")
    return (
        w.join(starts, id_col, "left")
        .select(
            id_col,
            n_tok.cast("long").alias("n_tok"),
            F.coalesce(covered, F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce(covered, F.lit(0))
                / F.greatest(n_tok, F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
    )


def remove_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Exact-substring deduplication with REMOVAL (the second half of Lee
    et al. 2022 — ``dup_span_stats`` above is the diagnostic): every
    k-token n-gram occurrence that is not the gram's globally FIRST
    occurrence (order: (doc, start), so exactly one copy of every
    duplicated substring survives, including within-doc repeats) marks its
    k token positions for removal; a document's kept text is its tokens
    outside every such span, in original order.

    Plan: gram explode with 60-bit hashes (q104/q120 trick — the shuffle
    moves 8-byte keys), then ONE window over the gram (row_number + count
    — first-occurrence flag and duplication arity from a single exchange,
    vs groupBy+join-back's two), one groupBy back to the doc collecting
    the sorted duplicate start positions, and the kept-token
    reconstruction entirely inside array expressions (no per-position
    explode, no Python). Removal check per position t: the largest
    duplicate start <= t is within k — O(tokens · dup_starts) per doc,
    JVM-side; per-doc cost is independent of corpus size (docs don't grow
    when the corpus does — chunk pathological single documents upstream).

    Skew: a boilerplate gram shared by millions of docs lands its
    occurrences in one window partition — an external per-key sort, not a
    blowup (row_number streams); unlike the pair-join operators there is
    no quadratic term, so no stop-list is needed for correctness.

    Output: (id, n_tok, n_removed, kept_text) — kept_text is the
    space-joined surviving tokens (empty string when everything was
    removed; docs shorter than k tokens have no grams and keep all).
    """
    w = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("ws"),
    )
    grams = (
        w.filter(F.size("ws") >= k)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(ws) - {k - 1}), i -> "
                    f"struct(i AS s, conv(substring(md5(concat_ws(' ', "
                    f"slice(ws, i, {k}))), 1, 15), 16, 10) AS g))"
                )
            ).alias("sg"),
        )
        .select(
            id_col,
            F.col("sg.s").alias("s"),
            F.col("sg.g").cast("long").alias("g"),
        )
    )
    wg = Window.partitionBy("g").orderBy(id_col, "s")
    occ = grams.select(
        id_col,
        "s",
        F.row_number().over(wg).alias("_rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_cnt"),
    )
    dup_starts = (
        occ.filter((F.col("_cnt") > 1) & (F.col("_rn") > 1))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("s")).alias("ss"))
    )
    joined = w.join(dup_starts, id_col, "left").withColumn(
        "ss", F.coalesce(F.col("ss"), F.array().cast("array<int>"))
    )
    # F.sequence(1, 0) DESCENDS in Spark — guard the empty-token case
    kept_nonempty = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size("ws")),
            lambda t: F.when(
                ~F.exists(
                    F.col("ss"), lambda s: (s <= t) & (t < s + F.lit(k))
                ),
                F.element_at(F.col("ws"), t),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    kept = F.when(F.size("ws") > 0, kept_nonempty).otherwise(
        F.array().cast("array<string>")
    )
    return joined.select(
        id_col,
        F.size("ws").cast("long").alias("n_tok"),
        (F.size("ws") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("kept_text"),
    )


def lexical_diversity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document lexical-diversity profile — unigram Shannon entropy,
    Simpson diversity and type/token ratio. Low-entropy / low-diversity
    documents are keyword-stuffed or template pages that slip past
    length/punctuation gates (quality_score) and even the Gopher
    repetition rules when the repeats are shuffled; entropy is the
    standard pretraining-corpus signal for them.

    Shape: word-count — explode to (doc, word), count, re-aggregate per
    doc. Two shuffles, both map-side combinable, no vocabulary state.

    Cross-engine determinism: Simpson (1 - Σc(c-1)/(n(n-1))) and TTR are
    EXACT integer/decimal arithmetic. Entropy needs log2: each term
    c·log2(c) is quantized to 6dp BEFORE the (exact, order-insensitive)
    decimal sum, and H = log2(n) - S/n is derived from exact inputs in
    IEEE double — term quantization bounds the entropy error at
    ~types·5e-7/n (≪ the 6dp output rounding) while making the sum
    reproducible under any partitioning.
    """
    wds = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            )
        ).alias("w"),
    )
    c = wds.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    term = F.round(F.col("c") * F.log2("c"), 6).cast("decimal(28,6)")
    t = c.groupBy(id_col).agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(term).alias("s"),
        F.sum(F.col("c") * (F.col("c") - 1)).alias("pairs"),
    )
    n = F.col("n")
    return t.select(
        id_col,
        n.cast("long").alias("n_tok"),
        F.col("n_types").cast("long").alias("n_types"),
        F.round(
            F.log2(n) - F.col("s").cast("double") / n.cast("double"), 6
        ).alias("entropy"),
        F.when(n > 1,
            F.round(
                F.lit(1.0)
                - F.col("pairs").cast("double")
                / (n * (n - 1)).cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("simpson"),
        F.round(F.col("n_types").cast("double") / n.cast("double"), 6).alias(
            "ttr"
        ),
    )


def ngram_novelty(
    df: DataFrame,
    ref: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Per-document n-gram novelty against a reference corpus — the
    memorization/overlap audit: what fraction of a candidate document's
    k-token grams already exist ANYWHERE in ``ref``. novelty → 0 flags
    near-verbatim reuse of reference material even when whole-doc and
    span-level dedup miss it (q45's contamination op asks the pair
    question; this asks the per-doc score question).

    Plan: grams hash to 60-bit ints (q104/q120 discipline) on both sides;
    the reference reduces to its DISTINCT gram set ONCE (re-usable across
    audits — persist it and this is one semi-join per audit), then a
    LEFT SEMI join marks seen occurrences and one per-doc aggregate
    scores. Occurrence-level counting (every position counts, repeated
    grams count each time) so novelty reflects the document's surface,
    not its vocabulary. Docs with fewer than k tokens have no grams:
    novelty 1.0 by contract (nothing measurable was reused).
    """
    def grams(frame):
        return (
            frame.select(
                F.col(id_col),
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != "",
                ).alias("ws"),
            )
            .filter(F.size("ws") >= k)
            .select(
                id_col,
                F.explode(
                    F.expr(
                        f"transform(sequence(1, size(ws) - {k - 1}), i -> "
                        f"cast(conv(substring(md5(concat_ws(' ', "
                        f"slice(ws, i, {k}))), 1, 15), 16, 10) as bigint))"
                    )
                ).alias("g"),
            )
        )

    ref_set = grams(ref).select("g").distinct()
    aud = grams(df)
    seen = aud.join(ref_set, "g", "left_semi").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_seen")
    )
    totals = aud.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    base = df.select(id_col)
    return (
        base.join(totals, id_col, "left")
        .join(seen, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_seen", F.lit(0)).alias("n_seen"),
            F.round(
                F.lit(1.0)
                - F.coalesce("n_seen", F.lit(0))
                / F.greatest(F.coalesce("n_grams", F.lit(0)), F.lit(1)),
                6,
            ).alias("novelty"),
        )
    )


def suffix_array_ranks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Generalized suffix array over the corpus's within-document word
    suffixes by PREFIX DOUBLING (Manber–Myers) — the index structure
    behind exact-substring dedup at its strongest (Lee et al. 2022 build
    exactly this to find every duplicated substring, not just fixed-k
    grams). Output: (id, s, sa_rank) where sa_rank is the DENSE global
    rank of doc[s:] among ALL suffixes of ALL documents (identical
    suffixes share a rank; suffixes never compare past their own doc —
    a shorter suffix that is a prefix of another ranks first).

    Distributed shape: round r refines ranks from prefix length 2^(r-1)
    to 2^r as the dense rank of the pair (rank[s], rank[s+k]) — the
    "rank at s+k" is ONE co-keyed self-join (missing → -1 sentinel:
    shorter-is-smaller), and the dense rank of the DISTINCT pair set
    rides the two-phase range-partitioned global rank (never a
    single-task window). ceil(log2(max_doc_len)) rounds, each a
    constant number of shuffles of (id, s, rank) triples — 8-byte-ish
    rows regardless of document width; per-round localCheckpoint
    truncates the lineage (the components discipline). Early exit when
    a round splits no rank class (prefix doubling can then never split
    one later).

    The driver-side loop bound and the two metadata collects (max doc
    length, distinct-rank count per round) are scalars, not data.
    """
    from georef_ar_etl_spark.operators.entity_match import with_global_rank

    w = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("ws"),
    ).filter(F.size("ws") >= 1)
    pos = w.select(
        F.col(id_col), F.posexplode("ws").alias("_p", "_w")
    ).select(id_col, (F.col("_p") + 1).cast("int").alias("s"), "_w")
    vocab = pos.select("_w").distinct()
    vr = with_global_rank(vocab, ["_w"], rank_col="r")
    pos = (
        pos.join(vr, "_w")
        .select(id_col, "s", F.col("r").cast("long").alias("r"))
        .localCheckpoint(eager=True)
    )
    maxlen = int(w.agg(F.max(F.size("ws"))).collect()[0][0] or 1)
    n_classes = vr.count()  # distinct words = current rank-class count
    k = 1
    while k < maxlen:
        right = pos.select(
            F.col(id_col),
            (F.col("s") - F.lit(k)).cast("int").alias("s"),
            F.col("r").alias("_r2"),
        )
        pairs = pos.join(right, [id_col, "s"], "left").select(
            id_col, "s", "r", F.coalesce("_r2", F.lit(-1)).alias("r2")
        )
        dr = pairs.select("r", "r2").distinct()
        # with_global_rank checkpoints its input, so this count is a cheap
        # metadata-sized scan — and |ranked| IS the new class count (one
        # row per distinct (r, r+k) pair), no extra distinct pass needed
        ranked = with_global_rank(dr, ["r", "r2"], rank_col="_nr")
        new_classes = ranked.count()
        pos = (
            pairs.join(ranked, ["r", "r2"])
            .select(id_col, "s", F.col("_nr").cast("long").alias("r"))
            .localCheckpoint(eager=True)
        )
        if new_classes == n_classes:
            break  # no class split at 2k -> none will split at any 2^j·k
        n_classes = new_classes
        k *= 2
    return pos.select(id_col, "s", F.col("r").alias("sa_rank"))


def repeated_spans(
    df: DataFrame,
    min_len: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Every duplicated word span of at least ``min_len`` words, as the
    LCP report over the suffix array — the COMPLETE version of what fixed
    k-gram candidates approximate (a length-9 duplicate shows up here
    once with lcp=9, not as two 8-gram hits): adjacent suffixes in suffix
    -array order that share a prefix >= min_len. Standard LCP-interval
    fact: ANY repeated substring of length L makes some ADJACENT pair
    share >= L (pairwise LCP = min of adjacent LCPs between them), so
    nothing is missed.

    Plan: ``suffix_array_ranks`` (prefix doubling), one two-phase global
    row_number for the total SA order (ties broken by (id, s)), one
    self-join for neighbors, then LCP per adjacent pair by folding a
    zip_with equality over the two suffix slices (multiplicative
    short-circuit — pure Catalyst). The slices bound row width by the
    MAX DOCUMENT length, fine for normal corpora; for monster documents
    the rank-table binary-lifting LCP (O(log len) joins of constant-width
    rows) is the upgrade path — chunk such docs upstream.

    Output: (doc_a, s_a, doc_b, s_b, lcp, span_fp) — span_fp is the md5
    of the shared prefix (space-joined), so equal spans group by it.
    """
    from georef_ar_etl_spark.operators.entity_match import with_global_rank

    w = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("ws"),
    ).filter(F.size("ws") >= 1)
    sa = suffix_array_ranks(df, text_col=text_col, id_col=id_col)
    ordered = with_global_rank(sa, ["sa_rank", id_col, "s"], rank_col="rn")
    a = ordered.select(
        F.col(id_col).alias("doc_a"), F.col("s").alias("s_a"), "rn"
    )
    b = ordered.select(
        F.col(id_col).alias("doc_b"),
        F.col("s").alias("s_b"),
        (F.col("rn") - 1).alias("rn"),
    )
    pairs = (
        a.join(b, "rn")
        .join(
            w.select(F.col(id_col).alias("doc_a"), F.col("ws").alias("_wa")),
            "doc_a",
        )
        .join(
            w.select(F.col(id_col).alias("doc_b"), F.col("ws").alias("_wb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "s_a",
            "doc_b",
            "s_b",
            F.expr("slice(_wa, s_a, size(_wa) - s_a + 1)").alias("_sa"),
            F.expr("slice(_wb, s_b, size(_wb) - s_b + 1)").alias("_sb"),
        )
    )
    eqs = F.zip_with(
        F.col("_sa"),
        F.col("_sb"),
        lambda x, y: F.when(
            x.isNotNull() & y.isNotNull() & (x == y), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    lcp = F.aggregate(
        eqs,
        F.struct(F.lit(1).alias("go"), F.lit(0).alias("n")),
        lambda acc, e: F.struct(
            (acc["go"] * e).alias("go"), (acc["n"] + acc["go"] * e).alias("n")
        ),
        lambda acc: acc["n"],
    )
    return (
        pairs.withColumn("lcp", lcp)
        .filter(F.col("lcp") >= min_len)
        .select(
            "doc_a",
            "s_a",
            "doc_b",
            "s_b",
            F.col("lcp").cast("int").alias("lcp"),
            F.md5(
                F.array_join(F.slice(F.col("_sa"), F.lit(1), F.col("lcp")), " ")
            ).alias("span_fp"),
        )
    )
