"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (JVM-side, codegen'd) so they hold up at
100 TB: language-ID (marker-word heuristic), quality scoring, token
counting, and document fingerprinting. Normalization mirrors the
reference's ``clean_string`` (georef_ar_etl/utils.py:190-195).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    """Whitespace token count (0 for empty/blank text)."""
    t = norm_text(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, " ")))


def marker_hits(col: Column, words: list[str]) -> Column:
    """Total occurrences of any marker word, word-bounded."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(norm_text(col), F.lit(pat))


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
    shingle position."""
    t = col if pre_normalized else norm_text(col)
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), n), lambda i: t.substr(i, F.lit(k)))
    return F.array_distinct(grams)
