"""Text-analysis operators for training-data curation (pure Catalyst where
possible; everything JVM-side and codegen'd unless noted).

Each returns the input DataFrame with added columns, so they compose into a
single whole-stage-codegen'd pass over the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# small multilingual stopword seed sets for the n-gram language heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "une", "dans", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "es": ["el", "la", "los", "de", "que", "y", "es", "en", "una", "por"],
}

# BPE-ish token split: words, numbers, or single non-space symbols
_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """whitespace_tokens + bpe-ish regex token count."""
    c = F.col(text_col)
    return (
        df.withColumn(
            "ws_tokens",
            F.size(F.filter(F.split(c, r"[ \t\n\r\f]+"), lambda t: t != "")))
        .withColumn(
            "re_tokens",
            F.size(F.regexp_extract_all(c, F.lit(_TOKEN_REGEX), F.lit(0))))
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a composite
    score in [0, 1] (heuristics in the C4/Gopher-rules family)."""
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = F.filter(F.split(F.lower(c), r"[ \t\n\r\f]+"), lambda t: t != "")
    n_words = F.size(toks)
    stop = F.array([F.lit(w) for w in _LANG_MARKERS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop))
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[.,;:!?]"), F.lit(0)))
    mean_word_len = F.when(n_words > 0, (n_chars - n_words + 1) / n_words).otherwise(F.lit(0.0))
    df = (
        df.withColumn("n_chars_m", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("stopword_hits", n_stop)
        .withColumn("punct_ratio",
                    F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0))
        .withColumn("mean_word_len", mean_word_len)
    )
    score = (
        F.when(F.col("n_words") >= 5, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10),
                 F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(F.col("stopword_hits") >= 2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(F.col("punct_ratio") <= 0.2, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return df.withColumn("quality_score", score)


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: argmax of per-language stopword hits
    over a fixed marker vocabulary ('und' unique to de, etc.). Deterministic
    tie-break: language order en, fr, de, es; 'unk' when zero hits."""
    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.col(text_col)), r"[ \t\n\r\f]+"), lambda t: t != ""))
    scores = [
        F.size(F.array_intersect(
            toks, F.array([F.lit(w) for w in words]))).alias(f"__s_{lang}")
        for lang, words in _LANG_MARKERS.items()
    ]
    df2 = df.select("*", *scores)
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"__s_{l}") for l in langs])
    pred = F.lit("unk")
    for lang in reversed(langs):  # earlier languages win ties
        pred = F.when(F.col(f"__s_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("unk"))
    return df2.withColumn("lang_pred", pred).drop(*[f"__s_{l}" for l in langs])


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit document fingerprint: xxhash64 of the whitespace-normalized,
    lowercased text (rolling-hash-equivalent content identity)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"[ \t\n\r\f]+", " ")
    return df.withColumn("fingerprint", F.xxhash64(norm))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All analysis columns in one codegen'd pass."""
    return with_fingerprint(
        with_lang_id(with_quality_score(with_token_counts(df, text_col),
                                        text_col), text_col), text_col)
