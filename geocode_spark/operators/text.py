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

# BPE-ish token split: words, numbers, or single non-space symbols.
# Explicit whitespace class (including \x0B) instead of \s: Java regex
# counts \x0B in \s, RE2 (the DuckDB oracle) does not — the one
# engine-divergent surface the class removes.
_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^ \t\n\x0B\f\rA-Za-z0-9]"


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


def with_repetition_score(df: DataFrame, text_col: str = "text",
                          n: int = 3) -> DataFrame:
    """Intra-document repetition (Gopher/RefinedWeb-family quality signal):
    the fraction of word n-grams that are duplicates of an earlier n-gram
    in the SAME document. Boilerplate, keyword-stuffed and
    template-generated pages score high; natural prose scores near 0.

    Adds ``ngram_total``, ``ngram_distinct`` and ``repetition_score``
    (= 1 - distinct/total, 0.0 for docs shorter than one n-gram). NULL
    text counts as empty (without the coalesce, size(NULL array) is
    -1/NULL and the counts would diverge from the 0 every consumer — and
    the DuckDB oracle — expects). Pure Catalyst array algebra — stays
    inside whole-stage codegen, composes with the other profile passes
    without a shuffle."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                r"[ \t\n\r\f]+"),
        lambda t: t != "")
    df = df.withColumn("__toks", toks)
    grams = F.transform(
        F.filter(
            F.transform(F.col("__toks"),
                        lambda w, i: F.slice(F.col("__toks"), i + 1, n)),
            lambda arr: F.size(arr) == n),
        lambda arr: F.array_join(arr, " "))
    df = df.withColumn("__grams", grams)
    total = F.size(F.col("__grams"))
    distinct = F.size(F.array_distinct(F.col("__grams")))
    return (df.withColumn("ngram_total", total)
            .withColumn("ngram_distinct", distinct)
            .withColumn("repetition_score",
                        F.when(total > 0,
                               1.0 - distinct / total).otherwise(0.0))
            .drop("__toks", "__grams"))


def contamination_flags(docs: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 5, min_overlap: int = 1) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing at least
    ``min_overlap`` distinct word-``n``-grams with ANY benchmark document
    (the standard eval-leakage screen a training-data pipeline runs before
    every release).

    Returns (id_col, contaminated_grams) for flagged documents only.

    100 TB shape: the benchmark side is SMALL (eval sets are KB-MB) — its
    distinct gram set is broadcast; the corpus side is one explode + one
    broadcast join + one aggregation shuffle keyed by document id. The
    corpus is never shuffled on gram, so a boilerplate gram cannot skew
    the exchange."""
    from .dedup import ngram_tokens

    bench_grams = (ngram_tokens(benchmark, text_col, id_col, n)
                   .select("gram").distinct())
    doc_grams = ngram_tokens(docs, text_col, id_col, n)
    return (doc_grams.join(F.broadcast(bench_grams), "gram")
            .groupBy(id_col)
            .agg(F.count("gram").alias("contaminated_grams"))
            .filter(F.col("contaminated_grams") >= min_overlap))


# tracking query parameters dropped by canonicalize_urls (the common
# analytics/click-id families; explicit list so both regex engines agree)
_TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)="


def canonicalize_urls(df: DataFrame, url_col: str = "url",
                      out_col: str = "canonical_url") -> DataFrame:
    """URL canonicalization for web-corpus dedup: lowercase scheme+host,
    strip the #fragment, drop default :80/:443 ports, strip trailing
    slashes, and drop tracking query parameters (utm_*, fbclid, gclid,
    msclkid, ref) while preserving the rest of the query in order.

    Adds ``out_col`` and ``domain`` (lowercased host without port). A
    string with no scheme passes through path-normalization only. Pure
    Catalyst (regexp + array ops) — explicit character classes only, so
    Java regex and RE2 (the DuckDB oracle) agree on every input."""
    u = F.col(url_col)
    df = df.withColumn("__base", F.regexp_extract(u, "^([^#]*)", 1))
    df = df.withColumn("__pre",
                       F.regexp_extract(F.col("__base"), "^([^?]*)", 1))
    df = df.withColumn("__q", F.regexp_extract(F.col("__base"),
                                               "^[^?]*[?](.*)$", 1))
    df = df.withColumn(
        "__sh_raw",
        F.regexp_extract(F.col("__pre"),
                         "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1))
    sh = F.lower(F.col("__sh_raw"))
    sh = F.regexp_replace(sh, "^(http://[^/:]*):80$", "$1")
    sh = F.regexp_replace(sh, "^(https://[^/:]*):443$", "$1")
    df = df.withColumn("__sh", sh)
    df = df.withColumn(
        "__path",
        F.regexp_replace(
            F.expr("substring(__pre, length(__sh_raw) + 1)"), "/+$", ""))
    keep = F.filter(
        F.split(F.col("__q"), "[&]"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE))
    df = df.withColumn("__qk", F.array_join(keep, "&"))
    canonical = F.concat(
        F.col("__sh"), F.col("__path"),
        F.when(F.col("__qk") != "",
               F.concat(F.lit("?"), F.col("__qk"))).otherwise(F.lit("")))
    domain = F.regexp_extract(F.col("__sh"),
                              "^[a-z][a-z0-9+.-]*://([^/:]*)", 1)
    return (df.withColumn(out_col, canonical)
            .withColumn("domain", domain)
            .drop("__base", "__pre", "__q", "__sh_raw", "__sh", "__path",
                  "__qk"))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All analysis columns in one codegen'd pass."""
    return with_repetition_score(
        with_fingerprint(
            with_lang_id(with_quality_score(with_token_counts(df, text_col),
                                            text_col), text_col), text_col),
        text_col)
