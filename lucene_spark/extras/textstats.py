"""Text analysis for training-data pipelines: counts, quality, lang-ID,
fingerprints.

All hot-path math is JVM column expressions (regexp/length/split) so the
operators stay inside whole-stage codegen; the only Python is the lang-ID
scoring, which is still SQL-expressible (stopword-hit argmax) and has a
DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# small per-language function-word profiles (deterministic, ASCII)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr": ("le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"),
    "es": ("el", "la", "los", "y", "es", "no", "una", "para", "en", "que"),
}
LANG_ORDER = tuple(LANG_PROFILES)  # tie-break: first in this order wins

BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def _words(text_col):
    return F.split(F.trim(F.lower(text_col)), r"\s+")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_chars).

    ``n_ws_tokens``: whitespace tokens; ``n_bpe_tokens``: a BPE-ish
    sub-word proxy — alpha runs count 1, each digit counts 1, each other
    non-space symbol counts 1 (the tokenizer-budget estimator shape).
    """
    t = F.col(text_col)
    ws = F.when(F.trim(t) == "", 0).otherwise(F.size(_words(t)))
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), 0))
    return df.select(
        "doc_id",
        ws.cast("int").alias("n_ws_tokens"),
        bpe.cast("int").alias("n_bpe_tokens"),
        F.length(t).cast("int").alias("n_chars"),
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, mean_word_len, punct_ratio, digit_ratio,
    stop_ratio, quality) — deterministic heuristic quality in [0, 1].

    quality = clamp(0.25·len_score + 0.25·stop_score + 0.25·(1−punct_ratio·4)
              + 0.25·(1−digit_ratio·4)) with len_score saturating at 100
    words and stop_score = min(1, stop_ratio·5).  Rounded to 6dp for stable
    cross-engine comparison.
    """
    t = F.col(text_col)
    words = _words(t)
    n_words = F.when(F.trim(t) == "", 0).otherwise(F.size(words)).cast("double")
    n_chars = F.length(F.regexp_replace(t, r"\s+", "")).cast("double")
    n_punct = (
        F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    ).cast("double")
    n_digit = (
        F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    ).cast("double")
    stops = LANG_PROFILES["en"]
    n_stop = F.size(F.filter(words, lambda w: w.isin(*stops))).cast("double")

    safe_words = F.greatest(n_words, F.lit(1.0))
    safe_chars = F.greatest(F.length(t).cast("double"), F.lit(1.0))
    mean_wl = n_chars / safe_words
    punct_ratio = n_punct / safe_chars
    digit_ratio = n_digit / safe_chars
    stop_ratio = n_stop / safe_words
    len_score = F.least(n_words / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(stop_ratio * 5.0, F.lit(1.0))
    quality = (
        0.25 * len_score
        + 0.25 * stop_score
        + 0.25 * F.greatest(F.lit(0.0), 1.0 - punct_ratio * 4.0)
        + 0.25 * F.greatest(F.lit(0.0), 1.0 - digit_ratio * 4.0)
    )
    return df.select(
        "doc_id",
        n_words.cast("int").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang, lang_hits) — argmax of function-word hits per language.

    Ties resolve in LANG_ORDER; zero hits ⇒ 'und' (undetermined).  A coarse
    but deterministic n-gram-free heuristic (function words are the
    strongest single lang-ID signal); swap in a real classifier via the
    same column contract.
    """
    words = _words(F.col(text_col))
    hit_cols = {
        lang: F.size(F.filter(words, lambda w: w.isin(*prof))).cast("int")
        for lang, prof in LANG_PROFILES.items()
    }
    best = None
    best_hits = None
    for lang in LANG_ORDER:
        h = hit_cols[lang]
        if best is None:
            best, best_hits = F.lit(lang), h
        else:
            cond = h > best_hits
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_hits = F.when(cond, h).otherwise(best_hits)
    best = F.when(best_hits > 0, best).otherwise(F.lit("und"))
    return df.select("doc_id", best.alias("lang"), best_hits.alias("lang_hits"))


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint) — md5 of the normalized text (lowercase, strip
    punctuation, collapse whitespace): the canonical near-exact-dup key."""
    t = F.col(text_col)
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(t), r"[^\w\s]", ""), r"\s+", " ")
    )
    return df.select("doc_id", F.md5(norm).alias("fingerprint"))
