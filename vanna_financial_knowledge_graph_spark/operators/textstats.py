"""Text analysis operators for training-data curation: language ID, quality
scoring, token counting, document fingerprinting.

Every expression here is built from pyspark.sql.functions only (whole-stage
codegen, no Python), and deliberately mirrors ANSI SQL one-to-one so the
DuckDB oracle can run the identical formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker-word sets for the n-gram language heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "les", "des", "est", "une"],
    "zh": ["de", "shi", "he", "zai", "le"],
}


def _marker_count(text_col, words: list[str]):
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    c = F.lit(0)
    for w in words:
        # occurrences of ' w ' = (len - len(removed)) / len(' w ')
        token = f" {w} "
        c = c + (
            (F.length(padded) - F.length(F.replace(padded, F.lit(token), F.lit(""))))
            / F.lit(len(token))
        ).cast("int")
    return c


def language_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic marker-word language vote: argmax count, ties broken by
    fixed language order (en, es, de, fr, zh), 'und' when all zero."""
    scores = {
        lang: _marker_count(text_col, words) for lang, words in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(["en", "es", "de", "fr", "zh"]):
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return documents.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in ["en", "es", "de", "fr", "zh"]],
        pred.alias("lang_pred"),
    )


def token_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (chars/4 heuristic —
    the reference's tiktoken fallback, utils/token_count.py:27-54)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return documents.select(
        "doc_id",
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
        .otherwise(F.size(toks))
        .cast("long")
        .alias("ws_tokens"),
        F.floor(F.length(F.col(text_col)) / 4).cast("long").alias("approx_bpe_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


def quality_scores(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a composite
    keep/drop signal (the usual pre-training heuristics)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = F.split(F.trim(t), r"\s+")
    n_words = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(toks))
    # class-member counts as length deltas of translate() deletions: same
    # codepoint counts as the old regexp_replace("[^...]", "") formulation
    # but a single table-lookup pass per class instead of a regex engine
    # walk — the three regexes were ~80% of this operator's compute
    # (round-6, guide §1.2 'per-task work')
    _alpha = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    n_alpha = n_chars - F.length(F.translate(t, _alpha, ""))
    n_punct = n_chars - F.length(F.translate(t, ".,;:!?", ""))
    n_digit = n_chars - F.length(F.translate(t, "0123456789", ""))
    stop_hits = _marker_count(text_col, ["the", "and", "of", "to", "in", "a", "is"])
    mean_word_len = F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, n_digit / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0))
    keep = (
        (n_words >= 10)
        & (mean_word_len >= 2.0)
        & (mean_word_len <= 12.0)
        & (alpha_ratio >= 0.6)
        & (digit_ratio <= 0.3)
    )
    return documents.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        keep.cast("int").alias("keep"),
    )


def doc_fingerprints(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized-content fingerprint + first/last 64-char anchors (rolling-
    hash stand-in that stays SQL-expressible)."""
    normed = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return documents.select(
        "doc_id",
        F.md5(normed).alias("fingerprint"),
        F.md5(F.substring(normed, 1, 64)).alias("head_hash"),
        F.md5(F.substring(normed, -64, 64)).alias("tail_hash"),
    )
