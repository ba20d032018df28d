"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions``
(JVM-side, whole-stage codegen) — no Python UDFs. Each operator adds
columns to a documents DataFrame; nothing shuffles until the caller
aggregates, so these compose into a single scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, universal_hash

# Tiny per-language function-word lists for the n-gram/stopword
# language heuristic. Deliberately small and frozen: the heuristic is
# the operator; swap in real fastText/CLD offline models via the same
# column contract when available.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "en", "un"],
}

STOPWORDS_EN = LANG_STOPWORDS["en"] + [
    "this", "with", "as", "on", "be", "by", "are", "was", "at", "or",
]

_WS = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (empty string -> empty array)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")) \
            .otherwise(F.split(t, _WS))


def bpe_ish_tokens(text: Column) -> Column:
    """A BPE-ish sub-word split: runs of letters, runs of digits, or a
    single other non-space char — the classic pre-tokenizer regex."""
    return F.regexp_extract_all(
        text, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_ratio(text: Column, char_class_regex: str) -> Column:
    """Fraction of characters matching a regex character class,
    computed as length-delta (identical semantics in any engine)."""
    n = F.length(text)
    stripped = F.length(F.regexp_replace(text, char_class_regex, ""))
    return F.when(n > 0, (n - stripped) / n).otherwise(F.lit(0.0))


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add token/character quality-score features.

    One projection, no shuffle; at 100 TB this pipelines into the
    parquet scan with column pruning (only ``text`` is read).
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(
        toks, lambda x: F.lower(x).isin(STOPWORDS_EN)))
    return (df
            .withColumn("n_tokens", n_tok)
            .withColumn("n_chars_m", F.length(t))
            .withColumn("avg_token_len",
                        F.when(n_tok > 0,
                               (F.length(F.concat_ws("", toks)) / n_tok))
                        .otherwise(F.lit(0.0)))
            .withColumn("digit_ratio", char_ratio(t, r"[0-9]"))
            .withColumn("punct_ratio",
                        char_ratio(t, r"[!-/:-@\[-`{-~]"))
            .withColumn("space_ratio", char_ratio(t, r"\s"))
            .withColumn("stopword_ratio",
                        F.when(n_tok > 0, stop_hits / n_tok)
                        .otherwise(F.lit(0.0))))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """A composite [0,1] quality score from the features — the shape
    of C4/Gopher-style filters (length, symbol ratios, stopword
    presence), tuned to be monotone and cheap."""
    feat = with_text_features(df, text_col)
    score = (
        F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("punct_ratio") * 4, F.lit(1.0))) * 0.2
        + (1.0 - F.least(F.col("digit_ratio") * 4, F.lit(1.0))) * 0.2
        + F.least(F.col("stopword_ratio") * 5, F.lit(1.0)) * 0.2
    )
    # an empty/whitespace-only document is quality 0, not "no
    # punctuation" credit
    score = F.when(F.col("n_tokens") > 0, score).otherwise(F.lit(0.0))
    return feat.withColumn("quality_score", F.round(score, 4))


def lang_scores(text: Column):
    """Per-language stopword-hit counts (the n-gram heuristic)."""
    toks = tokens(F.lower(text))

    def member(words):
        return lambda x: x.isin(list(words))

    return {
        lang: F.size(F.filter(toks, member(words)))
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(df: DataFrame, text_col: str = "text",
            out_col: str = "lang_pred") -> DataFrame:
    """Argmax language by stopword hits; deterministic tiebreak on
    language code; 'und' (undetermined) when no hits at all."""
    scores = lang_scores(F.col(text_col))
    langs = sorted(scores)           # deterministic tie order
    best = F.greatest(*[scores[l] for l in langs])
    pred = F.lit("und")
    for lang in reversed(langs):     # earlier lang wins ties
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return df.withColumn(out_col, pred)


def fingerprint(df: DataFrame, text_col: str = "text",
                k: int = 8, out_col: str = "fingerprint") -> DataFrame:
    """Winnowing-style document fingerprint: the minimum universal
    hash over all k-char grams of the normalized text — one int64 per
    doc, shift-invariant to small edits away from the minimizing gram.
    JVM-side: sequence + transform + array_min, no shuffle."""
    t = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    n = F.length(t)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: t.substr(i, F.lit(k)))
    hashes = F.transform(grams, lambda g: universal_hash(
        md5_long(g), 1664525, 1013904223))
    fp = F.when(n >= k, F.array_min(hashes)).otherwise(
        universal_hash(md5_long(t), 1664525, 1013904223))
    return df.withColumn(out_col, fp)
