"""Text analysis operators (training-data pipeline surface).

All pure Catalyst expressions (JVM-side, codegen'd, no Python) so they run
at scan speed and are reproducible in any SQL oracle: token counting,
quality scoring, n-gram-heuristic language ID, document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ts2g2_spark.functions.hashing import normalize_text

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit"],
    "fr": ["le", "la", "les", "et", "est", "que", "des"],
    "es": ["el", "los", "las", "es", "una", "que", "para"],
    "it": ["il", "che", "di", "non", "una", "per", "sono"],
}


def _word_matches(col: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.coalesce(
        F.size(F.regexp_extract_all(F.lower(col), F.lit(pat), F.lit(1))),
        F.lit(0),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_ish, n_chars_norm): whitespace tokens
    plus a BPE-ish regex count (word pieces + digits + punctuation runs),
    the standard cheap proxy for tokenizer cost."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe = F.size(
        F.regexp_extract_all(
            t, F.lit(r"([A-Za-z]+|[0-9]|[^A-Za-z0-9\s])"), F.lit(1))
    )
    return docs.select(
        "doc_id",
        ws.cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_ish"),
        F.length(normalize_text(t)).cast("long").alias("n_chars_norm"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: length, mean word length, punctuation
    ratio, stopword ratio, uppercase ratio — the classic cheap filters."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    n_punct = F.size(
        F.regexp_extract_all(t, F.lit(r"([^\w\s])"), F.lit(1)))
    n_upper = F.size(F.regexp_extract_all(t, F.lit(r"([A-Z])"), F.lit(1)))
    n_stop = _word_matches(t, LANG_MARKERS["en"])
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(n_chars / F.greatest(n_words, F.lit(1)), 6)
        .alias("mean_word_len"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
        .alias("punct_ratio"),
        F.round(n_upper / F.greatest(n_chars, F.lit(1)), 6)
        .alias("upper_ratio"),
        F.round(n_stop / F.greatest(n_words, F.lit(1)), 6)
        .alias("stopword_ratio"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: argmax over per-language marker hit
    counts, deterministic tie-break by language code; 'und' when no marker
    hits at all."""
    t = F.col(text_col)
    scored = docs.select(
        "doc_id",
        *[_word_matches(t, ws).alias(f"s_{lang}")
          for lang, ws in LANG_MARKERS.items()],
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    pick = F.coalesce(
        *[F.when((F.col(f"s_{lang}") == best) & (best > 0), F.lit(lang))
          for lang in langs],
        F.lit("und"),
    )
    return scored.select(
        "doc_id", pick.alias("lang_pred"), best.cast("long").alias("score"))


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint of the normalized text (md5) — dedup key that
    survives whitespace/punctuation/case jitter."""
    return docs.select(
        "doc_id", F.md5(normalize_text(text_col)).alias("fingerprint"))
