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


def token_count_columns(text_col: str = "text") -> dict[str, Column]:
    """Column builders — composable into ANY projection (the DataFrame
    wrappers below are one select over these; composite pipelines use
    them directly so the plan stays a single pass instead of join
    re-expansions per derived frame)."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe = F.size(
        F.regexp_extract_all(
            t, F.lit(r"([A-Za-z]+|[0-9]|[^A-Za-z0-9\s])"), F.lit(1))
    )
    return {
        "n_ws_tokens": ws.cast("long"),
        "n_bpe_ish": bpe.cast("long"),
        "n_chars_norm": F.length(normalize_text(t)).cast("long"),
    }


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_ish, n_chars_norm): whitespace tokens
    plus a BPE-ish regex count (word pieces + digits + punctuation runs),
    the standard cheap proxy for tokenizer cost."""
    cols = token_count_columns(text_col)
    return docs.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()])


def quality_columns(text_col: str = "text") -> dict[str, Column]:
    """Quality-feature column builders (see token_count_columns note)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    n_punct = F.size(
        F.regexp_extract_all(t, F.lit(r"([^\w\s])"), F.lit(1)))
    n_upper = F.size(F.regexp_extract_all(t, F.lit(r"([A-Z])"), F.lit(1)))
    n_stop = _word_matches(t, LANG_MARKERS["en"])
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "mean_word_len": F.round(
            n_chars / F.greatest(n_words, F.lit(1)), 6),
        "punct_ratio": F.round(
            n_punct / F.greatest(n_chars, F.lit(1)), 6),
        "upper_ratio": F.round(
            n_upper / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(
            n_stop / F.greatest(n_words, F.lit(1)), 6),
    }


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: length, mean word length, punctuation
    ratio, stopword ratio, uppercase ratio — the classic cheap filters."""
    cols = quality_columns(text_col)
    return docs.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()])


def lang_columns(text_col: str = "text") -> dict[str, Column]:
    """(lang_pred, score) column builders.  Marker counts appear in both
    the argmax and the tie-broken pick; whole-stage codegen's
    subexpression elimination evaluates each regex once per row."""
    t = F.col(text_col)
    scores = {lang: _word_matches(t, ws)
              for lang, ws in LANG_MARKERS.items()}
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[scores[lang] for lang in langs])
    pick = F.coalesce(
        *[F.when((scores[lang] == best) & (best > 0), F.lit(lang))
          for lang in langs],
        F.lit("und"),
    )
    return {"lang_pred": pick, "score": best.cast("long")}


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: argmax over per-language marker hit
    counts, deterministic tie-break by language code; 'und' when no marker
    hits at all."""
    cols = lang_columns(text_col)
    return docs.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()])


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint of the normalized text (md5) — dedup key that
    survives whitespace/punctuation/case jitter."""
    return docs.select(
        "doc_id", F.md5(normalize_text(text_col)).alias("fingerprint"))
