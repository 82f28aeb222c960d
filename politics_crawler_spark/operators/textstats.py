"""Text-analysis operators for training-data pipelines (task directive):
language-ID, quality scoring, token counting, document fingerprinting.

All pure JVM-side expressions (whole-stage codegen, no Python) with exact
ANSI-SQL equivalents so the DuckDB oracle can verify them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deterministic mini stopword lists (shared with the oracle SQL)
EN_STOP = ["the", "and", "of", "to", "a", "in", "is", "it"]
ES_STOP = ["el", "la", "de", "que", "y", "en"]


def token_count(text: Column) -> Column:
    """Whitespace/word tokens via regexp — mirrors DuckDB
    ``len(regexp_extract_all(text, '\\w+'))``."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\w+"), 0)).cast("long")


def n_chars(text: Column) -> Column:
    return F.length(text).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are .,!?;: — quality-score component."""
    removed = F.regexp_replace(text, r"[.,!?;:]", "")
    return F.when(F.length(text) > 0,
                  (F.length(text) - F.length(removed)) / F.length(text)
                  ).otherwise(F.lit(0.0))


def _stop_hits(text: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def stopword_ratio(text: Column, words: list[str] | None = None) -> Column:
    words = words or EN_STOP
    toks = token_count(text)
    return F.when(toks > 0, _stop_hits(text, words) / toks).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality: long enough, modest punctuation, has
    stopwords (a fluency proxy). Deterministic arithmetic only."""
    len_term = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    return F.round((len_term + punct_term + stop_term) / 3.0, 6)


def lang_id(text: Column) -> Column:
    """N-gram/stopword heuristic language tag: 'en' vs 'es' vs 'unknown'.

    (The reference has no language detection — `lang` is an input column per
    input_hint; this operator exists for the training-data pipeline tier.)
    """
    en = _stop_hits(text, EN_STOP)
    es = _stop_hits(text, ES_STOP)
    return (
        F.when((en == 0) & (es == 0), F.lit("unknown"))
        .when(en >= es, F.lit("en"))
        .otherwise(F.lit("es"))
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text (md5 exists verbatim in DuckDB → oracle-able)."""
    norm = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    return F.md5(norm)
