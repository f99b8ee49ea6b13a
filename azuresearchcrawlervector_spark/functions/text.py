"""Text-analysis columns for training-data pipelines — ALL pure built-ins
(JVM-side, whole-stage codegen), each with an exact ANSI-SQL twin for the
DuckDB oracle (see __spark_entry__.py).

- token_count      whitespace tokenization + a BPE-ish subword estimate
- quality_score    length / punctuation / stopword-ratio heuristic
- lang_id          marker-word n-gram heuristic (deterministic)
- fingerprint      normalized md5 content fingerprint (exact-dup key)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
# marker regexes per language — deliberately simple so the EXACT same
# expression runs in DuckDB; determinism is the contract, the heuristic
# quality is tunable later
LANG_MARKERS = {
    "en": r"\b(the|and|is|with)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|es|y)\b",
}


def token_count_col(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def subword_count_col(text: Column) -> Column:
    """BPE-ish upper-bound token estimate: alternating letter/digit runs +
    punctuation marks each count as one subword."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def stopword_ratio_col(text: Column) -> Column:
    pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_stop = F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0)))
    return F.round(n_stop / F.greatest(token_count_col(text), F.lit(1)), 6)


def punct_ratio_col(text: Column) -> Column:
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), F.lit(0)))
    return F.round(n_punct / F.greatest(F.length(text), F.lit(1)), 6)


def quality_score_col(text: Column) -> Column:
    """[0,1] quality heuristic: length band + low punctuation + presence of
    stopwords (word-salad and boilerplate both score low)."""
    len_score = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    stop = stopword_ratio_col(text)
    stop_score = F.when(stop > 0.6, F.lit(0.2)).when(stop > 0.02, F.lit(1.0)).otherwise(F.lit(0.4))
    punct_score = F.when(punct_ratio_col(text) > 0.2, F.lit(0.3)).otherwise(F.lit(1.0))
    return F.round((len_score + stop_score + punct_score) / 3.0, 6)


def lang_id_col(text: Column) -> Column:
    """Predicted language by max marker-hit count; ties broken by the fixed
    en > de > fr > es order (CASE evaluation order)."""
    counts = {
        lang: F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0)))
        for lang, pat in LANG_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in ("en", "de", "fr", "es"):
        expr = expr.when(counts[lang] == best, F.lit(lang))
    return expr


def fingerprint_col(text: Column) -> Column:
    """Content fingerprint: md5 of lowercase text with all non-word chars
    removed — whitespace/punctuation-insensitive exact-dup key."""
    return F.md5(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", ""))
