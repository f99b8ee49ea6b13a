"""Corpus curation — the canonical LLM training-data flow composed as
ONE declarative DataFrame plan: exact-dedup keeper selection → quality
gate → language filter → token statistics.

Because every stage is pure built-in expressions over one table plus a
single hash-groupBy, Catalyst sees the WHOLE pipeline at once: the
quality/language/token expressions collapse into one projection, the
filters push into the scan, and the only shuffle is the dedup groupBy
(map-side combinable). At 100 TB the plan reads the corpus once,
shuffles one (hash, min_id) row per distinct content, and never
re-scans between "stages" — the reason to compose declaratively
instead of materializing each step.

The reference has no curation concept; this composes the repo's text
operators (functions/text.py, operators/dedup.py) into the form a
training-data pipeline actually runs them.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import (
    lang_id_col, quality_score_col, subword_count_col, token_count_col,
)
from .dedup import exact_dedup


def curate_corpus(df: DataFrame, min_quality: float = 0.5,
                  langs: tuple[str, ...] = ("en",),
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred, quality, n_tokens, n_subwords) for the
    surviving documents: exact-dup keepers only (min id per distinct
    content), quality ≥ min_quality, predicted language in `langs`."""
    keepers = exact_dedup(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col))
    scored = df.join(keepers, on=id_col, how="left_semi").select(
        id_col,
        lang_id_col(F.col(text_col)).alias("lang_pred"),
        quality_score_col(F.col(text_col)).alias("quality"),
        token_count_col(F.col(text_col)).alias("n_tokens"),
        subword_count_col(F.col(text_col)).alias("n_subwords"),
    )
    return scored.filter(
        (F.col("quality") >= min_quality)
        & F.col("lang_pred").isin(*langs))
