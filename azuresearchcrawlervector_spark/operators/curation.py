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


def curate_corpus_v2(
    df: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    words_per_passage: int = 8,
    max_dup_bigram_frac: float = 0.1,
    target_shares: dict[str, float] | None = None,
    total: int = 40,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "mix",
    materialize: bool = True,
) -> DataFrame:
    """The session-2 training-data flow composed end to end:

    1. DECONTAMINATE (strict): drop any doc sharing a word-k-gram with
       the benchmark.
    2. PASSAGE DEDUP (fixed word windows): globally-first occurrence
       among the SURVIVORS; docs left with zero passages drop out.
    3. REPETITION GATE (Gopher): dup_bigram_frac over the CLEANED text
       must not exceed the threshold.
    4. MIXTURE SAMPLE: deterministic md5-deviate sample of the gated
       survivors to the target group mixture.

    Returns (doc_id, <group_col>, n_kept, dup_bigram_frac) for the
    sampled docs. Stage order matters and is part of the contract:
    dedup first-occurrence is computed among decontaminated docs only,
    repetition over deduped text, and sampling rates over the gated
    survivor counts.

    ``materialize`` (default True — round-5 VERDICT #3): snapshot the
    three stage boundaries (decontaminated survivor projection, deduped
    text, gated survivors) with eager localCheckpoints. Composed fully
    declaratively, every downstream consumer re-derives its whole
    upstream — the audited plan re-read the corpus 38 times / 128
    Exchanges; with the barriers each stage runs ONCE and the full plan
    holds ≤ a handful of scans (pinned by
    test_curation_v2_barrier_scan_count). Results are identical either
    way (same stage semantics, pinned by the shared DuckDB oracle);
    pass False to keep the single declarative plan for plan-audit use.
    """
    from .contamination import decontaminate
    from .dedup import passage_dedup
    from .lm import repetition_stats
    from .sampling import mixture_sample

    if target_shares is None:
        target_shares = {"en": 0.5, "de": 0.25, "fr": 0.25}
    surv = decontaminate(df, benchmark, k=k, text_col=text_col,
                         id_col=id_col)
    if materialize:
        surv = surv.select(id_col, text_col).localCheckpoint(eager=True)
    deduped = passage_dedup(surv, text_col, id_col,
                            words_per_passage=words_per_passage) \
        .filter(F.col("n_kept") > 0)
    if materialize:
        deduped = deduped.localCheckpoint(eager=True)
    rep = repetition_stats(deduped, text_col="clean_text",
                           id_col="doc_id")
    gated = (
        rep.filter(F.col("dup_bigram_frac") <= max_dup_bigram_frac)
        .select("doc_id", "dup_bigram_frac")
        .join(deduped.select("doc_id", "n_kept"), "doc_id")
        .join(df.select(F.col(id_col).alias("doc_id"), group_col),
              "doc_id")
    )
    if materialize:
        # mixture_sample's rate derivation COLLECTS group counts from
        # `gated` before the returned plan evaluates it again — the
        # barrier makes those two passes share one computation
        gated = gated.localCheckpoint(eager=True)
    return mixture_sample(gated, target_shares, total, group_col,
                          "doc_id", salt) \
        .select("doc_id", group_col, "n_kept", "dup_bigram_frac")
