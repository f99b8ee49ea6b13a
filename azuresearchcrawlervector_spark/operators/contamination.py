"""Benchmark-contamination detection over a document corpus.

Training-data hygiene: before a corpus is used for training, every
document is checked for verbatim n-gram overlap with a held-out
benchmark/eval set, and overlapping documents are dropped (the
standard "n-gram decontamination" from the GPT-3 / PaLM data papers).

Spark shape — built for the 100 TB corpus / small benchmark asymmetry:
the benchmark's distinct shingle set is tiny by definition (eval sets
are MBs, not TBs), so it is BROADCAST and the probe over the corpus is
a map-side hash lookup — no shuffle on the 100 TB side for the match
itself. The only shuffle is ONE map-side-combinable groupBy(doc_id)
that counts total and hit shingles together (hit-marking happens in the
broadcast join's projection, so both counts ride the same aggregate).

Reference parity note: the reference crawler (AzureSearchCrawler) has
no decontamination concept; this extends the repo's LLM-pipeline
operator family (operators/dedup.py word_shingles is reused verbatim
so the shingle definition is identical across dedup / MinHash /
contamination).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import word_shingles


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    min_ratio: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Per-document contamination against a benchmark shingle set.

    Returns (doc_id, n_shingles, n_hit, contam) for every document
    with at least one word-k-gram, where ``n_hit`` counts the doc's
    DISTINCT shingles that also occur anywhere in the benchmark and
    ``contam = n_hit / n_shingles``. Rows with ``contam < min_ratio``
    are dropped (``min_ratio=0.0`` keeps all docs — the full report).

    Documents shorter than ``k`` words have no shingles and are not
    reported (they cannot be contaminated under this definition).
    """
    doc_sh = word_shingles(docs, text_col, id_col, k)
    bench_sh = (
        word_shingles(benchmark, bench_text_col, bench_id_col, k)
        .select("shingle").distinct()
        .withColumn("_hit", F.lit(1))
    )
    # Broadcast LEFT join marks each corpus shingle, so total and hit
    # counts come out of ONE partial-aggregable groupBy.
    marked = doc_sh.join(F.broadcast(bench_sh), "shingle", "left")
    report = (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_hit"),
        )
        .withColumn(
            "contam",
            F.round(F.col("n_hit").cast("double") / F.col("n_shingles"), 6),
        )
    )
    if min_ratio > 0.0:
        report = report.filter(F.col("contam") >= min_ratio)
    return report


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    max_ratio: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Documents surviving decontamination: drop any doc whose
    benchmark-shingle overlap ratio EXCEEDS ``max_ratio`` (default 0.0
    = drop on any verbatim k-gram hit, the strict published policy).
    Returns the original rows of ``docs``, schema unchanged."""
    # compare on the EXACT counts, not the display-rounded ratio: a
    # multi-million-shingle doc with one verbatim hit rounds to
    # contam = 0.0 and would otherwise survive the strict policy
    flagged = contamination_report(
        docs, benchmark, k=k, min_ratio=0.0,
        text_col=text_col, id_col=id_col,
        bench_text_col=bench_text_col, bench_id_col=bench_id_col,
    ).filter(
        F.col("n_hit") > F.lit(float(max_ratio)) * F.col("n_shingles")
    ).select(F.col("doc_id").alias(id_col))
    return docs.join(flagged, on=id_col, how="left_anti")
