"""Incremental recrawl delta — classify every URL of a new crawl
against the previous snapshot by content fingerprint, so downstream
work (re-embedding, re-indexing, similarity updates) touches ONLY what
changed.

The at-scale contract: a 10^10-URL recrawl cannot re-embed the corpus;
it joins yesterday's (url, fingerprint) projection with today's crawl
— one sort-merge join on the id (or a co-partitioned/bucketed join
when both sides share the payload bucket layout, sources/payload.py)
— and emits a status column the pipeline filters on. Fingerprints are
the md5 content fingerprint already used by the `fingerprint` query
(functions/text.py), so "changed" means normalized content changed,
not incidental whitespace.

Reference parity: the reference crawler re-uploads every page each run
(AzureSearchIndexer.cs MergeOrUpload); the delta classification is the
beyond-reference scale behavior.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import fingerprint_col


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, fp) projection — the tiny table a snapshot keeps around
    for the next recrawl (two columns, prunable from any doc store)."""
    return df.select(F.col(id_col).alias("doc_id"),
                     fingerprint_col(F.col(text_col)).alias("fp"))


def recrawl_delta(prev: DataFrame, cur: DataFrame,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, status) over the union of both crawls' ids:
    'new' (only in cur), 'gone' (only in prev), 'changed' (both, fp
    differs), 'unchanged' (both, fp equal). ONE full-outer sort-merge
    join on the id; both inputs reduce to 2-column projections first
    so the scan reads nothing else."""
    # presence is tracked with non-nullable markers, NOT fp nullness —
    # a NULL-text document (failed fetch) has a NULL fingerprint but is
    # still present, and must classify as changed/gone, never 'new'
    p = with_fingerprint(prev, text_col, id_col).select(
        "doc_id", F.col("fp").alias("fp_prev"),
        F.lit(True).alias("in_prev"))
    c = with_fingerprint(cur, text_col, id_col).select(
        "doc_id", F.col("fp").alias("fp_cur"),
        F.lit(True).alias("in_cur"))
    return (
        p.join(c, on="doc_id", how="full_outer")
        .select(
            "doc_id",
            F.when(F.col("in_prev").isNull(), F.lit("new"))
             .when(F.col("in_cur").isNull(), F.lit("gone"))
             .when(F.col("fp_prev").eqNullSafe(F.col("fp_cur")),
                   F.lit("unchanged"))
             .otherwise(F.lit("changed")).alias("status"))
    )
