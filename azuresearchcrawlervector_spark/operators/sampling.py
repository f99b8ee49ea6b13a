"""Deterministic hash-based sampling and corpus mixture construction.

Training-data pipelines sample their corpus per source/language/domain
to hit a target mixture (e.g. "50% en, 25% de, 25% fr of N rows").
At 100 TB the sample must be:

- DETERMINISTIC and data-independent-of-partitioning: whether a row is
  kept depends only on its id, never on which executor saw it, how the
  input was split, or a prior run. ``rand()`` fails all of these;
  a salted cryptographic hash of the row id gives a reproducible
  uniform deviate (the same device used by the repo's md5_60 oracle
  twins, so the whole decision is ANSI-SQL-reproducible).
- SHUFFLE-FREE: per-group rates are a tiny literal map baked into the
  projection, so sampling is a pure narrow filter over the scan — the
  only full pass is the one that reads the data, and column pruning /
  partition pruning still apply. The only aggregation is the O(#groups)
  count used to derive rates, which is map-side combinable and returns
  #groups rows to the driver (bounded: languages/domains, not rows).

No reference counterpart (the crawler has no sampling concept); this
extends the LLM-pipeline operator family.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 2^60 — the md5-60 deviate's modulus (15 hex digits), exact in double
# arithmetic on both Spark and any IEEE-754 SQL engine.
_M60 = float(1 << 60)


def uniform_hash_col(id_col: Column, salt: str = "s0") -> Column:
    """Deterministic uniform deviate in [0, 1) from a row id: top 60
    bits of md5(salt ':' id) divided by 2^60. Exactly reproducible in
    ANSI SQL: ``CAST(concat('0x', substr(md5(salt || ':' || id), 1,
    15)) AS BIGINT) / 2^60`` computes the identical double."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    return h.cast("double") / F.lit(_M60)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "s0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its group's rate, decided by the salted md5
    deviate of the row id. Groups absent from ``rates`` get
    ``default_rate`` (0.0 = dropped). Pure narrow projection+filter —
    no shuffle, no state, rerun-stable."""
    if rates:
        pairs: list[Column] = []
        for g, r in sorted(rates.items()):
            pairs.extend([F.lit(g), F.lit(float(r))])
        rate = F.coalesce(
            F.element_at(F.create_map(*pairs), F.col(group_col)),
            F.lit(float(default_rate)),
        )
    else:
        rate = F.lit(float(default_rate))
    u = uniform_hash_col(F.col(id_col), salt)
    return df.filter(u < rate)


def mixture_rates(
    df: DataFrame,
    target_shares: dict[str, float],
    total: int,
    group_col: str = "lang",
) -> dict[str, float]:
    """Per-group keep-rates that turn ``df`` into a ``total``-row sample
    with the given group shares (in expectation): rate_g = min(1,
    total * share_g / count_g). ONE map-side-combinable groupBy
    returning #groups rows to the driver — the bounded collect."""
    counts = {
        r[group_col]: r["n"]
        for r in df.groupBy(group_col).agg(F.count("*").alias("n")).collect()
    }
    return {
        g: min(1.0, (total * share) / counts[g])
        for g, share in target_shares.items()
        if counts.get(g)
    }


def mixture_sample(
    df: DataFrame,
    target_shares: dict[str, float],
    total: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Compose: derive rates for a target mixture, then sample."""
    rates = mixture_rates(df, target_shares, total, group_col)
    return stratified_sample(df, rates, group_col, id_col, salt)
