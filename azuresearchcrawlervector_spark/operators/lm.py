"""Corpus-trained bigram language model + per-document LM quality score.

The CCNet recipe filters web text by language-model perplexity; this is
that filter with the LM itself trained distributedly on the corpus (or
any reference corpus): add-alpha-smoothed bigram model, document score
= average log10 P(w_i | w_{i-1}) — a monotone transform of perplexity.

Spark shape at 100 TB:
- Bigram extraction is a JVM projection (split → transform over the
  token array → explode); counting is ONE map-side-combinable groupBy
  per level (bigram, unigram-prefix). The model is a DataFrame — it
  does NOT need to fit on the driver or in a broadcast; scoring joins
  on the bigram key (sort-merge at scale, broadcast when the model is
  small or pruned with ``min_count``).
- Scoring = explode doc bigrams → left join model (unseen backs off to
  the smoothed floor) → one groupBy(doc) average. Two shuffles
  (model join + doc agg) regardless of corpus size.
- ``V`` (vocabulary size for smoothing) is the distinct first-token
  count — one combinable distinct-count returning a scalar.

No reference counterpart; extends the LLM-pipeline family. Alpha
smoothing keeps every quantity a ratio of exact counts, so the DuckDB
oracle reproduces scores to well past the rounded 4 decimals.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TOKS = "filter(split(lower({col}), '\\\\s+'), x -> x != '')"

# bigrams over a MATERIALIZED token-array column (`_ts`), never over
# the split() expression itself: an inlined split would be re-evaluated
# per lambda element (O(tokens^2) splits per doc). The two-projection
# shape below keeps the array computed once per row — Spark's
# CollapseProject declines to inline a non-cheap alias referenced from
# multiple places. Spark SQL array indexing in expr strings is 0-based.
_BIGRAMS = ("CASE WHEN size(_ts) < 2 THEN array() ELSE"
            " transform(sequence(1, size(_ts) - 1),"
            " i -> concat(_ts[i - 1], ' ', _ts[i])) END")


def doc_bigrams(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, bg) — one row per bigram OCCURRENCE (not distinct)."""
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  F.expr(_TOKS.format(col=text_col)).alias("_ts"))
        .select("doc_id", F.explode(F.expr(_BIGRAMS)).alias("bg"))
    )


def train_bigram_lm(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    min_count: int = 1) -> tuple[DataFrame, int]:
    """Model table (bg, w1, c2, c1) + V (distinct first tokens).

    c2 = count of the bigram, c1 = count of w1 as a bigram prefix;
    rows with c2 < min_count are pruned (scoring backs off to the
    smoothed floor for them — the standard frequency cutoff that keeps
    a 100 TB model joinable)."""
    bg = doc_bigrams(df, text_col, id_col)
    with_w1 = bg.withColumn("w1", F.split("bg", " ").getItem(0))
    # ONE pass over the bigram occurrences: c2 is materialized
    # (localCheckpoint — model-sized, i.e. distinct bigrams, never the
    # occurrence stream), and c1 derives FROM c2 (occurrences of w1 as
    # a prefix = Σ over its bigrams of c2 — exactly the old direct
    # count). The previous formulation exploded the corpus three times
    # (c2, c1, and the v-count action re-running c1's whole pipeline).
    c2 = (with_w1.groupBy("bg", "w1").agg(F.count("*").alias("c2"))
          .localCheckpoint(eager=True))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    v = c1.count()
    model = c2.join(c1, "w1").select("bg", "w1", "c2", "c1")
    if min_count > 1:
        model = model.filter(F.col("c2") >= min_count)
        # pruning must not lose PREFIX marginals: a prefix whose every
        # bigram was pruned still needs its true c1 at scoring time
        # (bg = NULL rows never match the scoring join on bg, they
        # exist only to carry c1)
        orphans = c1.join(model.select("w1").distinct(), "w1", "left_anti")
        model = model.unionByName(
            orphans.select(F.lit(None).cast("string").alias("bg"), "w1",
                           F.lit(None).cast("long").alias("c2"), "c1"))
    return model, v


def lm_score(df: DataFrame, model: DataFrame, v: int,
             alpha: float = 0.5, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bigrams, avg_logp) for every doc with >= 1 bigram:
    avg over the doc's bigram occurrences of
    log10((c2 + alpha) / (c1 + alpha * V)), with c2 (and c1 for fully
    unseen prefixes) defaulting to 0 — the add-alpha backoff floor.
    Higher is better; CCNet thresholds on exactly this quantity."""
    bg = doc_bigrams(df, text_col, id_col)
    # w1 marginals must survive bigram pruning: join c1 separately so
    # an unseen BIGRAM with a seen prefix still uses the true c1
    c1 = model.select("w1", "c1").distinct()
    scored = (
        bg.withColumn("w1", F.split("bg", " ").getItem(0))
        .join(model.select("bg", "c2"), "bg", "left")
        .join(c1, "w1", "left")
        .withColumn(
            "logp",
            F.log10(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(float(alpha)))
                / (F.coalesce(F.col("c1"), F.lit(0))
                   + F.lit(float(alpha)) * F.lit(float(v)))),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("logp"), 4).alias("avg_logp"),
        )
    )


def lm_quality(df: DataFrame, alpha: float = 0.5,
               text_col: str = "text", id_col: str = "doc_id",
               min_count: int = 1) -> DataFrame:
    """Self-trained convenience: train on ``df``, score ``df``."""
    model, v = train_bigram_lm(df, text_col, id_col, min_count)
    return lm_score(df, model, v, alpha, text_col, id_col)


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher/MassiveText repetition signals, exact counts per doc:

    (doc_id, n_tokens, top_tok_frac, top_bigram_frac, dup_bigram_frac)
    — fraction of tokens that are the single most frequent token, the
    most frequent bigram's share of bigram occurrences, and the share
    of bigram occurrences whose bigram repeats within the doc. High
    values flag boilerplate/spam that perplexity alone misses.

    One explode + one groupBy(doc, bigram) + one groupBy(doc) — all
    combinable; every ratio is exact ints, rounded to 6 (SQL-twin
    stable). Docs with exactly 1 token have no bigrams (fractions 0.0,
    n_tokens still reports); ZERO-token docs are omitted — the same
    contract as the DuckDB twin, which unnests an empty token list to
    no rows."""
    toks = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.expr(_TOKS.format(col=text_col)).alias("_ts"))
        .select("doc_id", F.size("_ts").alias("n_tokens"),
                F.explode("_ts").alias("tok"))
    )
    tok_top = (
        toks.groupBy("doc_id", "tok")
        .agg(F.first("n_tokens").alias("n_tokens"),
             F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.first("n_tokens").alias("n_tokens"),
             F.max("c").alias("top_tok"))
    )
    bgs = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.expr(_TOKS.format(col=text_col)).alias("_ts"))
        .select("doc_id", F.explode(F.expr(_BIGRAMS)).alias("bg"))
        .groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bg"), F.max("c").alias("top_bg"),
             F.sum(F.when(F.col("c") >= 2, F.col("c"))
                   .otherwise(F.lit(0))).alias("dup_bg"))
    )
    return (
        tok_top.join(bgs, "doc_id", "left")
        .select(
            "doc_id", "n_tokens",
            F.coalesce(
                F.round(F.col("top_tok") / F.col("n_tokens"), 6),
                F.lit(0.0)).alias("top_tok_frac"),
            F.coalesce(F.round(F.col("top_bg") / F.col("n_bg"), 6),
                       F.lit(0.0)).alias("top_bigram_frac"),
            F.coalesce(F.round(F.col("dup_bg") / F.col("n_bg"), 6),
                       F.lit(0.0)).alias("dup_bigram_frac"),
        )
    )
