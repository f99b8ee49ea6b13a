"""Sequence packing for LM pretraining: concat-and-chunk layout.

Pretraining consumes documents as one contiguous token stream cut into
fixed-length sequences; the batch job therefore has to answer, for
every document, "which sequence does your first token land in, and at
what offset" — a GLOBAL running sum of token counts in a deterministic
document order. A naive window over one ordering collapses to a single
partition; this implements the classic two-level DISTRIBUTED PREFIX
SUM instead:

1. documents are ranged into ordered SHARDS (id-derived, deterministic
   — never ``spark_partition_id()``, which changes run to run),
2. the running sum inside each shard is a Window partitioned BY SHARD
   (parallel across shards),
3. shard totals — O(#shards) rows — come to the driver once, their
   exclusive prefix sum goes back as a broadcast join.

Everything is exact integer arithmetic over the repo's whitespace
token count, so the DuckDB oracle (one global window) hash-matches.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import token_count_col


def pack_sequences(
    df: DataFrame,
    seq_len: int = 512,
    shard_size: int = 1_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, seq_id, seq_off): lay every document's tokens
    end-to-end in ascending id order and cut the stream into
    ``seq_len``-token sequences — doc starts in sequence ``seq_id`` at
    offset ``seq_off`` (documents may span boundaries; that is the
    standard concat-and-chunk contract).

    ``shard_size`` is the id range per prefix-sum shard: parallelism =
    id_range / shard_size, driver state = one long per shard."""
    from pyspark.sql.types import IntegralType
    if not isinstance(df.schema[id_col].dataType, IntegralType):
        raise TypeError(
            f"pack_sequences needs an integral id column, got "
            f"{df.schema[id_col].dataType} for {id_col!r}")
    t = df.select(
        F.col(id_col).alias("doc_id"),
        token_count_col(F.col(text_col)).cast("long").alias("n_tokens"),
        F.expr(f"CAST({id_col} AS BIGINT) DIV {int(shard_size)}")
         .alias("_shard"),
    )
    w = (Window.partitionBy("_shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = t.withColumn("_end", F.sum("n_tokens").over(w))
    totals = sorted(
        (r["_shard"], r["tot"]) for r in
        t.groupBy("_shard").agg(F.sum("n_tokens").alias("tot")).collect())
    acc = 0
    rows = []
    for shard, tot in totals:
        rows.append((shard, acc))
        acc += tot
    spark = df.sparkSession
    base = spark.createDataFrame(rows, "_shard long, _base long")
    return (
        local.join(F.broadcast(base), "_shard")
        .withColumn("_start", F.col("_base") + F.col("_end") - F.col("n_tokens"))
        .select(
            "doc_id", "n_tokens",
            (F.col("_start") / seq_len).cast("long").alias("seq_id"),
            (F.col("_start") % seq_len).alias("seq_off"),
        )
    )
