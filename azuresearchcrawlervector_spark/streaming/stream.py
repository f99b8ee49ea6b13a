"""Streaming page processing: the reference's queue-and-batch tail
(AzureSearchIndexer.cs:245-285 — BlockingCollection drained in batches of
10 under a semaphore) re-expressed as Structured Streaming.

readStream(file source over fetched-page parquet) → watermarked
dropDuplicates on url (the streaming analog of the seen anti-join for
late/replayed pages) → extraction + embedding (same UDF kernels as the
batch engine) → foreachBatch idempotent append (id = sha2(url,512) makes
replays safe — the MergeOrUpload semantics of S8, AzureSearchIndexer.cs:273,
become append + dedupe-on-read on a content-addressed key).

The batch engine remains the primary path (the crawl loop is
batch-iterative by design, SURVEY.md §1.2); this module exists for
continuous-ingest deployments where fetched pages arrive as files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, StringType, StructField, StructType, TimestampType,
)

from ..functions.embeddings import make_embed_udf
from ..functions.html import with_extraction
from ..functions.urls import doc_id_col

FETCHED_PAGE_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("status", IntegerType(), True),
    StructField("html", StringType(), True),
    StructField("image_id", StringType(), True),
    StructField("fetch_ts", TimestampType(), True),
])


def build_pipeline(
    stream_df: DataFrame,
    dom_selector: str | None = None,
    embedding_dim: int = 128,
    watermark: str = "10 minutes",
) -> DataFrame:
    """fetched pages (stream) → documents (stream)."""
    embed = make_embed_udf(embedding_dim)
    # dropDuplicatesWithinWatermark: plain dropDuplicates(['url']) would
    # never evict its state (the event-time column isn't in the dedup
    # keys), so the streaming seen-set grows without bound in continuous
    # deployments. WithinWatermark bounds state retention to the
    # watermark delay — replays inside the window dedupe, older replays
    # fall back to the content-addressed-id dedupe-on-read in the sink.
    deduped = (
        stream_df
        .withWatermark("fetch_ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])      # streaming seen-set
        .filter(F.col("status") == 200)              # F3
    )
    extracted = with_extraction(deduped, "html", dom_selector)
    return (
        extracted
        .filter(F.length("content") > 0)             # F4
        .withColumn("id", doc_id_col("url"))
        .withColumn("title_vector", embed(F.substring("title", 1, 8000)))
        .withColumn("content_vector", embed(F.substring("content", 1, 8000)))
        .select("id", "url", "title", "content", "title_vector", "content_vector")
    )


def run_file_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    dom_selector: str | None = None,
    embedding_dim: int = 128,
    available_now: bool = True,
):
    """File-source streaming job; availableNow processes the backlog in
    micro-batches then stops (the test/CI mode). The foreachBatch sink
    appends parquet — idempotent under replay because ids are
    content-addressed and readers dedupe on id."""
    stream = (
        spark.readStream.schema(FETCHED_PAGE_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    docs = build_pipeline(stream, dom_selector, embedding_dim)

    def sink(batch_df: DataFrame, batch_id: int):
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(output_dir))

    writer = (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def with_host_quota(stream_df: DataFrame, quota: int) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState): a
    per-host crawl quota that persists ACROSS micro-batches — the
    streaming analog of the batch engine's per-host politeness budget
    (P1/P3). State = one running count per host; rows beyond the quota
    are dropped (the reference's rate limiter blocks; a stream drops and
    relies on replay/backfill).

    Scale: state is one int per distinct host, hash-partitioned by the
    groupBy key — 10^7 hosts ≈ tens of MB of state spread across
    executors' state stores.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType as _L, StructType as _S

    out_schema = StructType(
        list(stream_df.schema.fields) + [StructField("host_seq", _L(), False)])
    state_schema = _S([StructField("n", _L(), False)])

    def fn(key, pdfs, state: GroupState):
        (taken,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            if taken >= quota:
                break
            take = min(quota - taken, len(pdf))
            head = pdf.iloc[:take].copy()
            head["host_seq"] = range(taken, taken + take)
            taken += take
            if take:
                yield head
        state.update((taken,))

    return (
        stream_df.groupBy("host")
        .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                GroupStateTimeout.NoTimeout)
    )


def run_host_quota_stream(
    spark: SparkSession, input_dir: str, output_dir: str,
    checkpoint_dir: str, quota: int = 3,
):
    """availableNow file-stream wrapper around with_host_quota (test/CI
    surface: state must persist across the backlog's micro-batches)."""
    schema = StructType(
        list(FETCHED_PAGE_SCHEMA.fields) + [StructField("host", StringType(), False)])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)   # force multiple micro-batches
        .parquet(input_dir)
    )
    gated = with_host_quota(stream, quota)
    q = (
        gated.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_documents_deduped(spark: SparkSession, output_dir: str) -> DataFrame:
    """Dedupe-on-read by content-addressed id (S8 MergeOrUpload analog):
    latest batch wins."""
    if not os.path.exists(output_dir):
        return spark.createDataFrame(
            [], "id string, url string, title string, content string, batch_id long")
    df = spark.read.parquet(output_dir)
    from pyspark.sql import Window
    w = Window.partitionBy("id").orderBy(F.col("batch_id").desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("_rn")
    )


def index_single_document(
    spark: SparkSession,
    output_dir: str,
    url: str,
    content: str,
    title: str = "",
    embedding_dim: int = 128,
) -> DataFrame:
    """Single-document sink — reference parity for S9,
    ``IndexPageAsync(url, content)`` (AzureSearchIndexer.cs:303-342):
    uploads one {id, content, title} document where **id is the RAW
    URL**, unlike the batched path's SHA-512 ids — the reference's
    documented id inconsistency between its two upload APIs, carried
    faithfully so a user migrating either call site gets identical
    document ids. Vectors are computed with the same embed kernel as
    the batch path (the reference's single-doc body skips vectors;
    here they ride along for schema compatibility with S8 readers —
    dedupe-on-read keys on id either way).

    Append-only and idempotent under replay for the same (url,
    content): readers dedupe on id. Returns the one-row DataFrame that
    was written.
    """
    embed = make_embed_udf(embedding_dim)
    df = (
        spark.createDataFrame(
            [(url, title, content)], "url string, title string, content string")
        .withColumn("id", F.col("url"))  # RAW url id — the S9 quirk
        .withColumn("title_vector", embed(F.substring("title", 1, 8000)))
        .withColumn("content_vector", embed(F.substring("content", 1, 8000)))
        # batch_id -1: sorts below any streaming micro-batch, so an S8
        # re-upload of the same id supersedes a single-doc upload — the
        # reference's MergeOrUpload ordering
        .withColumn("batch_id", F.lit(-1).cast("long"))
        .select("id", "url", "title", "content",
                "title_vector", "content_vector", "batch_id")
    )
    df.write.mode("append").parquet(output_dir)
    return df


def with_streaming_sessions(stream_df: DataFrame, gap_s: int = 30_000,
                            user_col: str = "user_id",
                            ts_col: str = "ts",
                            order_col: str = "event_id",
                            value_col: str = "value") -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState):
    gap-based sessionization that persists ACROSS micro-batches — the
    streaming twin of operators/sessions.session_stats.

    A session row is emitted when it is provably CLOSED: a later event
    for the same user arrives more than gap_s seconds after it. The
    open tail session lives in state (one small tuple per user) and is
    emitted by a later batch or stays pending — append-mode semantics,
    same contract as Spark's own session windows. Input files must
    arrive in event-time order per user (the availableNow test harness
    does; a production deployment puts a watermark upstream so
    off-order arrivals within the watermark are sorted per batch — the
    in-batch sort here — and older ones are dropped by the watermark).

    Scale: state = one 5-field tuple per distinct user, hash-partitioned
    by the groupBy key across executors' state stores; output rows are
    sessions, not events. Timestamps ride as epoch seconds (long) to
    stay tz-agnostic in state.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType as _D, LongType as _L, StructType as _S,
    )

    out_schema = ("user_id long, session_seq long, start_s long, "
                  "end_s long, n_events long, sum_value double")
    state_schema = _S([
        StructField("session_seq", _L(), False),
        StructField("start_s", _L(), False),
        StructField("last_s", _L(), False),
        StructField("n", _L(), False),
        StructField("sv", _D(), False),
    ])

    import pandas as pd

    def fn(key, pdfs, state: GroupState):
        (uid,) = key
        cur = list(state.get) if state.exists else None
        closed = []
        # pdfs is an iterator of ARROW CHUNKS with no cross-chunk order
        # guarantee — a group larger than maxRecordsPerBatch would be
        # sessionized out of order if chunks were sorted independently.
        # Concatenate then sort once; memory = one group's micro-batch
        # rows, the same bound applyInPandas itself implies.
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values([ts_col, order_col])
            secs = (pdf[ts_col].astype("int64") // 1_000_000_000).tolist()
            vals = pdf[value_col].tolist()
            for s, v in zip(secs, vals):
                if cur is None:
                    cur = [1, s, s, 0, 0.0]
                elif s - cur[2] > gap_s:
                    closed.append((uid, cur[0], cur[1], cur[2], cur[3], cur[4]))
                    cur = [cur[0] + 1, s, s, 0, 0.0]
                cur[2] = s
                cur[3] += 1
                cur[4] += v
        if cur is not None:
            state.update(tuple(cur))
        if closed:
            yield pd.DataFrame(closed, columns=[
                "user_id", "session_seq", "start_s", "end_s",
                "n_events", "sum_value"])

    return (
        stream_df.groupBy(user_col)
        .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                GroupStateTimeout.NoTimeout)
    )


def with_streaming_hll(stream_df: DataFrame, value_col: str = "url",
                       group_col: str = "host", b: int = 8) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState): a
    per-group HyperLogLog distinct counter that persists ACROSS
    micro-batches — the streaming twin of operators/hll.hll_distinct
    (continuous "distinct URLs per host" without unbounded dedup
    state). Emits (group, n_rows, est) once per group per micro-batch;
    the row with the highest n_rows is the current estimate.

    State = ONE 2^b-byte register array per group (256 B at b=8 —
    fixed, never grows with distinct count: the whole point), updated
    with the same md5-60 register math as the batch operator, so after
    any prefix of the stream the emitted estimate is bit-identical to
    hll_distinct over the same rows. Requires a string group column.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        BinaryType as _B, LongType as _L, StructType as _S,
    )

    from ..operators.hll import estimate_from_registers, register_update

    p = 1 << b
    out_schema = f"{group_col} string, n_rows long, est double"
    state_schema = _S([StructField("regs", _B(), False),
                       StructField("n", _L(), False)])

    import pandas as pd

    def fn(key, pdfs, state: GroupState):
        (g,) = key
        if state.exists:
            prev_regs, n = state.get
            regs = bytearray(prev_regs)
        else:
            regs, n = bytearray(p), 0
        for pdf in pdfs:
            vals = pdf[value_col].dropna()   # batch-operator parity:
            for v in vals:                   # NULL is "no value"
                register_update(regs, v, b)
            n += len(vals)
        state.update((bytes(regs), n))
        yield pd.DataFrame(
            [(g, n, estimate_from_registers(regs, b))],
            columns=[group_col, "n_rows", "est"])

    return (
        stream_df.groupBy(group_col)
        .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                GroupStateTimeout.NoTimeout)
    )


def with_streaming_cms(stream_df: DataFrame, value_col: str = "url",
                       group_col: str = "host", threshold: int = 100,
                       depth: int = 4, width: int = 1024) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState): a
    per-group Count-Min heavy-hitter alarm that persists ACROSS
    micro-batches — the streaming twin of operators/cms (live hot-URL /
    hot-path detection feeding adaptive politeness). Each micro-batch
    emits (group, value, est) for every DISTINCT value seen in that
    batch whose updated CM estimate has reached ``threshold`` — the
    arrival-driven alert pattern (a value alerts again on later
    batches while it keeps arriving; dedupe downstream if needed).

    State = ONE depth×width int64 counter array per group (32 KB at
    the defaults — fixed, independent of distinct count), updated with
    the SAME md5 bucket math as the batch operator, so after any
    stream prefix the emitted estimates equal cms_estimate over the
    same rows. One-sided like the batch sketch: a true heavy hitter is
    never missed; collisions can only alert early. NULL values skip
    (batch parity)."""
    import numpy as np
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import BinaryType as _B, StructType as _S

    from ..operators.cms import bucket_py, counters_update, estimate_py

    out_schema = f"{group_col} string, value string, est long"
    state_schema = _S([StructField("counters", _B(), False)])

    import pandas as pd

    def fn(key, pdfs, state: GroupState):
        (g,) = key
        if state.exists:
            counters = np.frombuffer(state.get[0], dtype=np.int64).copy()
        else:
            counters = np.zeros(depth * width, dtype=np.int64)
        seen: set = set()
        for pdf in pdfs:
            for v in pdf[value_col].dropna():
                counters_update(counters, v, depth, width)
                seen.add(v)
        state.update((counters.tobytes(),))
        hot = [(g, str(v), int(estimate_py(counters, v, depth, width)))
               for v in sorted(seen)
               if estimate_py(counters, v, depth, width) >= threshold]
        if hot:
            yield pd.DataFrame(hot, columns=[group_col, "value", "est"])

    return (
        stream_df.groupBy(group_col)
        .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                GroupStateTimeout.NoTimeout)
    )
