"""Gap-based sessionization over an event stream — the batch shape of
the classic training-data / analytics operator (split each user's
event sequence wherever the inter-event gap exceeds a threshold).

Scale shape: exactly ONE shuffle. The Window partitionBy(user) is the
only exchange; the closing groupBy(user, session) reuses it because
hash-partitioning by `user_id` already satisfies the clustered
distribution required for (user_id, session_seq) — Catalyst inserts no
second exchange (pinned by the plan test). Per-user state is a sort +
running sum inside the partition, so memory is bounded by the largest
single user's events; a pathological hot user is the same skew story
as the politeness window and gets the same remedy (salt by coarse time
bucket, then stitch sessions crossing bucket edges).

Determinism: events are ordered by (ts, event_id) so equal timestamps
cannot reorder between runs or engines — the DuckDB oracle twin in
__spark_entry__.py sorts identically.

Reference parity: the reference has no event/session concept; this is
part of the LLM-data-pipeline family (grouping raw interaction logs
into dialogue/session training examples).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, gap_s: int = 30_000,
               user_col: str = "user_id", ts_col: str = "ts",
               order_col: str = "event_id") -> DataFrame:
    """Per-event session assignment: adds `session_seq` (1-based per
    user) — a new session starts at the first event and whenever the
    gap since the previous event exceeds gap_s seconds."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    # parquet event times are TIMESTAMP_NTZ, which has no direct long
    # cast; the timestamp hop interprets them in the SESSION timezone,
    # so gaps are exact when that zone has a fixed offset (the repo's
    # session builder pins UTC). A DST-observing session zone would
    # shift gaps spanning a transition by the DST hour — callers with
    # such a config should set spark.sql.session.timeZone=UTC.
    ts_s = F.col(ts_col).cast("timestamp").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    return (events
            .withColumn("session_seq",
                        F.sum(is_new).over(
                            w.rowsBetween(Window.unboundedPreceding, 0))))


def session_stats(events: DataFrame, gap_s: int = 30_000,
                  user_col: str = "user_id", ts_col: str = "ts",
                  order_col: str = "event_id") -> DataFrame:
    """One row per session: bounds, event count, summed value.
    Single-shuffle plan — the aggregate rides the Window's
    user-partitioning (see module docstring)."""
    return (sessionize(events, gap_s, user_col, ts_col, order_col)
            .groupBy(F.col(user_col).alias("user_id"), "session_seq")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            )
