"""Gap-based sessionization (operators/sessions.py): semantics,
determinism under timestamp ties, and the single-shuffle plan."""
import datetime as dt

from azuresearchcrawlervector_spark.operators.sessions import (
    session_stats, sessionize)


def _events(spark, rows):
    return spark.createDataFrame(
        [(eid, dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s), uid, v)
         for eid, s, uid, v in rows],
        "event_id long, ts timestamp, user_id long, value double")


def test_sessions_split_on_gap(spark):
    # user 1: events at t=0, 10, 20000 (gap 19990 <= 30000 -> same
    # session), then t=60000 (gap 40000 > 30000 -> new session)
    df = _events(spark, [
        (1, 0, 1, 1.0), (2, 10, 1, 2.0), (3, 20000, 1, 3.0),
        (4, 60000, 1, 4.0),
        (5, 5, 2, 9.0),
    ])
    got = {(r["user_id"], r["session_seq"]): r
           for r in session_stats(df, gap_s=30_000).collect()}
    assert set(got) == {(1, 1), (1, 2), (2, 1)}
    assert got[(1, 1)]["n_events"] == 3
    assert got[(1, 1)]["sum_value"] == 6.0
    assert got[(1, 2)]["n_events"] == 1
    assert got[(1, 2)]["session_start"] == got[(1, 2)]["session_end"]
    assert got[(2, 1)]["n_events"] == 1


def test_boundary_gap_is_same_session(spark):
    # gap EXACTLY gap_s does not split (strict >)
    df = _events(spark, [(1, 0, 1, 0.0), (2, 30_000, 1, 0.0)])
    rows = session_stats(df, gap_s=30_000).collect()
    assert len(rows) == 1 and rows[0]["n_events"] == 2


def test_tie_timestamps_deterministic(spark):
    # equal ts: order falls back to event_id, so session_seq per event
    # is stable across runs/partitionings
    df = _events(spark, [(i, 0, 1, 0.0) for i in range(10)]
                 + [(i + 10, 40_000, 1, 0.0) for i in range(10)])
    a = sessionize(df).select("event_id", "session_seq").collect()
    b = sessionize(df.repartition(7)).select(
        "event_id", "session_seq").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    seqs = {r["event_id"]: r["session_seq"] for r in a}
    assert all(seqs[i] == 1 for i in range(10))
    assert all(seqs[i + 10] == 2 for i in range(10))


def test_single_shuffle_plan(spark):
    # the closing groupBy(user, session_seq) must REUSE the Window's
    # hash(user_id) exchange: exactly one Exchange in the plan
    df = _events(spark, [(1, 0, 1, 0.0)])
    plan = session_stats(df)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
