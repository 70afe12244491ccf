"""Gap-based sessionization vs hand-computed boundaries."""

from __future__ import annotations

import datetime as dt

from p5_rdf_rdb2rdf_spark.ops.sessions import session_stats, sessionize


def _ts(minutes: float) -> dt.datetime:
    return dt.datetime(2026, 1, 1) + dt.timedelta(minutes=minutes)


def test_sessionize_gap_boundaries_and_tiebreak(spark):
    """New session strictly AFTER the gap (exact-gap events stay in the
    same session); (ts, event_id) tiebreak; per-user independence; null
    timestamps join the user's first session without starting new ones."""
    rows = [
        # user 1: events at 0, 10, 40 (gap 30 exactly -> same session),
        # 71 (gap 31 -> NEW), 80
        (1, 1, _ts(0)), (2, 1, _ts(10)), (3, 1, _ts(40)),
        (4, 1, _ts(71)), (5, 1, _ts(80)),
        # user 2: simultaneous events tie-broken by id, then a big gap
        (6, 2, _ts(5)), (7, 2, _ts(5)), (8, 2, _ts(500)),
        # user 3: null ts then a real event
        (9, 3, None), (10, 3, _ts(1)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r.event_id: r.session_idx for r in sessionize(df, gap_minutes=30).collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 0, 7: 0, 8: 1, 9: 0, 10: 0}

    stats = {
        (r.user_id, r.session_idx): (r.n_events, r.duration_seconds)
        for r in session_stats(df, gap_minutes=30).collect()
    }
    assert stats[(1, 0)] == (3, 40 * 60.0)
    assert stats[(1, 1)] == (2, 9 * 60.0)
    assert stats[(2, 1)] == (1, 0.0)


def test_session_window_matches_batch_boundary_semantics(spark):
    """The native session_window operator (the streaming path) and the
    batch gap-island sessionize must agree EXACTLY at the boundary:
    events precisely gap apart merge, one microsecond more splits."""
    from pyspark.sql import functions as F

    rows = [
        (1, 1, _ts(0)),
        (2, 1, _ts(30)),                                   # == gap: merges
        (3, 1, _ts(30 + 30) ),                             # == gap again
        (4, 1, _ts(90) + dt.timedelta(microseconds=1)),    # > gap: splits
        (5, 2, _ts(0)), (6, 2, _ts(100)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")

    batch = {
        (r.user_id, r.start_ts, r.end_ts, r.n_events)
        for r in session_stats(df, gap_minutes=30).collect()
    }
    native = {
        (r.user_id, r.start_ts, r.end_ts, r.n_events)
        for r in (
            df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.min("ts").alias("start_ts"),
                F.max("ts").alias("end_ts"),
            )
            .select("user_id", "start_ts", "end_ts", "n_events")
        ).collect()
    }
    assert batch == native
    # the exact-gap chain 1-2-3 is ONE session; the +1us event split off
    assert (1, _ts(0), _ts(60), 3) in batch
