"""Event sessionization — gap-based session assignment over event streams,
the engagement-analytics / behavior-corpus-construction pass (grouping a
user's events into visits before converting them to KG observations or
training examples).

Batch implementation over partitioned window functions: lag + gap flag +
running sum, all inside whole-stage codegen. The window partitions by user,
so the only exchange is one hash shuffle on the user key and work
parallelizes across users; a single pathological mega-user serializes only
its own partition (order-dependent windows cannot be salted — that is
inherent to the semantics, not this plan; :func:`sessionize`'s
``skew_stats`` makes such a key observable as a metric). Gap arithmetic
uses exact integer microseconds (``unix_micros`` / ``epoch_us``) and the
window order pins ``NULLS FIRST`` explicitly, so any SQL engine spelling
out the same null placement reproduces session boundaries bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micros(c: "F.Column"):
    """Exact integer microseconds for TIMESTAMP and TIMESTAMP_NTZ columns:
    ``unix_micros`` rejects NTZ, so NTZ casts through TIMESTAMP first —
    the engine pins ``spark.sql.session.timeZone=UTC`` (session.py), making
    the cast a numeric identity; and even under a fixed non-UTC offset,
    gap DIFFERENCES are offset-invariant, so session boundaries hold."""
    return F.unix_micros(c.cast("timestamp"))


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
    skew_observe=None,
) -> DataFrame:
    """Assign every event a per-user session index.

    A new session starts at a user's first event and whenever the gap to
    the previous event EXCEEDS ``gap_minutes`` (strictly greater, exact
    microsecond integer comparison). Ordering is (ts, id) with ts
    EXPLICITLY ``asc_nulls_first`` — Spark's ASC default happens to be
    NULLS FIRST but DuckDB's is NULLS LAST, so the null placement is
    spelled out here and any SQL oracle must spell out ``NULLS FIRST``
    too; null-ts events then sort first in their user's order and produce
    null gaps, which never start a new session beyond the user's initial
    one. The id tiebreak makes simultaneous events deterministic.

    ``skew_observe`` (optional :class:`pyspark.sql.Observation`) makes the
    one inherent hazard of this plan — a pathological mega-user whose
    partition serializes — OBSERVABLE instead of a mystery-slow task: it
    rides the window's existing user-key shuffle (a full-frame count over
    the SAME partitioning adds a Window pass, never a second exchange) and
    reports ``max_events_per_user`` plus ``p99_events_per_user``
    (event-weighted: each event reports its user's total, so the p99 is
    "99% of events live with users no larger than X" — the task-sizing
    view that matters for stragglers). Metrics materialize with the first
    action on the returned frame, costing zero extra jobs.

    -> input columns + ``session_idx`` (0-based per user)."""
    if gap_minutes <= 0:
        raise ValueError("gap_minutes must be positive")
    order = [F.col(ts_col).asc_nulls_first(), F.col(id_col)]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(_micros(F.col(ts_col))).over(w)
    gap_us = F.lit(gap_minutes * 60 * 1_000_000)
    new_s = (
        F.when(_micros(F.col(ts_col)) - prev > gap_us, 1)
        .otherwise(0)
        .cast("long")
    )
    run = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # two projection layers: window functions cannot nest in one select,
    # and the planner fuses both Window nodes over the SAME partitioning/
    # ordering into one sort+shuffle anyway
    out = df.withColumn("__ns", new_s).withColumn(
        "session_idx", F.sum("__ns").over(run)
    ).drop("__ns")
    if skew_observe is not None:
        per_user = Window.partitionBy(user_col)
        out = (
            out.withColumn("__user_n", F.count(F.lit(1)).over(per_user))
            .observe(
                skew_observe,
                F.max("__user_n").alias("max_events_per_user"),
                F.percentile_approx("__user_n", 0.99).alias(
                    "p99_events_per_user"
                ),
            )
            .drop("__user_n")
        )
    return out


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session aggregates: (user, session_idx, n_events, start_ts,
    end_ts, duration_seconds). One window pass (:func:`sessionize`) + one
    partial-aggregated groupBy on (user, session) — the shuffle reuses the
    window's user partitioning, so AQE plans the aggregate exchange-free
    on the already-clustered data."""
    s = sessionize(df, user_col, ts_col, id_col, gap_minutes)
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (
            (_micros(F.max(ts_col)) - _micros(F.min(ts_col)))
            / 1_000_000.0
        ).alias("duration_seconds"),
    )
