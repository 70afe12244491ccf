"""Event sessionization — gap-based session assignment over event streams,
the engagement-analytics / behavior-corpus-construction pass (grouping a
user's events into visits before converting them to KG observations or
training examples).

Batch implementation over partitioned window functions: lag + gap flag +
running sum, all inside whole-stage codegen. The window partitions by user,
so the only exchange is one hash shuffle on the user key and work
parallelizes across users; a single pathological mega-user serializes only
its own partition (order-dependent windows cannot be salted — that is
inherent to the semantics, not this plan). Gap arithmetic uses exact
integer microseconds (``unix_micros`` / ``epoch_us``), so any SQL engine
reproduces session boundaries bit-for-bit.
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
) -> DataFrame:
    """Assign every event a per-user session index.

    A new session starts at a user's first event and whenever the gap to
    the previous event EXCEEDS ``gap_minutes`` (strictly greater, exact
    microsecond integer comparison). Ordering is (ts, id) — the id
    tiebreak makes simultaneous events deterministic. Null-ts events sort
    first in their user's order (Spark and standard SQL NULLS FIRST for
    ASC) and produce null gaps, which never start a new session beyond the
    user's initial one.

    -> input columns + ``session_idx`` (0-based per user)."""
    if gap_minutes <= 0:
        raise ValueError("gap_minutes must be positive")
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(_micros(F.col(ts_col))).over(w)
    gap_us = F.lit(gap_minutes * 60 * 1_000_000)
    new_s = (
        F.when(_micros(F.col(ts_col)) - prev > gap_us, 1)
        .otherwise(0)
        .cast("long")
    )
    run = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # two projection layers: window functions cannot nest in one select,
    # and the planner fuses both Window nodes over the SAME partitioning/
    # ordering into one sort+shuffle anyway
    return df.withColumn("__ns", new_s).withColumn(
        "session_idx", F.sum("__ns").over(run)
    ).drop("__ns")


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
