"""Streaming gap sessionization: Spark's native ``session_window``.

The streaming counterpart of ``operators/temporal.session_stats`` — one
row per (key, session) with count / start / end / duration, emitted in
append mode once the watermark closes the session. Uses the built-in
``F.session_window`` merging aggregate (a first-class stateful operator
since Spark 3.2) instead of hand-rolled ``applyInPandasWithState``: the
state store holds per-key open windows, sessions merge JVM-side, and
watermark eviction bounds state to (open sessions × keys in the
horizon) — independent of history length.

Boundary contract: identical to the batch ``sessionize`` — a new
session starts only when the gap EXCEEDS ``gap_seconds`` (``>``);
events exactly ``gap_seconds`` apart stay in one session (Spark merges
sessions whose windows touch, i.e. next.ts <= prev.ts + gap). Pinned by
an exact-boundary test against the batch operator.

Scale shape (10^12-turn ingest):
- the only shuffle is the groupBy(key) exchange into the state store
  partitions (same key the batch operator shuffles on);
- session merging is JVM-side state-store logic, no Python anywhere;
- append mode emits each closed session exactly once; a crashed query
  resumes from the checkpoint without re-emitting (same exactly-once
  contract the stateful transcript checks test).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["session_stats_stream"]


def session_stats_stream(
    stream_df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    watermark: str = "10 minutes",
    agg_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-session stats over a streaming DataFrame: ``(key,
    session_start, n_events, started_at, ended_at, duration_sec)``.

    ``session_start`` is the window start (== first event time);
    ``ended_at`` is the LAST EVENT time (the window end is last event +
    gap — an implementation detail of session windows, not a fact about
    the data, so it is not exposed). ``agg_cols`` adds per-session
    ``sum(<col>)`` columns named ``sum_<col>`` for metered quantities
    (tokens, bytes).

    Emits in append mode: one row per session, once the watermark passes
    the session's close. Open sessions stay in state until then.
    """
    gap_expr = f"{int(gap_seconds * 1_000_000)} microseconds"
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("started_at"),
        F.max(ts_col).alias("ended_at"),
    ] + [F.sum(c).alias(f"sum_{c}") for c in agg_cols]
    out = (stream_df
           .withWatermark(ts_col, watermark)
           .groupBy(F.col(key_col),
                    F.session_window(F.col(ts_col), gap_expr))
           .agg(*aggs))
    return (out
            .withColumn("session_start", F.col("session_window.start"))
            .drop("session_window")
            .withColumn(
                "duration_sec",
                (F.unix_micros(F.col("ended_at").cast("timestamp"))
                 - F.unix_micros(F.col("started_at").cast("timestamp")))
                / F.lit(1_000_000.0))
            .select(key_col, "session_start", "n_events", "started_at",
                    "ended_at", "duration_sec",
                    *[f"sum_{c}" for c in agg_cols]))
