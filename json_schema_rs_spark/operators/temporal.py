"""Temporal operators: gap sessionization and as-of join.

Neither exists in the reference (a single-instance validator has no
notion of event time), and Spark itself ships neither as a built-in —
these are the two temporal primitives a transcript/event pipeline needs
before cross-row validation makes sense: "which burst of activity is
one conversation?" (sessionize) and "what was the most recent X when Y
happened?" (as-of join, e.g. the active spec version / model config /
error state at each turn's timestamp).

Both are expressed as ONE shuffle on the entity key plus window
functions — no joins, no driver collection:

- :func:`sessionize` — lag + cumulative sum over (key, time) order; the
  classic gap-based session assignment. Scale shape: one Exchange on
  the key; per-key data must fit a task's sort spill budget, which
  holds for per-user event streams (bounded) and is the same contract
  the gap-free/monotonic transcript checks already make.
- :func:`asof_join` — union the tagged right rows into the left stream,
  sort each key partition once by (ts, side), and carry the last right
  payload forward with ``last(ignorenulls=True)``. This is the
  merge-join formulation of ASOF JOIN (the same plan a native
  implementation runs after its range-partition step) with exactly one
  Exchange for BOTH inputs — no per-row subqueries, no broadcast of the
  right side, no cartesian.

Skew: both operators partition by the entity key; a hot key serializes
into one task's sort. That is inherent to the semantics (a session /
as-of lookup is a per-key linear scan); the mitigations are the same as
the transcript pipeline's documented ones (bounded per-key streams, AQE
skew splitting for the shuffle read).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _micros(c: Column) -> Column:
    """Microsecond epoch for gap/duration arithmetic. ``unix_micros``
    rejects TIMESTAMP_NTZ (the parquet default); casting to the session
    timestamp type first accepts both, and timezone interpretation
    cancels in the differences these operators compute."""
    return F.unix_micros(c.cast("timestamp"))


def sessionize(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign a per-key session ordinal: a new session starts at the
    first event and whenever the time since the previous event exceeds
    ``gap_seconds``. Returns the input plus

    - ``session_seq`` — 0-based session ordinal within the key;
    - ``session_id`` — ``"<key>:<seq>"``, unique across keys.

    ``order_cols`` break timestamp ties deterministically (recommended:
    a unique event id). One shuffle on ``key_col``; everything after is
    two window passes over the same sort order (Spark reuses the sort —
    a single Sort + two Window nodes, no second Exchange).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # unix_micros keeps sub-second gaps exact; NULL prev (first event)
    # is a session start by definition
    is_start = prev_ts.isNull() | (
        (_micros(F.col(ts_col)) - _micros(prev_ts))
        > F.lit(int(gap_seconds * 1_000_000)))
    out = df.withColumn(
        "session_seq",
        F.sum(is_start.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
    return out.withColumn(
        "session_id",
        F.concat(F.col(key_col).cast("string"), F.lit(":"),
                 F.col("session_seq").cast("string")))


def split_conversations(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """ACTING complement of :func:`sessionize` for transcripts (the
    gap-free↔reindex symmetry applied to conversation identity): a
    reused ``conv_id`` whose inter-turn gap exceeds ``gap_seconds`` is
    really several conversations sharing an id — split it. Returns the
    input plus

    - ``new_conv_id`` — ``"<conv>:<session_seq>"`` (first session keeps
      seq 0, so an already-clean table maps 1:1);
    - ``new_turn_idx`` — 0-based dense position within the NEW
      conversation (gap-free by construction, so the repaired table
      passes both the uniqueness and gap-free checks when the original
      (conv, idx) keys were unique);
    - ``orig_*`` joinability is free: ``conv_col``/``idx_col`` are kept
      untouched.

    Scale shape: ONE exchange on ``conv_col``; the session marks, the
    running session ordinal, AND the within-session renumber all ride
    the same ``(ts, idx)``-sorted window — the renumber is
    ``row_number − last(session-start row_number)`` over the same sort,
    not a second partitioning (no (conv, seq) re-shuffle). Microsecond-
    exact gaps, ``idx_col`` breaks timestamp ties deterministically."""
    w = Window.partitionBy(conv_col).orderBy(ts_col, idx_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_start = prev_ts.isNull() | (
        (_micros(F.col(ts_col)) - _micros(prev_ts))
        > F.lit(int(gap_seconds * 1_000_000)))
    rn = F.row_number().over(w)
    out = (df.withColumn("_rn", rn)
             .withColumn("_seq",
                         F.sum(is_start.cast("long")).over(run) - 1)
             .withColumn("_start_rn",
                         F.last(F.when(is_start, rn),
                                ignorenulls=True).over(run)))
    return (out.withColumn(
                "new_conv_id",
                F.concat(F.col(conv_col).cast("string"), F.lit(":"),
                         F.col("_seq").cast("string")))
               .withColumn("new_turn_idx",
                           (F.col("_rn") - F.col("_start_rn"))
                           .cast("int"))
               .drop("_rn", "_seq", "_start_rn"))


def session_stats(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """One row per session: ``(key, session_seq, n_events, started_at,
    ended_at, duration_sec)``. The aggregation rides the SAME partition
    key as :func:`sessionize`'s window, so Catalyst plans it without a
    second Exchange (the sessionized stream is already hash-partitioned
    by the key)."""
    s = sessionize(df, key_col=key_col, ts_col=ts_col,
                   gap_seconds=gap_seconds, order_cols=order_cols)
    return (s.groupBy(key_col, "session_seq")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("started_at"),
                 F.max(ts_col).alias("ended_at"))
            .withColumn(
                "duration_sec",
                (_micros(F.col("ended_at")) - _micros(F.col("started_at")))
                / F.lit(1_000_000.0)))


def turn_latency_stats(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
    stale_seconds: Optional[float] = None,
    round_digits: int = 6,
) -> DataFrame:
    """Per-conversation inter-turn latency profile — the ops complement
    of :func:`~..operators.table_checks.monotonic_ts_violations`: instead
    of flagging out-of-order timestamps, measure how long turns take.
    One row per conversation with ≥2 turns: ``(conv_id, n_gaps,
    sum_gap_us, max_gap_us, avg_gap_sec[, n_stale])`` where a gap is the
    microsecond delta from the previous turn in ``idx_col`` order
    (``order_cols`` break idx ties deterministically) and ``n_stale``
    counts gaps above ``stale_seconds`` (agent-went-dark detection).
    Single-turn conversations have no gaps and are absent by
    construction; negative gaps (non-monotonic timestamps — the
    violation operator's job) enter the sums as-is, keeping the profile
    a pure measurement.

    Exactness: sums/max are integer microseconds (bit-exact
    cross-engine); ``avg_gap_sec`` = ``floor(sum_us / n) / 1e6`` — an
    exact integer floor division (tie-free cross-engine; round()
    of an int/small-int quotient hits exact decimal ties).

    Scale shape: the gap is computed in a skinny ``(conv, ts)`` window
    projection — ONE exchange on ``conv_col``; the per-conversation
    aggregate rides the window's hash partitioning (no second Exchange,
    same fusion as :func:`session_stats`); wide columns never move."""
    w = Window.partitionBy(conv_col).orderBy(idx_col, *order_cols)
    gap = _micros(F.col(ts_col)) - _micros(F.lag(F.col(ts_col)).over(w))
    per = (df.select(F.col(conv_col), F.col(idx_col),
                     *[F.col(c) for c in order_cols], F.col(ts_col))
             .select(F.col(conv_col), gap.alias("_gap_us"))
             .filter(F.col("_gap_us").isNotNull()))
    aggs = [F.count(F.lit(1)).alias("n_gaps"),
            F.sum("_gap_us").alias("sum_gap_us"),
            F.max("_gap_us").alias("max_gap_us")]
    if stale_seconds is not None:
        aggs.append(F.sum(
            (F.col("_gap_us") > F.lit(int(stale_seconds * 1_000_000)))
            .cast("long")).alias("n_stale"))
    return (per.groupBy(conv_col).agg(*aggs)
            .withColumn(
                # exact integer floor division, not round(): an integer
                # microsecond sum over a small count regularly lands on
                # exact decimal ties where engines' tie-breaking
                # disagrees; floor(a/b)/1e6 is tie-free and identical
                # IEEE ops everywhere
                "avg_gap_sec",
                F.floor(F.col("sum_gap_us") / F.col("n_gaps"))
                 .cast("double") / F.lit(1_000_000.0)))


def role_pair_latency(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
    role_col: str = "role",
    order_cols: Sequence[str] = (),
    round_digits: int = 6,
) -> DataFrame:
    """Corpus-wide response latency by adjacent role pair — the question
    behind :func:`turn_latency_stats` asked the way operators ask it:
    "how fast does the assistant answer the user?". One row per observed
    ``(prev_role, role)`` adjacency: ``(prev_role, role, n, sum_gap_us,
    max_gap_us, avg_gap_sec)``; gaps are integer microseconds from the
    previous turn in ``idx_col`` order, NULL roles reported as-is (the
    role-vocabulary check owns their legality).

    Scale shape: same skinny ``(conv, role, ts)`` window projection and
    single ``conv_col`` exchange as the other per-conversation passes,
    then ONE hash aggregate whose key cardinality is |roles|² — map-side
    partial aggregation absorbs the corpus, and the result is
    dashboard-sized at any input size."""
    w = Window.partitionBy(conv_col).orderBy(idx_col, *order_cols)
    gap = _micros(F.col(ts_col)) - _micros(F.lag(F.col(ts_col)).over(w))
    prev_role = F.lag(F.col(role_col)).over(w)
    per = (df.select(F.col(conv_col), F.col(idx_col),
                     *[F.col(c) for c in order_cols],
                     F.col(role_col), F.col(ts_col))
             .select(prev_role.alias("prev_role"),
                     F.col(role_col).alias("role"),
                     gap.alias("_gap_us"))
             .filter(F.col("_gap_us").isNotNull()))
    return (per.groupBy("prev_role", "role")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("_gap_us").alias("sum_gap_us"),
                 F.max("_gap_us").alias("max_gap_us"))
            .withColumn(
                "avg_gap_sec",
                F.floor(F.col("sum_gap_us") / F.col("n"))
                 .cast("double") / F.lit(1_000_000.0)))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: Optional[str] = None,
    right_cols: Optional[Sequence[str]] = None,
    tolerance_seconds: Optional[float] = None,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the most recent right row of the same
    ``on`` key with ``right.ts <= left.ts`` (ASOF LEFT JOIN semantics;
    rows with no prior match keep NULLs). ``right_cols`` selects which
    right payload columns to carry (default: all non-key, non-ts);
    each arrives as ``<prefix><col>``, plus ``<prefix>ts`` with the
    matched timestamp. ``tolerance_seconds`` discards matches older
    than the window. ``direction="forward"`` flips the contract to the
    NEXT right row with ``right.ts >= left.ts`` (tolerance then bounds
    how far ahead), matching pandas ``merge_asof`` directions; the plan
    is identical — only the window frame reverses.

    Plan: union tagged streams -> one Exchange on ``on`` -> one Sort by
    (ts, side) -> ``last(payload, ignorenulls=True)`` carried forward ->
    keep left rows. Right rows sort BEFORE left rows at equal
    timestamps, so an exactly-simultaneous right row matches (the
    ``<=`` in the contract). Ties between right rows at the same
    timestamp resolve to the later one in the deterministic
    (ts, right row order) sort; pass a unique id in ``right_cols`` and
    pre-sort if tie order matters.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    rts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, rts)]
    payload = F.struct(
        F.col(rts).alias("ts"),
        *[F.col(c).alias(c) for c in right_cols]).alias("_asof_payload")

    lcols = left.columns
    r_tagged = right.select(
        F.col(on).alias(on),
        F.col(rts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        payload,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c != on])
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(r_tagged.schema["_asof_payload"].dataType)
        .alias("_asof_payload"),
        *[F.col(c) for c in lcols if c != on])

    # forward is backward on reversed time: descending ts, right rows
    # still sorting before left at equal timestamps (the >= contract)
    order = (["_asof_ts", "_asof_side"] if direction == "backward"
             else [F.desc("_asof_ts"), F.asc("_asof_side")])
    w = (Window.partitionBy(on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    carried: Column = F.last("_asof_payload", ignorenulls=True).over(w)
    joined = (r_tagged.unionByName(l_tagged)
              .withColumn("_asof_m", carried)
              .filter(F.col("_asof_side") == 1))
    if tolerance_seconds is not None:
        age = (_micros(F.col("_asof_ts")) - _micros(F.col("_asof_m.ts"))
               if direction == "backward"
               else _micros(F.col("_asof_m.ts")) - _micros(F.col("_asof_ts")))
        joined = joined.withColumn(
            "_asof_m",
            F.when(age <= F.lit(int(tolerance_seconds * 1_000_000)),
                   F.col("_asof_m")))
    return joined.select(
        F.col(on),
        *[F.col(c) for c in lcols if c != on],
        F.col("_asof_m.ts").alias(f"{prefix}ts"),
        *[F.col(f"_asof_m.{c}").alias(f"{prefix}{c}")
          for c in right_cols])
