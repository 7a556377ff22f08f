"""Streaming sessionization (streaming/session_stream.py).

Closed sessions must equal the batch ``session_stats`` rows on the same
(boundary-free) data; the exact-gap boundary divergence between the two
operators is pinned explicitly; append mode holds open sessions until
the watermark closes them.
"""

import datetime as dt
import glob
import os
import shutil

from json_schema_rs_spark.operators.temporal import session_stats
from json_schema_rs_spark.streaming.session_stream import (
    session_stats_stream)

UTC = dt.timezone.utc
SCHEMA = "user_id bigint, event_id bigint, ts timestamp"


def _ts(minute, second=0):
    return dt.datetime(2026, 4, 1, 10, minute, second, tzinfo=UTC)


# a late sentinel key pushes the watermark far past every real session
SENTINEL = (999, 999, dt.datetime(2026, 4, 1, 23, 0, tzinfo=UTC))


def _write_chunks(spark, tmp_path, chunks) -> str:
    d = str(tmp_path / "stream_in")
    os.makedirs(d, exist_ok=True)
    for i, chunk in enumerate(chunks):
        staging = str(tmp_path / f"staging_{i}")
        spark.createDataFrame(chunk, SCHEMA).coalesce(1) \
            .write.parquet(staging)
        (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
        dest = os.path.join(d, f"chunk{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return d


def _run(spark, tmp_path, chunks, name, gap_seconds=300.0):
    d = _write_chunks(spark, tmp_path, chunks)
    stream = spark.readStream.schema(SCHEMA) \
        .option("maxFilesPerTrigger", 1).parquet(d)
    out = session_stats_stream(stream, gap_seconds=gap_seconds,
                               watermark="10 minutes")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(name)
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return [r for r in spark.sql(f"SELECT * FROM {name}").collect()
            if r.user_id != SENTINEL[0]]


ROWS = [
    # user 1: two sessions (5-min gap rule): 10:00-10:02 and 10:20-10:21
    (1, 0, _ts(0)), (1, 1, _ts(2)), (1, 2, _ts(20)), (1, 3, _ts(21)),
    # user 2: one single-event session
    (2, 4, _ts(5)),
    # user 3: events 4 min apart chain into one session
    (3, 5, _ts(0)), (3, 6, _ts(4)), (3, 7, _ts(8)),
]


def test_matches_batch_on_boundary_free_data(spark, tmp_path):
    got = _run(spark, tmp_path, [ROWS, [SENTINEL]], "sess_eq")
    stream_rows = sorted(
        (r.user_id, r.n_events, r.started_at, r.ended_at, r.duration_sec)
        for r in got)
    batch = session_stats(
        spark.createDataFrame(ROWS, SCHEMA),
        key_col="user_id", ts_col="ts", gap_seconds=300.0,
        order_cols=("event_id",))
    batch_rows = sorted(
        (r.user_id, r.n_events, r.started_at, r.ended_at, r.duration_sec)
        for r in batch.collect())
    assert stream_rows == batch_rows
    # session_start == first event time
    assert all(r.session_start == r.started_at for r in got)


def test_exact_gap_boundary_agrees_with_batch(spark, tmp_path):
    """Two events exactly gap_seconds apart stay in ONE session in both
    engines: batch uses ``>`` to split, and session_window merges
    touching windows (next.ts <= prev.ts + gap) — the boundary
    agreement is pinned here, not assumed."""
    rows = [(7, 0, _ts(0)), (7, 1, _ts(5))]  # 300 s apart, gap = 300 s
    got = _run(spark, tmp_path, [rows, [SENTINEL]], "sess_bound")
    assert len(got) == 1 and got[0].n_events == 2
    batch = session_stats(
        spark.createDataFrame(rows, SCHEMA), key_col="user_id",
        ts_col="ts", gap_seconds=300.0, order_cols=("event_id",))
    assert batch.count() == 1


def test_open_session_held_until_watermark(spark, tmp_path):
    """Without the sentinel the watermark tops out at max(ts) - 10 min =
    10:11, so only sessions whose close (last event + gap) precedes it
    emit: user 1's first (closes 10:07) and user 2's (closes 10:10).
    User 3's (closes 10:13) and user 1's second (closes 10:26) stay in
    state — emission is watermark-driven, not trigger-driven."""
    got = _run(spark, tmp_path, [ROWS], "sess_open")
    assert sorted((r.user_id, r.n_events) for r in got) == [(1, 2), (2, 1)]


def test_agg_cols_sum(spark, tmp_path):
    schema = "user_id bigint, event_id bigint, ts timestamp, tokens bigint"
    rows = [(1, 0, _ts(0), 10), (1, 1, _ts(2), 5), (2, 2, _ts(1), 7)]
    d = str(tmp_path / "in2")
    os.makedirs(d, exist_ok=True)
    staging = str(tmp_path / "s2")
    spark.createDataFrame(
        rows + [(999, 9, SENTINEL[2], 0)], schema
    ).coalesce(1).write.parquet(staging)
    (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
    shutil.move(part, os.path.join(d, "chunk0.parquet"))
    stream = spark.readStream.schema(schema).parquet(d)
    out = session_stats_stream(stream, gap_seconds=300.0,
                               watermark="0 seconds",
                               agg_cols=("tokens",))
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("sess_tok")
         .option("checkpointLocation", str(tmp_path / "ck2")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.user_id: r.sum_tokens
           for r in spark.sql("SELECT * FROM sess_tok").collect()
           if r.user_id != 999}
    assert got == {1: 15, 2: 7}
