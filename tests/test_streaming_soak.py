"""Restart soak for the stateful streaming checks: the round-4 suite
proved exactly-once across ONE checkpoint restart; this drives the same
query through FIVE sessions against one checkpoint — files arriving
between restarts, half the sessions killed without draining (the
recovery path: uncommitted micro-batches must replay, committed ones
must not re-emit) — and requires the final sink to byte-match the batch
operators with zero duplicates."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F  # noqa: F401

from json_schema_rs_spark.operators.table_checks import (
    monotonic_ts_violations,
    turn_gap_violations,
)
from json_schema_rs_spark.streaming.stateful import stateful_transcript_checks

UTC = dt.timezone.utc
SCHEMA = "conv_id string, turn_idx int, role string, ts timestamp"


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2026, 4, 1, 9, minute, second, tzinfo=UTC)


def _corpus() -> list[tuple]:
    """12 conversations, deterministic anomalies: every 3rd drops
    turn_idx 2 (gap), every 4th swaps one timestamp (non-monotonic)."""
    rows = []
    for i in range(12):
        conv = f"S{i:02d}"
        for idx in range(5):
            if i % 3 == 0 and idx == 2:
                continue
            sec = idx * 10
            if i % 4 == 0 and idx == 3:
                sec = 5                  # earlier than turn 2's ts
            role = "user" if idx % 2 == 0 else "assistant"
            rows.append((conv, idx, role, _ts(i, sec)))
    return rows


SENTINEL = ("ZZ-flush", 0, "user", _ts(59))


def _chunks(rows: list[tuple]) -> list[list[tuple]]:
    """Six chunks in conversation-time order (two convs per chunk) so
    the advancing watermark never drops a late row, plus the sentinel."""
    by_conv: dict[str, list[tuple]] = {}
    for r in rows:
        by_conv.setdefault(r[0], []).append(r)
    convs = sorted(by_conv)
    out = [sum((by_conv[c] for c in convs[i:i + 2]), [])
           for i in range(0, len(convs), 2)]
    out.append([SENTINEL])
    return out


def _append_chunk(spark, tmp_path, stream_dir, i, chunk) -> None:
    staging = str(tmp_path / f"soak_staging_{i}")
    spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(staging)
    (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
    dest = os.path.join(stream_dir, f"chunk{i}.parquet")
    shutil.move(part, dest)
    os.utime(dest, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))


@pytest.mark.soak
def test_five_restart_soak_exactly_once(spark, tmp_path):
    rows = _corpus()
    chunks = _chunks(rows)
    stream_dir = str(tmp_path / "soak_in")
    os.makedirs(stream_dir, exist_ok=True)
    sink = str(tmp_path / "soak_sink")
    ckpt = str(tmp_path / "soak_ckpt")

    def start_query():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(stream_dir))
        out = stateful_transcript_checks(
            stream, watermark_delay="10 minutes", session_gap_ms=5_000)
        return (out.writeStream.outputMode("append").format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt).start())

    # sessions 0..4: one new chunk lands before each restart; odd
    # sessions are killed as soon as any micro-batch has committed
    # (no drain) — the crash-recovery path
    next_chunk = 0
    for session in range(5):
        if next_chunk < len(chunks):
            _append_chunk(spark, tmp_path, stream_dir, next_chunk,
                          chunks[next_chunk])
            next_chunk += 1
        q = start_query()
        try:
            if session % 2 == 1:
                deadline = time.monotonic() + 30
                while (not q.recentProgress
                       and time.monotonic() < deadline):
                    time.sleep(0.2)
            else:
                q.processAllAvailable()
        finally:
            q.stop()

    # final session: land every remaining chunk (incl. the sentinel that
    # closes all conversations) and drain completely
    for i in range(next_chunk, len(chunks)):
        _append_chunk(spark, tmp_path, stream_dir, i, chunks[i])
    q = start_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(tuple(r) for r in spark.read.parquet(sink).collect())
    df = spark.createDataFrame(rows, SCHEMA)
    expected = sorted(
        tuple(r) for r in turn_gap_violations(df)
        .unionByName(monotonic_ts_violations(df)).collect())
    # the corpus fires both families: 4 gap convs + 3 swapped-ts convs
    assert len(expected) >= 7
    assert got == expected           # byte-identical AND no duplicates
    assert len(got) == len(set(got))
