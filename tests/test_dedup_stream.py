"""Streaming exact dedup (streaming/dedup_stream.py).

Within the watermark horizon the stream must keep exactly one row per
content digest — the same survivors the batch exact_dedup picks on the
same data; past the horizon, state is evicted (a far-later duplicate
passes through, proving boundedness rather than leaking it silently).
"""

import datetime as dt
import glob
import os
import shutil

import pytest

from json_schema_rs_spark.streaming.dedup_stream import dedup_stream

UTC = dt.timezone.utc
SCHEMA = "doc_id bigint, text string, ts timestamp"


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2026, 3, 1, 10, minute, tzinfo=UTC)


def _write_chunks(spark, tmp_path, chunks) -> str:
    d = str(tmp_path / "stream_in")
    os.makedirs(d, exist_ok=True)
    for i, chunk in enumerate(chunks):
        staging = str(tmp_path / f"staging_{i}")
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(staging)
        (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
        dest = os.path.join(d, f"chunk{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return d


def _run(spark, tmp_path, chunks, name, watermark="10 minutes"):
    d = _write_chunks(spark, tmp_path, chunks)
    stream = spark.readStream.schema(SCHEMA) \
        .option("maxFilesPerTrigger", 1).parquet(d)
    out = dedup_stream(stream, watermark=watermark)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(name)
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_duplicates_within_horizon_dropped(spark, tmp_path):
    rows = _run(spark, tmp_path, [[
        (1, "alpha", _ts(0)),
        (2, "beta", _ts(1)),
        (3, "alpha", _ts(2)),      # dup of doc 1, 2 min later
        (4, "alpha", _ts(3)),      # another dup
        (5, "gamma", _ts(4)),
    ]], "dedup_one_batch")
    assert sorted((r["doc_id"], r["text"]) for r in rows) == [
        (1, "alpha"), (2, "beta"), (5, "gamma")]


def test_dedup_spans_microbatches(spark, tmp_path):
    # duplicate arrives in a LATER micro-batch but inside the horizon:
    # state carries across triggers
    rows = _run(spark, tmp_path, [
        [(1, "alpha", _ts(0)), (2, "beta", _ts(1))],
        [(3, "alpha", _ts(2)), (4, "delta", _ts(3))],
    ], "dedup_cross_batch")
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 4]


def test_state_evicted_past_watermark(spark, tmp_path):
    # same text again 50 min later with a 5-min horizon: the first
    # digest's state is gone, so the late copy is EMITTED — bounded
    # state, documented semantics (batch compaction catches it).
    # Two advancing batches: state cleanup runs with the PREVIOUS
    # batch's watermark, so eviction lands one micro-batch after the
    # watermark passes the digest's expiry.
    rows = _run(spark, tmp_path, [
        [(1, "alpha", _ts(0))],
        [(2, "advance", _ts(30))],       # pushes watermark past alpha
        [(3, "advance2", _ts(40))],      # batch whose cleanup evicts alpha
        [(4, "alpha", _ts(50))],
    ], "dedup_evict", watermark="5 minutes")
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 3, 4]


def test_matches_batch_exact_dedup_survivor_set(spark, tmp_path):
    from json_schema_rs_spark.operators.dedup import exact_dedup
    data = [(i, f"text-{i % 7}", _ts(i)) for i in range(20)]
    got = sorted(r["text"] for r in _run(
        spark, tmp_path, [data], "dedup_vs_batch", watermark="60 minutes"))
    batch = spark.createDataFrame(data, SCHEMA)
    want = sorted(r["text"]
                  for r in exact_dedup(batch, text_col="text").collect())
    assert got == want                      # same one-per-digest survivor set
    assert len(got) == 7


def test_digest_column_optional(spark, tmp_path):
    rows = _run(spark, tmp_path, [[(1, "a", _ts(0))]], "dedup_cols")
    assert set(rows[0].asDict()) == {"doc_id", "text", "ts"}
