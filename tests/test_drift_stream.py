"""Streaming categorical drift monitor: per-window JS/chi-square against a
fixed baseline, emitted once per closed event-time window."""

from __future__ import annotations

import datetime as dt
import glob
import math
import os
import shutil

import numpy as np
import pytest

from json_schema_rs_spark.streaming.drift_stream import (
    categorical_drift_stream,
)

UTC = dt.timezone.utc
BASELINE = {"user": 0.5, "assistant": 0.3, "system": 0.2}
SCHEMA = "conv_id string, role string, ts timestamp"


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2026, 3, 1, 10, minute, second, tzinfo=UTC)


def _rows(minute: int, mix: dict) -> list:
    out = []
    i = 0
    for role, count in mix.items():
        for _ in range(count):
            out.append((f"c{i}", role, _ts(minute, i % 60)))
            i += 1
    return out


# window 1 (10:00-10:05): exactly the baseline mix; window 2 (10:05-10:10):
# shifted toward assistant plus two out-of-baseline "narrator" rows
W1 = _rows(0, {"user": 10, "assistant": 6, "system": 4})
W2 = _rows(5, {"user": 2, "assistant": 14, "system": 2, "narrator": 2})
SENTINEL = [("zz", "user", _ts(59))]


def _manual(mix: dict, q: dict) -> tuple:
    n = sum(mix.values())
    js = 0.0
    for c, qi in q.items():
        pi = mix.get(c, 0) / n
        m = (pi + qi) / 2
        if pi > 0:
            js += pi * math.log(pi / m)
        js += qi * math.log(qi / m)
    p_other = sum(v for c, v in mix.items() if c not in q) / n
    if p_other > 0:
        js += p_other * math.log(2.0)
    js /= 2.0
    chi2 = sum((mix.get(c, 0) - n * qi) ** 2 / (n * qi)
               for c, qi in q.items())
    return js, chi2


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


def test_per_window_js_chi2_match_manual(spark, tmp_path):
    d = _write_chunks(spark, tmp_path,
                      [W1[:12] + W2[:9], W1[12:] + W2[9:] + SENTINEL])
    out = categorical_drift_stream(
        spark.readStream.schema(SCHEMA).parquet(d), "role", BASELINE,
        window="5 minutes", watermark_delay="1 minute")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("drift_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r.window_start.minute: r for r in spark.sql(
        "SELECT * FROM drift_stream").collect()
        if r.window_start.hour == 10 and r.window_start.minute < 10}
    assert set(rows) == {0, 5}

    r1 = rows[0]
    assert r1.n == 20 and r1.other_count == 0
    assert abs(r1.js) < 1e-12 and abs(r1.chi2) < 1e-12  # exact match

    r2 = rows[5]
    js2, chi22 = _manual(
        {"user": 2, "assistant": 14, "system": 2, "narrator": 2}, BASELINE)
    assert r2.n == 20 and r2.other_count == 2
    assert abs(r2.js - js2) < 1e-9
    assert abs(r2.chi2 - chi22) < 1e-9
    assert r2.js > 0.1 and r2.chi2 > 10  # the shift is loud


def test_windows_emit_once_after_watermark(spark, tmp_path):
    """Append mode: the open window (sentinel's) does not emit; rerun from
    the checkpoint with no new input emits nothing new."""
    d = _write_chunks(spark, tmp_path, [W1 + SENTINEL])
    sink = str(tmp_path / "sink")

    def run():
        out = categorical_drift_stream(
            spark.readStream.schema(SCHEMA).parquet(d), "role", BASELINE,
            window="5 minutes", watermark_delay="1 minute")
        q = (out.writeStream.outputMode("append").format("parquet")
             .option("path", sink)
             .option("checkpointLocation", str(tmp_path / "ck2")).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.read.parquet(sink).collect()

    first = run()
    assert [r.window_start.minute for r in first] == [0]
    assert run() == first  # restart re-emits nothing


def test_baseline_validation():
    with pytest.raises(ValueError):
        categorical_drift_stream(None, "role", {})
    with pytest.raises(ValueError):
        categorical_drift_stream(None, "role", {"a": 0.0})


def test_unnormalized_baseline_weights(spark, tmp_path):
    """Counts work as weights — the baseline is normalized internally."""
    d = _write_chunks(spark, tmp_path, [W1 + SENTINEL])
    out = categorical_drift_stream(
        spark.readStream.schema(SCHEMA).parquet(d), "role",
        {"user": 50, "assistant": 30, "system": 20},
        window="5 minutes", watermark_delay="1 minute")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("drift_weights")
         .option("checkpointLocation", str(tmp_path / "ck3")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    (r,) = spark.sql("SELECT * FROM drift_weights").collect()
    assert abs(r.js) < 1e-12 and abs(r.chi2) < 1e-12


def _num_rows(minute: int, vals: list) -> list:
    return [(f"n{i}", v, _ts(minute, i % 60)) for i, v in enumerate(vals)]


NUM_SCHEMA = "conv_id string, v double, ts timestamp"


def test_numeric_psi_per_window(spark, tmp_path):
    from json_schema_rs_spark.streaming.drift_stream import (
        numeric_drift_stream,
    )
    # baseline: uniform over bins 0..4 of [0, 50) in steps of 10
    base = {i: 0.2 for i in range(5)}
    w1 = _num_rows(0, [5.0, 15.0, 25.0, 35.0, 45.0] * 4)        # matches
    w2 = _num_rows(5, [5.0] * 16 + [45.0] * 2 + [None, None])    # shifted
    d = _write_chunks_schema(spark, tmp_path, [w1 + w2 + [("zz", 1.0, _ts(59))]],
                             NUM_SCHEMA)
    out = numeric_drift_stream(
        spark.readStream.schema(NUM_SCHEMA).parquet(d), "v", base,
        lo=0.0, hi=50.0, nbins=5, window="5 minutes",
        watermark_delay="1 minute")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("num_drift")
         .option("checkpointLocation", str(tmp_path / "ckn")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r.window_start.minute: r for r in spark.sql(
        "SELECT * FROM num_drift").collect()
        if r.window_start.minute < 10}
    assert set(rows) == {0, 5}
    r1 = rows[0]
    assert r1.n == 20 and r1.null_count == 0 and abs(r1.psi) < 1e-12
    r2 = rows[5]
    assert r2.n == 20 and r2.null_count == 2
    # manual PSI: p = (16/18, eps, eps, eps, 2/18) vs q = 0.2 each
    eps = 1e-6
    p = [16 / 18, eps, eps, eps, 2 / 18]
    want = sum((pi - 0.2) * math.log(pi / 0.2) for pi in p)
    assert abs(r2.psi - want) < 1e-9
    assert r2.psi > 0.5  # major shift


def _write_chunks_schema(spark, tmp_path, chunks, schema) -> str:
    d = str(tmp_path / "stream_in_n")
    os.makedirs(d, exist_ok=True)
    for i, chunk in enumerate(chunks):
        staging = str(tmp_path / f"staging_n{i}")
        spark.createDataFrame(chunk, schema).coalesce(1) \
            .write.parquet(staging)
        (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
        dest = os.path.join(d, f"chunk{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return d


def test_numeric_psi_validates_params():
    from json_schema_rs_spark.streaming.drift_stream import (
        numeric_drift_stream,
    )
    with pytest.raises(ValueError):
        numeric_drift_stream(None, "v", {}, lo=0.0, hi=0.0)
    with pytest.raises(ValueError):
        numeric_drift_stream(None, "v", {}, lo=1.0, hi=2.0, nbins=0)
