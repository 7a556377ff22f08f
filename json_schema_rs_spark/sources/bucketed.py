"""Bucketed transcript input for shuffle-free cross-row checks.

At 10^12 turns the transcript table is written clustered by conversation
(Iceberg partition/sort-order or Spark bucketing), so the per-conversation
window checks need NO exchange at read time — the whole validation
pipeline becomes embarrassingly parallel. This module reproduces that
layout locally:

- :func:`write_bucketed` (one-time prep): rewrite the flat parquet as a
  Spark-bucketed, sorted table (``CLUSTERED BY (conv_id) SORTED BY
  (conv_id, turn_idx)``).
- :func:`register_bucketed` (per session): attach an EXTERNAL table
  definition over those files so a fresh session scans them bucket-aware
  (in-memory catalog does not persist across JVMs; the files do).

With this input, ``transcript_pipeline(...)`` plans zero Exchange
operators (asserted in tests/test_pipeline_fused.py::test_bucketed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

N_BUCKETS = 64

DDL_COLS = ("conv_id STRING, turn_idx INT, role STRING, text STRING, "
            "tool STRING, ts TIMESTAMP")


def write_bucketed(spark: SparkSession, src_parquet: str, table_path: str,
                   *, n_buckets: int = N_BUCKETS) -> None:
    """One-time prep: src parquet -> bucketed+sorted parquet table files.
    Uses a throwaway managed-table name; the files at ``table_path`` are
    what matters."""
    name = "bench_tx_bucketed_prep"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (spark.read.parquet(src_parquet)
         .repartition(n_buckets, "conv_id")
         .write.mode("overwrite")
         .bucketBy(n_buckets, "conv_id")
         .sortBy("conv_id", "turn_idx")
         .option("path", table_path)
         .saveAsTable(name))


def register_bucketed(spark: SparkSession, table_path: str,
                      *, name: str = "bench_tx_bucketed",
                      n_buckets: int = N_BUCKETS) -> DataFrame:
    """Attach an external bucketed-table definition over prepped files in
    a fresh session and return the bucket-aware DataFrame."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} ({DDL_COLS}) USING PARQUET "
        f"CLUSTERED BY (conv_id) SORTED BY (conv_id, turn_idx) "
        f"INTO {n_buckets} BUCKETS LOCATION '{table_path}'")
    return spark.table(name)
