"""Driver-style comparison harness: run each ``__spark_entry__.queries()``
entry and its ``oracle_sql()`` twin on the same sf dir and compare
row count, column names, and values — through the SAME observable
behavior as the driver's correctness gate (CORRECTNESS_r{N}.json):
both sides go through pandas, columns sorted by name, rows sorted with
``sort_values`` (unhashable cells crash, as they crash the driver), and
cells compared dtype-sensitively with no rounding and no list
normalization. Round 4 proved the old ``fetchall()``-based
canonicalization (dtype-erased ints, normalized lists) silently masks
driver hash failures; this delegates to ``tools.oracle_check``."""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_check import compare_frames  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare_one(name: str, spark, con, sf_dir: str, entry_mod) -> tuple[bool, str]:
    sdf = entry_mod.queries()[name](spark, sf_dir)
    spdf = sdf.toPandas()
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        return True, f"rows-only: {len(spdf)} rows"
    opdf = con.execute(sql).df()
    try:
        rows_ok, schema_ok, hash_ok, detail = compare_frames(spdf, opdf)
    except Exception as exc:  # noqa: BLE001
        return False, (f"driver-canon crash (would ERR at the driver): "
                       f"{type(exc).__name__}: {str(exc)[:200]}")
    if not schema_ok:
        return False, f"schema mismatch: {detail}"
    if not rows_ok:
        return False, f"row count mismatch: {detail}"
    if not hash_ok:
        return False, f"value mismatch: {detail}"
    return True, f"OK ({len(spdf)} rows)"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    names = only or list(entry_mod.queries())
    failed = []
    for name in names:
        try:
            ok, msg = compare_one(name, spark, con, sf_dir, entry_mod)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {str(e)[:300]}"
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}", flush=True)
        if not ok:
            failed.append(name)
    # smoke entry()
    try:
        n = entry_mod.entry(spark).count()
        print(f"PASS entry(): {n} rows", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL entry(): {e}", flush=True)
        failed.append("entry")
    spark.stop()
    print(f"{len(names) - len(failed)}/{len(names)} queries pass")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
