"""Driver-style comparison harness: run each ``__spark_entry__.queries()``
entry and its ``oracle_sql()`` twin on the same sf dir, compare row count,
column names, and order-insensitive canonicalized values — the same gate
the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import datetime
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def canon_rows(columns, rows) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def compare_one(name: str, spark, con, sf_dir: str, entry_mod) -> tuple[bool, str]:
    sdf = entry_mod.queries()[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        return True, f"rows-only: {len(srows)} rows"
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    if sorted(scols) != sorted(ocols):
        return False, f"schema mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"
    if len(srows) != len(orows):
        return False, f"row count mismatch: spark={len(srows)} oracle={len(orows)}"
    a, b = canon_rows(scols, srows), canon_rows(ocols, orows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch ({sum(1 for x, y in zip(a, b) if x != y)} rows), first: {diffs}"
    return True, f"OK ({len(srows)} rows)"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
