"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 next to its
``oracle_sql()`` DuckDB statement over the same parquet tables, and
compares row count, column names, and values (columns sorted by name,
rows sorted by all columns, NaN==NaN). Queries with no oracle are
reported ``no_oracle``. Exit code 1 if any mismatch.

Usage: python tools/oracle_check.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (SparkSession.builder.master("local[8]")
             .appName("oracle-check")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    import __spark_entry__ as entry
    qs, osql = entry.queries(), entry.oracle_sql()
    bad = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {exc}")
            bad.append(name)
            continue
        if name not in osql:
            print(f"{name}: no_oracle rows={len(srows)}")
            continue
        try:
            res = con.execute(osql[name])
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {exc}")
            bad.append(name)
            continue
        sc, sr = _canon(scols, srows)
        oc, orr = _canon(ocols, orows)
        ok_rows = len(sr) == len(orr)
        ok_cols = sc == oc
        ok_vals = sr == orr
        status = "PASS" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        detail = ""
        if not ok_cols:
            detail = f" cols spark={sc} oracle={oc}"
        elif not ok_rows:
            detail = f" rows spark={len(sr)} oracle={len(orr)}"
        elif not ok_vals:
            diff = next((i for i, (a, b) in enumerate(zip(sr, orr))
                         if a != b), None)
            detail = (f" first-diff@{diff}:"
                      f" spark={sr[diff] if diff is not None else '?'}"
                      f" oracle={orr[diff] if diff is not None else '?'}")
        print(f"{name}: {status} rows={len(sr)}{detail}")
        if status == "FAIL":
            bad.append(name)
    spark.stop()
    if bad:
        print(f"FAILED: {bad}")
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
