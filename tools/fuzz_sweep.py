"""Standalone long-run differential fuzz sweep.

Reuses the generators from tests/test_differential_fuzz.py (compiler vs
interpreter byte-agreement — the oracle is agreement between two
independent implementations) but runs MANY more seeded cases than the CI
slice. Any divergence prints the minimal reproducer (spec + row) so it
can be pinned as a regression test.

Usage:
    python tools/fuzz_sweep.py [--seed N] [--specs N] [--rows N]
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--specs", type=int, default=100)
    ap.add_argument("--rows", type=int, default=300)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from json_schema_rs_spark import ValidationEngine
    from json_schema_rs_spark.plans.pyvalidator import validate
    from json_schema_rs_spark.plans.spec import parse_spec
    from test_differential_fuzz import DDL, _rand_row, _rand_spec

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    rng = random.Random(args.seed)
    names = ("s", "i", "x", "a")
    failures = 0
    t0 = time.time()
    for case in range(args.specs):
        spec = _rand_spec(rng)
        rows = [_rand_row(rng) for _ in range(args.rows)]
        df = spark.createDataFrame(
            [tuple([cid] + list(r)) for cid, r in enumerate(rows)], DDL)
        try:
            eng = ValidationEngine(spec, key_cols=("_cid",))
            got = {cid: set() for cid in range(len(rows))}
            for r in eng.validate(df).violations.collect():
                got[r._cid].add((r.instance_path, r.code, r.message))
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            failures += 1
            print(f"CASE {case}: ENGINE ERROR {type(exc).__name__}: {exc}")
            print("  spec:", json.dumps(spec))
            continue
        root = parse_spec(spec)
        for cid, row in enumerate(rows):
            data = {n: v for n, v in zip(names, row) if v is not None}
            exp = {(v.path, v.code, v.message) for v in validate(root, data)}
            if got[cid] != exp:
                failures += 1
                print(f"CASE {case} row {cid}: DIVERGENCE")
                print("  spec:", json.dumps(spec))
                print("  row:", row)
                print("  compiler:", sorted(got[cid]))
                print("  interp  :", sorted(exp))
                break
        if (case + 1) % 10 == 0:
            print(f"[{time.time()-t0:7.1f}s] {case+1}/{args.specs} specs, "
                  f"{failures} failures", flush=True)
    print(f"DONE: {args.specs} specs x {args.rows} rows, seed {args.seed}: "
          f"{failures} failures in {time.time()-t0:.1f}s")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
