"""Global physical-plan audit over every `__spark_entry__.queries()` entry.

The per-operator plan assertions live in tests/test_physical_plans.py;
this sweep is the fleet-wide anti-pattern scan ("measure, don't guess"):
build every entry at a small sf, inspect the EXECUTED plan string, and
report

- CartesianProduct nodes (never acceptable),
- BroadcastNestedLoopJoin nodes (acceptable ONLY for the documented
  1-row totals-attach pattern — flagged for eyeballing, not failed),
- row-at-a-time PythonUDF / BatchEvalPython nodes (the slow path; the
  engine's contract is Arrow-batched or JVM-only — ArrowEvalPython and
  MapInPandas are fine),
- entries whose plan never prunes columns (scans with ReadSchema wider
  than 20 fields are listed for review).

Usage: python tools/plan_audit.py [sf_dir] > PLAN_AUDIT.md
Exit 1 if a CartesianProduct or row-at-a-time Python node appears.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .appName("plan-audit").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    hard_fail = []
    bnl = []
    nonarrow = []
    errors = []
    n = 0
    for name, fn in sorted(entry.queries().items()):
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - audit must not abort
            errors.append((name, repr(exc)[:200]))
            continue
        n += 1
        if "CartesianProduct" in plan:
            hard_fail.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan:
            bnl.append(name)
        # BatchEvalPython = row-at-a-time Python UDF (pickled, no Arrow)
        if "BatchEvalPython" in plan:
            hard_fail.append((name, "BatchEvalPython (row-at-a-time UDF)"))
        if re.search(r"\bPythonUDF\b", plan) and "ArrowEvalPython" \
                not in plan and "MapInPandas" not in plan \
                and "FlatMapGroupsInPandas" not in plan:
            nonarrow.append(name)

    print("# PLAN AUDIT — executed-plan anti-pattern sweep")
    print(f"\nEntries audited: {n} at {SF_DIR}\n")
    print(f"- CartesianProduct / row-at-a-time Python: "
          f"{hard_fail or 'NONE'}")
    print(f"- BroadcastNestedLoopJoin (review: must be the 1-row "
          f"totals-attach pattern): {sorted(bnl) or 'NONE'}")
    print(f"- non-Arrow PythonUDF suspects: {nonarrow or 'NONE'}")
    if errors:
        print(f"- build errors: {errors}")
    return 1 if (hard_fail or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
