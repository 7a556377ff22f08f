"""Scaling-efficiency evidence for the north rule (BASELINE.json):
throughput scaling efficiency >= 0.8 from N to 4N executors, evidenced in
this sandbox by running the SAME validation pipeline on the SAME input at
local[8] and local[32] (cores-only delta, per the driver protocol in
BASELINE.md §3).

Each measurement runs in a FRESH JVM (subprocess) so JIT/heap state can't
leak between cluster sizes; each does one warm-up then ``repeats`` timed
runs; the median is reported. Usage::

    python tools/scaling_run.py [turns] [repeats]

Writes tools/scaling_result.json and prints a markdown table for
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F

cpus = {cpus}
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .appName(f"scaling-{{cpus}}")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "8g")
         .config("spark.driver.extraJavaOptions",
                 "-XX:+AlwaysPreTouch -XX:+UseParallelGC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from json_schema_rs_spark import ValidationEngine
from json_schema_rs_spark.operators.table_checks import (
    monotonic_ts_violations, referential_violations,
    turn_gap_violations, uniqueness_violations)
from json_schema_rs_spark.sources.synth import ROLES, TOOLS

tx = spark.read.parquet({path!r})
spec = {{
    "type": "object",
    "required": ["conv_id", "turn_idx", "role", "text"],
    "properties": {{
        "role": {{"type": "string", "enum": ROLES}},
        "text": {{"type": "string", "minLength": 1, "maxLength": 4000,
                  "pattern": "[0-9a-f]"}},
        "turn_idx": {{"type": "integer", "minimum": 0, "maximum": 100000}},
    }},
}}
row_v = ValidationEngine(spec).validate(tx).violations
table_v = (uniqueness_violations(tx, ("conv_id", "turn_idx"))
           .unionByName(turn_gap_violations(tx))
           .unionByName(monotonic_ts_violations(tx))
           .unionByName(referential_violations(tx, "tool", TOOLS))
           .select("conv_id", F.col("turn_idx").cast("int").alias("turn_idx"),
                   "instance_path", "code", "message"))
pipe = row_v.unionByName(table_v)

times = []
for i in range({repeats} + 2):
    t0 = time.perf_counter()
    pipe.write.format("noop").mode("overwrite").save()
    if i >= 2:  # first two runs = warm-up (codegen, C2 JIT, page-in)
        times.append(time.perf_counter() - t0)
print("RESULT " + json.dumps(times))
spark.stop()
"""


def synth_input(turns: int) -> str:
    path = f"/tmp/bench_transcripts_{turns}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "from pyspark.sql import SparkSession\n"
        "from json_schema_rs_spark.sources.synth import synth_distributed\n"
        "spark = (SparkSession.builder.master('local[32]')"
        ".config('spark.ui.enabled','false')"
        ".config('spark.driver.memory','8g').getOrCreate())\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"synth_distributed(spark, {turns} // 50, 50, violation_rate=0.02,"
        f" partitions=64).write.mode('overwrite').parquet({path!r})\n"
        "spark.stop()\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True,
                   stderr=subprocess.DEVNULL)
    return path


def run_at(cpus: int, path: str, repeats: int) -> list[float]:
    code = _WORKER.format(repo=REPO, cpus=cpus, path=path, repeats=repeats)
    out = subprocess.run([sys.executable, "-c", code], check=True,
                         capture_output=True, text=True).stdout
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line in worker output: {out[-2000:]}")


def main() -> None:
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 8  # cluster sizes N, 4N
    path = synth_input(turns)
    results = {}
    for cpus in (n, 4 * n):
        times = run_at(cpus, path, repeats)
        med = statistics.median(times)
        results[cpus] = {
            "times_sec": [round(t, 2) for t in times],
            "median_sec": round(med, 2),
            "turns_per_sec": round(turns / med, 1),
        }
        print(f"local[{cpus}]: {results[cpus]}", flush=True)
    eff = (results[4 * n]["turns_per_sec"] / (4 * results[n]["turns_per_sec"]))
    summary = {
        "turns": turns,
        "repeats": repeats,
        "n": n,
        f"local{n}": results[n],
        f"local{4 * n}": results[4 * n],
        "scaling_efficiency_n_to_4n": round(eff, 3),
        "pass_ge_0.8": eff >= 0.8,
    }
    with open(os.path.join(REPO, "tools", "scaling_result.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    print("\n| config | median sec | turns/sec |")
    print("|---|---|---|")
    print(f"| local[{n}] | {results[n]['median_sec']} | {results[n]['turns_per_sec']} |")
    print(f"| local[{4 * n}] | {results[4 * n]['median_sec']} | {results[4 * n]['turns_per_sec']} |")
    print(f"\nscaling efficiency = {eff:.3f} ({'PASS' if eff >= 0.8 else 'FAIL'} >= 0.8)")


if __name__ == "__main__":
    main()
