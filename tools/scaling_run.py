"""Scaling-efficiency evidence for the north rule (BASELINE.json):
throughput scaling efficiency >= 0.8 from N to 4N executors.

Sandbox protocol (driver instruction: evidence by running the same job on
the same input at two parallelism levels):

- **Cluster model**: ``local-cluster[N,1,4096]`` — N REAL executor JVMs
  (Spark's multi-executor test mode), not N threads in one JVM. This
  matters: in a single shared JVM all worker threads couple through one
  garbage collector, capping measured scaling at ~0.7 even for pure
  compute; separate executor JVMs (what an actual cluster runs) scale
  cleanly. Calibration data for both models is in BASELINE.md §3.5.
- **Input**: seeded 32M-turn synthetic transcript table, written once,
  bucketed ``CLUSTERED BY (conv_id) SORTED BY (conv_id, turn_idx)``
  (the at-scale Iceberg layout) so the fused pipeline plans ZERO
  exchanges — embarrassingly parallel by construction.
- **Job**: the full fused north-rule pipeline (row-local spec checks +
  vocab referential + duplicate-key + gap-free + monotonic-ts),
  ``noop`` sink.
- **Noise control**: fresh JVMs per config, configs interleaved
  round-robin (N, 4N, N, 4N, ...), one warm-up + several timed runs per
  JVM, per-config MIN across all rounds (the host shows multi-second
  ambient drift; min-of-interleaved is the standard drift-resistant
  estimator).

Usage::

    python tools/scaling_run.py [turns] [rounds] [n]

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
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

n = {n}
spark = (SparkSession.builder.master(f"local-cluster[{{n}},1,4096]")
         .appName(f"scaling-{{n}}x")
         .config("spark.driver.memory", "4g")
         .config("spark.executor.extraJavaOptions",
                 "-XX:+AlwaysPreTouch -XX:+UseParallelGC")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.sql.adaptive.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from json_schema_rs_spark.sources.bucketed import register_bucketed
from json_schema_rs_spark.operators.pipeline import transcript_pipeline
from json_schema_rs_spark.sources.synth import ROLES, TOOLS

tx = register_bucketed(spark, {table_path!r})
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
kw = {{}}
if {protocol}:
    kw = dict(role_protocol=(
        [("system", "user"), ("user", "assistant"), ("assistant", "user"),
         ("assistant", "tool"), ("tool", "assistant"), ("tool", "tool")],
        ["system", "user"]), tool_pairing=True)
pipe = transcript_pipeline(tx, spec, vocabularies={{"tool": TOOLS}}, **kw)
plan = pipe._jdf.queryExecution().executedPlan().toString()
assert plan.count("Exchange") == 0, "bucketed pipeline must be shuffle-free"

times = []
for i in range({timed} + 1):
    t0 = time.perf_counter()
    pipe.write.format("noop").mode("overwrite").save()
    # run 0 = executor launch + codegen warm-up. NOTE: per-executor C2
    # JIT warm-up needs several runs at 4N (64 tasks / 4N executors =
    # few tasks each), so enough timed runs must follow for min() to
    # reach steady state — the bias otherwise penalizes the larger
    # cluster, which a long-running production job never experiences.
    if i >= 1:
        times.append(time.perf_counter() - t0)
print("RESULT " + json.dumps(times))
spark.stop()
"""


def synth_input(turns: int) -> str:
    """Seeded flat parquet + bucketed table files (both written once)."""
    flat = f"/tmp/bench_transcripts_{turns}"
    bucketed = f"/tmp/bench_tx_bucketed_{turns}"
    code = (
        f"import sys, os; sys.path.insert(0, {REPO!r})\n"
        "from pyspark.sql import SparkSession\n"
        "from json_schema_rs_spark.sources.synth import synth_distributed\n"
        "from json_schema_rs_spark.sources.bucketed import write_bucketed\n"
        "spark = (SparkSession.builder.master('local[32]')"
        ".config('spark.ui.enabled','false')"
        ".config('spark.sql.warehouse.dir','/tmp/spark-warehouse')"
        ".config('spark.driver.memory','8g').getOrCreate())\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"if not os.path.exists('{flat}/_SUCCESS'):\n"
        f"    synth_distributed(spark, {turns} // 50, 50, violation_rate=0.02,"
        f" partitions=64).write.mode('overwrite').parquet('{flat}')\n"
        f"if not os.path.exists('{bucketed}/_SUCCESS'):\n"
        f"    write_bucketed(spark, '{flat}', '{bucketed}')\n"
        "spark.stop()\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True,
                   stderr=subprocess.DEVNULL)
    return bucketed


def run_at(n: int, table_path: str, timed: int,
           protocol: bool = False) -> list[float]:
    code = _WORKER.format(repo=REPO, n=n, table_path=table_path, timed=timed,
                          protocol=protocol)
    out = subprocess.run([sys.executable, "-c", code], check=True,
                         capture_output=True, text=True).stdout
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line in worker output: {out[-2000:]}")


def main() -> None:
    # --protocol: scale the pipeline WITH the fused conversation-protocol
    # checks (role DFA + tool pairing) — same zero-Exchange plan
    protocol = "--protocol" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--protocol"]
    turns = int(args[0]) if len(args) > 0 else 32_000_000
    rounds = int(args[1]) if len(args) > 1 else 2
    n = int(args[2]) if len(args) > 2 else 4  # cluster sizes N, 4N
    table_path = synth_input(turns)
    all_times: dict[int, list[float]] = {n: [], 4 * n: []}
    for r in range(rounds):
        for execs in (n, 4 * n):
            times = run_at(execs, table_path, timed=6, protocol=protocol)
            all_times[execs].extend(times)
            print(f"round {r} local-cluster[{execs}]: "
                  f"{[round(t, 2) for t in times]}", flush=True)
    results = {}
    for execs, times in all_times.items():
        best = min(times)
        results[execs] = {
            "times_sec": [round(t, 2) for t in times],
            "best_sec": round(best, 2),
            "median_sec": round(statistics.median(times), 2),
            "turns_per_sec": round(turns / best, 1),
        }
    eff = (results[4 * n]["turns_per_sec"] / (4 * results[n]["turns_per_sec"]))
    summary = {
        "turns": turns,
        "rounds": rounds,
        "n_executors": n,
        "cluster_model": "local-cluster[N,1,4096] (separate executor JVMs)",
        "input": "bucketed by conv_id (zero-Exchange pipeline)",
        "protocol_checks": protocol,
        f"executors_{n}": results[n],
        f"executors_{4 * n}": results[4 * n],
        "scaling_efficiency_n_to_4n": round(eff, 3),
        "pass_ge_0.8": eff >= 0.8,
    }
    fname = ("scaling_result_protocol.json" if protocol
             else "scaling_result.json")
    with open(os.path.join(REPO, "tools", fname), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    print("\n| config | best sec | turns/sec |")
    print("|---|---|---|")
    print(f"| local-cluster[{n}] | {results[n]['best_sec']} | {results[n]['turns_per_sec']} |")
    print(f"| local-cluster[{4 * n}] | {results[4 * n]['best_sec']} | {results[4 * n]['turns_per_sec']} |")
    print(f"\nscaling efficiency = {eff:.3f} ({'PASS' if eff >= 0.8 else 'FAIL'} >= 0.8)")


if __name__ == "__main__":
    main()
