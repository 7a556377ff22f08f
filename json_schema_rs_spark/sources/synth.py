"""Deterministic synthetic transcript tables (FIXTURES.md F1-F3).

Shape per BASELINE.json ``input_hint``::

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

Everything is seeded and wall-clock-free: the same (seed, n_conversations,
...) always produces byte-identical rows, so correctness goldens and
benchmarks are reproducible. Violations are injected with per-kind flags so
tests know exactly what to expect.

Scale note: generation is driver-side pandas for test scales (<=10M rows)
— at real scale the table comes from Iceberg, not this module. A
distributed variant (``synth_distributed``) builds the same rows via
``spark.range`` + expressions for benchmark inputs so generation itself
scales with cores.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ["system", "user", "assistant", "tool"]
TOOLS = ["search", "calculator", "code_exec", "browser"]

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu héllo wörld 🙂 données"
).split()

_BASE_TS = datetime(2026, 1, 1, 0, 0, 0, tzinfo=timezone.utc)

TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, "
                     "text string, tool string, ts timestamp")


def synth_transcripts_pandas(
    n_conversations: int = 100,
    turns_per_conv: int = 10,
    *,
    seed: int = 42,
    skew_hot_fraction: float = 0.0,
    skew_hot_conversations: int = 3,
    violation_rate: float = 0.0,
) -> pd.DataFrame:
    """Seeded generator. ``skew_hot_fraction`` moves that fraction of all
    turns into ``skew_hot_conversations`` hot conversations (the north_rule
    skew knob). ``violation_rate`` injects, per affected turn, one of:
    out-of-vocab role, too-long text, pattern-missing conv reference, null
    text, unknown tool, tool set on role=user.
    """
    rng = random.Random(seed)
    rows: list[tuple] = []
    total_turns = n_conversations * turns_per_conv
    hot_turns = int(total_turns * skew_hot_fraction)

    def make_text(rng: random.Random) -> str:
        n = rng.randint(1, 40)
        return " ".join(rng.choice(_WORDS) for _ in range(n))

    def conv_rows(conv_id: str, n_turns: int) -> None:
        for turn_idx in range(n_turns):
            role = ROLES[turn_idx % 4] if turn_idx > 0 else "system"
            tool = rng.choice(TOOLS) if role == "tool" else None
            text = make_text(rng)
            ts = _BASE_TS + timedelta(minutes=turn_idx)
            if violation_rate > 0 and rng.random() < violation_rate:
                kind = rng.randrange(6)
                if kind == 0:
                    role = "narrator"                      # enum violation
                elif kind == 1:
                    text = "x" * 4001                      # TooLong
                elif kind == 2:
                    text = ""                              # TooShort (minLength 1)
                elif kind == 3:
                    text = None                            # MissingRequired
                elif kind == 4:
                    tool = "teleport"                      # tool vocab violation
                else:
                    role, tool = "user", rng.choice(TOOLS)  # tool on user
            rows.append((conv_id, turn_idx, role, text, tool,
                         ts.replace(tzinfo=None)))

    n_hot = min(skew_hot_conversations, n_conversations) if hot_turns else 0
    for i in range(n_hot):
        conv_rows(f"conv_{i:08d}", hot_turns // max(n_hot, 1))
    for i in range(n_hot, n_conversations):
        conv_rows(f"conv_{i:08d}", turns_per_conv)

    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])


def synth_transcripts(spark: SparkSession, **kwargs) -> DataFrame:
    pdf = synth_transcripts_pandas(**kwargs)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


def synth_distributed(
    spark: SparkSession,
    n_conversations: int,
    turns_per_conv: int,
    *,
    seed: int = 42,
    violation_rate: float = 0.02,
    partitions: int = 32,
) -> DataFrame:
    """Benchmark-scale generator: pure ``spark.range`` + expressions, no
    driver materialization, no Python in the row path. Deterministic in
    (seed, shape) via xxhash64-keyed pseudo-randomness. Injects the same
    violation kinds as the pandas generator (different draw, same rates).
    """
    total = n_conversations * turns_per_conv
    df = spark.range(0, total, 1, partitions)
    conv = (F.col("id") / turns_per_conv).cast("long")
    turn = (F.col("id") % turns_per_conv).cast("int")
    h = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    word = F.element_at(F.lit(_WORDS).cast("array<string>"),
                        (h % len(_WORDS) + 1).cast("int"))
    text = F.concat_ws(" ", word, word, F.conv(h.cast("string"), 10, 16))
    role = (F.when(turn == 0, "system")
             .otherwise(F.element_at(F.lit(ROLES).cast("array<string>"),
                                     (turn % 4 + 1).cast("int"))))
    tool = F.when(role == "tool",
                  F.element_at(F.lit(TOOLS).cast("array<string>"),
                               (h % len(TOOLS) + 1).cast("int")))
    ts = F.to_timestamp(F.lit("2026-01-01 00:00:00")) + \
        F.make_interval(mins=turn)
    # violation injection: deterministic per-row draw
    draw = (h % 1_000_000) / 1_000_000.0
    kind = h % 4
    inject = draw < F.lit(violation_rate)
    role = F.when(inject & (kind == 0), "narrator").otherwise(role)
    text = (F.when(inject & (kind == 1), F.concat(F.lit("x"), F.repeat(F.lit("y"), 4000)))
             .when(inject & (kind == 2), "")
             .when(inject & (kind == 3), F.lit(None).cast("string"))
             .otherwise(text))
    return df.select(
        F.format_string("conv_%08d", conv).alias("conv_id"),
        turn.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def vocab_df(spark: SparkSession, name: str) -> DataFrame:
    values = ROLES if name == "roles" else TOOLS
    col = "role" if name == "roles" else "tool"
    from ..functions.exprs import arrow_local_df
    return arrow_local_df(spark, [(v,) for v in values], f"{col} string")
