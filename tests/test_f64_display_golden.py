"""Golden test bounding the JDK-vs-Rust f64 Display divergence.

``fmt_f64_col`` (the typed/codegen message path) renders doubles via the
JVM's double->string cast; Rust ``Display`` (and the byte-exact pandas
path via ``formatting.fmt_f64``) uses shortest-round-trip digits. JDK 17
still ships the pre-Ryu algorithm (fixed in JDK 19, JDK-4511638), which
for a small set of doubles emits MORE significand digits than the
shortest form. This test pins that residual set exactly:

- a deterministic ~6k-value candidate corpus (binade boundaries, decimal
  boundary families, 9-digit mantissas, seeded random bit patterns) is
  rendered through the real Spark expression;
- every divergence must (a) round-trip to the identical double — digits
  differ, value never does; (b) lie OUTSIDE the human-bounds magnitude
  envelope [1e-7, 2^53) — schema bounds in that range render
  byte-identically on both paths; (c) be exactly the frozen golden set
  below — a JVM upgrade that fixes (or worsens) the rendering fails this
  test loudly instead of silently shifting message bytes.

Checks needing byte-exact messages for out-of-envelope bounds should use
the pandas path (``plans/pyvalidator.py``), which routes through
``formatting.fmt_f64`` and has no divergence by construction.
"""

import math
import random
import struct

from pyspark.sql import functions as F

from json_schema_rs_spark.functions.exprs import fmt_f64_col
from json_schema_rs_spark.functions.formatting import fmt_f64

# bit patterns (IEEE754 binary64) of every candidate the JDK renders with
# non-shortest digits — discovered by this very generator on JDK 17
GOLDEN_DIVERGENT_BITS = frozenset(int(s, 16) for s in [
    "0x3b10000000000000", "0x3b20000000000000", "0x3b70000000000000",
    "0x3b80000000000000", "0x3c10000000000000", "0x3c20000000000000",
    "0x3d20000000000000", "0x3d30000000000000", "0x3e00000000000000",
    "0x3e70000000000000", "0x4350ab061059ea28", "0x4360000000000000",
    "0x4368000000000000", "0x4370000000000000", "0x4378000000000000",
    "0x4380000000000000", "0x4388000000000000", "0x4398000000000000",
    "0x43a0000000000000", "0x43a8000000000000", "0x43ad3d62b17cfb21",
    "0x43b0000000000000", "0x43b409ef2260e70f", "0x43b47ee5e1e89e7e",
    "0x43b7a3a69a8dca03", "0x43b8000000000000", "0x43b9da13ec856f37",
    "0x43bfd9313605bf54", "0x43c8000000000000", "0x43d0000000000000",
    "0x43d8000000000000", "0x43d88870f81dbaa1", "0x43e080f37817fea4",
    "0x43e158e46046bb84", "0x43f0c1ddd4d2b6bc", "0x43f615934ded662e",
    "0x43f8c6c33a04800a", "0x43f9cd4a2daf5d64", "0x43fd0d800f97651e",
    "0x43fee25fe8a9301c", "0x4403953bc081ebea", "0x44044beab277fcea",
    "0x44062c74fef88a1e", "0x440915acd7e6d840", "0x440ad4fb31c67040",
    "0x440deeb65411d92e", "0x440e8958d302789a", "0x44116faeaa965ce0",
    "0x441a05912499828e", "0x4440000000000000", "0x444eb3cd17b98cce",
    "0x4484d64651fe74c6", "0x44ada56a4b0835c0", "0x44b52d02c7e14af6",
    "0x44c52d02c7e14af6", "0xc362a810a2611b8d", "0xc36b9a0a41e02a89",
    "0xc37459eef50bea63", "0xc3a00c6f2321d1e1",
])

# byte-parity envelope: no divergence observed for 1e-7 <= |x| < 2^53
SAFE_LO, SAFE_HI = 1e-7, 2.0**53


def _bits(v: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", v))[0]


def _candidates() -> list:
    cands = set()
    for n in range(-80, 81):
        cands.add(2.0**n)
        cands.add(2.0**n * 1.5)
    for e in range(-30, 31):
        for m in (1, 2, 3, 7, 9, 11, 123, 999, 123456789, 999999999):
            try:
                cands.add(float(f"{m}e{e}"))
            except OverflowError:
                pass
    rng = random.Random(42)
    for _ in range(3000):
        v = struct.unpack("<d", struct.pack("<Q", rng.getrandbits(64)))[0]
        if not math.isnan(v) and not math.isinf(v):
            cands.add(v)
    for _ in range(2000):
        m = rng.randrange(100_000_000, 1_000_000_000)
        e = rng.randrange(-20, 20)
        try:
            cands.add(float(f"{m}e{e}"))
        except OverflowError:
            pass
    return sorted(cands)


def test_f64_display_divergence_is_pinned(spark):
    vals = _candidates()
    assert len(vals) > 5000
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rendered = df.select("x", fmt_f64_col(F.col("x")).alias("s")).collect()
    divergent = {}
    for r in rendered:
        expected = fmt_f64(r["x"])
        if r["s"] != expected:
            divergent[_bits(r["x"])] = (r["x"], r["s"])
    # (c) exactly the frozen set — no silent growth, no silent fix
    assert set(divergent) == GOLDEN_DIVERGENT_BITS, (
        f"divergence set changed: +{sorted(hex(b) for b in set(divergent) - GOLDEN_DIVERGENT_BITS)} "
        f"-{sorted(hex(b) for b in GOLDEN_DIVERGENT_BITS - set(divergent))}")
    for v, s in divergent.values():
        # (a) digits-only: the rendered text parses back to the same double
        assert float(s) == v, (v, s)
        # (b) outside the human-bounds envelope
        assert not (SAFE_LO <= abs(v) < SAFE_HI), (v, s)


def test_f64_display_exact_inside_envelope(spark):
    """Dense check inside the envelope: every rendering byte-matches the
    Rust-Display twin (this is the range real schema bounds live in)."""
    rng = random.Random(7)
    vals = set()
    for _ in range(2000):
        # uniformly spread exponents across the envelope
        e = rng.randrange(-6, 15)
        vals.add(rng.random() * 10.0**e)
        vals.add(float(rng.randrange(-10**15, 10**15)))
    vals = sorted(v for v in vals if v == 0 or SAFE_LO <= abs(v) < SAFE_HI)
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = df.select("x", fmt_f64_col(F.col("x")).alias("s")).collect()
    bad = [(r["x"], r["s"], fmt_f64(r["x"]))
           for r in out if r["s"] != fmt_f64(r["x"])]
    assert not bad, bad[:5]
