"""Differential fuzz of the ECMA-262 regex translator
(`functions/ecma_regex.py`): random patterns from a generative ECMA
grammar + random probe texts; wherever ``translate()`` yields BOTH a
Java and a Python translation, ``java find == python search`` is
asserted — two independently derived backends agreeing is the oracle,
the same philosophy as the compiler/pyvalidator differential (the
reference anchor is the single from-scratch ECMA parser both
translations share, `ecma_regex.py:1-801`).

Findings classify as:
- ``compile``: a produced translation does not compile in its target
  engine (broken emission);
- ``verdict``: the two translations disagree on find/search for a text
  (semantic divergence — exactly the bug class that would silently make
  the vectorized rlike path disagree with the pandas/pyvalidator twin).

Usage:
    python tools/regex_fuzz.py [--seed N] [--patterns N] [--texts N]

Exit 1 on any finding; each finding prints a minimal reproducer tuple.
A seeded CI slice runs in tests/test_regex_fuzz.py.
"""

from __future__ import annotations

import argparse
import random
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from json_schema_rs_spark.functions.ecma_regex import (  # noqa: E402
    PY_FLAGS, translate)

# generation alphabet: ASCII letters/digits, specials that exercise the
# escaping paths, a BMP accent, and an astral emoji (UTF-16 surrogate
# pair on the Java side — the classic divergence hazard)
_LITERALS = list("abcz019 _-") + ["é", "\U0001F600"]
_CLASS_ESCAPES = ["\\d", "\\D", "\\w", "\\W", "\\s", "\\S"]
_ESCAPED_SPECIALS = ["\\.", "\\+", "\\*", "\\?", "\\(", "\\)", "\\[",
                     "\\]", "\\{", "\\}", "\\|", "\\^", "\\$", "\\\\",
                     "\\/", "\\n", "\\t"]


def _rand_class(rng: random.Random) -> str:
    body = []
    for _ in range(rng.randint(1, 3)):
        kind = rng.random()
        if kind < 0.45:
            body.append(rng.choice("abcz019_ -"))
        elif kind < 0.7:
            lo, hi = sorted(rng.sample("abcdwxyz", 2))
            body.append(f"{lo}-{hi}")
        else:
            body.append(rng.choice(_CLASS_ESCAPES))
    neg = "^" if rng.random() < 0.25 else ""
    return "[" + neg + "".join(body) + "]"


def _rand_atom(rng: random.Random, depth: int, groups: int) -> tuple[str, int]:
    """Returns (atom, n_new_capture_groups)."""
    r = rng.random()
    if depth > 2:
        r = min(r, 0.59)  # no recursion past depth 2
    if r < 0.30:
        return rng.choice(_LITERALS), 0
    if r < 0.40:
        return rng.choice(_ESCAPED_SPECIALS), 0
    if r < 0.50:
        return rng.choice(_CLASS_ESCAPES), 0
    if r < 0.57:
        return _rand_class(rng), 0
    if r < 0.60:
        return ".", 0
    if r < 0.70:
        inner, g = _rand_seq(rng, depth + 1, groups)
        return f"(?:{inner})", g
    if r < 0.80:
        inner, g = _rand_seq(rng, depth + 1, groups)
        return f"({inner})", g + 1
    if r < 0.86:
        inner, g = _rand_seq(rng, depth + 1, groups)
        op = rng.choice(["?=", "?!"])
        return f"({op}{inner})", g
    if r < 0.90 and groups > 0:
        return f"\\{rng.randint(1, groups)}", 0
    if r < 0.95:
        # fixed-width lookbehind (the supported subset)
        lit = "".join(rng.choice("abc") for _ in range(rng.randint(1, 2)))
        op = rng.choice(["?<=", "?<!"])
        return f"({op}{lit})", 0
    return rng.choice(["^", "$", "\\b", "\\B"]), 0


def _rand_quant(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.55:
        return ""
    if r < 0.70:
        q = rng.choice(["*", "+", "?"])
    elif r < 0.80:
        q = "{%d}" % rng.randint(0, 3)
    else:
        m = rng.randint(0, 2)
        q = "{%d,%d}" % (m, m + rng.randint(0, 2))
    return q + ("?" if rng.random() < 0.25 else "")


def _rand_seq(rng: random.Random, depth: int, groups: int) -> tuple[str, int]:
    parts = []
    new_groups = 0
    for _ in range(rng.randint(1, 4)):
        atom, g = _rand_atom(rng, depth, groups + new_groups)
        new_groups += g
        quant = _rand_quant(rng)
        # a quantifier on an anchor/lookaround is valid ECMA only under
        # Annex B for some shapes; keep generation simple and legal by
        # never quantifying zero-width atoms
        if atom in ("^", "$", "\\b", "\\B") or atom.startswith("(?=") \
                or atom.startswith("(?!") or atom.startswith("(?<"):
            quant = ""
        parts.append(atom + quant)
    return "".join(parts), new_groups


def rand_pattern(rng: random.Random) -> str:
    alts = [_rand_seq(rng, 0, 0)[0] for _ in range(rng.randint(1, 3))]
    return "|".join(alts)


_TEXT_ALPHABET = list("aabbccz 019_-") + ["é", "\U0001F600", "\n",
                                          "\t", "."]


def rand_text(rng: random.Random) -> str:
    return "".join(rng.choice(_TEXT_ALPHABET)
                   for _ in range(rng.randint(0, 8)))


def sweep(jpattern, rng: random.Random, n_patterns: int,
          n_texts: int) -> tuple[list, dict]:
    """Returns (findings, stats). ``jpattern`` is the JVM
    java.util.regex.Pattern class (spark._jvm.java.util.regex.Pattern).
    """
    findings = []
    stats = {"patterns": 0, "invalid": 0, "python_only": 0,
             "java_only": 0, "both": 0, "checks": 0}
    for _ in range(n_patterns):
        pat = rand_pattern(rng)
        stats["patterns"] += 1
        t = translate(pat)
        if not t.valid:
            stats["invalid"] += 1
            continue
        if t.java is None and t.python is None:
            # valid-but-untranslatable is a DOCUMENTED loud path
            # (UnsupportedPatternError at plan time): unset-group
            # backrefs and variable lookbehind land here by design.
            # Count it — a growing share would flag a coverage gap like
            # the \S-union one this tool found — but it is not a
            # divergence finding.
            stats["untranslatable"] = stats.get("untranslatable", 0) + 1
            continue
        if t.java is None:
            stats["python_only"] += 1
        if t.python is None:
            stats["java_only"] += 1
        jm = pyrx = None
        if t.java is not None:
            try:
                jm = jpattern.compile(t.java)
            except Exception as exc:  # noqa: BLE001
                findings.append(("compile-java", pat, t.java, None,
                                 repr(exc)[:160]))
                continue
        if t.python is not None:
            try:
                pyrx = re.compile(t.python, PY_FLAGS)
            except re.error as exc:
                findings.append(("compile-python", pat, t.python, None,
                                 repr(exc)[:160]))
                continue
        if jm is None or pyrx is None:
            continue
        stats["both"] += 1
        # probe texts stay SHORT (<= 8 chars): nested generated
        # quantifiers + backrefs can backtrack exponentially in BOTH
        # engines, and neither re.search nor java.util.regex takes a
        # timeout — a long text (an earlier version probed the pattern
        # string itself) turns one unlucky pattern into a wedged sweep
        texts = [rand_text(rng) for _ in range(n_texts)] + ["", "a"]
        for text in texts:
            stats["checks"] += 1
            jgot = bool(jm.matcher(text).find())
            pgot = pyrx.search(text) is not None
            if jgot != pgot:
                findings.append(("verdict", pat, t.java, t.python,
                                 f"text={text!r} java={jgot} py={pgot}"))
                break
    return findings, stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--patterns", type=int, default=500)
    ap.add_argument("--texts", type=int, default=25)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[1]")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    rng = random.Random(args.seed)
    findings, stats = sweep(spark._jvm.java.util.regex.Pattern, rng,
                            args.patterns, args.texts)
    print("stats:", stats)
    for f in findings:
        print("FINDING:", f)
    spark.stop()
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
