"""Differential fuzzing: the two engines (vectorized compiler, Python
interpreter) must agree BYTE-FOR-BYTE on randomized specs and rows.

The generated suite (tests/suite_gen.py) encodes the author's expectations
— and therefore shares the author's blind spots. This layer removes the
author from the loop: specs and rows are drawn from a seeded random
generator, and the ORACLE IS AGREEMENT — every (instance_path, code,
message) triple the compiler emits for a row must equal what the
interpreter emits for the same instance, across keyword combinations and
value shapes nobody hand-picked. (The interpreter itself is validated
against first-principles verdicts by the suite harness; two independent
implementations agreeing on random inputs is the strongest cross-check
available without the official suite corpus.)

Also here: a cross-DIALECT regex check — for each translatable pattern,
the Java translation (executed by the JVM via ``rlike``) and the Python
translation (``re`` with PY_FLAGS) must agree row-by-row on random
probe strings. The two translations come from one audit of the same
ECMA pattern, so disagreement means a dialect-semantics bug.

Determinism: fixed seeds; everything reruns identically.
"""

import math
import random
import string as _string

import pytest
from pyspark.sql import functions as F

from json_schema_rs_spark import ValidationEngine
from json_schema_rs_spark.plans.pyvalidator import validate
from json_schema_rs_spark.plans.spec import parse_spec

# -- random spec / row generation -------------------------------------------

_PATTERNS = ["^a", "b$", "[a-z]+", "\\d{2}", "x|y", "a{2,3}", "\\w+$",
             "^[0-9a-f]+$"]
_STR_POOL = ["", "a", "ab", "abc", "hello", "xyzzy", "b7", "42", "aa",
             "é", "\U0001F600", "x" * 20, "line1 line2", "UPPER"]
_ENUM_POOL = ["red", "green", "blue", "", "a"]


def _rand_string_schema(rng):
    s = {"type": "string"}
    if rng.random() < 0.5:
        s["minLength"] = rng.randrange(0, 4)
    if rng.random() < 0.5:
        s["maxLength"] = rng.randrange(2, 8)
    r = rng.random()
    if r < 0.15:
        s["pattern"] = rng.choice(_PATTERNS)
    elif r < 0.25:
        # a random grammar draw, end-to-end through the validator (the
        # engines use DIFFERENT translations: compiler -> Java rlike,
        # interpreter -> Python re); keep only dual-dialect patterns
        from json_schema_rs_spark.functions.ecma_regex import translate
        for _ in range(10):
            p = _rand_pattern(rng, depth=1)
            t = translate(p)
            if t.valid and t.java and t.python:
                s["pattern"] = p
                break
    elif r < 0.4:
        s["enum"] = rng.sample(_ENUM_POOL, rng.randrange(1, 4))
    elif r < 0.5:
        s["const"] = rng.choice(_STR_POOL)
    return s


def _rand_int_schema(rng):
    s = {"type": "integer"}
    if rng.random() < 0.7:
        s["minimum"] = rng.randrange(-10, 5)
    if rng.random() < 0.7:
        s["maximum"] = rng.randrange(0, 15)
    return s


def _rand_num_schema(rng):
    s = {"type": "number"}
    if rng.random() < 0.7:
        s["minimum"] = round(rng.uniform(-5, 2), 2)
    if rng.random() < 0.7:
        s["maximum"] = round(rng.uniform(0, 8), 2)
    return s


def _rand_arr_schema(rng):
    s = {"type": "array"}
    if rng.random() < 0.5:
        s["minItems"] = rng.randrange(0, 3)
    if rng.random() < 0.5:
        s["maxItems"] = rng.randrange(2, 5)
    if rng.random() < 0.4:
        s["uniqueItems"] = True
    if rng.random() < 0.4:
        s["items"] = {"type": "integer", "minimum": 0, "maximum": 50}
    return s


def _rand_spec(rng):
    props = {"s": _rand_string_schema(rng), "i": _rand_int_schema(rng),
             "x": _rand_num_schema(rng), "a": _rand_arr_schema(rng)}
    defs = {}
    # random combinator wrap on one scalar property
    if rng.random() < 0.4:
        tgt = rng.choice(["s", "i", "x"])
        other = dict(props[tgt])
        comb = rng.choice(["anyOf", "oneOf", "allOf"])
        props[tgt] = {comb: [props[tgt],
                             {"type": other["type"],
                              **({"minLength": 1} if tgt == "s"
                                 else {"minimum": 0})}]}
    # random $ref indirection (possibly chained) on another property
    if rng.random() < 0.4:
        tgt = rng.choice(["s", "i", "x", "a"])
        defs["leaf"] = props[tgt]
        hops = rng.randrange(1, 3)
        prev = "leaf"
        for h in range(hops):
            defs[f"hop{h}"] = {"$ref": f"#/$defs/{prev}"}
            prev = f"hop{h}"
        props[tgt] = {"$ref": f"#/$defs/{prev}"}
    spec = {"type": "object", "properties": props}
    if defs:
        spec["$defs"] = defs
    req = [c for c in ("s", "i", "x", "a") if rng.random() < 0.3]
    if req:
        spec["required"] = req
    # random additionalProperties: drop one property from the schema so
    # its (still-present) column becomes a genuinely additional key; the
    # harness key column is declared so AP sees only instance keys
    r = rng.random()
    droppable = [c for c in ("s", "i", "x", "a")
                 if c not in (spec.get("required") or ())]
    if r < 0.3 and droppable:  # all-required specs have nothing to drop
        undeclared = rng.choice(droppable)
        pruned = {k: v for k, v in props.items() if k != undeclared}
        spec["properties"] = {**pruned, "_cid": {}}
        spec["additionalProperties"] = (
            False if r < 0.15 else {"type": "integer"})
    return spec


def _rand_row(rng):
    def s():
        return rng.choice(_STR_POOL + [None])
    def i():
        return rng.choice([None, 0, 1, -1, 3, 7, 12, -11, 50])
    def x():
        return rng.choice([None, 0.0, -0.5, 1.25, 3.75, 7.5, -5.25, 100.0])
    def a():
        if rng.random() < 0.2:
            return None
        n = rng.randrange(0, 5)
        return [rng.choice([0, 1, 2, 7, 51, -3]) for _ in range(n)]
    return (s(), i(), x(), a())


DDL = "_cid bigint, s string, i bigint, x double, a array<bigint>"
N_SPECS = 12
N_ROWS = 200


def _cases():
    rng = random.Random(20260817)
    return [( _rand_spec(rng),
              [_rand_row(rng) for _ in range(N_ROWS)]) for _ in range(N_SPECS)]


@pytest.mark.parametrize("case_idx", range(N_SPECS))
def test_compiler_interpreter_agree_on_random_specs(spark, case_idx):
    spec, rows = _cases()[case_idx]
    df = spark.createDataFrame(
        [tuple([cid] + list(r)) for cid, r in enumerate(rows)], DDL)
    eng = ValidationEngine(spec, key_cols=("_cid",))
    got = {cid: set() for cid in range(len(rows))}
    for r in eng.validate(df).violations.collect():
        got[r._cid].add((r.instance_path, r.code, r.message))
    root = parse_spec(spec)
    names = ("s", "i", "x", "a")
    mismatches = []
    for cid, row in enumerate(rows):
        data = {n: v for n, v in zip(names, row) if v is not None}
        exp = {(v.path, v.code, v.message) for v in validate(root, data)}
        if got[cid] != exp:
            mismatches.append((cid, data, sorted(got[cid]), sorted(exp)))
    assert not mismatches, (
        f"spec #{case_idx} {spec}: {len(mismatches)} disagreeing rows; "
        f"first: {mismatches[0]}")


_RX_CLASSES = ["[a-z]", "[0-9]", "[^a-c]", "[xyz]", "[\\d]", "[\\w]",
               "[a-z0-9]"]
_RX_CLASS_MEMBERS = ["a", "b", "z", "0", "9", "_", "-", "^", "]", "\\]",
                     "\\d", "\\w", "\\s", "\\W", "\\S", "\\t", "\\x41",
                     "\\-", "a-f", "0-5", "x-z", "\\d-x", "%", ".", "*",
                     "$", "(", ")"]


def _rand_class(rng):
    """Random character class incl. Annex B shapes (leading/trailing
    dashes, class escapes adjacent to ranges, ] escapes, metachars)."""
    body = "".join(rng.choice(_RX_CLASS_MEMBERS)
                   for _ in range(rng.randrange(1, 5)))
    return "[" + ("^" if rng.random() < 0.3 else "") + body + "]"
_RX_ESCAPES = ["\\d", "\\w", "\\s", "\\D", "\\W", "\\S", "\\t", "\\n",
               "\\x41", "\\u0062", "\\.", "\\*", "\\$"]
_RX_QUANTS = ["", "*", "+", "?", "{2}", "{1,3}", "{2,}", "*?", "+?"]


def _rand_pattern(rng, depth=2):
    """Random valid-ECMA pattern from a constrained grammar (literals,
    classes, escapes, groups, lookarounds, quantifiers, alternation,
    anchors) — the generator that found the Java empty-iteration
    divergence (see functions/ecma_regex.py `_quantifier`)."""
    def atom(d):
        r = rng.random()
        if r < 0.35:
            return rng.choice("abcxyz019_")
        if r < 0.5:
            return (_rand_class(rng) if rng.random() < 0.5
                    else rng.choice(_RX_CLASSES))
        if r < 0.65:
            return rng.choice(_RX_ESCAPES)
        if r < 0.75:
            return "."
        if d <= 0:
            return rng.choice("abc")
        inner = seq(d - 1)
        k = rng.random()
        if k < 0.5:
            return f"({inner})"
        if k < 0.8:
            return f"(?:{inner})"
        return f"(?={inner})" if k < 0.9 else f"(?!{inner})"

    def seq(d):
        parts = []
        for _ in range(rng.randrange(1, 5)):
            a = atom(d)
            q = "" if a.startswith(("(?=", "(?!")) else rng.choice(_RX_QUANTS)
            parts.append(a + q)
        s = "".join(parts)
        if rng.random() < 0.3:
            s = s + "|" + seq(max(d - 1, 0))
        if rng.random() < 0.2:
            s = "^" + s
        if rng.random() < 0.2:
            s = s + "$"
        return s

    return seq(depth)


def test_java_and_python_regex_translations_agree(spark):
    """One Spark job: every (pattern, probe) pair evaluated by the JVM
    through the Java translation must match Python ``re`` through the
    Python translation — the audited ECMA semantics must survive BOTH
    dialect translations identically. Patterns = the hand-picked
    divergence-table pool + seeded random grammar draws."""
    import re
    from json_schema_rs_spark.functions.ecma_regex import (
        PY_FLAGS,
        translate,
    )

    rng = random.Random(777)
    alphabet = _string.ascii_lowercase + _string.digits + " \n\t|{}[]-^$é"
    probes = [""] + ["".join(rng.choice(alphabet)
                             for _ in range(rng.randrange(1, 12)))
                     for _ in range(120)]
    pats = _PATTERNS + ["a{,3}", "\\s", "[\\d-x]", "(ab)\\1", "a(?=b)",
                        "a(?!b)", "\\bfoo\\b", "[^]", "x|", "\\q", "\\101"]
    seen = set(pats)
    target = len(pats) + 150
    while len(pats) < target:
        p = _rand_pattern(rng)
        t = translate(p)
        if p not in seen and t.valid and t.java and t.python:
            seen.add(p)
            pats.append(p)
    import signal

    def _bail(signum, frame):
        raise TimeoutError

    signal.signal(signal.SIGALRM, _bail)
    rows, metas = [], []
    for p in pats:
        tx = translate(p)
        assert tx.valid, p
        if tx.java is None:        # pandas-fallback-only patterns: no Java twin
            continue
        cre = re.compile(tx.python, PY_FLAGS)
        staged_r, staged_m = [], []
        try:
            # pathological generated patterns can backtrack exponentially
            # in the Python engine — a property of the pattern, not a
            # dialect question; skip such patterns wholesale
            signal.setitimer(signal.ITIMER_REAL, 2.0)
            for s in probes:
                staged_r.append((len(metas) + len(staged_m), s, tx.java))
                staged_m.append((p, s, bool(cre.search(s))))
        except TimeoutError:
            continue
        finally:
            signal.setitimer(signal.ITIMER_REAL, 0)
        rows.extend(staged_r)
        metas.extend(staged_m)
    df = spark.createDataFrame(rows, "rid bigint, s string, j string")
    got = {r.rid: r.m for r in df.select(
        "rid", F.expr("s rlike j").alias("m")).collect()}
    bad = [(metas[rid][0], metas[rid][1], got[rid], metas[rid][2])
           for rid in got if got[rid] != metas[rid][2]]
    assert not bad, f"{len(bad)} dialect disagreements; first 5: {bad[:5]}"


# -- extension-keyword fuzz (extensions=True in BOTH engines) ----------------

_EXT_STR_POOL = _STR_POOL + [
    "2024-02-29", "2023-02-29", "2024-13-01", "2024-01-01T00:00:00Z",
    "2024-01-01T23:59:60Z", "1.2.3.4", "01.2.3.4", "256.1.1.1", "::1",
    "1::2::3", "a@b", "/a/~0b", "/a~", "2024-01-01", "10.0.0.999"]


def _rand_ext_string_schema(rng):
    s = {"type": "string"}
    r = rng.random()
    if r < 0.4:
        s["format"] = rng.choice(["date", "date-time", "ipv4", "ipv6",
                                  "email", "json-pointer"])
    elif r < 0.6:
        s["not"] = {"type": "string",
                    "minLength": rng.randrange(1, 4)}
    if rng.random() < 0.3:
        s["minLength"] = rng.randrange(0, 3)
    return s


def _rand_ext_num_schema(rng):
    s = {"type": "number"}
    if rng.random() < 0.5:
        s["exclusiveMinimum"] = round(rng.uniform(-5, 2), 2)
    if rng.random() < 0.5:
        s["exclusiveMaximum"] = round(rng.uniform(0, 8), 2)
    if rng.random() < 0.6:
        s["multipleOf"] = rng.choice([0.1, 0.25, 0.5, 1, 2.5, 3])
    return s


def _rand_ext_arr_schema(rng):
    s = {"type": "array"}
    if rng.random() < 0.6:
        s["contains"] = {"type": "integer",
                         "minimum": rng.randrange(0, 8)}
        if rng.random() < 0.5:
            s["minContains"] = rng.randrange(0, 3)
        if rng.random() < 0.5:
            s["maxContains"] = rng.randrange(1, 4)
    if rng.random() < 0.5:
        s["prefixItems"] = [{"type": "integer",
                             "maximum": rng.randrange(2, 9)}]
    r = rng.random()
    if r < 0.35:
        s["unevaluatedItems"] = rng.choice(
            [False, {"type": "integer", "maximum": 40}])
    elif r < 0.6:
        s["items"] = {"type": "integer", "minimum": 0}
    return s


def _rand_ext_spec(rng):
    props = {"s": _rand_ext_string_schema(rng), "i": _rand_int_schema(rng),
             "x": _rand_ext_num_schema(rng), "a": _rand_ext_arr_schema(rng)}
    spec = {"type": "object", "properties": props}
    r = rng.random()
    if r < 0.3:
        # unevaluatedProperties with a conditionally-evaluated key: `a`
        # leaves `properties` and is only evaluated through `then`
        spec["properties"] = {k: v for k, v in props.items() if k != "a"}
        spec["properties"]["_cid"] = {}
        spec["if"] = {"properties": {"s": {"type": "string",
                                           "minLength": 1}},
                      "required": ["s"]}
        spec["then"] = {"properties": {"a": {}}}
        spec["unevaluatedProperties"] = rng.choice(
            [False, {"type": "array"}])
    elif r < 0.6:
        spec["if"] = {"properties": {"i": {"type": "integer",
                                           "minimum": 0}},
                      "required": ["i"]}
        spec["then"] = {"required": ["x"]}
        if rng.random() < 0.5:
            spec["else"] = {"properties": {"x": {"type": "number",
                                                 "maximum": 3}}}
    if rng.random() < 0.3:
        spec["dependentRequired"] = {"i": ["x"]}
    if rng.random() < 0.3:
        spec["dependentSchemas"] = {"a": {"properties": {
            "i": {"type": "integer", "minimum": 0}}}}
    if rng.random() < 0.25:
        spec["patternProperties"] = {"^s": {"type": "string",
                                            "maxLength": 15}}
    return spec


def _rand_ext_row(rng):
    def s():
        return rng.choice(_EXT_STR_POOL + [None])
    def i():
        return rng.choice([None, 0, 1, -1, 3, 7, 12, -11, 50])
    def x():
        return rng.choice([None, 0.0, -0.5, 1.25, 3.75, 7.5, -5.25,
                           100.0, 90.0, 0.3])
    def a():
        if rng.random() < 0.2:
            return None
        n = rng.randrange(0, 5)
        return [rng.choice([0, 1, 2, 7, 41, 51, -3]) for _ in range(n)]
    return (s(), i(), x(), a())


N_EXT_SPECS = 10


def _ext_cases():
    rng = random.Random(20260818)
    return [(_rand_ext_spec(rng),
             [_rand_ext_row(rng) for _ in range(N_ROWS)])
            for _ in range(N_EXT_SPECS)]


@pytest.mark.parametrize("case_idx", range(N_EXT_SPECS))
def test_compiler_interpreter_agree_on_random_ext_specs(spark, case_idx):
    """Same oracle-is-agreement contract over the EXTENSION keyword
    surface: formats, multipleOf (quotient), exclusive bounds, contains/
    prefixItems/unevaluatedItems, if/then/else, dependentRequired/
    Schemas, patternProperties, unevaluatedProperties."""
    spec, rows = _ext_cases()[case_idx]
    df = spark.createDataFrame(
        [tuple([cid] + list(r)) for cid, r in enumerate(rows)], DDL)
    eng = ValidationEngine(spec, key_cols=("_cid",), extensions=True)
    got = {cid: set() for cid in range(len(rows))}
    for r in eng.validate(df).violations.collect():
        got[r._cid].add((r.instance_path, r.code, r.message))
    root = parse_spec(spec, extensions=True)
    names = ("s", "i", "x", "a")
    mismatches = []
    for cid, row in enumerate(rows):
        data = {n: v for n, v in zip(names, row) if v is not None}
        exp = {(v.path, v.code, v.message) for v in validate(root, data)}
        # the harness key column is not part of the logical instance:
        # drop compiler rows about _cid (declared {} when uP is present)
        got_cid = {t for t in got[cid] if not t[0].startswith("/_cid")}
        if got_cid != exp:
            mismatches.append((cid, data, sorted(got_cid), sorted(exp)))
    assert not mismatches, (
        f"ext spec #{case_idx} {spec}: {len(mismatches)} disagreeing rows; "
        f"first: {mismatches[0]}")
