"""Programmatic suite-case generator (official JSON-Schema-Test-Suite
format: ``{description, schema, tests: [{description, data, valid}]}``).

The reference runs the entire official suite per category
(`/root/reference/json_schema_rs/tests/json_schema_test_suite.rs:68-163`);
the suite itself is not vendored in this environment, so this module
GENERATES an equivalent corpus for the supported keyword subset from
first-principles predicates: each case family's expected verdict is
computed by an independent one-line rule (e.g. ``len(s) >= min_length``),
never by the engine under test.

Groups carry an extra engine hint:

- ``columns``: ``{name: spark_type}`` — present when every instance in
  the group maps onto typed Spark columns (flat object, no null values,
  homogeneous arrays), so the vectorized compiler can run it too;
- groups without ``columns`` are interpreter-only (nested/mixed shapes)
  and are SKIP-LISTED for the compiler loudly by the harness.
"""

from __future__ import annotations

from typing import Any

# one sample value per JSON kind (for type cross-products)
KIND_SAMPLES: dict[str, Any] = {
    "string": "hello",
    "integer": 7,
    "float": 7.5,
    "boolean": True,
    "array": [1, 2],
    "object": {"k": 1},
}

SPARK_TYPE = {
    "string": "string", "integer": "bigint", "float": "double",
    "boolean": "boolean", "array": "array<bigint>",
}

TYPE_ACCEPTS = {  # JSON Schema type -> accepted sample kinds (serde rules)
    "string": {"string"},
    "integer": {"integer"},            # floats are never integers
    "number": {"integer", "float"},
    "boolean": {"boolean"},
    "array": {"array"},
    "object": {"object"},
}


def _group(desc, schema, tests, columns=None):
    g = {"description": desc, "schema": schema, "tests": tests}
    if columns:
        g["columns"] = columns
    return g


def _t(desc, data, valid):
    return {"description": desc, "data": data, "valid": valid}


def gen_type_matrix():
    """Every declared type against every value kind: 6 x 6 verdicts."""
    out = []
    for t, accepted in TYPE_ACCEPTS.items():
        tests = []
        cols = {}
        for kind, sample in KIND_SAMPLES.items():
            if kind == "object":
                continue              # struct columns: interpreter-only
            col = f"c_{kind}"
            cols[col] = SPARK_TYPE[kind]
            tests.append(_t(f"{t} vs {kind}", {col: sample}, kind in accepted))
        schema = {"type": "object",
                  "properties": {f"c_{k}": {"type": t}
                                 for k in KIND_SAMPLES if k != "object"}}
        # one test per property: each instance sets exactly one column
        out.append(_group(f"type:{t} matrix", schema, tests, cols))
        # interpreter-only: the object kind + root-level dispatch
        out.append(_group(
            f"type:{t} root", {"type": t},
            [_t(f"root {t} vs {kind}", sample, kind in accepted)
             for kind, sample in KIND_SAMPLES.items()]))
    return out


def gen_length():
    out = []
    cases = [
        (0, 5, "", True), (0, 5, "abcde", True), (0, 5, "abcdef", False),
        (2, 4, "a", False), (2, 4, "ab", True), (2, 4, "abcd", True),
        (2, 4, "abcde", False),
        (1, 1, "é", True), (1, 1, "中", True), (1, 1, "🚀", True),
        (2, 2, "🚀x", True), (3, 3, "🚀x", False),
        (1, 2, "\x07\x08", True),
    ]
    tests = []
    groups = {}
    for mn, mx, s, valid in cases:
        groups.setdefault((mn, mx), []).append(
            _t(f"len({s!r}) in [{mn},{mx}]", {"s": s},
               mn <= len(s) <= mx))
    for (mn, mx), tests in sorted(groups.items()):
        out.append(_group(
            f"minLength {mn} maxLength {mx}",
            {"type": "object",
             "properties": {"s": {"type": "string",
                                  "minLength": mn, "maxLength": mx}}},
            tests, {"s": "string"}))
    return out


def gen_bounds():
    out = []
    for mn, mx in [(0, 10), (-5, 5), (2.5, 7.5)]:
        vals = [mn - 1, mn, (mn + mx) / 2, mx, mx + 1, mn - 0.001, mx + 0.001]
        tests = [_t(f"x={v}", {"x": float(v)}, mn <= v <= mx) for v in vals]
        out.append(_group(
            f"number bounds [{mn},{mx}]",
            {"type": "object",
             "properties": {"x": {"type": "number",
                                  "minimum": mn, "maximum": mx}}},
            tests, {"x": "double"}))
    # integer bounds on an integer column (inclusive at both ends)
    tests = [_t(f"i={v}", {"i": v}, 3 <= v <= 6) for v in [2, 3, 4, 6, 7]]
    out.append(_group(
        "integer bounds [3,6]",
        {"type": "object",
         "properties": {"i": {"type": "integer",
                              "minimum": 3, "maximum": 6}}},
        tests, {"i": "bigint"}))
    # 1.0 is NOT an integer (serde semantics) — interpreter-only instance
    out.append(_group(
        "float never integer", {"type": "integer"},
        [_t("1.0", 1.0, False), _t("1", 1, True), _t("-3", -3, True),
         _t("true not integer", True, False)]))
    return out


def gen_enum_const():
    out = []
    # serde equality: ints never equal floats, bools are not numbers
    enum = ["a", 1, 2.5, True, None, [1, 2], {"k": 1}]
    probes = [
        ("a", True), ("b", False), (1, True), (1.0, False), (2.5, True),
        (2, False), (True, True), (False, False), (None, True),
        ([1, 2], True), ([2, 1], False), ({"k": 1}, True), ({"k": 2}, False),
    ]
    out.append(_group(
        "enum serde equality", {"enum": enum},
        [_t(f"probe {p!r}", p, v) for p, v in probes]))
    out.append(_group(
        "const string", {"type": "object", "properties": {"s": {"const": "en"}}},
        [_t("match", {"s": "en"}, True), _t("miss", {"s": "de"}, False),
         _t("absent ok", {}, True)], {"s": "string"}))
    out.append(_group(
        "const integer vs float", {"const": 3},
        [_t("3", 3, True), _t("3.0 is not 3", 3.0, False),
         _t("true is not 1-ish", True, False)]))
    out.append(_group(
        "enum on column", {"type": "object",
                           "properties": {"s": {"enum": ["x", "y"]}}},
        [_t("x", {"s": "x"}, True), _t("z", {"s": "z"}, False),
         _t("absent", {}, True)], {"s": "string"}))
    return out


def gen_required_properties():
    out = []
    out.append(_group(
        "required two of three",
        {"type": "object", "required": ["a", "b"],
         "properties": {"a": {"type": "string"}, "b": {"type": "integer"}}},
        [_t("both", {"a": "x", "b": 1}, True),
         _t("missing b", {"a": "x"}, False),
         _t("missing both", {}, False),
         _t("extra ok", {"a": "x", "b": 1, "c": 9}, True)],
        {"a": "string", "b": "bigint", "c": "bigint"}))
    out.append(_group(
        "additionalProperties forbid",
        {"type": "object", "properties": {"a": {"type": "string"}},
         "additionalProperties": False},
        [_t("clean", {"a": "x"}, True),
         _t("extra", {"a": "x", "z": 1}, False)],
        {"a": "string", "z": "bigint"}))
    out.append(_group(
        "additionalProperties schema",
        {"type": "object", "properties": {"a": {"type": "string"}},
         "additionalProperties": {"type": "integer", "minimum": 0}},
        [_t("extra ok", {"a": "x", "z": 3}, True),
         _t("extra negative", {"a": "x", "z": -1}, False)],
        {"a": "string", "z": "bigint"}))
    # typeless node still applies required/properties to objects — but
    # scalar constraints are TYPE-SCOPED: a typeless {"minimum": 5} is
    # ignored (validator/mod.rs:417-441 dispatches only object keywords)
    out.append(_group(
        "typeless required",
        {"required": ["a"], "properties": {"a": {"minimum": 5}}},
        [_t("present big", {"a": 9}, True),
         _t("typeless minimum ignored", {"a": 1}, True),
         _t("missing", {}, False),
         _t("non-object ignored", "just a string", True)]))
    return out


def gen_arrays():
    out = []
    out.append(_group(
        "array size bounds",
        {"type": "object",
         "properties": {"a": {"type": "array", "minItems": 2, "maxItems": 3}}},
        [_t("1", {"a": [1]}, False), _t("2", {"a": [1, 2]}, True),
         _t("3", {"a": [1, 2, 3]}, True), _t("4", {"a": [1, 2, 3, 4]}, False),
         _t("absent", {}, True)],
        {"a": "array<bigint>"}))
    out.append(_group(
        "uniqueItems integers",
        {"type": "object",
         "properties": {"a": {"type": "array", "uniqueItems": True}}},
        [_t("unique", {"a": [1, 2, 3]}, True),
         _t("dup", {"a": [1, 2, 1]}, False),
         # first-duplicate = EARLIEST element recurring later (i-outer
         # scan): -3, not 51 — regression pinned from differential fuzz
         _t("crossed dup pairs", {"a": [-3, 51, 51, -3]}, False),
         _t("empty", {"a": []}, True)],
        {"a": "array<bigint>"}))
    out.append(_group(
        "uniqueItems strings",
        {"type": "object",
         "properties": {"a": {"type": "array", "uniqueItems": True}}},
        [_t("unique", {"a": ["x", "y"]}, True),
         _t("dup", {"a": ["x", "x"]}, False)],
        {"a": "array<string>"}))
    # serde equality inside uniqueItems: 1 vs 1.0 vs true (interpreter)
    out.append(_group(
        "uniqueItems serde equality",
        {"type": "array", "uniqueItems": True},
        [_t("1 vs 1.0 distinct", [1, 1.0], True),
         _t("1 vs true distinct", [1, True], True),
         _t("null dup", [None, None], False),
         _t("object dup", [{"a": 1}, {"a": 1}], False),
         _t("object key order irrelevant", [{"a": 1, "b": 2},
                                            {"b": 2, "a": 1}], False)]))
    out.append(_group(
        "items element bounds",
        {"type": "object",
         "properties": {"a": {"type": "array",
                              "items": {"type": "number",
                                        "minimum": 0, "maximum": 1}}}},
        [_t("in range", {"a": [0.0, 0.5, 1.0]}, True),
         _t("below", {"a": [-0.1]}, False),
         _t("above", {"a": [0.2, 1.2]}, False),
         _t("empty", {"a": []}, True)],
        {"a": "array<double>"}))
    out.append(_group(
        "items string constraints",
        {"type": "object",
         "properties": {"a": {"type": "array",
                              "items": {"type": "string", "minLength": 2}}}},
        [_t("ok", {"a": ["ab", "cde"]}, True),
         _t("short elem", {"a": ["ab", "c"]}, False)],
        {"a": "array<string>"}))
    # nested arrays: interpreter-only
    out.append(_group(
        "nested items",
        {"type": "array", "items": {"type": "array",
                                    "items": {"type": "integer"}}},
        [_t("ok", [[1], [2, 3]], True),
         _t("inner float", [[1], [2.5]], False),
         _t("inner not array", [1], False)]))
    return out


def gen_refs():
    out = []
    schema = {
        "$defs": {"name": {"type": "string", "minLength": 2},
                  "hop": {"$ref": "#/$defs/name"}},
        "type": "object",
        "properties": {"a": {"$ref": "#/$defs/hop"}},
    }
    out.append(_group(
        "transitive $defs ref", schema,
        [_t("ok", {"a": "ab"}, True), _t("short", {"a": "a"}, False)],
        {"a": "string"}))
    out.append(_group(
        "definitions container",
        {"definitions": {"pos": {"type": "number", "minimum": 0}},
         "type": "object", "properties": {"x": {"$ref": "#/definitions/pos"}}},
        [_t("ok", {"x": 1.0}, True), _t("neg", {"x": -1.0}, False)],
        {"x": "double"}))
    out.append(_group(
        "dangling ref",
        {"type": "object", "$defs": {"real": {"type": "string"}},
         "properties": {"a": {"$ref": "#/$defs/nope"}}},
        [_t("always invalid when present", {"a": "x"}, False)],
        {"a": "string"}))
    out.append(_group(
        "ref cycle",
        {"$defs": {"a": {"$ref": "#/$defs/b"}, "b": {"$ref": "#/$defs/a"}},
         "type": "object", "properties": {"x": {"$ref": "#/$defs/a"}}},
        [_t("cycle invalid", {"x": 1}, False)],
        {"x": "bigint"}))
    return out


def gen_combinators():
    out = []
    out.append(_group(
        "anyOf over column",
        {"type": "object", "properties": {
            "x": {"anyOf": [{"type": "number", "maximum": 3},
                            {"type": "number", "minimum": 10}]}}},
        [_t("low", {"x": 1.0}, True), _t("mid", {"x": 5.0}, False),
         _t("high", {"x": 12.0}, True)],
        {"x": "double"}))
    out.append(_group(
        "oneOf exactly one",
        {"type": "object", "properties": {
            "x": {"oneOf": [{"type": "number", "maximum": 10},
                            {"type": "number", "minimum": 5}]}}},
        [_t("only first", {"x": 2.0}, True),
         _t("both match", {"x": 7.0}, False),
         _t("only second", {"x": 15.0}, True),
         _t("neither... impossible here", {"x": 11.0}, True)],
        {"x": "double"}))
    out.append(_group(
        "allOf conjunction",
        {"type": "object", "properties": {
            "s": {"allOf": [{"type": "string", "minLength": 2},
                            {"type": "string", "maxLength": 4}]}}},
        [_t("ok", {"s": "abc"}, True), _t("short", {"s": "a"}, False),
         _t("long", {"s": "abcde"}, False)],
        {"s": "string"}))
    out.append(_group(
        "empty combinators", {"anyOf": []},
        [_t("anything fails empty anyOf", 1, False)]))
    out.append(_group(
        "oneOf zero subschemas", {"oneOf": []},
        [_t("anything fails", "x", False)]))
    out.append(_group(
        "nested oneOf in anyOf",
        {"type": "object", "properties": {
            "x": {"anyOf": [
                {"oneOf": [{"type": "number", "maximum": 2},
                           {"type": "number", "minimum": 1}]},
                {"type": "number", "minimum": 100},
            ]}}},
        # oneOf arm: valid iff exactly one of (<=2, >=1) holds -> x<1 or x>2;
        # anyOf adds x>=100 (redundant); 1<=x<=2 matches both -> invalid arm
        [_t("x=0.5 one match", {"x": 0.5}, True),
         _t("x=1.5 two matches", {"x": 1.5}, False),
         _t("x=50 one match", {"x": 50.0}, True)],
        {"x": "double"}))
    out.append(_group(
        "const gates before combinators... const wins",
        {"const": 5, "anyOf": [{"type": "string"}]},
        [_t("const match falls through to anyOf", 5, False),
         _t("const miss", 6, False)]))
    return out


def gen_annotations():
    schema = {
        "type": "object", "title": "T", "description": "D", "$comment": "C",
        "default": {"a": "zz"}, "examples": [{"a": "bad"}], "deprecated": True,
        "properties": {"a": {"type": "string", "maxLength": 3,
                             "format": "email"}},
    }
    return [_group(
        "annotation keywords ignored", schema,
        [_t("ok", {"a": "xy"}, True),
         _t("too long (format email ignored)", {"a": "abcd"}, False),
         _t("not an email but format ignored", {"a": "zzz"}, True)],
        {"a": "string"})]


def gen_type_array():
    return [_group(
        "type array first element wins", {"type": ["string", "integer"]},
        [_t("string ok", "x", True), _t("integer NOT ok (first only)",
                                        1, False)])]


def gen_uuid():
    u = "123e4567-e89b-12d3-a456-426614174000"
    vals = [
        (u, True), (u.upper(), True), (u.replace("-", ""), True),
        (f"urn:uuid:{u}", True), ("{" + u + "}", True),
        (u + "\n", False), ("x" + u, False), ("123e4567", False),
        ("g23e4567-e89b-12d3-a456-426614174000", False),
    ]
    return [_group(
        "format uuid",
        {"type": "object",
         "properties": {"s": {"type": "string", "format": "uuid"}}},
        [_t(f"uuid {v!r}", {"s": v}, ok) for v, ok in vals],
        {"s": "string"})]


def gen_patterns():
    cases = [
        ("a{", [("xa{y", True), ("a", False)]),
        ("^ab", [("abc", True), ("zab", False)]),
        ("c$", [("abc", True), ("abc\n", False)]),
        ("\\d+", [("a7b", True), ("abc", False), ("٣", False)]),
        ("\\cJ", [("a\nb", True), ("ab", False)]),
        ("[]a", [("a", False), ("", False)]),
        ("\\p{L}", [("p{L}", True), ("A", False)]),
    ]
    out = []
    for pat, probes in cases:
        out.append(_group(
            f"pattern {pat!r}",
            {"type": "object",
             "properties": {"s": {"type": "string", "pattern": pat}}},
            [_t(f"probe {s!r}", {"s": s}, ok) for s, ok in probes],
            {"s": "string"}))
    return out


# ---------------------------------------------------------------------------
# Nasty-case families (round-3): the shapes the official suite is famous
# for — exotic unicode lengths, $ref chains/diamonds, the full ECMA-262
# (+Annex B) divergence corpus from functions/ecma_regex.py's table,
# float boundary arithmetic, serde-equality edge cases, pathological
# combinator nests. Expected verdicts remain first-principles one-liners
# (len(), <=, hand-derived ECMA match semantics), never the engine.
# ---------------------------------------------------------------------------

def gen_unicode_lengths():
    """minLength/maxLength count CODE POINTS: astral chars are 1, combining
    marks are their own code points, ZWJ sequences count every scalar."""
    probes = [
        "\U0001F600",                  # astral emoji: 1 cp
        "\u00e9",                 # NFC e-acute: 1 cp
        "e\u0301",                # NFD e-acute: 2 cps
        "\U0001F44D\U0001F3FD",        # emoji + skin-tone modifier: 2 cps
        "\U0001F468\u200d\U0001F469\u200d\U0001F467",  # ZWJ family: 5 cps
        "\ufeff",                 # BOM is a countable char: 1 cp
        "\U0010FFFF",                  # max scalar: 1 cp
        "a\U0001F600b",                # mixed: 3 cps
        "A\u0328\u030a",          # A + 2 combining: 3 cps
        "",                            # empty: 0
        "\U0001F680" * 4,              # 4 cps
    ]
    out = []
    for mn, mx in [(0, 0), (1, 1), (2, 2), (3, 3), (1, 4), (5, 5)]:
        out.append(_group(
            f"unicode codepoint length [{mn},{mx}]",
            {"type": "object",
             "properties": {"s": {"type": "string",
                                  "minLength": mn, "maxLength": mx}}},
            [_t(f"cp len {len(s)}: {s!r}", {"s": s}, mn <= len(s) <= mx)
             for s in probes],
            {"s": "string"}))
    return out


def gen_ref_chains():
    out = []
    # 6-deep $ref chain ending in a real constraint
    defs = {"d0": {"type": "string", "minLength": 2}}
    for i in range(1, 6):
        defs[f"d{i}"] = {"$ref": f"#/$defs/d{i-1}"}
    out.append(_group(
        "ref chain depth 6",
        {"$defs": defs, "type": "object",
         "properties": {"a": {"$ref": "#/$defs/d5"}}},
        [_t("ok", {"a": "ab"}, True), _t("short", {"a": "a"}, False),
         _t("absent", {}, True)],
        {"a": "string"}))
    # diamond: two properties share one def through different hops
    out.append(_group(
        "ref diamond",
        {"$defs": {"leaf": {"type": "integer", "minimum": 0},
                   "l": {"$ref": "#/$defs/leaf"},
                   "r": {"$ref": "#/$defs/leaf"}},
         "type": "object",
         "properties": {"x": {"$ref": "#/$defs/l"},
                        "y": {"$ref": "#/$defs/r"}}},
        [_t("both ok", {"x": 1, "y": 2}, True),
         _t("left neg", {"x": -1, "y": 2}, False),
         _t("right neg", {"x": 1, "y": -2}, False)],
        {"x": "bigint", "y": "bigint"}))
    # ref inside combinator arms
    out.append(_group(
        "refs inside anyOf",
        {"$defs": {"low": {"type": "number", "maximum": 3},
                   "high": {"type": "number", "minimum": 10}},
         "type": "object",
         "properties": {"x": {"anyOf": [{"$ref": "#/$defs/low"},
                                        {"$ref": "#/$defs/high"}]}}},
        [_t("low", {"x": 1.0}, True), _t("mid", {"x": 5.0}, False),
         _t("high", {"x": 11.0}, True)],
        {"x": "double"}))
    # allOf of refs
    out.append(_group(
        "allOf of refs",
        {"$defs": {"min2": {"type": "string", "minLength": 2},
                   "max4": {"type": "string", "maxLength": 4}},
         "type": "object",
         "properties": {"s": {"allOf": [{"$ref": "#/$defs/min2"},
                                        {"$ref": "#/$defs/max4"}]}}},
        [_t("ok", {"s": "abc"}, True), _t("short", {"s": "a"}, False),
         _t("long", {"s": "abcde"}, False)],
        {"s": "string"}))
    # 3-cycle through $defs
    out.append(_group(
        "ref 3-cycle",
        {"$defs": {"a": {"$ref": "#/$defs/b"}, "b": {"$ref": "#/$defs/c"},
                   "c": {"$ref": "#/$defs/a"}},
         "type": "object", "properties": {"x": {"$ref": "#/$defs/a"}}},
        [_t("cycle invalid when present", {"x": 1}, False),
         _t("absent ok", {}, True)],
        {"x": "bigint"}))
    # chain whose last hop dangles
    out.append(_group(
        "ref chain to dangling",
        {"$defs": {"a": {"$ref": "#/$defs/b"}, "b": {"$ref": "#/$defs/gone"}},
         "type": "object", "properties": {"x": {"$ref": "#/$defs/a"}}},
        [_t("invalid when present", {"x": "v"}, False)],
        {"x": "string"}))
    return out


def gen_pattern_annexb():
    """The ECMA-262(+Annex B) divergence corpus — one group per construct
    from functions/ecma_regex.py's divergence table, expected verdicts
    hand-derived from the spec (partial-match semantics, no flags)."""
    cases = [
        # real quantifier vs Annex B literal brace
        ("a{2,}", [("aa", True), ("a", False), ("baaa", True)]),
        ("a{,3}", [("xa{,3}y", True), ("aaa", False)]),  # {,3} is literal
        ("^$", [("", True), ("x", False)]),
        # ECMA `.`: NEL U+0085 matches (not a LineTerminator); LS/PS/\n don't
        (".", [("\u0085", True), ("\u2028", False), ("\n", False),
               ("ab", True), ("", False)]),
        # ECMA \s: BOM + Zs + NBSP in; ZWSP out
        ("\\s", [("\ufeff", True), ("\u00a0", True), ("\u3000", True),
                 ("x", False), ("\u200b", False)]),
        # ECMA \w, \d, \b are ASCII-only
        ("\\w+", [("_a1", True), ("\u00e9", False), ("%%", False)]),
        ("\\bfoo\\b", [("a foo b", True), ("afoob", False), ("foo", True)]),
        # Annex B: \c not followed by a letter = literal backslash, c kept
        ("\\c5", [("a\\c5", True), ("c5", False)]),
        # Annex B IdentityEscape: \q is literal q
        ("\\q", [("q", True), ("x", False)]),
        # [] never matches; [^] matches ANY char including line terminators
        ("a[]b", [("ab", False), ("a]b", False)]),
        ("[^]", [("\n", True), ("a", True), ("", False)]),
        # \8 with no 8th group: literal 8
        ("\\8", [("8", True), ("9", False)]),
        # backreferences
        ("(ab)\\1", [("xabab", True), ("abba", False), ("ab", False)]),
        ("(?<g1>ab)\\k<g1>", [("abab", True), ("abxab", False)]),
        # lookahead (positive, negative, Annex B quantified)
        ("a(?=b)", [("ab", True), ("ac", False)]),
        ("a(?!b)", [("ac", True), ("ab", False), ("ba", True)]),
        ("(?=a)*b", [("b", True), ("ab", True), ("c", False)]),
        # Annex B legacy octal: \101 = U+0041
        ("\\101", [("A", True), ("101", False)]),
        # Annex B: `-` after a class escape is a literal dash
        ("[\\d-x]", [("5", True), ("-", True), ("x", True), ("y", False)]),
        # empty alternative matches the empty string -> always true
        ("x|", [("x", True), ("", True), ("y", True)]),
        # $ is absolute end (no multiline): trailing \n defeats it
        ("a$", [("ba", True), ("a\n", False)]),
        ("[a-c]+$", [("xabc", True), ("abcx", False)]),
        # escapes
        ("\\u0041", [("A", True), ("u0041", False)]),
        ("\\x41", [("A", True), ("B", False)]),
        ("\\0", [("\x00", True), ("0", False)]),
        ("(?:ab)+", [("abab", True), ("aab", True), ("ba", False)]),
        # nested quantifiers + alternation
        ("(a|b)*c", [("abbac", True), ("c", True), ("ab", False)]),
    ]
    out = []
    for pat, probes in cases:
        out.append(_group(
            f"annexb pattern {pat!r}",
            {"type": "object",
             "properties": {"s": {"type": "string", "pattern": pat}}},
            [_t(f"probe {s!r}", {"s": s}, ok) for s, ok in probes],
            {"s": "string"}))
    return out


def gen_numeric_boundaries():
    """Bounds compared in f64 arithmetic: 2^53 rounding, -0.0 == 0.0,
    0.1 + 0.2 drift, shortest-repr boundary values."""
    out = []
    grids = [
        (-0.5, 0.5, [-0.5, -0.0, 0.0, 0.5, 0.5000000000000001,
                     -0.5000000000000001, 0.25]),
        (0.1, 0.3, [0.1, 0.3, 0.30000000000000004,   # = 0.1 + 0.2
                    0.09999999999999999, 0.2]),
        (5.0, 5.0, [5.0, 5.000000000000001, 4.999999999999999]),
        (-1e308, 1e308, [1e308, -1e308, 1.5e308, -1.5e308, 0.0]),
        (1e-12, 1e-10, [1e-12, 1e-10, 9.999999999999999e-13, 5e-11]),
    ]
    for mn, mx, vals in grids:
        out.append(_group(
            f"float boundary bounds [{mn!r},{mx!r}]",
            {"type": "object",
             "properties": {"x": {"type": "number",
                                  "minimum": mn, "maximum": mx}}},
            [_t(f"x={v!r}", {"x": v}, mn <= v <= mx) for v in vals],
            {"x": "double"}))
    # 2^53 region on an integer column: bounds given as JSON ints are
    # compared as f64 (the reference parses bounds into f64)
    lo, hi = 2**53 - 1, 2**53 + 2
    vals = [2**53 - 2, 2**53 - 1, 2**53, 2**53 + 2, 2**53 + 4]
    out.append(_group(
        "2^53 integer bounds",
        {"type": "object",
         "properties": {"i": {"type": "integer",
                              "minimum": lo, "maximum": hi}}},
        [_t(f"i={v}", {"i": v}, float(lo) <= float(v) <= float(hi))
         for v in vals],
        {"i": "bigint"}))
    # negative integer bounds
    out.append(_group(
        "negative integer bounds [-6,-3]",
        {"type": "object",
         "properties": {"i": {"type": "integer",
                              "minimum": -6, "maximum": -3}}},
        [_t(f"i={v}", {"i": v}, -6 <= v <= -3)
         for v in [-7, -6, -4, -3, -2, 0]],
        {"i": "bigint"}))
    return out


def gen_enum_nasty():
    out = []
    # unicode normalization: NFC and NFD are DIFFERENT strings
    out.append(_group(
        "enum NFC vs NFD",
        {"type": "object", "properties": {"s": {"enum": ["\u00e9", "\U0001F680"]}}},
        [_t("NFC member", {"s": "\u00e9"}, True),
         _t("NFD probe is a different string", {"s": "e\u0301"}, False),
         _t("astral member", {"s": "\U0001F680"}, True),
         _t("astral + space", {"s": "\U0001F680 "}, False)],
        {"s": "string"}))
    # empty string is a legitimate enum member
    out.append(_group(
        "enum empty string member",
        {"type": "object", "properties": {"s": {"enum": ["", "x"]}}},
        [_t("empty", {"s": ""}, True), _t("space", {"s": " "}, False),
         _t("x", {"s": "x"}, True)],
        {"s": "string"}))
    # long member
    long = "k" * 500
    out.append(_group(
        "enum long member",
        {"type": "object", "properties": {"s": {"enum": [long]}}},
        [_t("match", {"s": long}, True),
         _t("one short", {"s": long[:-1]}, False)],
        {"s": "string"}))
    # serde equality on array members: [1] and [1.0] are distinct
    out.append(_group(
        "enum array int vs float members", {"enum": [[1], ["a"]]},
        [_t("[1]", [1], True), _t("[1.0] distinct", [1.0], False),
         _t('["a"]', ["a"], True), _t("[] no member", [], False)]))
    # const deep object: key order irrelevant, values exact
    out.append(_group(
        "const nested object",
        {"const": {"a": 1, "b": [2, 3], "c": {"d": None}}},
        [_t("same other order", {"c": {"d": None}, "b": [2, 3], "a": 1}, True),
         _t("array order matters", {"a": 1, "b": [3, 2], "c": {"d": None}},
            False),
         _t("int vs float inside", {"a": 1.0, "b": [2, 3], "c": {"d": None}},
            False)]))
    return out


def gen_combinator_nasty():
    out = []
    # oneOf with 5 overlapping branches: valid iff EXACTLY one matches
    branches = [{"type": "number", "maximum": m} for m in (2, 4, 6, 8, 10)]
    def n_matches(x):
        return sum(x <= m for m in (2, 4, 6, 8, 10))
    out.append(_group(
        "oneOf five overlapping",
        {"type": "object", "properties": {"x": {"oneOf": branches}}},
        [_t(f"x={v} matches {n_matches(v)}", {"x": float(v)},
            n_matches(v) == 1) for v in [1, 3, 7, 9, 11]],
        {"x": "double"}))
    # duplicated subschema: any match is a double match
    out.append(_group(
        "oneOf duplicated subschema",
        {"type": "object",
         "properties": {"x": {"oneOf": [{"type": "number", "minimum": 0},
                                        {"type": "number", "minimum": 0}]}}},
        [_t("non-negative double-matches", {"x": 1.0}, False),
         _t("negative zero-matches", {"x": -1.0}, False),
         _t("absent ok", {}, True)],
        {"x": "double"}))
    # contradictory allOf: nothing present ever passes
    out.append(_group(
        "allOf contradictory bounds",
        {"type": "object",
         "properties": {"x": {"allOf": [{"type": "number", "minimum": 5},
                                        {"type": "number", "maximum": 3}]}}},
        [_t("present fails", {"x": 4.0}, False),
         _t("even boundary fails", {"x": 5.0}, False),
         _t("absent ok", {}, True)],
        {"x": "double"}))
    # oneOf of oneOf: inner arm is itself exactly-one
    inner = {"oneOf": [{"type": "number", "maximum": 2},
                       {"type": "number", "minimum": 1}]}
    out.append(_group(
        "oneOf nested in oneOf",
        {"type": "object",
         "properties": {"x": {"oneOf": [inner,
                                        {"type": "number", "minimum": 100}]}}},
        # inner valid iff x<1 or x>2 (exactly one of <=2 / >=1);
        # outer second arm: x>=100. x=150: inner valid AND >=100 -> two
        [_t("x=0.5 inner only", {"x": 0.5}, True),
         _t("x=1.5 neither (inner double-match)", {"x": 1.5}, False),
         _t("x=50 inner only", {"x": 50.0}, True),
         _t("x=150 both arms", {"x": 150.0}, False)],
        {"x": "double"}))
    # anyOf containing allOf
    out.append(_group(
        "allOf inside anyOf",
        {"type": "object",
         "properties": {"s": {"anyOf": [
             {"allOf": [{"type": "string", "minLength": 2},
                        {"type": "string", "maxLength": 3}]},
             {"type": "string", "minLength": 10}]}}},
        [_t("len 2 first arm", {"s": "ab"}, True),
         _t("len 5 neither", {"s": "abcde"}, False),
         _t("len 10 second arm", {"s": "abcdefghij"}, True)],
        {"s": "string"}))
    return out


def gen_deep_nesting():
    """Deeply nested properties/required/items — the interpreter-only
    stress shapes the official suite is famous for."""
    # 5-deep object chain, required at every level, bound at the leaf
    leaf = {"type": "integer", "minimum": 10}
    schema = leaf
    for i in reversed(range(5)):
        schema = {"type": "object", "required": [f"k{i}"],
                  "properties": {f"k{i}": schema}}
    def nest(v, depth=5):
        for i in reversed(range(depth)):
            v = {f"k{i}": v}
        return v
    good = nest(11)
    short = nest(11, 3)          # missing k3/k4 below depth 3
    bad_leaf = nest(9)
    out = [_group(
        "required chain depth 5", schema,
        [_t("full path ok", good, True),
         _t("leaf below minimum", bad_leaf, False),
         _t("chain cut at depth 3", short, False),
         _t("root not object", 7, False)])]
    # array of objects with required inside items
    out.append(_group(
        "items of objects with required",
        {"type": "array",
         "items": {"type": "object", "required": ["id"],
                   "properties": {"id": {"type": "integer"}}}},
        [_t("all have id", [{"id": 1}, {"id": 2}], True),
         _t("one missing", [{"id": 1}, {}], False),
         _t("wrong id type", [{"id": "x"}], False),
         _t("empty array", [], True)]))
    # alternating array/object nesting
    out.append(_group(
        "object-array-object nesting",
        {"type": "object",
         "properties": {"rows": {"type": "array",
                                 "items": {"type": "object",
                                           "properties": {"v": {"type": "number",
                                                                "maximum": 1}}}}}},
        [_t("ok", {"rows": [{"v": 0.5}, {"v": 1.0}]}, True),
         _t("deep violation", {"rows": [{"v": 0.5}, {"v": 1.5}]}, False),
         _t("rows absent", {}, True)]))
    return out


def gen_uuid_nasty():
    u0 = "00000000-0000-0000-0000-000000000000"
    uf = "ffffffff-ffff-ffff-ffff-ffffffffffff"
    vals = [
        (u0, True), (uf, True), (uf.upper(), True),
        (u0.replace("-", ""), True),                      # simple form
        ("123E4567-e89b-12d3-A456-426614174000", True),   # mixed case
        ("123e4567e89b-12d3-a456-426614174000", False),   # dash misplaced
        ("123e4567-e89b-12d3-a456-42661417400", False),   # 31 hex
        ("123e4567-e89b-12d3-a456-4266141740000", False), # 33 hex
        (" 123e4567-e89b-12d3-a456-426614174000", False), # leading space
        ("123e4567-e89b-12d3-a456-4266 4174000", False),  # inner space
    ]
    return [_group(
        "format uuid nasty",
        {"type": "object",
         "properties": {"s": {"type": "string", "format": "uuid"}}},
        [_t(f"uuid {v!r}", {"s": v}, ok) for v, ok in vals],
        {"s": "string"})]


def gen_bounds_grid():
    """Systematic off-by-one sweep: every integer bound pair against the
    seven interesting probes around it (below-min, min, min+1, mid,
    max-1, max, above-max)."""
    out = []
    for mn, mx in [(0, 1), (0, 100), (-10, 10), (7, 7), (-100, -90),
                   (1000000, 1000003), (0, 0), (-1, 1)]:
        mid = (mn + mx) // 2
        probes = sorted({mn - 1, mn, mn + 1, mid, mx - 1, mx, mx + 1})
        out.append(_group(
            f"bounds grid [{mn},{mx}]",
            {"type": "object",
             "properties": {"i": {"type": "integer",
                                  "minimum": mn, "maximum": mx}}},
            [_t(f"i={v}", {"i": v}, mn <= v <= mx) for v in probes],
            {"i": "bigint"}))
    return out


def _xg(desc, schema, tests, columns=None):
    g = _group(desc, schema, tests, columns)
    g["extensions"] = True
    return g


def gen_ext_numeric():
    """Extension numeric keywords, verdicts from first-principles
    predicates: multipleOf = quotient-is-integer ((v/m) % 1.0 == 0, the
    jsonschema-package rule); exclusive bounds = strict comparisons."""
    out = []
    for m in (0.1, 0.5, 3, 0.01):
        probes = [90.0, 0.3, 1.0, 0.25, 3.3, -6.0, 0.0, 7.0, 10.02, -0.1]
        out.append(_xg(
            f"ext multipleOf {m}",
            {"type": "object",
             "properties": {"v": {"type": "number", "multipleOf": m}}},
            [_t(f"v={v}", {"v": v}, (v / m) % 1.0 == 0) for v in probes],
            {"v": "double"}))
    for mn, mx in [(0, 10), (-5, 5), (7, 8)]:
        probes = sorted({mn - 1, mn, mn + 1, (mn + mx) // 2, mx - 1, mx,
                         mx + 1})
        out.append(_xg(
            f"ext exclusive bounds ({mn},{mx})",
            {"type": "object",
             "properties": {"v": {"type": "integer",
                                  "exclusiveMinimum": mn,
                                  "exclusiveMaximum": mx}}},
            [_t(f"v={v}", {"v": v}, mn < v < mx) for v in probes],
            {"v": "bigint"}))
    return out


def gen_ext_conditional():
    """if/then/else + dependentRequired grid: rule computed independently
    per instance."""
    schema = {"type": "object",
              "if": {"properties": {"r": {"const": "t"}}, "required": ["r"]},
              "then": {"required": ["u"]},
              "else": {"properties": {"u": {"enum": ["ok"]}}},
              "dependentRequired": {"u": ["w"]},
              "properties": {"r": {"type": "string"}}}

    def rule(inst):
        if inst.get("r") == "t":
            branch_ok = "u" in inst
        else:
            branch_ok = ("u" not in inst) or inst["u"] == "ok"
        dep_ok = ("u" not in inst) or ("w" in inst)
        return branch_ok and dep_ok

    insts = [{"r": "t", "u": "x", "w": "y"}, {"r": "t"},
             {"r": "t", "u": "x"}, {"r": "s", "u": "ok", "w": "y"},
             {"r": "s", "u": "no", "w": "y"}, {"r": "s"}, {},
             {"u": "ok", "w": "y"}, {"u": "ok"}, {"w": "y"}]
    return [_xg("ext if/then/else + dependentRequired", schema,
                [_t(str(i), inst, rule(inst))
                 for i, inst in enumerate(insts)],
                {"r": "string", "u": "string", "w": "string"})]


def gen_ext_object():
    """patternProperties / propertyNames / min-maxProperties."""
    out = []
    schema = {"type": "object",
              "patternProperties": {"^s": {"type": "string",
                                           "minLength": 2}},
              "properties": {"n": {"type": "integer"}}}

    def rule(inst):
        return all(isinstance(v, str) and len(v) >= 2
                   for k, v in inst.items() if k.startswith("s"))

    insts = [{"s1": "ab", "n": 1}, {"s1": "a"}, {"s1": "ab", "s2": "c"},
             {"n": 2}, {}, {"s1": "abc", "s2": "de", "n": 3}]
    out.append(_xg("ext patternProperties minLength", schema,
                   [_t(str(i), inst, rule(inst))
                    for i, inst in enumerate(insts)],
                   {"s1": "string", "s2": "string", "n": "bigint"}))
    # sub-schema needs type:"string": constraints are type-scoped in
    # this ladder (a typeless maxLength is inert, reference semantics).
    # maxLength 4 so the harness's _cid key column passes the name check.
    schema2 = {"type": "object",
               "propertyNames": {"type": "string", "maxLength": 4},
               "properties": {"abc": {}, "abcde": {}}}
    insts2 = [{"abc": 1}, {"abcde": 1}, {"abc": 1, "abcde": 2}, {}]
    out.append(_xg("ext propertyNames maxLength", schema2,
                   [_t(str(i), inst,
                       all(len(k) <= 4 for k in inst))
                    for i, inst in enumerate(insts2)],
                   {"abc": "bigint", "abcde": "bigint"}))
    return out


def gen_ext_arrays():
    """contains/minContains/maxContains + prefixItems + unevaluatedItems,
    rules computed per instance."""
    out = []
    for min_c, max_c in [(1, 2), (0, 1), (2, None)]:
        schema = {"type": "object", "properties": {
            "xs": {"type": "array", "contains": {"type": "integer",
                                                 "minimum": 5},
                   **({"minContains": min_c} if min_c != 1 else {}),
                   **({"maxContains": max_c} if max_c is not None else {})}}}

        def rule(xs, mn=min_c, mx=max_c):
            cnt = sum(1 for x in xs if isinstance(x, int) and x >= 5)
            return cnt >= mn and (mx is None or cnt <= mx)

        arrays = [[], [1], [5], [5, 6], [5, 6, 7], [1, 9], [4, 4, 4]]
        out.append(_xg(
            f"ext contains [{min_c},{max_c}]", schema,
            [_t(str(xs), {"xs": xs}, rule(xs)) for xs in arrays],
            {"xs": "array<bigint>"}))
    schema_p = {"type": "object", "properties": {
        "xs": {"type": "array",
               "prefixItems": [{"type": "integer", "minimum": 0}],
               "unevaluatedItems": {"type": "integer", "maximum": 9}}}}

    def rule_p(xs):
        ok = True
        if len(xs) >= 1:
            ok &= xs[0] >= 0
        ok &= all(x <= 9 for x in xs[1:])
        return ok

    arrays = [[], [0], [-1], [0, 9], [0, 10], [-1, 10], [3, 1, 2, 11]]
    out.append(_xg("ext prefixItems + unevaluatedItems schema", schema_p,
                   [_t(str(xs), {"xs": xs}, rule_p(xs)) for xs in arrays],
                   {"xs": "array<bigint>"}))
    return out


def gen_ext_formats():
    """Assertive formats: the expected verdict comes from an independent
    implementation (ipaddress / datetime / '@' rule), not the engine."""
    import datetime
    import ipaddress
    out = []

    def date_ok(s):
        try:
            y, m, d = s.split("-")
            if len(y) != 4 or len(m) != 2 or len(d) != 2:
                return False
            datetime.date(int(y), int(m), int(d))
            return True
        except ValueError:
            return False

    dates = ["2024-02-29", "2023-02-29", "2024-1-1", "0000-01-01",
             "2024-12-31", "2024-04-31", "1999-06-15", "junk"]
    out.append(_xg("ext format date",
                   {"type": "object", "properties": {
                       "s": {"type": "string", "format": "date"}}},
                   [_t(s, {"s": s}, date_ok(s)) for s in dates],
                   {"s": "string"}))

    def ip_ok(cls, s):
        try:
            return not getattr(cls(s), "scope_id", None)
        except ValueError:
            return False

    ips4 = ["1.2.3.4", "01.2.3.4", "256.1.1.1", "0.0.0.0",
            "255.255.255.255", "1.2.3", "junk"]
    out.append(_xg("ext format ipv4",
                   {"type": "object", "properties": {
                       "s": {"type": "string", "format": "ipv4"}}},
                   [_t(s, {"s": s}, ip_ok(ipaddress.IPv4Address, s))
                    for s in ips4], {"s": "string"}))
    ips6 = ["::1", "::", "1:2:3:4:5:6:7:8", "::ffff:1.2.3.4",
            "fe80::1%eth0", "1::2::3", "12345::", "junk"]
    out.append(_xg("ext format ipv6",
                   {"type": "object", "properties": {
                       "s": {"type": "string", "format": "ipv6"}}},
                   [_t(s, {"s": s}, ip_ok(ipaddress.IPv6Address, s))
                    for s in ips6], {"s": "string"}))
    emails = ["a@b", "nope", "", "@", "x y@z"]
    out.append(_xg("ext format email",
                   {"type": "object", "properties": {
                       "s": {"type": "string", "format": "email"}}},
                   [_t(s, {"s": s}, "@" in s) for s in emails],
                   {"s": "string"}))

    # relative-json-pointer: expected verdict from the draft ABNF applied
    # by hand (independent of the engine's regex)
    rel = [("0", True), ("12", True), ("0#", True), ("1/a/b", True),
           ("1/a~0b", True), ("", False), ("#", False), ("/a", False),
           ("01", False), ("1#/x", False), ("-1", False), ("2/a~", False),
           ("10/~1", True), ("007", False)]
    out.append(_xg("ext format relative-json-pointer",
                   {"type": "object", "properties": {
                       "s": {"type": "string",
                             "format": "relative-json-pointer"}}},
                   [_t(s, {"s": s}, ok) for s, ok in rel],
                   {"s": "string"}))

    # regex: ECMA-262 dialect verdicts fixed by hand (the engine's own
    # auditor is under test here, so the expectations must not come from
    # it; dialect notes: inline flags and (?P< are Python-only syntax,
    # (?<name> is the ECMA named group, \\q is an Annex B identity escape)
    rx = [("abc", True), ("[0-9]+", True), ("a{2,3}", True),
          ("(a)\\1", True), ("(?<n>x)", True), ("\\q", True),
          ("(", False), ("[", False), ("a{3,2}", False), ("*a", False),
          ("\\", False), ("(?i)x", False), ("(?P<n>x)", False)]
    out.append(_xg("ext format regex (ECMA-262 dialect)",
                   {"type": "object", "properties": {
                       "s": {"type": "string", "format": "regex"}}},
                   [_t(s, {"s": s}, ok) for s, ok in rx],
                   {"s": "string"}))

    # date-time: RFC-3339 shape per the engine's pinned dialect (T/t
    # separator, 00-59 seconds — no leap second — mandatory Z/z or
    # ±HH:MM offset with HH<=23) + the same calendar check as `date`;
    # verdicts hand-derived from the documented dialect
    dts = [("2024-02-29T12:00:00Z", True),     # leap-year Feb 29
           ("2023-02-29T12:00:00Z", False),    # calendar, not shape
           ("2024-06-15t23:59:59z", True),     # lowercase t/z
           ("2024-06-15T23:59:60Z", False),    # leap second not in dialect
           ("2024-06-15 12:00:00Z", False),    # space separator
           ("2024-06-15T12:00:00", False),     # offset mandatory
           ("2024-06-15T12:00:00+05:30", True),
           ("2024-06-15T12:00:00-23:59", True),
           ("2024-06-15T12:00:00+24:00", False),
           ("2024-06-15T12:00:00.530Z", True),
           ("2024-04-31T00:00:00Z", False),    # April 31
           ("0000-01-01T00:00:00Z", False)]    # year >= 1
    out.append(_xg("ext format date-time",
                   {"type": "object", "properties": {
                       "s": {"type": "string", "format": "date-time"}}},
                   [_t(s, {"s": s}, ok) for s, ok in dts],
                   {"s": "string"}))

    # json-pointer: RFC-6901 ABNF by hand — "" is the whole document,
    # every segment starts with "/", ~ only as ~0/~1
    jps = [("", True), ("/a/b", True), ("/", True), ("//", True),
           ("/~0", True), ("/~1", True), ("/~01", True),
           ("/a b", True), ("/~2", False), ("/a~", False),
           ("a", False), ("#/a", False), ("/a/~", False)]
    out.append(_xg("ext format json-pointer",
                   {"type": "object", "properties": {
                       "s": {"type": "string", "format": "json-pointer"}}},
                   [_t(s, {"s": s}, ok) for s, ok in jps],
                   {"s": "string"}))
    return out


def gen_ext_anchors_unevaluated():
    """$anchor/$dynamicRef resolution + unevaluatedProperties flow —
    hand-computed verdicts (shapes too structural for a one-line rule)."""
    out = []
    schema = {"type": "object",
              "$defs": {"pos": {"$anchor": "pos", "type": "integer",
                                "minimum": 1}},
              "properties": {"a": {"$ref": "#pos"},
                             "b": {"$dynamicRef": "#pos"}}}
    cases = [({"a": 1, "b": 2}, True), ({"a": 0}, False),
             ({"b": 0}, False), ({}, True), ({"a": 5, "b": 0}, False)]
    out.append(_xg("ext anchors", schema,
                   [_t(str(i), inst, v) for i, (inst, v) in enumerate(cases)],
                   {"a": "bigint", "b": "bigint"}))
    schema_u = {"type": "object",
                "if": {"properties": {"r": {"const": "t"}},
                       "required": ["r"]},
                "then": {"properties": {"u": {}}},
                "properties": {"r": {"type": "string"}},
                "unevaluatedProperties": False}
    cases_u = [({"r": "t", "u": 1}, True), ({"r": "s", "u": 1}, False),
               ({"u": 1}, False), ({"r": "t"}, True), ({}, True)]
    out.append(_xg("ext unevaluatedProperties via then", schema_u,
                   [_t(str(i), inst, v)
                    for i, (inst, v) in enumerate(cases_u)],
                   {"r": "string", "u": "bigint"}))
    return out



# ---------------------------------------------------------------------------
# Round-4 families: the official-suite shapes the round-3 verdict named as
# still untested — $defs-inside-items ref targets, surrogate-pair length
# edges, heterogeneous-type enum members, nested unevaluated* interactions.
# ---------------------------------------------------------------------------


def gen_defs_in_items():
    """``items`` whose subschema is (or contains) a ``$ref`` target —
    the ref-resolution shapes the official suite exercises under
    ``$defs``/``items`` composition: per-element refs, transitive hops
    reached from inside ``items``, defs ANCHORED inside the items
    subschema itself (pointer into a non-root location), and refs to
    defs that are themselves array schemas."""
    out = []
    # items -> $ref to a root-level def, per element
    out.append(_group(
        "items ref to root def",
        {"type": "object",
         "$defs": {"pos": {"type": "integer", "minimum": 1}},
         "properties": {"xs": {"type": "array",
                               "items": {"$ref": "#/$defs/pos"}}}},
        [_t("empty ok", {"xs": []}, True),
         _t("all pos", {"xs": [1, 2, 3]}, True),
         _t("zero at 0", {"xs": [0]}, False),
         _t("neg at tail", {"xs": [3, 2, -1]}, False),
         _t("single ok", {"xs": [7]}, True)],
        {"xs": "array<bigint>"}))
    # items -> transitive hop (ref -> ref -> constraint)
    out.append(_group(
        "items transitive ref hop",
        {"type": "object",
         "$defs": {"name": {"type": "string", "minLength": 2},
                   "hop": {"$ref": "#/$defs/name"}},
         "properties": {"xs": {"type": "array",
                               "items": {"$ref": "#/$defs/hop"}}}},
        [_t("ok", {"xs": ["ab", "cde"]}, True),
         _t("short member", {"xs": ["ab", "c"]}, False),
         _t("empty ok", {"xs": []}, True),
         _t("empty string member", {"xs": [""]}, False)],
        {"xs": "array<string>"}))
    # def anchored INSIDE the items subschema, referenced by pointer into
    # that non-root location: the reference resolves ONLY #/$defs/... and
    # #/definitions/... fragments (ref_resolver.rs:86-106 ->
    # UnsupportedFragment), so every element is invalid when present —
    # the dangling-ref contract, not a resolution
    out.append(_group(
        "items-local $defs pointer target unsupported",
        {"type": "object",
         "properties": {"xs": {
             "type": "array",
             "items": {
                 "$defs": {"s": {"type": "string", "minLength": 2}},
                 "$ref": "#/properties/xs/items/$defs/s"}}}},
        [_t("element present -> UnsupportedFragment", {"xs": ["ab"]}, False),
         _t("short also invalid (ref, not length)", {"xs": ["a"]}, False),
         _t("empty array ok", {"xs": []}, True)],
        {"xs": "array<string>"}))
    # ref target that is itself an ARRAY schema (items + minItems live
    # in the def; the property is just a $ref)
    out.append(_group(
        "property ref to array def",
        {"type": "object",
         "$defs": {"arr": {"type": "array", "minItems": 1,
                           "items": {"type": "integer", "maximum": 9}}},
         "properties": {"xs": {"$ref": "#/$defs/arr"}}},
        [_t("ok", {"xs": [1, 9]}, True),
         _t("too big member", {"xs": [10]}, False),
         _t("empty violates minItems", {"xs": []}, False)],
        {"xs": "array<bigint>"}))
    # nested arrays: items -> ref -> def whose items is another ref
    # (array<array<...>> instances; interpreter-only shape)
    out.append(_group(
        "items ref to def with inner items ref",
        {"$defs": {"inner": {"type": "integer", "minimum": 0},
                   "row": {"type": "array",
                           "items": {"$ref": "#/$defs/inner"}}},
         "type": "array", "items": {"$ref": "#/$defs/row"}},
        [_t("ok", [[0, 1], [2]], True),
         _t("neg in inner", [[0], [-1]], False),
         _t("outer non-array member", [1], False),
         _t("empty", [], True)]))
    # dangling ref INSIDE items: every element invalid when present
    out.append(_group(
        "items dangling ref",
        {"type": "object",
         "$defs": {"real": {"type": "integer"}},
         "properties": {"xs": {"type": "array",
                               "items": {"$ref": "#/$defs/nope"}}}},
        [_t("element present -> invalid", {"xs": [1]}, False),
         _t("empty array ok (no element to fail)", {"xs": []}, True)],
        {"xs": "array<bigint>"}))
    return out


def gen_surrogate_length_edges():
    """Length edges past the round-3 unicode set: astral (surrogate-pair
    in UTF-16) code points at exact min/max boundaries — an engine
    counting UTF-16 units or bytes instead of code points diverges on
    every one of these. Flags (2 regional indicators), keycaps
    (digit + VS16 + combining keycap), first/last astral scalars, and
    astral runs straddling each bound."""
    probes = [
        ("\U00010000", 1),                      # first astral scalar
        ("\U0010FFFF\U0010FFFF", 2),            # max scalar x2
        ("\uffff", 1),                          # BMP max (no pair)
        ("\U0001F1FA\U0001F1F8", 2),            # flag: 2 regional indicators
        ("1\ufe0f\u20e3", 3),                   # keycap: digit+VS16+keycap
        ("a\U0001F600", 2),                     # BMP + astral mix
        ("\U0001F600a\U0001F600", 3),           # astral sandwich
        ("\U0001F3F3\ufe0f\u200d\U0001F308", 4),  # rainbow flag ZWJ seq
        ("\U0001F600" * 2, 2),
        ("\U0001F600" * 3, 3),
        ("\U0001F600" * 5, 5),
    ]
    out = []
    for mn, mx in [(1, 1), (2, 2), (3, 3), (2, 4), (4, 5), (0, 2)]:
        out.append(_group(
            f"surrogate-pair length edges [{mn},{mx}]",
            {"type": "object",
             "properties": {"s": {"type": "string",
                                  "minLength": mn, "maxLength": mx}}},
            [_t(f"cp len {n}: {s!r}", {"s": s}, mn <= n <= mx)
             for s, n in probes],
            {"s": "string"}))
    return out


def gen_enum_hetero():
    """``enum`` with heterogeneous-type members — membership is serde
    VALUE equality (validator/mod.rs enum rule): an integer instance can
    only match an integer member (never "1" or 1.0), a string only a
    string member, a boolean only a boolean member; null matches a null
    member (interpreter shape — a typed column's NULL means absent)."""
    members = [1, "1", 2.5, True, None]
    out = []
    out.append(_group(
        "enum hetero vs integer column",
        {"type": "object", "properties": {"x": {"enum": members}}},
        [_t("int 1 matches int member", {"x": 1}, True),
         _t("int 2 no member", {"x": 2}, False),
         _t("int 0 no member (True is not 0/1)", {"x": 0}, False)],
        {"x": "bigint"}))
    out.append(_group(
        "enum hetero vs string column",
        {"type": "object", "properties": {"s": {"enum": members}}},
        [_t('"1" matches string member', {"s": "1"}, True),
         _t('"2.5" is not the number 2.5', {"s": "2.5"}, False),
         _t('"true" is not boolean true', {"s": "true"}, False),
         _t('"True" no member', {"s": "True"}, False)],
        {"s": "string"}))
    out.append(_group(
        "enum hetero vs double column",
        {"type": "object", "properties": {"f": {"enum": members}}},
        [_t("2.5 matches float member", {"f": 2.5}, True),
         # serde equality: float 1.0 is NOT the integer member 1
         _t("1.0 is not integer member 1", {"f": 1.0}, False),
         _t("2.25 no member", {"f": 2.25}, False)],
        {"f": "double"}))
    out.append(_group(
        "enum hetero vs boolean column",
        {"type": "object", "properties": {"b": {"enum": members}}},
        [_t("true matches", {"b": True}, True),
         _t("false no member", {"b": False}, False)],
        {"b": "boolean"}))
    # mixed-kind instances incl. null and containers: interpreter shape
    out.append(_group(
        "enum hetero mixed instances",
        {"enum": [1, "1", 2.5, True, None, [1, 2], {"k": 1}]},
        [_t("null matches null member", None, True),
         _t("array member deep-equal", [1, 2], True),
         _t("array order matters", [2, 1], False),
         _t("object member deep-equal", {"k": 1}, True),
         _t("object value float mismatch", {"k": 1.0}, False),
         _t("float 1.0 is not int member 1", 1.0, False),
         _t("int 1 is not float-in-array", 1, True),
         _t("false no member", False, False)]))
    return out


def gen_nested_unevaluated():
    """``unevaluatedProperties`` / ``unevaluatedItems`` interacting with
    the annotation-producing keywords NESTED around them (allOf, $ref,
    if/then, prefixItems) — the 2020-12 flow rules the official suite
    leans on hardest. Extension groups (E16 + friends)."""
    out = []
    # NOTE on scope: this engine inherits the reference's keyword ladder
    # — $ref/allOf/anyOf/oneOf evaluate EXCLUSIVELY of siblings
    # (validator/mod.rs precedence), so 2020-12 annotation flow through
    # them does not exist and unevaluated* combined with them is a LOUD
    # SpecParseError (plans/spec.py:504-515; pinned in
    # test_extensions.py). The groups here cover the flows the engine
    # DOES define: properties, patternProperties, dependentSchemas,
    # if/then/else, prefixItems.
    # patternProperties-matched props count as evaluated
    out.append(_xg(
        "ext unevaluatedProperties with patternProperties",
        {"type": "object",
         "properties": {"a": {"type": "integer"}},
         "patternProperties": {"^x_": {"type": "string"}},
         "unevaluatedProperties": False},
        [_t("named + pattern evaluated", {"a": 1, "x_k": "v"}, True),
         _t("pattern only", {"x_k": "v"}, True),
         _t("extra fails", {"a": 1, "x_k": "v", "z": 1}, False),
         _t("only extra", {"z": 1}, False),
         _t("empty ok", {}, True)],
        {"a": "bigint", "x_k": "string", "z": "bigint"}))
    # dependentSchemas branch properties evaluated ONLY when triggered
    out.append(_xg(
        "ext unevaluatedProperties with dependentSchemas",
        {"type": "object",
         "properties": {"a": {"type": "integer"}},
         "dependentSchemas": {"a": {"properties": {"b": {"type": "string"}}}},
         "unevaluatedProperties": False},
        [_t("trigger present: b evaluated", {"a": 1, "b": "x"}, True),
         _t("no trigger: b unevaluated", {"b": "x"}, False),
         _t("trigger + extra", {"a": 1, "c": 2}, False),
         _t("trigger alone", {"a": 1}, True)],
        {"a": "bigint", "b": "string", "c": "bigint"}))
    # unevaluatedProperties as a SCHEMA (not false): extras must satisfy
    # it (typed shape keeps the extra integer-valued; the wrong-TYPE
    # extra lives in the interpreter-only mixed group below)
    out.append(_xg(
        "ext unevaluatedProperties schema form",
        {"type": "object",
         "properties": {"a": {"type": "string"}},
         "unevaluatedProperties": {"type": "integer", "minimum": 0}},
        [_t("no extras", {"a": "x"}, True),
         _t("extra non-negative int", {"a": "x", "z": 3}, True),
         _t("extra negative", {"a": "x", "z": -1}, False)],
        {"a": "string", "z": "bigint"}))
    out.append(_xg(
        "ext unevaluatedProperties schema form mixed kinds",
        {"type": "object",
         "properties": {"a": {"type": "string"}},
         "unevaluatedProperties": {"type": "integer", "minimum": 0}},
        [_t("extra wrong type", {"a": "x", "z": "y"}, False),
         _t("extra bool is not integer", {"z": True}, False),
         _t("extra float is not integer", {"z": 1.0}, False),
         _t("extra ok int", {"z": 7}, True)]))
    # if/then interaction: then-branch properties only evaluated when
    # the if matched (the round-3 group tested then; add ELSE flow)
    out.append(_xg(
        "ext unevaluatedProperties via else",
        {"type": "object",
         "if": {"properties": {"r": {"const": "t"}}, "required": ["r"]},
         "then": {"properties": {"u": {}}},
         "else": {"properties": {"w": {}}},
         "properties": {"r": {"type": "string"}},
         "unevaluatedProperties": False},
        [_t("if matched: u evaluated", {"r": "t", "u": 1}, True),
         _t("if matched: w NOT evaluated", {"r": "t", "w": 1}, False),
         _t("else branch: w evaluated", {"r": "s", "w": 1}, True),
         _t("else branch: u NOT evaluated", {"r": "s", "u": 1}, False),
         _t("no r: else flow evaluates w", {"w": 1}, True)],
        {"r": "string", "u": "bigint", "w": "bigint"}))
    # unevaluatedItems false: prefixItems width becomes an exact cap
    out.append(_xg(
        "ext unevaluatedItems false exact width",
        {"type": "object", "properties": {"xs": {
            "type": "array",
            "prefixItems": [{"type": "integer"},
                            {"type": "integer", "minimum": 0}],
            "unevaluatedItems": False}}},
        [_t("empty", {"xs": []}, True),
         _t("one", {"xs": [1]}, True),
         _t("exact width", {"xs": [1, 2]}, True),
         _t("over width", {"xs": [1, 2, 3]}, False),
         _t("prefix violation wins its slot", {"xs": [1, -5]}, False)],
        {"xs": "array<bigint>"}))
    # nested objects each with their own unevaluatedProperties
    # (struct-in-struct instance: interpreter shape)
    out.append(_xg(
        "ext nested unevaluatedProperties scopes",
        {"type": "object",
         "properties": {
             "o": {"type": "object",
                   "properties": {"a": {"type": "integer"}},
                   "unevaluatedProperties": False}},
         "unevaluatedProperties": False},
        [_t("inner + outer clean", {"o": {"a": 1}}, True),
         _t("inner extra fails inner scope", {"o": {"a": 1, "z": 2}}, False),
         _t("outer extra fails outer scope", {"o": {"a": 1}, "z": 2}, False),
         _t("empty inner", {"o": {}}, True),
         _t("outer empty", {}, True)]))
    return out


def gen_multipleof_float_edges():
    """``multipleOf`` under the engine's pinned IEEE rule
    ``(x / m) % 1.0 == 0`` — the float-trap cases (0.3 vs 0.1, 2.4 vs
    0.2) where decimal intuition and binary doubles disagree; both
    engines share IEEE-754 doubles so the verdicts are reproducible."""
    probes = [  # (value, multipleOf) -> rule computed below
        (0.3, 0.1), (0.2, 0.1), (1.0, 0.1), (2.4, 0.2), (0.75, 0.25),
        (4.5, 1.5), (5.0, 0.5), (1e16, 10.0), (-0.2, 0.1), (0.0, 0.1),
    ]
    out = []
    for mo in sorted({m for _, m in probes}):
        vals = [v for v, m in probes if m == mo]
        out.append(_xg(
            f"ext multipleOf IEEE edges m={mo}",
            {"type": "object",
             "properties": {"x": {"type": "number", "multipleOf": mo}}},
            [_t(f"x={v}", {"x": v}, (v / mo) % 1.0 == 0) for v in vals],
            {"x": "double"}))
    # integer instances against a fractional multipleOf
    out.append(_xg(
        "ext multipleOf fractional on integer column",
        {"type": "object",
         "properties": {"n": {"type": "integer", "multipleOf": 0.5}}},
        [_t("4 is 8*0.5", {"n": 4}, True),
         _t("7 is 14*0.5", {"n": 7}, True)],
        {"n": "bigint"}))
    return out


def gen_dependent_required_matrix():
    """``dependentRequired`` with multiple triggers and chained
    dependencies — each trigger fires independently; a chain a->b->c,d
    is NOT transitive (only PRESENT triggers fire)."""
    schema = {"type": "object",
              "dependentRequired": {"a": ["b"], "b": ["c", "d"]},
              "properties": {"a": {}, "b": {}, "c": {}, "d": {}}}

    def rule(inst):
        ok = True
        if "a" in inst:
            ok &= "b" in inst
        if "b" in inst:
            ok &= "c" in inst and "d" in inst
        return ok

    insts = [{}, {"a": 1}, {"a": 1, "b": 2}, {"b": 2, "c": 3},
             {"a": 1, "b": 2, "c": 3, "d": 4}, {"b": 1, "c": 2, "d": 3},
             {"c": 1, "d": 2}, {"d": 5}, {"a": 1, "c": 2, "d": 3}]
    return [_xg(
        "ext dependentRequired chain matrix", schema,
        [_t(str(sorted(i)), i, rule(i)) for i in insts],
        {"a": "bigint", "b": "bigint", "c": "bigint", "d": "bigint"})]


def gen_property_names():
    """``propertyNames`` with a TYPED subschema (the engine ladder rule:
    a typeless subschema asserts nothing — pinned by the last group):
    every present key is judged as a string instance."""
    out = []
    out.append(_xg(
        "ext propertyNames length and pattern",
        {"type": "object",
         "propertyNames": {"type": "string", "minLength": 2,
                           "pattern": "^[a-z_]+$"}},
        [_t("both keys ok", {"ab": 1, "cd_e": 2}, True),
         _t("short key", {"a": 1}, False),
         # NB: uppercase key must not case-collide with a lowercase
         # column (Spark resolves columns case-insensitively by default)
         _t("uppercase key", {"XY": 1}, False),
         _t("digit in key", {"k9": 1}, False),
         _t("empty object ok", {}, True)],
        {"ab": "bigint", "cd_e": "bigint", "a": "bigint",
         "XY": "bigint", "k9": "bigint"}))
    out.append(_xg(
        "ext propertyNames typeless subschema asserts nothing",
        {"type": "object",
         "propertyNames": {"minLength": 100}},
        [_t("any key passes (reference typeless rule)", {"a": 1}, True),
         _t("empty ok", {}, True)],
        {"a": "bigint"}))
    return out


def gen_contains_unique():
    """``contains``/``min``/``maxContains`` interacting with
    ``uniqueItems`` on the same array — independent checks that can each
    fire (or both) on one instance."""
    schema = {"type": "object", "properties": {"xs": {
        "type": "array", "uniqueItems": True,
        "contains": {"type": "integer", "minimum": 5},
        "maxContains": 2}}}

    def rule(xs):
        uniq = len(set(xs)) == len(xs)
        cnt = sum(1 for x in xs if isinstance(x, int) and x >= 5)
        return uniq and 1 <= cnt <= 2

    arrays = [[5, 6], [5, 5], [5, 6, 7], [1, 2], [], [5],
              [1, 5, 1], [9, 8, 1, 1], [4, 5, 6, 7]]
    return [_xg(
        "ext contains bounds with uniqueItems", schema,
        [_t(str(xs), {"xs": xs}, rule(xs)) for xs in arrays],
        {"xs": "array<bigint>"})]


def gen_format_annotation_only():
    """Formats the engine deliberately does NOT assert — ``time`` (the
    jsonschema/RFC-3339 divergence documented in functions/formats.py),
    ``duration``/``hostname``/``uri`` (no stable checker in this
    environment), and unknown format names — must stay INERT
    annotations in BOTH core and extensions mode: every instance,
    however malformed for the nominal format, is valid. Draft 2020-12
    format-annotation vocabulary behavior."""
    out = []
    samples = {
        "time": ["10:00:00", "23:59:59Z", "23:59:60Z", "25:99:99",
                 "junk", ""],
        "duration": ["P1D", "PT20M", "P3Y6M4DT12H30M5S", "P", "-P1D",
                     "nope"],
        "hostname": ["example.com", "-bad-.example", "a..b", "_x",
                     "x" * 300, ""],
        "uri": ["https://e.com/x", "not a uri", "%%", "::::", "a b",
                ""],
        "x-custom-format": ["anything", ""],
    }
    for fmt, vals in samples.items():
        schema = {"type": "object", "properties": {
            "s": {"type": "string", "format": fmt}}}
        for mode, mk in (("core", _group), ("ext", _xg)):
            out.append(mk(
                f"format {fmt} annotation-only {mode}", schema,
                [_t(f"inert on {v[:20]!r}", {"s": v}, True)
                 for v in vals],
                {"s": "string"}))
    return out


def gen_ref_in_prefixitems():
    """``$ref`` in array position — each ``prefixItems`` slot and the
    trailing ``items`` schema resolve through ``#/$defs``. The official
    suite exercises refs-inside-prefixItems; verdicts here come from
    independent per-slot predicates, never the engine."""
    schema = {
        "$defs": {
            "small": {"type": "integer", "maximum": 3},
            "big": {"type": "integer", "minimum": 10},
        },
        "type": "object",
        "properties": {"xs": {
            "type": "array",
            "prefixItems": [{"$ref": "#/$defs/small"},
                            {"$ref": "#/$defs/big"}],
            "items": {"$ref": "#/$defs/small"},
        }},
    }

    def rule(xs):
        ok = True
        if len(xs) >= 1:
            ok = ok and xs[0] <= 3
        if len(xs) >= 2:
            ok = ok and xs[1] >= 10
        return ok and all(x <= 3 for x in xs[2:])

    arrays = [[], [1], [4], [1, 10], [1, 9], [3, 12, 2], [3, 12, 7],
              [0, 10, 1, 2], [0, 10, 1, 9], [-5, 100, 3, 3, 3],
              [4, 10], [3, 10, -8, 0, 3, 4]]
    return [_xg("prefixItems slots by $ref", schema,
                [_t(str(xs), {"xs": xs}, rule(xs)) for xs in arrays],
                {"xs": "array<bigint>"})]


def gen_pattern_casefold():
    """ECMA ``pattern`` matching is case-SENSITIVE and codepoint-based;
    these pin the Unicode case edges (Kelvin sign, long s, dotted
    capital I, sigma forms, sharp s) where a casefolding or
    locale-aware regex engine would diverge — partial-match (search)
    semantics per V12. Verdicts enumerated by hand from the codepoint
    identity rule."""
    cases = [  # pattern -> [(input, expected)]
        ("straße", [("straße", True), ("STRASSE", False),
                         ("strasse", False), ("xstraßey", True)]),
        ("K", [("\u212a", False),   # KELVIN SIGN is not ASCII K
               ("Kelvin", True), ("kelvin", False)]),
        ("[K-L]", [("\u212a", False), ("K", True), ("k", False)]),
        ("s", [("ſ", False),          # LATIN SMALL LONG S
               ("so", True), ("S", False)]),
        ("i", [("İ", False),          # DOTTED CAPITAL I
               ("I", False), ("hi", True)]),
        ("Σ", [("σ", False), ("ς", False),
                    ("xΣy", True)]),
        ("[a-z]+", [("STRASSE", False), ("STRASSEx", True),
                    ("straße", True)]),   # 'stra' matches partially
        ("[A-Z]+", [("straße", False), ("ß", False)]),
    ]
    out = []
    for pat, tests in cases:
        schema = {"type": "object", "properties": {
            "s": {"type": "string", "pattern": pat}}}
        out.append(_group(
            f"pattern casefold {pat!r}", schema,
            [_t(f"vs {s!r}", {"s": s}, ok) for s, ok in tests],
            {"s": "string"}))
    return out


def gen_unevaluated_items_contains():
    """Draft 2020-12 evaluated-item tracking: an item is evaluated by
    its ``prefixItems`` slot OR by matching ``contains``; only the rest
    see ``unevaluatedItems``. Verdict rule (independent of the engine):
    at least one element >= 10 (contains), and every non-slot-0 element
    < 10 must be <= 5 (the unevaluated bound)."""
    schema = {"type": "object", "properties": {"xs": {
        "type": "array",
        "prefixItems": [{"type": "integer"}],
        "contains": {"type": "integer", "minimum": 10},
        "unevaluatedItems": {"type": "integer", "maximum": 5}}}}

    def rule(xs):
        if not any(x >= 10 for x in xs):
            return False
        return all(x <= 5 for i, x in enumerate(xs)
                   if i > 0 and x < 10)

    arrays = [[], [1], [15], [1, 12, 3], [1, 12, 7], [2, 15],
              [1, 12, 3, 99], [15, 8], [15, 6], [10], [9, 10], [1, 3],
              [12, 5, 5, 12, 5], [12, 5, 6]]
    return [_xg("ext unevaluatedItems after prefixItems and contains",
                schema,
                [_t(str(xs), {"xs": xs}, rule(xs)) for xs in arrays],
                {"xs": "array<bigint>"})]


def generate() -> list[dict]:
    groups = []
    for gen in (gen_type_matrix, gen_length, gen_bounds, gen_enum_const,
                gen_required_properties, gen_arrays, gen_refs,
                gen_combinators, gen_annotations, gen_type_array, gen_uuid,
                gen_patterns,
                gen_unicode_lengths, gen_ref_chains, gen_pattern_annexb,
                gen_numeric_boundaries, gen_enum_nasty, gen_combinator_nasty,
                gen_deep_nesting, gen_uuid_nasty, gen_bounds_grid,
                gen_ext_numeric, gen_ext_conditional, gen_ext_object,
                gen_ext_arrays, gen_ext_formats,
                gen_ext_anchors_unevaluated,
                gen_defs_in_items, gen_surrogate_length_edges,
                gen_enum_hetero, gen_nested_unevaluated,
                gen_multipleof_float_edges, gen_dependent_required_matrix,
                gen_property_names, gen_contains_unique,
                gen_format_annotation_only, gen_ref_in_prefixitems,
                gen_pattern_casefold, gen_unevaluated_items_contains):
        groups.extend(gen())
    return groups


def case_count(groups) -> int:
    return sum(len(g["tests"]) for g in groups)


if __name__ == "__main__":
    gs = generate()
    print(f"{len(gs)} groups, {case_count(gs)} cases, "
          f"{sum(1 for g in gs if 'columns' in g)} compiler-compatible groups")