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


def generate() -> list[dict]:
    groups = []
    for gen in (gen_type_matrix, gen_length, gen_bounds, gen_enum_const,
                gen_required_properties, gen_arrays, gen_refs,
                gen_combinators, gen_annotations, gen_type_array, gen_uuid,
                gen_patterns):
        groups.extend(gen())
    return groups


def case_count(groups) -> int:
    return sum(len(g["tests"]) for g in groups)


if __name__ == "__main__":
    gs = generate()
    print(f"{len(gs)} groups, {case_count(gs)} cases, "
          f"{sum(1 for g in gs if 'columns' in g)} compiler-compatible groups")
