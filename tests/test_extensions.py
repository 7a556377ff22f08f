"""Draft-2020-12 extension keywords (the reference's design.md TODO list):
not, if/then/else, multipleOf, exclusiveMinimum/Maximum, minProperties/
maxProperties, dependentRequired, contains/minContains/maxContains,
prefixItems, patternProperties, propertyNames, dependentSchemas, and the
assertive content* triple (contentEncoding/contentMediaType/contentSchema).

Three gates:
1. parity-off: with extensions=False (default) the keywords are inert —
   lenient parse ignores them, strict parse rejects them (reference
   behavior, byte-identical);
2. compiler vs pyvalidator byte-equality over typed rows (same harness as
   test_compiler_spark);
3. verdict differential vs the ``jsonschema`` package on dynamic
   instances (the third engine actually implements these keywords).
"""

import pytest
from pyspark.sql import Row

from json_schema_rs_spark import ValidationEngine
from json_schema_rs_spark.plans.pyvalidator import validate
from json_schema_rs_spark.plans.spec import SpecParseError, parse_spec

from test_compiler_spark import row_to_instance, spark_violations


def python_violations_ext(spec, df, keys=("id",)):
    root = parse_spec(spec, extensions=True)
    out = []
    for row in df.collect():
        inst = row_to_instance(row)
        for v in validate(root, inst):
            out.append(tuple(row[k] for k in keys) + (v.path, v.code, v.message))
    return sorted(out)


def cross_check(spark, spec, rows, schema, keys=("id",)):
    df = spark.createDataFrame(rows, schema=schema)
    engine = ValidationEngine(spec, key_cols=keys, extensions=True)
    got = spark_violations(engine, df, keys)
    want = python_violations_ext(spec, df, keys)
    assert got == want, f"\nspark: {got}\npy:    {want}"
    return got


class TestParityOff:
    def test_lenient_default_ignores_extensions(self, spark):
        spec = {"type": "object",
                "properties": {"a": {"type": "integer", "multipleOf": 5}},
                "not": {"type": "object"}}
        df = spark.createDataFrame([Row(id=1, a=7)], "id int, a int")
        # default engine: multipleOf/not invisible -> zero violations
        s = ValidationEngine(spec, key_cols=("id",)).validate(df).summary()
        assert s["violation_count"] == 0
        # extensions on: 7 is not a multiple of 5, and `not` matches
        s2 = ValidationEngine(spec, key_cols=("id",),
                              extensions=True).validate(df).summary()
        assert s2["violation_count"] == 2

    def test_strict_default_rejects_extension_keywords(self):
        with pytest.raises(SpecParseError, match="multipleOf"):
            parse_spec({"type": "integer", "multipleOf": 5}, strict=True)
        # strict + extensions accepts them
        n = parse_spec({"type": "integer", "multipleOf": 5},
                       strict=True, extensions=True)
        assert n.multiple_of == 5.0


class TestNumericExtensions:
    SCHEMA = "id int, a long, b double"
    SPEC = {"type": "object", "properties": {
        "a": {"type": "integer", "multipleOf": 3},
        "b": {"type": "number", "exclusiveMinimum": 0,
              "exclusiveMaximum": 10.5},
    }}

    def test_cross_engine_bytes(self, spark):
        rows = [Row(id=1, a=9, b=5.0),       # clean
                Row(id=2, a=7, b=0.0),       # not multiple; == exmin
                Row(id=3, a=-6, b=10.5),     # negative multiple ok; == exmax
                Row(id=4, a=None, b=-1.5),   # absent a; below exmin
                Row(id=5, a=0, b=10.4999)]   # zero is a multiple
        got = cross_check(spark, self.SPEC, rows, self.SCHEMA)
        codes = sorted(c for _, _, c, _ in got)
        assert codes == ["AboveExclusiveMaximum", "BelowExclusiveMinimum",
                         "BelowExclusiveMinimum", "NotMultipleOf"]

    def test_fractional_multiple_of(self, spark):
        spec = {"type": "object", "properties": {
            "b": {"type": "number", "multipleOf": 0.5}}}
        rows = [Row(id=1, b=2.5), Row(id=2, b=2.75), Row(id=3, b=-1.5)]
        got = cross_check(spark, spec, rows, "id int, b double")
        assert [r[0] for r in got] == [2]

    def test_jsonschema_verdicts(self):
        jsonschema = pytest.importorskip("jsonschema")
        spec = {"type": "number", "multipleOf": 0.5,
                "exclusiveMinimum": -2, "exclusiveMaximum": 7}
        root = parse_spec(spec, extensions=True)
        v3 = jsonschema.Draft202012Validator(spec)
        for x in (-2.5, -2, -1.5, 0, 0.25, 3.5, 6.5, 7, 7.5):
            assert (len(validate(root, x)) == 0) == v3.is_valid(x), x

    def test_decimal_multiple_of_quotient_semantics(self, spark):
        # regression: raw IEEE remainder (90.0 % 0.1 != 0) mass-flagged
        # valid decimal multiples; the quotient-is-integer form matches
        # the jsonschema package on non-binary-exact divisors
        jsonschema = pytest.importorskip("jsonschema")
        spec_j = {"type": "number", "multipleOf": 0.1}
        root = parse_spec(spec_j, extensions=True)
        v3 = jsonschema.Draft202012Validator(spec_j)
        for x in (90.0, 0.3, 3.3, 0.1, 1.0, 0.25, 10.02, 4.35, -90.0):
            assert (len(validate(root, x)) == 0) == v3.is_valid(x), x
        # jsonschema raises ValueError on non-finite instances; this
        # engine treats them as not-a-multiple (NaN quotient)
        for x in (float("nan"), float("inf"), float("-inf")):
            assert [v.code for v in validate(root, x)] == ["NotMultipleOf"]
        # cross-engine bytes on the same divisor
        spec = {"type": "object", "properties": {
            "b": {"type": "number", "multipleOf": 0.1}}}
        rows = [Row(id=1, b=90.0), Row(id=2, b=0.3), Row(id=3, b=-90.0),
                Row(id=4, b=4.35), Row(id=5, b=None)]
        got = cross_check(spark, spec, rows, "id int, b double")
        assert [r[0] for r in got] == [2, 4]


class TestNotIfThenElse:
    def test_not_cross_engine(self, spark):
        spec = {"type": "object", "properties": {
            "s": {"type": "string", "not": {"enum": ["forbidden", "banned"]}}}}
        rows = [Row(id=1, s="ok"), Row(id=2, s="forbidden"), Row(id=3, s=None)]
        got = cross_check(spark, spec, rows, "id int, s string")
        assert [(r[0], r[2]) for r in got] == [(2, "NotSchemaMatched")]

    def test_if_then_else_cross_engine(self, spark):
        # the transcript shape: IF role is "tool" THEN tool is required,
        # ELSE tool must be absent-or-enum
        spec = {"type": "object",
                "if": {"properties": {"role": {"const": "tool"}},
                       "required": ["role"]},
                "then": {"required": ["tool"]},
                "else": {"properties": {"tool": {"enum": ["search"]}}},
                "properties": {"role": {"type": "string"}}}
        rows = [Row(id=1, role="tool", tool="search"),    # then: ok
                Row(id=2, role="tool", tool=None),        # then: missing tool
                Row(id=3, role="user", tool="search"),    # else: ok
                Row(id=4, role="user", tool="browser"),   # else: enum miss
                Row(id=5, role=None, tool=None)]          # if fails (role absent): else, ok
        got = cross_check(spark, spec, rows, "id int, role string, tool string")
        assert [(r[0], r[2]) for r in got] == [
            (2, "MissingRequired"), (4, "NotInEnum")]

    def test_then_without_if_is_inert(self, spark):
        spec = {"type": "object", "then": {"required": ["x"]},
                "properties": {"x": {"type": "string"}}}
        rows = [Row(id=1, x=None)]
        assert cross_check(spark, spec, rows, "id int, x string") == []

    def test_jsonschema_verdicts(self):
        jsonschema = pytest.importorskip("jsonschema")
        spec = {"if": {"properties": {"a": {"const": 1}}, "required": ["a"]},
                "then": {"required": ["b"]},
                "else": {"not": {"required": ["b"]}}}
        root = parse_spec(spec, extensions=True)
        v3 = jsonschema.Draft202012Validator(spec)
        for inst in ({"a": 1, "b": 2}, {"a": 1}, {"a": 2, "b": 2},
                     {"a": 2}, {}, {"b": 1}):
            assert (len(validate(root, inst)) == 0) == v3.is_valid(inst), inst


class TestObjectExtensions:
    def test_min_max_properties_cross_engine(self, spark):
        spec = {"type": "object", "minProperties": 2, "maxProperties": 3,
                "properties": {"id": {"type": "integer"}}}
        # presence = non-null column among (id, x, y, z)
        rows = [Row(id=1, x="a", y=None, z=None),   # 2 present: ok
                Row(id=2, x=None, y=None, z=None),  # 1: too few
                Row(id=3, x="a", y="b", z="c")]     # 4: too many
        got = cross_check(spark, spec, rows,
                          "id int, x string, y string, z string")
        assert [(r[0], r[2]) for r in got] == [
            (2, "TooFewProperties"), (3, "TooManyProperties")]

    def test_dependent_required_cross_engine(self, spark):
        spec = {"type": "object",
                "dependentRequired": {"tool": ["ts", "role"]},
                "properties": {"tool": {"type": "string"}}}
        rows = [Row(id=1, tool="search", ts="t", role="r"),  # ok
                Row(id=2, tool="search", ts=None, role="r"), # missing ts
                Row(id=3, tool=None, ts=None, role=None)]    # trigger absent
        got = cross_check(spark, spec, rows,
                          "id int, tool string, ts string, role string")
        assert [(r[0], r[1], r[2]) for r in got] == [
            (2, "/ts", "MissingDependentRequired")]

    def test_jsonschema_verdicts(self):
        jsonschema = pytest.importorskip("jsonschema")
        spec = {"minProperties": 1, "maxProperties": 2,
                "dependentRequired": {"a": ["b"]}}
        root = parse_spec(spec, extensions=True)
        v3 = jsonschema.Draft202012Validator(spec)
        for inst in ({}, {"a": 1}, {"a": 1, "b": 2}, {"b": 2},
                     {"a": 1, "b": 2, "c": 3}, {"x": 1, "y": 2}):
            assert (len(validate(root, inst)) == 0) == v3.is_valid(inst), inst


class TestArrayExtensions:
    SCHEMA = "id int, arr array<int>"

    def test_contains_cross_engine(self, spark):
        spec = {"type": "object", "properties": {
            "arr": {"type": "array",
                    "contains": {"type": "integer", "minimum": 10},
                    "minContains": 2, "maxContains": 3}}}
        rows = [Row(id=1, arr=[10, 11, 1]),        # 2 matches: ok
                Row(id=2, arr=[10, 1, 2]),         # 1: too few
                Row(id=3, arr=[10, 11, 12, 13]),   # 4: too many
                Row(id=4, arr=[]),                 # 0: too few
                Row(id=5, arr=[1, None, 12, 20])]  # null element skipped: 2 ok
        got = cross_check(spark, spec, rows, self.SCHEMA)
        assert [(r[0], r[2]) for r in got] == [
            (2, "TooFewContains"), (3, "TooManyContains"),
            (4, "TooFewContains")]

    def test_min_contains_zero_always_satisfied(self, spark):
        spec = {"type": "object", "properties": {
            "arr": {"type": "array", "contains": {"const": 99},
                    "minContains": 0}}}
        rows = [Row(id=1, arr=[1, 2]), Row(id=2, arr=[])]
        assert cross_check(spark, spec, rows, self.SCHEMA) == []

    def test_prefix_items_and_items_after(self, spark):
        # NOTE: sub-schemas must carry a `type` for numeric bounds to
        # fire — typeless nodes enforce only presence checks, the
        # engine-wide reference semantic (validator/mod.rs:417-441)
        spec = {"type": "object", "properties": {
            "arr": {"type": "array",
                    "prefixItems": [{"const": 0},
                                    {"type": "integer", "minimum": 100}],
                    "items": {"type": "integer", "maximum": 9}}}}
        rows = [Row(id=1, arr=[0, 100, 1, 2]),   # ok everywhere
                Row(id=2, arr=[5, 100, 1]),      # prefix 0 mismatch
                Row(id=3, arr=[0, 1, 50]),       # prefix 1 below min, item 2 above max
                Row(id=4, arr=[0]),              # shorter than prefix: ok
                Row(id=5, arr=[])]               # empty: ok
        got = cross_check(spark, spec, rows, self.SCHEMA)
        assert [(r[0], r[1], r[2]) for r in got] == [
            (2, "/arr/0", "NotConst"),
            (3, "/arr/1", "BelowMinimum"),
            (3, "/arr/2", "AboveMaximum")]

    def test_jsonschema_verdicts(self):
        jsonschema = pytest.importorskip("jsonschema")
        spec = {"type": "array",
                "prefixItems": [{"const": 0}],
                "items": {"type": "integer", "maximum": 9},
                "contains": {"type": "integer", "minimum": 5},
                "minContains": 1, "maxContains": 2}
        root = parse_spec(spec, extensions=True)
        v3 = jsonschema.Draft202012Validator(spec)
        for inst in ([0, 5], [0, 1], [0, 5, 6, 7], [0], [],
                     [1, 5], [0, 5, 6], [0, 10]):
            assert (len(validate(root, inst)) == 0) == v3.is_valid(inst), inst


class TestExtensionsPlanShape:
    def test_row_local_extensions_no_exchange(self, spark):
        """Every extension keyword stays in the zero-shuffle row plan."""
        spec = {"type": "object", "minProperties": 1,
                "dependentRequired": {"a": ["b"]},
                "dependentSchemas": {"b": {"required": ["a"]}},
                "patternProperties": {"^b$": {"type": "string"}},
                "propertyNames": {"maxLength": 3},
                "if": {"required": ["a"]}, "then": {"required": ["b"]},
                "not": {"properties": {"a": {"const": -1}}},
                "properties": {
                    "a": {"type": "integer", "multipleOf": 2,
                          "exclusiveMinimum": 0},
                    "arr": {"type": "array", "contains": {"minimum": 1},
                            "prefixItems": [{"const": 0}]}}}
        df = spark.createDataFrame(
            [Row(id=1, a=2, b="x", arr=[0, 1])],
            "id int, a long, b string, arr array<int>")
        engine = ValidationEngine(spec, key_cols=("id",), extensions=True)
        plan = engine.validate(df).violations._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan, plan


class TestObjectSchemaExtensions:
    def test_pattern_properties_cross_engine(self, spark):
        spec = {"type": "object",
                "patternProperties": {
                    "^meta_": {"type": "string", "minLength": 2}},
                "properties": {"id": {"type": "integer"}}}
        rows = [Row(id=1, meta_a="ok", meta_b="xx", other="z"),
                Row(id=2, meta_a="y", meta_b=None, other=None),  # too short
                Row(id=3, meta_a=None, meta_b="zz", other="q")]
        got = cross_check(spark, spec, rows,
                          "id int, meta_a string, meta_b string, other string")
        assert [(r[0], r[1], r[2]) for r in got] == [(2, "/meta_a", "TooShort")]

    def test_pattern_properties_excuse_additional(self, spark):
        spec = {"type": "object", "additionalProperties": False,
                "patternProperties": {"^x_": {"type": "string"}},
                "properties": {"id": {"type": "integer"}}}
        rows = [Row(id=1, x_a="ok", rogue="bad"),
                Row(id=2, x_a="ok", rogue=None)]
        got = cross_check(spark, spec, rows, "id int, x_a string, rogue string")
        assert [(r[0], r[1], r[2]) for r in got] == [
            (1, "/rogue", "DisallowedAdditionalProperty")]

    def test_property_names_cross_engine(self, spark):
        spec = {"type": "object",
                "propertyNames": {"type": "string", "maxLength": 4}}
        rows = [Row(id=1, ab="x", toolong="y"),
                Row(id=2, ab="x", toolong=None)]  # absent -> not judged present
        got = cross_check(spark, spec, rows, "id int, ab string, toolong string")
        assert [(r[0], r[1], r[2]) for r in got] == [
            (1, "/toolong", "InvalidPropertyName")]

    def test_dependent_schemas_cross_engine(self, spark):
        spec = {"type": "object",
                "dependentSchemas": {
                    "tool": {"required": ["ts"],
                             "properties": {"role": {"const": "tool"}}}},
                "properties": {"role": {"type": "string"}}}
        rows = [Row(id=1, tool="search", ts="t", role="tool"),   # ok
                Row(id=2, tool="search", ts=None, role="tool"),  # missing ts
                Row(id=3, tool="search", ts="t", role="user"),   # const miss
                Row(id=4, tool=None, ts=None, role="user")]      # untriggered
        got = cross_check(spark, spec, rows,
                          "id int, tool string, ts string, role string")
        assert [(r[0], r[1], r[2]) for r in got] == [
            (2, "/ts", "MissingRequired"), (3, "/role", "NotConst")]

    def test_jsonschema_verdicts(self):
        jsonschema = pytest.importorskip("jsonschema")
        spec = {"type": "object",
                "patternProperties": {"^n_": {"type": "integer"}},
                "propertyNames": {"type": "string", "pattern": "^[a-z_]+$"},
                "dependentSchemas": {"a": {"required": ["b"]}},
                "properties": {"a": {"type": "integer"},
                               "b": {"type": "integer"}}}
        root = parse_spec(spec, extensions=True)
        v3 = jsonschema.Draft202012Validator(spec)
        for inst in ({"a": 1, "b": 2}, {"a": 1}, {"n_x": 1}, {"n_x": "s"},
                     {"BAD": 1}, {"b": 2, "n_y": 0}, {}):
            assert (len(validate(root, inst)) == 0) == v3.is_valid(inst), inst

    def test_invalid_pattern_properties_rejected_at_parse(self):
        with pytest.raises(SpecParseError, match="ECMA-262"):
            parse_spec({"patternProperties": {"(?i)x": {}}}, extensions=True)


def _b64json(d):
    import base64
    import json
    return base64.b64encode(json.dumps(d).encode()).decode()


class TestContentExtensions:
    SPEC = {"type": "object", "properties": {
        "payload": {"type": "string", "contentEncoding": "base64",
                    "contentMediaType": "application/json",
                    "contentSchema": {
                        "type": "object", "required": ["k"],
                        "properties": {"k": {"type": "integer",
                                             "maximum": 50}}}},
        "raw": {"type": "string", "contentMediaType": "application/json"}}}

    def test_content_ladder_cross_engine(self, spark):
        rows = [
            Row(id=0, payload=_b64json({"k": 10}), raw="{}"),   # clean
            Row(id=1, payload="!!notb64", raw="{}"),            # bad base64
            Row(id=2, payload=_b64json({"k": 99}), raw="nope"),
            Row(id=3, payload="e29vcHM=", raw="[1,2]"),         # b64 of {oops
            Row(id=4, payload=_b64json({"x": 1}), raw=None),
        ]
        got = cross_check(spark, self.SPEC, rows,
                          "id int, payload string, raw string")
        assert [(r[0], r[1], r[2]) for r in got] == [
            (1, "/payload", "InvalidContentEncoding"),
            (2, "/payload/k", "AboveMaximum"),
            (2, "/raw", "InvalidContentMediaType"),
            (3, "/payload", "InvalidContentMediaType"),
            (4, "/payload/k", "MissingRequired"),
        ]

    def test_content_schema_refs_and_nesting(self, spark):
        # contentSchema is a full sub-document: $refs resolve against the
        # ROOT schema; nested violations re-root under the property path
        spec = {"type": "object",
                "$defs": {"pt": {"type": "object", "required": ["x"]}},
                "properties": {"doc": {
                    "type": "string", "contentMediaType": "application/json",
                    "contentSchema": {
                        "type": "object",
                        "properties": {"p": {"$ref": "#/$defs/pt"}}}}}}
        rows = [Row(id=1, doc='{"p": {"x": 1}}'),
                Row(id=2, doc='{"p": {}}')]
        got = cross_check(spark, spec, rows, "id int, doc string")
        assert [(r[0], r[1], r[2]) for r in got] == [
            (2, "/doc/p/x", "MissingRequired")]

    def test_trailing_newline_is_not_base64(self, spark):
        # regression: ^..$ anchors let "$" match before a final newline on
        # BOTH engines (Python re and Java rlike), so "AAAAAAA\n" (len 8,
        # %4==0) passed the validity gate and then blew up b64decode;
        # \A..\z / fullmatch reject it
        from json_schema_rs_spark.plans.pyvalidator import content_b64_valid
        assert not content_b64_valid("AAAAAAA\n")
        assert not content_b64_valid("AAAA\n")
        assert content_b64_valid("AAAA")
        spec = {"type": "object", "properties": {
            "p": {"type": "string", "contentEncoding": "base64"}}}
        rows = [Row(id=1, p="AAAAAAA\n"), Row(id=2, p="AAAA"),
                Row(id=3, p="AAAA\nAAAA")]
        got = cross_check(spark, spec, rows, "id int, p string")
        assert [(r[0], r[2]) for r in got] == [
            (1, "InvalidContentEncoding"), (3, "InvalidContentEncoding")]

    def test_json_mode_content(self):
        # the pure-Python path gets content* on nested strings for free
        root = parse_spec(
            {"type": "object", "properties": {
                "inner": {"type": "string", "contentEncoding": "base64"}}},
            extensions=True)
        assert validate(root, {"inner": "AAAA"}) == []
        bad = validate(root, {"inner": "A"})
        assert [(v.path, v.code) for v in bad] == [
            ("/inner", "InvalidContentEncoding")]

    def test_stricter_than_2020_12_documented_divergence(self):
        # 2020-12 makes content* annotation-only; this engine asserts them
        # (draft-07 style) because an inert opt-in extension is useless.
        jsonschema = pytest.importorskip("jsonschema")
        spec = {"type": "string", "contentEncoding": "base64"}
        assert jsonschema.Draft202012Validator(spec).is_valid("!!!")
        root = parse_spec(spec, extensions=True)
        # typed-target compiler never sees a bare-string root, but the
        # pyvalidator (JSON mode) does:
        assert [v.code for v in validate(root, "!!!")] == [
            "InvalidContentEncoding"]

    def test_content_parse_rules(self):
        for bad, msg in ((
                {"contentEncoding": "base32"}, "only .base64."), (
                {"contentMediaType": "text/html"}, "only .application/json."), (
                {"contentSchema": {}}, "requires contentMediaType")):
            with pytest.raises(SpecParseError, match=msg):
                parse_spec(bad, extensions=True)
        # off by default: inert lenient, rejected strict
        parse_spec({"contentEncoding": "base32"})  # ignored, no error
        with pytest.raises(SpecParseError, match="unknown field"):
            parse_spec({"contentEncoding": "base64"}, strict=True)

class TestAnchorsDynamicRef:
    """$anchor / $dynamicAnchor / $dynamicRef (design.md TODO rows).

    Single-resource documents only (the engine, like the reference, has no
    $id/remote resolution), so the dynamic scope IS the document and
    $dynamicRef degenerates to anchor lookup — spec-faithful for this
    subset, and identical to what Draft202012Validator does on the same
    documents.
    """

    SPEC = {"type": "object",
            "$defs": {
                "posint": {"$anchor": "posint",
                           "type": "integer", "minimum": 1},
                "wrap": {"$dynamicRef": "#dynpos"},
                "dynpos": {"$dynamicAnchor": "dynpos",
                           "type": "integer", "maximum": 9}},
            "properties": {
                "a": {"$ref": "#posint"},
                "b": {"$dynamicRef": "#posint"},
                "c": {"$ref": "#/$defs/wrap"}}}

    def test_cross_engine_bytes(self, spark):
        rows = [Row(id=1, a=2, b=3, c=4),        # clean
                Row(id=2, a=0, b=0, c=10),       # all three fire
                Row(id=3, a=None, b=None, c=None)]  # absent: inert
        got = cross_check(spark, self.SPEC, rows,
                          "id int, a long, b long, c long")
        assert [(r[0], r[1], r[2]) for r in got] == [
            (2, "/a", "BelowMinimum"), (2, "/b", "BelowMinimum"),
            (2, "/c", "AboveMaximum")]

    def test_anchor_not_found_cross_engine(self, spark):
        # unresolvable anchor -> InvalidRef at validate time (reference
        # shape: resolution errors are per-row violations, not parse
        # errors — ref_resolver.rs:118-155), naming the AnchorNotFound
        # variant in the Rust-Debug reason string
        spec = {"type": "object",
                "properties": {"x": {"$ref": "#nowhere"}}}
        rows = [Row(id=1, x=1)]
        got = cross_check(spark, spec, rows, "id int, x long")
        assert [(r[0], r[1], r[2]) for r in got] == [(1, "/x", "InvalidRef")]
        assert 'AnchorNotFound { ref_str: "#nowhere", name: "nowhere" }' \
            in got[0][3]

    def test_extensions_off_keeps_reference_behavior(self, spark):
        # with extensions off, "#name" refs stay UnsupportedFragment
        # (byte-parity with the reference, ref_resolver.rs:76-110) and
        # $anchor/$dynamicRef are unknown keywords: lenient-inert,
        # strict-rejected
        spec = {"type": "object",
                "properties": {"x": {"$ref": "#posint"}},
                "$defs": {"posint": {"$anchor": "posint",
                                     "type": "integer", "minimum": 1}}}
        df = spark.createDataFrame([Row(id=1, x=0)], "id int, x long")
        engine = ValidationEngine(spec, key_cols=("id",))
        got = spark_violations(engine, df, ("id",))
        assert [(r[1], r[2]) for r in got] == [("/x", "InvalidRef")]
        assert 'UnsupportedFragment { ref_str: "#posint" }' in got[0][3]
        with pytest.raises(SpecParseError, match=r"\$anchor"):
            parse_spec({"$anchor": "a"}, strict=True)

    def test_parse_rules(self):
        for bad, msg in ((
                {"$anchor": "1bad"}, "valid anchor name"), (
                {"$anchor": 7}, "valid anchor name"), (
                {"$dynamicRef": 3}, "must be a string"), (
                {"$defs": {"a": {"$anchor": "dup"},
                           "b": {"$dynamicAnchor": "dup"}}},
                "duplicate anchor")):
            with pytest.raises(SpecParseError, match=msg):
                parse_spec(bad, extensions=True)
        # same node may carry both spellings of one name
        root = parse_spec({"$anchor": "n", "$dynamicAnchor": "n"},
                          extensions=True)
        assert root.anchors == {"n": root}

    def test_root_self_anchor_is_recursion_safe(self, spark):
        # a root carrying its own anchor puts root into root.anchors —
        # repr/eq/fingerprint must not recurse, and a $ref to it must
        # behave exactly like $ref "#"
        spec = {"$anchor": "top", "type": "object",
                "required": ["id"],
                "properties": {"id": {"type": "integer"}}}
        root = parse_spec(spec, extensions=True)
        repr(root)                      # dataclass repr: anchors excluded
        assert root.fingerprint() == parse_spec(
            dict(spec), extensions=True).fingerprint()
        rows = [Row(id=None, x=1)]
        got = cross_check(spark, spec, rows, "id int, x long")
        assert [(r[1], r[2]) for r in got] == [("/id", "MissingRequired")]

    def test_jsonschema_verdicts(self):
        jsonschema = pytest.importorskip("jsonschema")
        root = parse_spec(self.SPEC, extensions=True)
        v3 = jsonschema.Draft202012Validator(self.SPEC)
        for inst in ({"a": 1, "b": 1, "c": 9}, {"a": 0}, {"b": 0},
                     {"c": 10}, {"a": 5, "b": 0, "c": 11}, {},
                     {"a": 1.5}, {"c": 3}):
            assert (len(validate(root, inst)) == 0) == v3.is_valid(inst), inst

class TestFormats:
    """Assertive `format` extension (E15) — the selected formats the
    jsonschema package's FormatChecker can differentially verify here."""

    CASES = {
        "date": ["2024-02-29", "2023-02-29", "2024-1-1", "20240101",
                 "2024-W01-1", "2024-013", "0000-01-01", "999-01-01",
                 "2024-00-10", "2024-13-01", "2024-04-31", "2024-04-30",
                 "1-01-01", "2024-02-29 ", " 2024-02-29", "2024-02-29\n"],
        "date-time": [
            "2024-01-01T00:00:00Z", "2024-01-01t00:00:00z",
            "2024-02-30T00:00:00Z", "2024-01-01T23:59:60Z",
            "2024-01-01T00:00:00+05:30", "2024-01-01T00:00:00",
            "2024-01-01 00:00:00Z", "2024-01-01T00:00:00.123456789Z",
            "2024-01-01T24:00:00Z", "2024-01-01T00:00:00+24:00",
            "2024-01-01T00:00:00-00:00", "2024-01-01T00:00Z",
            "2024-01-01T00:00:00.Z", "2024-01-01T00:00:00+0530",
            "0000-01-01T00:00:00Z", "9999-12-31T23:59:59+23:59",
            "2024-01-01T00:00:00.5+05:30"],
        "ipv4": ["1.2.3.4", "01.2.3.4", "256.1.1.1", "1.2.3", "1.2.3.4.5",
                 " 1.2.3.4", "0.0.0.0", "255.255.255.255", "1.2.3.04",
                 "1.2.3.4\n", "1.2.3.400", "12.34.56.78"],
        "ipv6": ["::1", "::", "1:2:3:4:5:6:7:8", "::ffff:1.2.3.4",
                 "fe80::1%eth0", "1::2::3", "::0001", "12345::",
                 "1:2:3:4:5:6:1.2.3.4", "::1.2.3.4", "1::", ":",
                 ":::", "1:2:3:4:5:6:7:8:9", "1:2:3:4:5:6:7:1.2.3.4",
                 "a:b:c:d:e:f:A:B", "::1\n", "g::1"],
        "json-pointer": ["", "/a/b", "/a~0b", "/a~2b", "a/b", "/", "/a~",
                         "/~1", "//", "/a/", "~", "/é", "/a~01"],
        "email": ["a@b", "a b@c", "@", "no-at", "", "x@y@z", "@@"],
        # ASCII inputs only: jsonschema's checker uses str.isdigit and
        # would also accept Unicode digit strings (divergence pinned in
        # test_rel_pointer_unicode_digit_documented_divergence)
        "relative-json-pointer": [
            "0", "1", "12", "0#", "12#", "1/a/b", "0/", "1/a~0b", "",
            "#", "/a", "01", "00#", "1#", "1#/x", "-1", "1 ", "5/a~2",
            "10/~1", "0//", "3#extra", "2/a~", "007"],
    }

    def test_jsonschema_verdicts(self):
        jsonschema = pytest.importorskip("jsonschema")
        fc = jsonschema.FormatChecker()
        for f, cases in self.CASES.items():
            root = parse_spec({"type": "string", "format": f},
                              extensions=True)
            v3 = jsonschema.Draft202012Validator(
                {"type": "string", "format": f}, format_checker=fc)
            for x in cases:
                assert (len(validate(root, x)) == 0) == v3.is_valid(x), \
                    (f, x)

    def test_rel_pointer_unicode_digit_documented_divergence(self):
        # the ABNF is %x30-39; jsonschema's str.isdigit loop also
        # accepts Unicode digits — we follow the spec
        jsonschema = pytest.importorskip("jsonschema")
        fc = jsonschema.FormatChecker()
        v3 = jsonschema.Draft202012Validator(
            {"type": "string", "format": "relative-json-pointer"},
            format_checker=fc)
        root = parse_spec(
            {"type": "string", "format": "relative-json-pointer"},
            extensions=True)
        assert v3.is_valid("١٢")                       # their quirk
        assert [v.code for v in validate(root, "١٢")] == ["InvalidFormat"]

    REGEX_AGREE = ["abc", "a|b", "[0-9]+", "^x$", "a{2,3}", "(a)(b)\\2",
                   "(", "[", "a{3,2}", ")", "*a", "\\", "(?<=a)b",
                   "a{,3}", "x**", "(?:x)+", "[^a-z]", "a??"]
    # (pattern, python_re_valid, ecma_valid) — dialect divergences, each
    # explained: inline flags / (?P< are Python-only syntax; (?<name> is
    # the ECMA named group (a Python error); \p \q [a-\w] are Annex B
    # identity-escape / class forms Python rejects
    REGEX_DIVERGE = [("(?i)x", True, False), ("(?P<n>x)", True, False),
                     ("(?<n>x)", False, True), ("\\p{L}", False, True),
                     ("\\q", False, True), ("[a-\\w]", False, True)]

    def test_regex_format_vs_python_re_classified(self):
        # format:"regex" asserts the ECMA-262 dialect (the same auditor
        # the pattern keyword compiles under); jsonschema's checker is
        # re.compile (Python dialect). Agreement on the common subset,
        # every divergence dialect-classified.
        import re as _re
        jsonschema = pytest.importorskip("jsonschema")
        fc = jsonschema.FormatChecker()
        v3 = jsonschema.Draft202012Validator(
            {"type": "string", "format": "regex"}, format_checker=fc)
        root = parse_spec({"type": "string", "format": "regex"},
                          extensions=True)
        for x in self.REGEX_AGREE:
            ours = len(validate(root, x)) == 0
            assert ours == v3.is_valid(x), x
        for x, py_ok, ecma_ok in self.REGEX_DIVERGE:
            try:
                _re.compile(x)
                py = True
            except _re.error:
                py = False
            assert py == py_ok == v3.is_valid(x), x
            assert (len(validate(root, x)) == 0) == ecma_ok, x

    def test_regex_format_consistent_with_pattern_keyword(self):
        # a spec can never carry a pattern that format:"regex" blesses
        # and the compiler rejects: both run the same ECMA audit
        from json_schema_rs_spark.functions.ecma_regex import translate
        root = parse_spec({"type": "string", "format": "regex"},
                          extensions=True)
        for x in self.REGEX_AGREE + [d[0] for d in self.REGEX_DIVERGE]:
            assert (len(validate(root, x)) == 0) == translate(x).valid, x

    def test_datetime_trailing_newline_documented_divergence(self):
        # jsonschema's date-time checker is "$"-anchored (rfc3339_validator
        # RFC3339_REGEX), so "...Z\n" passes it — a library quirk, not
        # RFC 3339. This engine anchors \A..\z and rejects it (stricter,
        # spec-faithful); pinned here so the divergence stays deliberate.
        jsonschema = pytest.importorskip("jsonschema")
        fc = jsonschema.FormatChecker()
        v3 = jsonschema.Draft202012Validator(
            {"type": "string", "format": "date-time"}, format_checker=fc)
        root = parse_spec({"type": "string", "format": "date-time"},
                          extensions=True)
        assert v3.is_valid("2024-01-01T00:00:00Z\n")          # their quirk
        assert [v.code for v in validate(root, "2024-01-01T00:00:00Z\n")] \
            == ["InvalidFormat"]

    def test_ipv4_ipv6_fuzz_vs_ipaddress(self):
        # the regexes claim exact ipaddress-module parity — fuzz it
        import ipaddress
        import random
        from json_schema_rs_spark.functions.formats import python_valid
        rng = random.Random(4242)
        alphabet = "0123456789abcdefABCDEF.:% "
        pool = []
        for _ in range(3000):
            pool.append("".join(rng.choice(alphabet)
                                for _ in range(rng.randrange(1, 24))))
        # plus mutations of valid addresses
        seeds = ["1:2:3:4:5:6:7:8", "::ffff:1.2.3.4", "fe80::1",
                 "255.255.255.255", "10.0.0.1"]
        for s in seeds:
            for _ in range(200):
                t = list(s)
                t[rng.randrange(len(t))] = rng.choice(alphabet)
                pool.append("".join(t))
        for x in pool:
            for f, cls in (("ipv4", ipaddress.IPv4Address),
                           ("ipv6", ipaddress.IPv6Address)):
                try:
                    addr = cls(x)
                    # IPv6Address accepts "%zone" since 3.9; jsonschema's
                    # checker (and this engine) treats a zone as invalid
                    want = not getattr(addr, "scope_id", None)
                except ValueError:
                    want = False
                assert python_valid(f, x) == want, (f, x)

    def test_cross_engine_bytes(self, spark):
        spec = {"type": "object", "properties": {
            "d": {"type": "string", "format": "date"},
            "ip": {"type": "string", "format": "ipv4"},
            "em": {"type": "string", "format": "email"}}}
        rows = [Row(id=1, d="2024-02-29", ip="10.0.0.1", em="a@b"),
                Row(id=2, d="2023-02-29", ip="256.0.0.1", em="nope"),
                Row(id=3, d=None, ip="01.2.3.4", em=None),
                Row(id=4, d="2024-1-1", ip=None, em="@")]
        got = cross_check(spark, spec, rows, "id int, d string, ip string, em string")
        assert [(r[0], r[1], r[2]) for r in got] == [
            (2, "/d", "InvalidFormat"), (2, "/em", "InvalidFormat"),
            (2, "/ip", "InvalidFormat"),
            (3, "/ip", "InvalidFormat"), (4, "/d", "InvalidFormat")]
        assert 'string "2023-02-29" is not a valid "date"' in got[0][3]

    def test_cross_engine_bytes_regex_and_rel_pointer(self, spark):
        # the regex format's Arrow-UDF Spark path and the rel-pointer
        # regex path must match the interpreter byte-for-byte
        spec = {"type": "object", "properties": {
            "rx": {"type": "string", "format": "regex"},
            "rp": {"type": "string", "format": "relative-json-pointer"}}}
        rows = [Row(id=1, rx="[0-9]+", rp="0#"),
                Row(id=2, rx="(", rp="01"),
                Row(id=3, rx="(?i)x", rp="1/a~2"),
                Row(id=4, rx=None, rp=None),
                Row(id=5, rx="(?<n>x)", rp="12/a/b")]
        got = cross_check(spark, spec, rows, "id int, rx string, rp string")
        assert [(r[0], r[1], r[2]) for r in got] == [
            (2, "/rp", "InvalidFormat"), (2, "/rx", "InvalidFormat"),
            (3, "/rp", "InvalidFormat"), (3, "/rx", "InvalidFormat")]
        assert 'string "(" is not a valid "regex"' in got[1][3]

    def test_off_by_default_and_unknown_formats_inert(self, spark):
        # format is a CORE keyword: strict accepts it, and without
        # extensions every non-uuid format stays an annotation
        spec = {"type": "object", "properties": {
            "d": {"type": "string", "format": "date"}}}
        df = spark.createDataFrame([Row(id=1, d="junk")], "id int, d string")
        s = ValidationEngine(spec, key_cols=("id",)).validate(df).summary()
        assert s["violation_count"] == 0
        n = parse_spec({"type": "string", "format": "date"}, strict=True)
        assert n.format == "date" and n.ext_format is None
        # unknown/unsupported formats stay annotations even with
        # extensions on (time is deliberately excluded — jsonschema's
        # checker diverges from RFC 3339)
        for f in ("time", "hostname", "uri", "duration", "nonsense"):
            root = parse_spec({"type": "string", "format": f},
                              extensions=True)
            assert root.ext_format is None
            assert validate(root, "anything") == []

class TestUnevaluated:
    """unevaluatedProperties / unevaluatedItems (E16) over the supported
    shapes (no $ref/combinator siblings — loud parse errors instead of
    silent divergence from the exclusive-keyword ladder)."""

    def test_jsonschema_verdicts_properties(self):
        jsonschema = pytest.importorskip("jsonschema")
        spec = {"type": "object",
                "if": {"properties": {"t": {"const": "x"}}, "required": ["t"]},
                "then": {"properties": {"u": {"type": "integer"}}},
                "else": {"properties": {"w": {"type": "integer"}}},
                "dependentSchemas": {"d": {"properties": {"e": {}}}},
                "properties": {"t": {"type": "string"}},
                "unevaluatedProperties": False}
        root = parse_spec(spec, extensions=True)
        v3 = jsonschema.Draft202012Validator(spec)
        for inst in ({"t": "x", "u": 1}, {"t": "x", "w": 1},
                     {"t": "y", "w": 1}, {"t": "y", "u": 1}, {"u": 1},
                     {"t": "x", "u": "bad"}, {"d": 1, "e": 2}, {"e": 2},
                     {"t": "x", "u": 1, "d": 0, "e": 0}, {},
                     {"t": "x", "u": 1, "z": 9}):
            assert (len(validate(root, inst)) == 0) == v3.is_valid(inst), inst

    def test_jsonschema_verdicts_items(self):
        jsonschema = pytest.importorskip("jsonschema")
        for spec in (
            {"type": "array", "prefixItems": [{"type": "integer"}],
             "unevaluatedItems": False},
            {"type": "array", "contains": {"type": "integer"},
             "unevaluatedItems": False},
            {"type": "array", "items": {"type": "integer"},
             "unevaluatedItems": False},
            {"type": "array", "prefixItems": [{}],
             "unevaluatedItems": {"type": "integer"}},
        ):
            root = parse_spec(spec, extensions=True)
            v3 = jsonschema.Draft202012Validator(spec)
            for inst in ([], [1], [1, 2], [1, "a"], ["a"], ["a", "b"],
                         [1, 2, "c"], ["x", 1], [1.5], [True]):
                assert (len(validate(root, inst)) == 0) == v3.is_valid(inst), \
                    (spec, inst)

    def test_cross_engine_properties(self, spark):
        # transcript shape: `then` evaluates tool only for tool turns;
        # ts is never evaluated -> always flagged when present
        spec = {"type": "object",
                "if": {"properties": {"role": {"const": "tool"}},
                       "required": ["role"]},
                "then": {"properties": {"tool": {"type": "string"}}},
                "properties": {"role": {"type": "string"},
                               "id": {"type": "integer"}},
                "unevaluatedProperties": False}
        rows = [Row(id=1, role="tool", tool="search", ts=None),
                Row(id=2, role="user", tool="search", ts=None),
                Row(id=3, role="tool", tool=None, ts=7),
                Row(id=4, role=None, tool=None, ts=None)]
        got = cross_check(spark, spec, rows,
                          "id int, role string, tool string, ts long")
        assert [(r[0], r[1], r[2]) for r in got] == [
            (2, "/tool", "DisallowedUnevaluatedProperty"),
            (3, "/ts", "DisallowedUnevaluatedProperty")]
        assert 'unevaluated property "tool" not allowed' in got[0][3]

    def test_cross_engine_properties_schema_form(self, spark):
        # schema-form unevaluatedProperties: unevaluated keys must satisfy
        # the sub-schema instead of being forbidden
        spec = {"type": "object",
                "properties": {"a": {"type": "string"},
                               "id": {"type": "integer"}},
                "unevaluatedProperties": {"type": "integer"}}
        rows = [Row(id=1, a="x", b=3), Row(id=2, a="x", b=None),
                Row(id=3, a=None, b=4)]
        schema = "id int, a string, b long"
        got = cross_check(spark, spec, rows, schema)
        assert got == []  # b is integer everywhere it's present
        spec2 = {"type": "object",
                 "properties": {"a": {"type": "string"},
                                "id": {"type": "integer"}},
                 "unevaluatedProperties": {"type": "string"}}
        got2 = cross_check(spark, spec2, rows, schema)
        assert [(r[0], r[1], r[2]) for r in got2] == [
            (1, "/b", "ExpectedString"), (3, "/b", "ExpectedString")]

    def test_cross_engine_items(self, spark):
        spec = {"type": "object", "properties": {
            "id": {"type": "integer"},
            "xs": {"type": "array",
                   "prefixItems": [{"type": "integer"}],
                   "contains": {"const": 0},
                   "unevaluatedItems": False}}}
        rows = [Row(id=1, xs=[5]),          # prefix only
                Row(id=2, xs=[5, 0]),       # second matches contains
                Row(id=3, xs=[5, 0, 9]),    # 9 unevaluated
                Row(id=4, xs=None), Row(id=5, xs=[])]
        got = cross_check(spark, spec, rows, "id int, xs array<long>")
        # contains defaults minContains to 1: rows 1 ([5]) and 5 ([]) have
        # zero matches -> TooFewContains; row 3's 9 is unevaluated
        assert [(r[0], r[1], r[2]) for r in got] == [
            (1, "/xs", "TooFewContains"),
            (3, "/xs/2", "DisallowedUnevaluatedItem"),
            (5, "/xs", "TooFewContains")]

    def test_parse_guards(self):
        for bad, kw in ((
                {"allOf": [{}], "unevaluatedProperties": False}, "allOf"), (
                {"$ref": "#", "unevaluatedProperties": False}, r"\$ref"), (
                {"additionalProperties": True,
                 "unevaluatedProperties": False}, "additionalProperties"), (
                {"anyOf": [{}], "unevaluatedItems": False}, "anyOf"), (
                {"if": {}, "unevaluatedItems": False}, "if"), (
                {"dependentSchemas": {},
                 "unevaluatedItems": False}, "dependentSchemas")):
            with pytest.raises(SpecParseError, match=kw):
                parse_spec(bad, extensions=True)
        # true-form is inert, items-present makes unevaluatedItems inert
        root = parse_spec({"type": "array", "items": {},
                           "unevaluatedItems": False}, extensions=True)
        assert validate(root, ["anything", 1]) == []
        root2 = parse_spec({"unevaluatedProperties": True}, extensions=True)
        assert validate(root2, {"x": 1}) == []

    def test_off_by_default(self, spark):
        spec = {"type": "object", "properties": {"a": {"type": "string"}},
                "unevaluatedProperties": False}
        df = spark.createDataFrame([Row(id=1, a="x", b=1)],
                                   "id int, a string, b long")
        s = ValidationEngine(spec, key_cols=("id",)).validate(df).summary()
        assert s["violation_count"] == 0
        with pytest.raises(SpecParseError, match="unevaluatedProperties"):
            parse_spec(spec, strict=True)
