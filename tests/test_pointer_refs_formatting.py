"""Unit tests for pointers, $ref resolution, and message formatting —
mirroring the reference's json_pointer.rs / ref_resolver.rs / error.rs
unit tests (SURVEY.md §5)."""

import math

import pytest

from json_schema_rs_spark.functions import formatting as fmt
from json_schema_rs_spark.plans.pointer import JsonPointer, escape_segment
from json_schema_rs_spark.plans.refs import (
    RefResolutionError,
    parse_ref,
    resolve_transitive,
)
from json_schema_rs_spark.plans.spec import parse_spec


class TestJsonPointer:
    def test_root_displays_as_root(self):
        assert JsonPointer.root().display_root_or_path() == "root"
        assert JsonPointer.root().as_str() == ""

    def test_push_builds_slash_path(self):
        p = JsonPointer.root().push("a").push("b")
        assert p.as_str() == "/a/b"
        assert p.display_root_or_path() == "/a/b"

    def test_rfc6901_escaping(self):
        # "~" -> "~0", "/" -> "~1" (json_pointer.rs:36-38)
        assert escape_segment("a/b") == "a~1b"
        assert escape_segment("a~b") == "a~0b"
        assert JsonPointer.root().push("m~n/o").as_str() == "/m~0n~1o"


class TestRefResolver:
    def test_parse_root_forms(self):
        assert parse_ref("") == ("root", None)
        assert parse_ref("#") == ("root", None)

    def test_parse_defs_and_definitions(self):
        assert parse_ref("#/$defs/Name") == ("$defs", "Name")
        assert parse_ref("#/definitions/Name") == ("definitions", "Name")

    def test_parse_pointer_escapes_in_name(self):
        assert parse_ref("#/$defs/a~1b") == ("$defs", "a/b")
        assert parse_ref("#/$defs/a~0b") == ("$defs", "a~b")

    @pytest.mark.parametrize("ref,variant", [
        ("http://x/schema.json", "UnsupportedRef"),
        ("#anchor", "UnsupportedFragment"),
        ("#/$defs/a/b", "UnsupportedFragment"),
        ("#/other/Name", "UnsupportedFragment"),
        ("#/$defs/", "UnsupportedFragment"),
        ("#/$defs/a~2b", "InvalidPointerEscape"),
    ])
    def test_rejected_refs(self, ref, variant):
        with pytest.raises(RefResolutionError) as e:
            parse_ref(ref)
        assert e.value.variant == variant

    def test_transitive_resolution_and_cycle(self):
        root = parse_spec({
            "$defs": {
                "A": {"$ref": "#/$defs/B"},
                "B": {"type": "string"},
                "C": {"$ref": "#/$defs/D"},
                "D": {"$ref": "#/$defs/C"},
            },
        })
        node = parse_spec({"$ref": "#/$defs/A"})
        assert resolve_transitive(root, node).type == "string"
        cyc = parse_spec({"$ref": "#/$defs/C"})
        with pytest.raises(RefResolutionError) as e:
            resolve_transitive(root, cyc)
        assert e.value.variant == "RefCycle"

    def test_rust_debug_strings(self):
        # InvalidRef messages interpolate Rust's {:?} of the resolver error
        # (validator/mod.rs:68-82)
        e = RefResolutionError("DefsMissing", "#/$defs/Missing")
        assert e.rust_debug() == 'DefsMissing { ref_str: "#/$defs/Missing" }'
        e2 = RefResolutionError("DefNotFound", "#/$defs/X", "X")
        assert e2.rust_debug() == 'DefNotFound { ref_str: "#/$defs/X", name: "X" }'
        e3 = RefResolutionError("RefCycle", "#/$defs/A")
        assert e3.rust_debug() == 'RefCycle { ref_str: "#/$defs/A" }'


class TestRustF64Display:
    """fmt_f64 must match Rust `{}` Display for f64 (error.rs:328-345):
    shortest round-trip, no scientific notation, integral without .0."""

    @pytest.mark.parametrize("x,s", [
        (3.0, "3"),
        (3.5, "3.5"),
        (-2.0, "-2"),
        (0.0, "0"),
        (0.1, "0.1"),
        (0.0001, "0.0001"),
        (1e16, "10000000000000000"),
        (1.5e-7, "0.00000015"),
        (123456789.123, "123456789.123"),
        (float("nan"), "NaN"),
        (float("inf"), "inf"),
        (float("-inf"), "-inf"),
        (5, "5"),   # ints compared as f64
    ])
    def test_fmt_f64(self, x, s):
        assert fmt.fmt_f64(x) == s

    def test_round_trip(self):
        for x in [1/3, 2/7, 1e-12, 9.999999999999998]:
            assert float(fmt.fmt_f64(x)) == x


class TestSerdeJsonCompact:
    """json_compact must match serde_json::to_string (validator/mod.rs:27)."""

    @pytest.mark.parametrize("v,s", [
        ("hi", '"hi"'),
        ('say "hi"', '"say \\"hi\\""'),
        ("héllo🙂", '"héllo🙂"'),      # serde does not \u-escape non-ASCII
        (1, "1"),
        (1.0, "1.0"),                   # floats keep the decimal point
        (2.5, "2.5"),
        (True, "true"),
        (None, "null"),
        ([1, 2], "[1,2]"),
        ([1.0, "a"], '[1.0,"a"]'),
        ({"a": 1, "b": [True]}, '{"a":1,"b":[true]}'),
        ("tab\there", '"tab\\there"'),
        ("line\nbreak", '"line\\nbreak"'),
    ])
    def test_compact(self, v, s):
        assert fmt.json_compact(v) == s

    def test_type_names(self):
        assert fmt.json_type_name(None) == "null"
        assert fmt.json_type_name(True) == "boolean"
        assert fmt.json_type_name(1) == "number"
        assert fmt.json_type_name(1.5) == "number"
        assert fmt.json_type_name("x") == "string"
        assert fmt.json_type_name([]) == "array"
        assert fmt.json_type_name({}) == "object"
