"""JSON document-column mode: full recursive validation of nested payloads
via the Arrow-batched pandas-UDF slow path (operators/json_mode.py),
cross-checked against the pure-Python reference validator."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from json_schema_rs_spark.operators.json_mode import validate_json_column  # noqa: E402

SPEC = {
    "type": "object",
    "required": ["name", "args"],
    "properties": {
        "name": {"type": "string", "minLength": 1,
                 "enum": ["search", "calculator"]},
        "args": {
            "type": "object",
            "required": ["q"],
            "properties": {
                "q": {"type": "string", "maxLength": 10},
                "limit": {"type": "integer", "minimum": 1, "maximum": 100},
            },
        },
        "tags": {"type": "array", "maxItems": 2,
                 "items": {"type": "string"}},
    },
}


def _run(spark, rows):
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, payload string")
    out = validate_json_column(df, SPEC, "payload")
    return sorted((r.conv_id, r.turn_idx, r.instance_path, r.code, r.message)
                  for r in out.collect())


def test_nested_payload_violations(spark):
    rows = [
        ("c0", 0, '{"name": "search", "args": {"q": "ok"}}'),          # valid
        ("c0", 1, '{"name": "teleport", "args": {"q": "ok"}}'),        # enum
        ("c0", 2, '{"name": "search", "args": {"q": "0123456789ab", "limit": 0}}'),
        ("c0", 3, '{"name": "search"}'),                                # missing args
        ("c0", 4, '{"name": "search", "args": {"q": "x"}, "tags": [1, "a", "b"]}'),
    ]
    got = _run(spark, rows)
    assert ("c0", 1, "/payload/name", "NotInEnum",
            '/payload/name: value "teleport" not in enum (allowed: "search", "calculator")') in got
    assert ("c0", 2, "/payload/args/q", "TooLong",
            "/payload/args/q: string has 12 code points, maxLength is 10") in got
    assert ("c0", 2, "/payload/args/limit", "BelowMinimum",
            "/payload/args/limit: value 0 is below minimum 1") in got
    assert ("c0", 3, "/payload/args", "MissingRequired",
            '/payload/args: missing required property "args"') in got
    # array item type error at element index path, plus maxItems
    assert ("c0", 4, "/payload/tags", "TooManyItems",
            "/payload/tags: array has 3 item(s), maximum is 2") in got
    assert ("c0", 4, "/payload/tags/0", "ExpectedString",
            "/payload/tags/0: expected string, got number") in got
    assert not [g for g in got if g[1] == 0]


def test_null_and_invalid_payloads(spark):
    rows = [
        ("c1", 0, None),                      # absent -> no violations
        ("c1", 1, "{not json"),               # InvalidJson
    ]
    got = _run(spark, rows)
    assert [g[:4] for g in got] == [("c1", 1, "/payload", "InvalidJson")]


def test_root_reroot_message(spark):
    # a root-level violation's location rewrites from "root" to /payload
    df_rows = [("c2", 0, '"just a string"')]
    got = _run(spark, df_rows)
    assert got == [("c2", 0, "/payload", "ExpectedObject",
                    "/payload: expected object, got string")]


# ---------------------------------------------------------------------------
# json_key_profile: schema discovery over a JSON payload column
# ---------------------------------------------------------------------------

from json_schema_rs_spark.operators.json_mode import json_key_profile  # noqa: E402


def _profile(spark, payloads):
    df = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)],
                               "id long, payload string")
    out = json_key_profile(df, "payload")
    return [(r.key, r.kind, r.n_values, r.frac_of_docs)
            for r in out.collect()]


def test_key_profile_kinds(spark):
    rows = _profile(spark, [
        '{"k": 5, "f": 1.5, "s": "x", "b": true, "z": null, '
        '"o": {"a": 1}, "arr": [1, 2]}',
        '{"k": 7}',
        '{"k": "seven"}',
        '{"e": 2e3}',
    ])
    got = {(k, kind): n for k, kind, n, _ in rows}
    assert got == {
        ("arr", "array"): 1, ("b", "boolean"): 1, ("f", "number"): 1,
        ("k", "integer"): 2, ("k", "string"): 1, ("o", "object"): 1,
        ("s", "string"): 1, ("z", "null"): 1, ("e", "number"): 1,
    }
    # output is ordered by (key, kind)
    assert rows == sorted(rows, key=lambda r: (r[0], r[1]))


def test_key_profile_denominator_counts_all_rows(spark):
    # NULL and malformed payloads contribute no keys but stay in the
    # denominator; non-object JSON (a bare array) also emits no keys
    rows = _profile(spark, ['{"k": 1}', '{"k": 2}', "not json {",
                            None, "[1, 2]"])
    assert rows == [("k", "integer", 2, 0.4)]


def test_key_profile_integer_vs_number_boundary(spark):
    # the serde-driven boundary the validator uses: 1.0 is NOT an integer
    rows = _profile(spark, ['{"x": 1}', '{"x": 1.0}'])
    assert {(k, kind): n for k, kind, n, _ in rows} == {
        ("x", "integer"): 1, ("x", "number"): 1}


def test_key_profile_uint64_range_int_is_number(spark):
    # the as_i64 rule (validator/mod.rs:291): an int past i64::MAX does
    # NOT lex as int64 — Spark's variant parser types it DECIMAL(20,0),
    # which the kind map classifies 'number'. i64::MAX itself stays
    # 'integer'. The s_json_keys oracle mirrors this with a value-level
    # UBIGINT split (DuckDB types EVERY non-negative JSON int UBIGINT).
    rows = _profile(spark, [
        '{"x": 9223372036854775807}',       # i64::MAX -> integer
        '{"x": 9223372036854775808}',       # i64::MAX + 1 -> number
        '{"x": 18446744073709551615}'])     # u64::MAX -> number
    assert {(k, kind): n for k, kind, n, _ in rows} == {
        ("x", "integer"): 1, ("x", "number"): 2}
    # and the driver-oracle side of the same contract, via DuckDB
    import duckdb
    got = duckdb.sql("""
        SELECT CASE json_type(p, '$.x')
          WHEN 'BIGINT' THEN 'integer'
          WHEN 'UBIGINT' THEN CASE
            WHEN json_extract(p, '$.x')::UBIGINT
                 > 9223372036854775807::UBIGINT THEN 'number'
            ELSE 'integer' END
          ELSE 'other' END
        FROM (VALUES ('{"x": 9223372036854775807}'),
                     ('{"x": 9223372036854775808}'),
                     ('{"x": -5}')) t(p)
    """).fetchall()
    assert [r[0] for r in got] == ["integer", "number", "integer"]


def test_key_profile_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, '{"k": 1}')], "id long, payload string")
    plan = json_key_profile(df, "payload")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan         # zero Python stages
    assert "Generate" in plan           # the variant_explode generator
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# spec_from_json_profile: profile -> spec -> validate (the discovery arc)
# ---------------------------------------------------------------------------

from json_schema_rs_spark.operators.json_mode import (  # noqa: E402
    spec_from_json_profile)


def test_spec_derivation_rules(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 1, "mixed": "s", "maybe_null": 1}'),
         (2, '{"k": 2, "mixed": 3, "opt": true}'),
         (3, '{"k": 3, "maybe_null": null}')],
        "id long, payload string")
    spec = spec_from_json_profile(json_key_profile(df, "payload"))
    assert spec["required"] == ["k"]
    props = spec["properties"]
    assert props["k"] == {"type": "integer"}
    assert props["opt"] == {"type": "boolean"}
    assert props["mixed"] == {}        # multi-kind: no guessed type
    assert props["maybe_null"] == {}   # seen as JSON null: no type

    # the profiled snapshot validates clean under its own spec
    clean = validate_json_column(df, spec, "payload", key_cols=("id",))
    assert clean.count() == 0


def test_drift_fires_typed_violations(spark):
    base = spark.createDataFrame(
        [(1, '{"k": 1}'), (2, '{"k": 2}')], "id long, payload string")
    spec = spec_from_json_profile(json_key_profile(base, "payload"))
    drifted = spark.createDataFrame(
        [(3, '{"k": "oops"}'), (4, '{"other": 1}')],
        "id long, payload string")
    got = sorted((r.id, r.code) for r in validate_json_column(
        drifted, spec, "payload", key_cols=("id",)).collect())
    assert got == [(3, "ExpectedInteger"), (4, "MissingRequired")]


def test_required_tolerates_multi_kind_rounding(spark):
    # a key present in EVERY doc but split across kinds whose 6dp fracs
    # sum to 0.999999 must still be required
    rows = [(i, '{"x": %s}' % ('1' if i % 3 == 0 else '"s"'))
            for i in range(3)]
    df = spark.createDataFrame(rows, "id long, payload string")
    spec = spec_from_json_profile(json_key_profile(df, "payload"))
    assert spec["required"] == ["x"]
