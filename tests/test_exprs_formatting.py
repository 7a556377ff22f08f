"""Column-side formatter goldens: the vectorized helpers in
functions/exprs.py must byte-match the Python twins in
functions/formatting.py (which pyvalidator and the oracles use) across
control characters and the full double range — the round-1 caveats
(C0 chars, |x| outside [1e-3, 1e7)) are now requirements.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from json_schema_rs_spark.functions import formatting as fmt  # noqa: E402
from json_schema_rs_spark.functions.exprs import (  # noqa: E402
    fmt_f64_col,
    json_quote,
    serde_json_number,
)

STRINGS = [
    "plain text",
    'quotes " and \\ backslash',
    "newline\nCR\rtab\t",
    "bell\x07 backspace\x08 formfeed\x0c vertical\x0b",
    "nul\x00 esc\x1b unit\x1f",
    "unicode é 中 🚀",
    "",
    "\x07",
]

DOUBLES = [
    0.0, 1.0, -1.0, 31.0, 0.5, -2.25,
    1e8, 1.5e8, -3.7e9,            # Java sci, Rust plain — the 1e8 case
    123456789.125,
    1e-3, 1e-4, 1.5e-4, 2.5e-7,    # small-magnitude expansion
    1e15, 1.57e15, -9.9e15,        # beyond the long-cast branch
    1e16, 1.2345e17, 1e21, -4e22,  # repr scientific range
    987654321.123456,
    45.5, 300000.0,
]


@pytest.fixture(scope="module")
def run(spark):
    def _run(col_expr, values, typ):
        df = spark.createDataFrame([(v,) for v in values], f"v {typ}")
        return [r.out for r in df.select(col_expr(F.col("v")).alias("out"))
                .collect()]
    return _run


def test_json_quote_matches_serde(run):
    got = run(json_quote, STRINGS, "string")
    for s, g in zip(STRINGS, got):
        # serde_json escaping == json.dumps with ensure_ascii=False for
        # strings (both \u00XX-escape C0 with the 5 shorthands)
        assert g == json.dumps(s, ensure_ascii=False), repr(s)


def test_fmt_f64_col_matches_rust_display(run):
    got = run(fmt_f64_col, DOUBLES, "double")
    for x, g in zip(DOUBLES, got):
        assert g == fmt.fmt_f64(x), f"{x!r}: {g!r} != {fmt.fmt_f64(x)!r}"
        assert "E" not in g and "e" not in g     # Display is never sci


def test_serde_json_number_matches_twin(run):
    got = run(lambda c: serde_json_number(c, is_float=True), DOUBLES, "double")
    for x, g in zip(DOUBLES, got):
        exp = fmt.json_compact(float(x))
        assert g == exp, f"{x!r}: {g!r} != {exp!r}"


def test_bounds_message_with_1e8_bound(spark):
    """End-to-end: a spec bound of 1e8 must render plain decimal in the
    violation message, byte-matching the pyvalidator path."""
    from json_schema_rs_spark import ValidationEngine
    from json_schema_rs_spark.plans import pyvalidator
    from json_schema_rs_spark.plans.spec import parse_spec
    spec = {"type": "object",
            "properties": {"x": {"type": "number", "maximum": 1e8}}}
    df = spark.createDataFrame([(1, 2.5e9)], "k long, x double")
    msg = ValidationEngine(spec, key_cols=("k",)) \
        .validate(df).violations.collect()[0].message
    pv = pyvalidator.validate(parse_spec(spec), {"x": 2.5e9})[0]
    assert msg == "/x: value 2500000000 is above maximum 100000000"
    assert msg.split(": ", 1)[1] == pv.message.split(": ", 1)[1]


def test_control_char_enum_message_matches_pyvalidator(spark):
    """\\x07-bearing text through NotConst must serde-escape identically
    on the vectorized and interpreter paths."""
    from json_schema_rs_spark import ValidationEngine
    from json_schema_rs_spark.plans import pyvalidator
    from json_schema_rs_spark.plans.spec import parse_spec
    spec = {"type": "object", "properties": {"t": {"const": "ok"}}}
    val = "ding\x07dong\x1b"
    df = spark.createDataFrame([(1, val)], "k long, t string")
    msg = ValidationEngine(spec, key_cols=("k",)) \
        .validate(df).violations.collect()[0].message
    pv = pyvalidator.validate(parse_spec(spec), {"t": val})[0]
    assert msg == "/t: " + pv.message.split(": ", 1)[1]
    assert "\\u0007" in msg and "\\u001b" in msg
