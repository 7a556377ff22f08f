"""Hypothesis property tests for the byte-exact formatting twins.

These are the pure-Python halves of cross-engine contracts (the pandas /
interpreter message path). Properties, not examples: any finite double
and any JSON value drawn by hypothesis must satisfy them.
"""

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from json_schema_rs_spark.functions.formatting import (
    _serde_float,
    fmt_f64,
    json_compact,
)

finite_floats = st.floats(allow_nan=False, allow_infinity=False)


@given(finite_floats)
@settings(max_examples=500, deadline=None)
def test_fmt_f64_round_trips(x):
    """Rust-Display text must parse back to the identical double — the
    whole point of shortest-round-trip rendering (plain decimal, no
    exponent, no trailing .0)."""
    s = fmt_f64(x)
    assert "e" not in s and "E" not in s
    assert float(s) == x
    assert not s.endswith(".0")


@given(finite_floats)
@settings(max_examples=500, deadline=None)
def test_serde_float_round_trips_and_is_json(x):
    s = _serde_float(x)
    assert float(s) == x
    v = json.loads(s)          # ryu form must be a legal JSON number
    assert float(v) == x
    assert "+" not in s        # serde never writes e+21 / zero-padded exp


json_values = st.recursive(
    st.none() | st.booleans()
    | st.integers(min_value=-2**53, max_value=2**53)
    | finite_floats
    | st.text(max_size=20),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=8), children, max_size=4),
    max_leaves=10,
)


def _eq_typed(a, b):
    """JSON equality with serde's type fidelity: bools are not numbers,
    ints are not floats."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, float) or isinstance(b, float):
        return (isinstance(a, (int, float)) and isinstance(b, (int, float))
                and float(a) == float(b)
                and isinstance(a, float) == isinstance(b, float))
    if isinstance(a, list):
        return (isinstance(b, list) and len(a) == len(b)
                and all(_eq_typed(x, y) for x, y in zip(a, b)))
    if isinstance(a, dict):
        return (isinstance(b, dict) and a.keys() == b.keys()
                and all(_eq_typed(a[k], b[k]) for k in a))
    return type(a) is type(b) and a == b


@given(json_values)
@settings(max_examples=300, deadline=None)
def test_json_compact_parses_back_equal(v):
    """serde-style compact serialization must be valid JSON that parses
    back to the same value, preserving int-vs-float kind."""
    s = json_compact(v)
    parsed = json.loads(s)
    assert _eq_typed(parsed, v), (v, s, parsed)
