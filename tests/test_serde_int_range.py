"""serde as_i64 contract: integers beyond i64 are numbers, never
type:"integer" instances (validator/mod.rs:291-297 via serde's as_i64;
Python ints are unbounded so the range check must be explicit)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from json_schema_rs_spark.plans.pyvalidator import validate
from json_schema_rs_spark.plans.spec import parse_spec


def test_big_int_is_number_not_integer():
    root = parse_spec({"type": "integer"})
    assert validate(root, 12345678901234567890)   # beyond i64 -> violation
    assert validate(root, 2 ** 63)
    assert not validate(root, 2 ** 63 - 1)
    assert not validate(root, -(2 ** 63))
    assert validate(root, -(2 ** 63) - 1)


def test_big_int_satisfies_number():
    root = parse_spec({"type": "number", "minimum": 0})
    assert not validate(root, 12345678901234567890)
