"""Byte-exact violation-message formatting.

The reference renders every error as one line ``{location}: {message}``
(`/root/reference/json_schema_rs/src/validator/error.rs:241-398`), with
payload values serialized via ``serde_json::to_string``
(validator/mod.rs:26-29) and numeric bounds via Rust's ``{}`` ``Display``
for f64 (error.rs:328-345). This module reproduces both formatters in
Python so violation rows byte-match the reference's goldens.
"""

from __future__ import annotations

import json
import math
import re
from decimal import Decimal
from typing import Any


def fmt_f64(x: float) -> str:
    """Rust ``Display`` for f64: shortest round-trip decimal, **never**
    scientific notation, integral values without ``.0`` (``3`` not ``3.0``).
    """
    if isinstance(x, int):  # JSON integers compared as f64 in the reference
        x = float(x)
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "inf" if x > 0 else "-inf"
    r = repr(x)
    if "e" in r or "E" in r:
        # expand scientific to plain decimal, preserving shortest digits
        r = format(Decimal(r), "f")
    if r.endswith(".0"):
        r = r[:-2]
    return r


_EXP_PLUS = re.compile(r"e\+?0*(\d)")
_EXP_MINUS = re.compile(r"e-0*(\d)")


def _serde_float(x: float) -> str:
    """serde_json (ryu) float serialization: ``1.0`` stays ``1.0``;
    scientific form uses ``1e21`` / ``1e-7`` (no ``+``, no zero-padded
    exponent) unlike Python's ``1e+21``."""
    if math.isnan(x) or math.isinf(x):
        return "null"  # serde_json refuses non-finite; json.dumps would not
    r = repr(x)
    r = _EXP_PLUS.sub(lambda m: "e" + m.group(1), r)
    r = _EXP_MINUS.sub(lambda m: "e-" + m.group(1), r)
    return r


def json_compact(v: Any) -> str:
    """``serde_json::to_string`` parity: compact separators, non-ASCII kept
    raw, floats via ryu-style shortest form. Used for every serialized
    payload value inside messages (validator/mod.rs:26-29)."""
    if isinstance(v, float):
        return _serde_float(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, (int, str)):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, list):
        return "[" + ",".join(json_compact(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            json.dumps(k, ensure_ascii=False) + ":" + json_compact(val)
            for k, val in v.items()
        ) + "}"
    return json.dumps(v, ensure_ascii=False, separators=(",", ":"))


def json_type_name(v: Any) -> str:
    """JSON kind of a Python value for ``got`` payloads
    (validator/mod.rs:15-24)."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    raise TypeError(f"not a JSON value: {type(v).__name__}")


# ---------------------------------------------------------------------------
# Message templates — one per ValidationError variant (error.rs:241-398).
# ``location`` is JsonPointer.display_root_or_path().
# ---------------------------------------------------------------------------

def msg_invalid_ref(location: str, ref_str: str, reason: str) -> str:
    return f'{location}: could not resolve $ref "{ref_str}": {reason}'


def msg_expected_type(location: str, kind: str, got: str) -> str:
    return f"{location}: expected {kind}, got {got}"


def msg_duplicate_array_items(location: str, duplicate_value: str) -> str:
    return f"{location}: array has duplicate items (value: {duplicate_value})"


def msg_too_few_items(location: str, actual_count: int, min_items: int) -> str:
    return f"{location}: array has {actual_count} item(s), minimum is {min_items}"


def msg_too_many_items(location: str, actual_count: int, max_items: int) -> str:
    return f"{location}: array has {actual_count} item(s), maximum is {max_items}"


def msg_missing_required(location: str, prop: str) -> str:
    return f'{location}: missing required property "{prop}"'


def msg_disallowed_additional_property(location: str, prop: str) -> str:
    return f'{location}: additional property "{prop}" not allowed'


def msg_disallowed_unevaluated_property(location: str, prop: str) -> str:
    """Extension (E16), styled after the additionalProperties message."""
    return f'{location}: unevaluated property "{prop}" not allowed'


def msg_disallowed_unevaluated_item(location: str) -> str:
    """Extension (E16); per-element path, like the `items` checks."""
    return f"{location}: unevaluated item not allowed"


def msg_not_in_enum(location: str, invalid_value: str, allowed: list[str]) -> str:
    return f"{location}: value {invalid_value} not in enum (allowed: {', '.join(allowed)})"


def msg_not_const(location: str, actual: str, expected: str) -> str:
    return f"{location}: value {actual} does not match const (expected: {expected})"


def msg_below_minimum(location: str, actual: float, minimum: float) -> str:
    return f"{location}: value {fmt_f64(actual)} is below minimum {fmt_f64(minimum)}"


def msg_above_maximum(location: str, actual: float, maximum: float) -> str:
    return f"{location}: value {fmt_f64(actual)} is above maximum {fmt_f64(maximum)}"


def msg_too_short(location: str, actual_length: int, min_length: int) -> str:
    return f"{location}: string has {actual_length} code points, minLength is {min_length}"


def msg_too_long(location: str, actual_length: int, max_length: int) -> str:
    return f"{location}: string has {actual_length} code points, maxLength is {max_length}"


def msg_pattern_mismatch(location: str, value: str, pattern: str) -> str:
    return f'{location}: string "{value}" does not match pattern "{pattern}"'


def msg_invalid_pattern_in_schema(location: str, pattern: str) -> str:
    return f'{location}: schema has invalid pattern "{pattern}"'


def msg_invalid_uuid_format(location: str, value: str) -> str:
    return f'{location}: string "{value}" is not a valid UUID'


def msg_invalid_format(location: str, value: str, fmt_name: str) -> str:
    """Extension formats (E15) — ours to define, styled after
    :func:`msg_invalid_uuid_format`."""
    return f'{location}: string "{value}" is not a valid "{fmt_name}"'


def msg_no_subschema_matched(location: str, subschema_count: int) -> str:
    return f"{location}: instance does not match any of the {subschema_count} subschema(s)"


def msg_multiple_subschemas_matched(location: str, match_count: int, subschema_count: int) -> str:
    return (f"{location}: instance matches {match_count} of the {subschema_count} "
            f"oneOf subschema(s), exactly one required")


# --- extension-keyword messages (engine extensions; the reference has no
# Display formats for these — design.md lists them as TODO — so the
# formats below are THIS engine's contract, byte-shared between the
# vectorized compiler and the pyvalidator twin) ---

def msg_not_multiple_of(location: str, actual: float, multiple_of: float) -> str:
    return (f"{location}: value {fmt_f64(actual)} is not a multiple of "
            f"{fmt_f64(multiple_of)}")


def msg_below_exclusive_minimum(location: str, actual: float, bound: float) -> str:
    return (f"{location}: value {fmt_f64(actual)} is not greater than "
            f"exclusive minimum {fmt_f64(bound)}")


def msg_above_exclusive_maximum(location: str, actual: float, bound: float) -> str:
    return (f"{location}: value {fmt_f64(actual)} is not less than "
            f"exclusive maximum {fmt_f64(bound)}")


def msg_not_schema_matched(location: str) -> str:
    return f'{location}: instance matches the schema in "not"'


def msg_too_few_properties(location: str, actual: int, min_properties: int) -> str:
    return (f"{location}: object has {actual} propert(y/ies), "
            f"minProperties is {min_properties}")


def msg_too_many_properties(location: str, actual: int, max_properties: int) -> str:
    return (f"{location}: object has {actual} propert(y/ies), "
            f"maxProperties is {max_properties}")


def msg_missing_dependent_required(location: str, prop: str, present: str) -> str:
    return (f'{location}: missing property "{prop}" required by '
            f'presence of "{present}"')


def msg_too_few_contains(location: str, actual: int, min_contains: int) -> str:
    return (f'{location}: array has {actual} item(s) matching "contains", '
            f"minimum is {min_contains}")


def msg_too_many_contains(location: str, actual: int, max_contains: int) -> str:
    return (f'{location}: array has {actual} item(s) matching "contains", '
            f"maximum is {max_contains}")


def msg_invalid_property_name(location: str, name: str) -> str:
    return f'{location}: property name "{name}" does not match "propertyNames"'


def msg_invalid_content_encoding(location: str, encoding: str) -> str:
    return f'{location}: string is not valid "{encoding}" content'


def msg_invalid_content_media_type(location: str, media_type: str) -> str:
    return f'{location}: string content is not valid "{media_type}"'
