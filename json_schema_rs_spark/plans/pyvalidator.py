"""Reference-semantics JSON-document validator (pure Python).

A faithful reimplementation of the reference's keyword-ladder interpreter
(`/root/reference/json_schema_rs/src/validator/mod.rs:58-450`) used for:

1. unit tests mirroring the reference's 139 validator tests;
2. the Arrow-batched pandas-UDF "JSON document column" mode
   (:mod:`..operators.json_mode`) — the slow path for arbitrarily nested
   payloads the typed-column compiler can't express;
3. golden cross-checks of the vectorized typed-column compiler.

Evaluation precedence per schema node (each hit suppresses later keywords —
validator/mod.rs:68-171):

1. ``$ref`` (transitive; failure -> InvalidRef, node abandoned)
2. ``const`` (mismatch -> NotConst, node abandoned; match falls through)
3. ``enum`` non-empty (miss -> NotInEnum, node abandoned)
4. ``anyOf`` (handled exclusively — siblings never evaluated)
5. ``oneOf`` (handled exclusively)
6. ``allOf`` non-empty (subschemas pushed, siblings ignored)
7. ``type`` dispatch + type-scoped constraints

All errors are collected; there is no fail-fast (validator/mod.rs:1-3).
"""

from __future__ import annotations

import base64
import json
import re
from dataclasses import dataclass
from typing import Any

from ..functions import ecma_regex
from ..functions import formats
from ..functions import formatting as fmt
from .pointer import JsonPointer
from .refs import RefResolutionError, resolve_transitive
from .spec import ALLOW, FORBID, SchemaNode

_UUID_HYPHENATED = re.compile(
    r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"
)
_UUID_SIMPLE = re.compile(r"[0-9a-fA-F]{32}")


def is_valid_uuid(s: str) -> bool:
    """``uuid::Uuid::parse_str`` accepts hyphenated, simple (32 hex),
    ``urn:uuid:`` and braced forms (validator/mod.rs:279-289)."""
    if s.startswith("urn:uuid:"):
        return _UUID_HYPHENATED.fullmatch(s[9:]) is not None
    if s.startswith("{") and s.endswith("}"):
        return _UUID_HYPHENATED.fullmatch(s[1:-1]) is not None
    return (_UUID_HYPHENATED.fullmatch(s) is not None
            or _UUID_SIMPLE.fullmatch(s) is not None)


def json_eq(a: Any, b: Any) -> bool:
    """serde_json ``Value`` equality: booleans are not numbers, and an
    integer is never equal to a float (``Number`` variant equality —
    ``1`` != ``1.0``), unlike Python's ``==``."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a is b
    if isinstance(a, int) and isinstance(b, int):
        return a == b
    if isinstance(a, float) and isinstance(b, float):
        return a == b
    if isinstance(a, (int, float)) or isinstance(b, (int, float)):
        return False  # int vs float (or number vs non-number)
    if type(a) is not type(b):
        return False
    if isinstance(a, list):
        return len(a) == len(b) and all(json_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict):
        return a.keys() == b.keys() and all(json_eq(v, b[k]) for k, v in a.items())
    return a == b


@dataclass(frozen=True)
class Violation:
    """One validation error: RFC 6901 path, variant code, and the byte-exact
    Display line (error.rs:241-398)."""

    path: str
    code: str
    message: str

    def sort_key(self) -> tuple[str, str]:
        return (self.path, self.code)


def _is_integer(v: Any) -> bool:
    """serde ``as_i64`` semantics: floats are never integers — ``1.0`` is
    NOT a valid ``type:"integer"`` instance (validator/mod.rs:291-297;
    design.md documents this as stricter than the spec) — and neither is
    an integer outside i64 (``as_i64`` returns None for them; Python ints
    are unbounded, so the range check must be explicit)."""
    return (isinstance(v, int) and not isinstance(v, bool)
            and -(2 ** 63) <= v < 2 ** 63)


def _is_number(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def validate(root: SchemaNode, instance: Any) -> list[Violation]:
    """Validate one JSON instance; returns all violations (empty = valid)."""
    return validate_with_root(root, root, instance)


def validate_with_root(root: SchemaNode, start: SchemaNode, instance: Any) -> list[Violation]:
    """Interpreter: ``start`` is the node to evaluate, ``root`` the $ref
    namespace (validator/mod.rs:58)."""
    errors: list[Violation] = []
    # explicit work stack — "no literal recursion" except combinator trials
    # (validator/mod.rs:64-67)
    stack: list[tuple[SchemaNode, Any, JsonPointer]] = [(start, instance, JsonPointer.root())]

    while stack:
        schema, inst, path = stack.pop()
        loc = path.display_root_or_path()

        # 1. $ref
        try:
            schema = resolve_transitive(root, schema)
        except RefResolutionError as e:
            ref_str = schema.ref if schema.ref is not None \
                else (schema.dynamic_ref or "<missing>")
            errors.append(Violation(path.as_str(), "InvalidRef",
                                    fmt.msg_invalid_ref(loc, ref_str, e.rust_debug())))
            continue

        # 2. const
        if schema.has_const and not json_eq(inst, schema.const):
            errors.append(Violation(
                path.as_str(), "NotConst",
                fmt.msg_not_const(loc, fmt.json_compact(inst), fmt.json_compact(schema.const))))
            continue

        # 3. enum (non-empty)
        if schema.enum is not None and len(schema.enum) > 0 \
                and not any(json_eq(a, inst) for a in schema.enum):
            errors.append(Violation(
                path.as_str(), "NotInEnum",
                fmt.msg_not_in_enum(loc, fmt.json_compact(inst),
                                    [fmt.json_compact(a) for a in schema.enum])))
            continue

        # 3a. not (EXTENSION — mirrors compiler.py step 3a): fires when
        # the sub-schema matches; never abandons the node
        if schema.not_schema is not None \
                and len(validate_with_root(root, schema.not_schema, inst)) == 0:
            errors.append(Violation(path.as_str(), "NotSchemaMatched",
                                    fmt.msg_not_schema_matched(loc)))

        # 3b. if/then/else (EXTENSION): the matching branch's checks run
        # at the same path; `if` alone never produces a violation
        if schema.if_schema is not None:
            cond_ok = len(validate_with_root(root, schema.if_schema, inst)) == 0
            branch = schema.then_schema if cond_ok else schema.else_schema
            if branch is not None:
                stack.append((branch, inst, path))

        # 4. anyOf — handled exclusively (validator/mod.rs:109-133)
        if schema.any_of is not None:
            if len(schema.any_of) == 0:
                errors.append(Violation(path.as_str(), "NoSubschemaMatched",
                                        fmt.msg_no_subschema_matched(loc, 0)))
            elif not any(len(validate_with_root(root, s, inst)) == 0
                         for s in schema.any_of):
                errors.append(Violation(
                    path.as_str(), "NoSubschemaMatched",
                    fmt.msg_no_subschema_matched(loc, len(schema.any_of))))
            continue

        # 5. oneOf — handled exclusively (validator/mod.rs:134-163)
        if schema.one_of is not None:
            if len(schema.one_of) == 0:
                errors.append(Violation(path.as_str(), "NoSubschemaMatched",
                                        fmt.msg_no_subschema_matched(loc, 0)))
            else:
                passed = sum(1 for s in schema.one_of
                             if len(validate_with_root(root, s, inst)) == 0)
                if passed == 0:
                    errors.append(Violation(
                        path.as_str(), "NoSubschemaMatched",
                        fmt.msg_no_subschema_matched(loc, len(schema.one_of))))
                elif passed > 1:
                    errors.append(Violation(
                        path.as_str(), "MultipleSubschemasMatched",
                        fmt.msg_multiple_subschemas_matched(loc, passed, len(schema.one_of))))
            continue

        # 6. allOf non-empty — push subschemas, siblings ignored (:164-171)
        if schema.all_of is not None and len(schema.all_of) > 0:
            for sub in reversed(schema.all_of):
                stack.append((sub, inst, path))
            continue

        # 7. type dispatch
        t = schema.type
        if t == "object":
            if not isinstance(inst, dict):
                errors.append(Violation(
                    path.as_str(), "ExpectedObject",
                    fmt.msg_expected_type(loc, "object", fmt.json_type_name(inst))))
                continue
            _check_object(root, schema, inst, path, stack, errors)
        elif t == "string":
            _check_string(schema, inst, path, loc, stack, errors)
        elif t == "integer":
            if not _is_integer(inst):
                errors.append(Violation(
                    path.as_str(), "ExpectedInteger",
                    fmt.msg_expected_type(loc, "integer", fmt.json_type_name(inst))))
            else:
                _check_bounds(schema, float(inst), path, loc, errors)
        elif t == "number":
            if not _is_number(inst):
                errors.append(Violation(
                    path.as_str(), "ExpectedNumber",
                    fmt.msg_expected_type(loc, "number", fmt.json_type_name(inst))))
            else:
                _check_bounds(schema, float(inst), path, loc, errors)
        elif t == "array":
            if not isinstance(inst, list):
                errors.append(Violation(
                    path.as_str(), "ExpectedArray",
                    fmt.msg_expected_type(loc, "array", fmt.json_type_name(inst))))
                continue
            _check_array(root, schema, inst, path, loc, stack, errors)
        elif t == "boolean":
            if not isinstance(inst, bool):
                errors.append(Violation(
                    path.as_str(), "ExpectedBoolean",
                    fmt.msg_expected_type(loc, "boolean", fmt.json_type_name(inst))))
        else:
            # type absent or not enforced (e.g. "null"): required/properties
            # still apply to objects (validator/mod.rs:417-441)
            if isinstance(inst, dict):
                _check_required_and_properties(root, schema, inst, path, stack, errors)

    return errors


def _check_object(root: SchemaNode, schema: SchemaNode, obj: dict,
                  path: JsonPointer, stack: list,
                  errors: list[Violation]) -> None:
    """type:"object" body (validator/mod.rs:174-229)."""
    _check_required_and_properties(root, schema, obj, path, stack, errors)
    # extension: unevaluatedProperties (E16). Structural annotation flow
    # (see the compiler twin); parse guarantees additionalProperties and
    # the exclusive combinators are absent on this node.
    up = schema.unevaluated_properties
    if up is not None and up != ALLOW:
        evaluated = _evaluated_keys(root, schema, obj)
        pending_up = []
        for k in sorted(obj):
            if k in evaluated:
                continue
            p = path.push(k)
            if up == FORBID:
                errors.append(Violation(
                    p.as_str(), "DisallowedUnevaluatedProperty",
                    fmt.msg_disallowed_unevaluated_property(
                        p.display_root_or_path(), k)))
            else:
                pending_up.append((up, obj[k], p))
        for item in reversed(pending_up):
            stack.append(item)
    ap = schema.additional_properties
    if ap is None or ap == ALLOW:
        return  # nothing constrains extras — skip the per-key regex scan
    # a property matched by patternProperties is NOT "additional" (2020-12)
    pp = sorted(schema.pattern_properties.items()) \
        if schema.pattern_properties is not None else []
    pp_rx = [(ecma_regex.compile_python(pat), sub) for pat, sub in pp]
    extra = [k for k in obj if k not in schema.properties
             and not any(rx.search(k) is not None for rx, _ in pp_rx)]
    if extra:
        if ap == FORBID:
            for k in extra:
                p = path.push(k)
                errors.append(Violation(
                    p.as_str(), "DisallowedAdditionalProperty",
                    fmt.msg_disallowed_additional_property(p.display_root_or_path(), k)))
        elif isinstance(ap, SchemaNode):
            for k in reversed(extra):
                stack.append((ap, obj[k], path.push(k)))


def _check_required_and_properties(root: SchemaNode, schema: SchemaNode,
                                   obj: dict, path: JsonPointer,
                                   stack: list, errors: list[Violation]) -> None:
    """required + properties descent, shared by object and typeless nodes
    (validator/mod.rs:183-202, 417-441). Note the MissingRequired path is
    ``{path}/{name}`` (instance_path.push(name), :186)."""
    if schema.required is not None:
        for name in schema.required:
            if name not in obj:
                p = path.push(name)
                errors.append(Violation(
                    p.as_str(), "MissingRequired",
                    fmt.msg_missing_required(p.display_root_or_path(), name)))
    # BTreeMap order: sorted property keys, pushed in reverse so they pop
    # first-key-first (validator/mod.rs:192-202)
    pending = [(sub, obj[key], path.push(key))
               for key, sub in schema.sorted_properties() if key in obj]
    for item in reversed(pending):
        stack.append(item)
    # extensions: minProperties / maxProperties / dependentRequired.
    # For dynamic JSON objects "present" = key in the dict (the compiler's
    # typed analog counts non-null declared columns).
    n_present = len(obj)
    if schema.min_properties is not None and n_present < schema.min_properties:
        errors.append(Violation(
            path.as_str(), "TooFewProperties",
            fmt.msg_too_few_properties(path.display_root_or_path(), n_present,
                                       schema.min_properties)))
    if schema.max_properties is not None and n_present > schema.max_properties:
        errors.append(Violation(
            path.as_str(), "TooManyProperties",
            fmt.msg_too_many_properties(path.display_root_or_path(), n_present,
                                        schema.max_properties)))
    if schema.dependent_required is not None:
        for trigger, deps in sorted(schema.dependent_required.items()):
            if trigger not in obj:
                continue
            for dep in deps:
                if dep not in obj:
                    p = path.push(dep)
                    errors.append(Violation(
                        p.as_str(), "MissingDependentRequired",
                        fmt.msg_missing_dependent_required(
                            p.display_root_or_path(), dep, trigger)))
    # patternProperties: sub-schemas over every key whose name matches
    # (in addition to `properties`)
    if schema.pattern_properties is not None:
        pending_pp = []
        for pat, sub in sorted(schema.pattern_properties.items()):
            rx = ecma_regex.compile_python(pat)
            pending_pp.extend((sub, obj[k], path.push(k))
                              for k in sorted(obj) if rx.search(k) is not None)
        for item in reversed(pending_pp):
            stack.append(item)
    # propertyNames: every key, as a string instance, must satisfy the
    # sub-schema (combinator-style trial; the violation is ours)
    if schema.property_names is not None:
        for k in sorted(obj):
            if len(validate_with_root(root, schema.property_names, k)) > 0:
                p = path.push(k)
                errors.append(Violation(
                    p.as_str(), "InvalidPropertyName",
                    fmt.msg_invalid_property_name(
                        p.display_root_or_path(), k)))
    # dependentSchemas: trigger present -> the whole instance must also
    # satisfy the sub-schema
    if schema.dependent_schemas is not None:
        pending_ds = [(sub, obj, path)
                      for trigger, sub in sorted(schema.dependent_schemas.items())
                      if trigger in obj]
        for item in reversed(pending_ds):
            stack.append(item)


def _evaluated_keys(root: SchemaNode, schema: SchemaNode, obj: dict) -> set:
    """Keys of ``obj`` evaluated by ``schema``'s in-place application
    (E16): properties, patternProperties matches, everything when
    additionalProperties is present, plus the applied if/then/else branch
    and triggered dependentSchemas, recursed structurally. Evaluated-ness
    is STRUCTURAL — a failed branch still evaluates its matched names —
    matching the jsonschema package's observable behavior."""
    s = {k for k in obj if k in schema.properties}
    if schema.pattern_properties is not None:
        for pat in schema.pattern_properties:
            rx = ecma_regex.compile_python(pat)
            s.update(k for k in obj if rx.search(k) is not None)
    if schema.additional_properties is not None:
        s.update(obj)
    if schema.if_schema is not None:
        ok = len(validate_with_root(root, schema.if_schema, obj)) == 0
        branch = schema.then_schema if ok else schema.else_schema
        if branch is not None:
            s |= _evaluated_keys(root, branch, obj)
    if schema.dependent_schemas is not None:
        for trigger, sub in sorted(schema.dependent_schemas.items()):
            if trigger in obj:
                s |= _evaluated_keys(root, sub, obj)
    return s


_B64_RX = re.compile(r"[A-Za-z0-9+/]*={0,2}")


def content_b64_valid(s: str) -> bool:
    """The engine's base64 validity rule (RFC 4648 §4 alphabet, correct
    padding length). Both engines share THIS definition — the vectorized
    compiler evaluates the same regex (``\\A..\\z``-anchored) + length%4
    JVM-side, so verdicts are identical by construction. ``fullmatch``
    (not ``^..$``, whose ``$`` matches before a final newline) so
    "AAAA\\n" is rejected like ``base64.b64decode`` would. Non-canonical
    trailing bits are accepted (as ``b64decode`` also does)."""
    return _B64_RX.fullmatch(s) is not None and len(s) % 4 == 0


def content_parse_json(s: str, encoding: "str | None") -> tuple[bool, Any]:
    """Decode (if ``encoding``) and parse a content string as JSON.
    Returns ``(ok, parsed)``; validity is defined by ``json.loads`` over
    UTF-8 text — the SAME definition the Arrow-batched compiler UDF uses,
    so verdicts are cross-engine identical by construction. Callers must
    have checked :func:`content_b64_valid` first when encoding is set."""
    if encoding == "base64":
        try:
            text = base64.b64decode(s).decode("utf-8")
        except (ValueError, UnicodeDecodeError):
            return False, None
    else:
        text = s
    try:
        return True, json.loads(text)
    except ValueError:
        return False, None


def _check_string(schema: SchemaNode, inst: Any, path: JsonPointer,
                  loc: str, stack: list, errors: list[Violation]) -> None:
    """type:"string" body (validator/mod.rs:231-289). A non-string gets
    ExpectedString but does NOT abandon the node — length/pattern/uuid simply
    skip non-strings."""
    if not isinstance(inst, str):
        errors.append(Violation(
            path.as_str(), "ExpectedString",
            fmt.msg_expected_type(loc, "string", fmt.json_type_name(inst))))
        return
    n = len(inst)  # Python str length = Unicode code points = Rust chars().count()
    if schema.min_length is not None and n < schema.min_length:
        errors.append(Violation(path.as_str(), "TooShort",
                                fmt.msg_too_short(loc, n, schema.min_length)))
    if schema.max_length is not None and n > schema.max_length:
        errors.append(Violation(path.as_str(), "TooLong",
                                fmt.msg_too_long(loc, n, schema.max_length)))
    if schema.pattern is not None:
        # ECMA-262(+Annex B) audit + Python-dialect translation — the same
        # verdicts as the reference's regress engine (functions/ecma_regex)
        rx = ecma_regex.compile_python(schema.pattern)
        if rx is None:
            errors.append(Violation(
                path.as_str(), "InvalidPatternInSchema",
                fmt.msg_invalid_pattern_in_schema(loc, schema.pattern)))
        elif rx.search(inst) is None:  # partial match, like regress .find()
            errors.append(Violation(
                path.as_str(), "PatternMismatch",
                fmt.msg_pattern_mismatch(loc, inst, schema.pattern)))
    if schema.format == "uuid" and not is_valid_uuid(inst):
        errors.append(Violation(path.as_str(), "InvalidUuidFormat",
                                fmt.msg_invalid_uuid_format(loc, inst)))
    # assertive format extension (E15) — shared rules, functions/formats.py
    if schema.ext_format is not None \
            and not formats.python_valid(schema.ext_format, inst):
        errors.append(Violation(
            path.as_str(), "InvalidFormat",
            fmt.msg_invalid_format(loc, inst, schema.ext_format)))
    # content* extensions (assertive, draft-07 style): encoding gate ->
    # media-type parse -> contentSchema over the DECODED instance (pushed
    # onto the same interpreter stack, so $refs and the full keyword
    # ladder apply; the pointer continues from this path, which re-roots
    # inner violations for free)
    if schema.content_encoding is not None and not content_b64_valid(inst):
        errors.append(Violation(
            path.as_str(), "InvalidContentEncoding",
            fmt.msg_invalid_content_encoding(loc, schema.content_encoding)))
        return
    if schema.content_media_type is not None:
        ok, parsed = content_parse_json(inst, schema.content_encoding)
        if not ok:
            errors.append(Violation(
                path.as_str(), "InvalidContentMediaType",
                fmt.msg_invalid_content_media_type(
                    loc, schema.content_media_type)))
        elif schema.content_schema is not None:
            stack.append((schema.content_schema, parsed, path))


def _check_bounds(schema: SchemaNode, x: float, path: JsonPointer,
                  loc: str, errors: list[Violation]) -> None:
    """Inclusive minimum/maximum compared as f64 (validator/mod.rs:298-349)."""
    if schema.minimum is not None and x < schema.minimum:
        errors.append(Violation(path.as_str(), "BelowMinimum",
                                fmt.msg_below_minimum(loc, x, schema.minimum)))
    if schema.maximum is not None and x > schema.maximum:
        errors.append(Violation(path.as_str(), "AboveMaximum",
                                fmt.msg_above_maximum(loc, x, schema.maximum)))
    # extensions: exclusive bounds + multipleOf (draft 2020-12)
    if schema.exclusive_minimum is not None and x <= schema.exclusive_minimum:
        errors.append(Violation(
            path.as_str(), "BelowExclusiveMinimum",
            fmt.msg_below_exclusive_minimum(loc, x, schema.exclusive_minimum)))
    if schema.exclusive_maximum is not None and x >= schema.exclusive_maximum:
        errors.append(Violation(
            path.as_str(), "AboveExclusiveMaximum",
            fmt.msg_above_exclusive_maximum(loc, x, schema.exclusive_maximum)))
    if schema.multiple_of is not None \
            and not ((x / schema.multiple_of) % 1.0 == 0):
        # quotient-is-integer (jsonschema-package semantics; see the
        # compiler twin): raw `x % m == 0` falsely flags e.g. 90.0 with
        # multipleOf 0.1. NaN/Inf quotients -> NaN % 1.0 -> not a multiple.
        errors.append(Violation(
            path.as_str(), "NotMultipleOf",
            fmt.msg_not_multiple_of(loc, x, schema.multiple_of)))


def _check_array(root: SchemaNode, schema: SchemaNode, arr: list,
                 path: JsonPointer, loc: str, stack: list,
                 errors: list[Violation]) -> None:
    """type:"array" body (validator/mod.rs:351-407): minItems/maxItems,
    uniqueItems (first duplicate by (i, j) scan order), items recursion with
    element index as path segment."""
    n = len(arr)
    if schema.min_items is not None and n < schema.min_items:
        errors.append(Violation(path.as_str(), "TooFewItems",
                                fmt.msg_too_few_items(loc, n, schema.min_items)))
    if schema.max_items is not None and n > schema.max_items:
        errors.append(Violation(path.as_str(), "TooManyItems",
                                fmt.msg_too_many_items(loc, n, schema.max_items)))
    if schema.unique_items is True:
        dup = None
        for i in range(n):
            for j in range(i + 1, n):
                if json_eq(arr[i], arr[j]):
                    dup = fmt.json_compact(arr[i])
                    break
            if dup is not None:
                break
        if dup is not None:
            errors.append(Violation(path.as_str(), "DuplicateArrayItems",
                                    fmt.msg_duplicate_array_items(loc, dup)))
    # extensions: contains / minContains / maxContains (draft 2020-12;
    # effective only when `contains` is present, minContains defaults 1).
    # Per-element match results are kept for unevaluatedItems below so an
    # expensive contains subschema runs once per element, not twice.
    contains_match = None  # list[bool] per element when contains present
    if schema.contains is not None:
        contains_match = [
            len(validate_with_root(root, schema.contains, e)) == 0
            for e in arr]
        cnt = sum(contains_match)
        min_c = schema.min_contains if schema.min_contains is not None else 1
        if cnt < min_c:
            errors.append(Violation(path.as_str(), "TooFewContains",
                                    fmt.msg_too_few_contains(loc, cnt, min_c)))
        if schema.max_contains is not None and cnt > schema.max_contains:
            errors.append(Violation(
                path.as_str(), "TooManyContains",
                fmt.msg_too_many_contains(loc, cnt, schema.max_contains)))
    # extensions: prefixItems — first k elements get their own schemas;
    # `items` then applies only to elements AFTER the prefix
    k = 0
    if schema.prefix_items is not None:
        k = len(schema.prefix_items)
        for i in range(min(k, n) - 1, -1, -1):
            stack.append((schema.prefix_items[i], arr[i], path.push(str(i))))
    if schema.items is not None:
        for i in range(n - 1, k - 1, -1):
            stack.append((schema.items, arr[i], path.push(str(i))))
    # extension: unevaluatedItems (E16) — inert when `items` is present;
    # otherwise elements past the prefix that don't match `contains`
    # (contains-matched elements are evaluated, draft 2020-12)
    ui = schema.unevaluated_items
    if ui is not None and ui != ALLOW and schema.items is None:
        pending_ui = []
        for i in range(k, n):
            if contains_match is not None and contains_match[i]:
                continue
            p = path.push(str(i))
            if ui == FORBID:
                errors.append(Violation(
                    p.as_str(), "DisallowedUnevaluatedItem",
                    fmt.msg_disallowed_unevaluated_item(
                        p.display_root_or_path())))
            else:
                pending_ui.append((ui, arr[i], p))
        for item in reversed(pending_ui):
            stack.append(item)
