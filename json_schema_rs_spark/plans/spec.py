"""Constraint-spec model: a JSON-Schema-subset document parsed driver-side.

The keyword vocabulary, parse behaviors, and validation precedence mirror the
reference (`/root/reference/json_schema_rs/src/json_schema/json_schema.rs:279-403`):

- ``type`` may be a string or an array of strings; only the **first** element
  is used (json_schema.rs:96-114; design.md:405).
- ``additionalProperties`` is Allow (true/absent), Forbid (false), or a
  sub-schema (json_schema.rs:53-94).
- Annotation-only keywords (``title``, ``description``, ``$comment``,
  ``default``, ``examples``, ``deprecated``, ``$schema``, ``$id``, and any
  ``format`` other than ``"uuid"``) are parsed and **ignored** for
  validation (design.md:697-727).
- Strict mode (``disallow_unknown_fields``) rejects unknown keywords at parse
  time (json_schema.rs:138-205; settings.rs:16).

This module is pure Python (no Spark): it is the plan-time half of the
engine, shared by the vectorized compiler and the pandas-UDF JSON-document
validator.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Optional, Union

from ..functions import formats

# Keywords the reference model understands (serde field set of JsonSchema,
# json_schema.rs:279-403). Anything else is "unknown" in strict mode.
KNOWN_KEYWORDS = {
    "$schema", "$id", "$ref", "type", "$defs", "definitions", "properties",
    "additionalProperties", "required", "title", "description", "$comment",
    "enum", "const", "items", "uniqueItems", "minItems", "maxItems",
    "minimum", "maximum", "minLength", "maxLength", "pattern", "format",
    "default", "deprecated", "examples", "allOf", "anyOf", "oneOf",
}

# ENGINE EXTENSIONS — the reference's own TODO list (design.md:383-677:
# `not`, `if/then/else`, `minProperties`/`maxProperties`,
# `dependentRequired`, `contains`/`minContains`/`maxContains`,
# `prefixItems`, `exclusiveMinimum`/`exclusiveMaximum`, `multipleOf`),
# implemented here with draft 2020-12 semantics. OPT-IN
# (``extensions=True``): with extensions off these keywords behave exactly
# as the reference — ignored when lenient, rejected in strict mode — so
# reference parity is byte-identical by default.
EXTENSION_KEYWORDS = {
    "not", "if", "then", "else", "multipleOf",
    "exclusiveMinimum", "exclusiveMaximum",
    "minProperties", "maxProperties", "dependentRequired",
    "contains", "minContains", "maxContains", "prefixItems",
    "patternProperties", "propertyNames", "dependentSchemas",
    "contentEncoding", "contentMediaType", "contentSchema",
    "$anchor", "$dynamicAnchor", "$dynamicRef",
    "unevaluatedProperties", "unevaluatedItems",
}

# draft 2020-12 §8.2.2 anchor-name shape
_ANCHOR_NAME_RE = re.compile(r"^[A-Za-z_][-A-Za-z0-9._]*$")

# Spec-version inference (spec_version.rs:8-17; settings.rs:70-79): resolved
# from the $schema URI, defaulting to Draft 2020-12.
DRAFT_URIS = {
    "https://json-schema.org/draft/2020-12/schema": "Draft202012",
    "https://json-schema.org/draft/2019-09/schema": "Draft201909",
    "http://json-schema.org/draft-07/schema#": "Draft07",
    "http://json-schema.org/draft-06/schema#": "Draft06",
    "http://json-schema.org/draft-04/schema#": "Draft04",
}
DEFAULT_SPEC_VERSION = "Draft202012"


class SpecParseError(ValueError):
    """Raised when a spec document cannot be parsed into the model."""


# Sentinel distinguishing "const absent" from "const: null". Must survive
# pickling with identity intact (SchemaNodes are shipped to executors in
# pandas-UDF closures), hence a singleton class with __reduce__ rather
# than a bare object().
class _AbsentType:
    _instance: "_AbsentType" = None  # type: ignore[assignment]

    def __new__(cls) -> "_AbsentType":
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __reduce__(self):
        return (_AbsentType, ())

    def __repr__(self) -> str:
        return "<absent>"


_ABSENT = _AbsentType()

ALLOW = "allow"
FORBID = "forbid"


@dataclass
class SchemaNode:
    """One schema node — a struct of optionals, like the reference's
    ``JsonSchema`` (deliberately not an enum of subtypes, design.md:56-58)."""

    schema_uri: Optional[str] = None
    id: Optional[str] = None
    ref: Optional[str] = None
    type: Optional[str] = None          # first element when given as array
    defs: Optional[dict[str, "SchemaNode"]] = None
    definitions: Optional[dict[str, "SchemaNode"]] = None
    properties: dict[str, "SchemaNode"] = field(default_factory=dict)
    # ALLOW | FORBID | SchemaNode; None means absent (= allow)
    additional_properties: Optional[Union[str, "SchemaNode"]] = None
    required: Optional[list[str]] = None
    enum: Optional[list[Any]] = None
    const: Any = _ABSENT
    items: Optional["SchemaNode"] = None
    unique_items: Optional[bool] = None
    min_items: Optional[int] = None
    max_items: Optional[int] = None
    minimum: Optional[float] = None
    maximum: Optional[float] = None
    min_length: Optional[int] = None
    max_length: Optional[int] = None
    pattern: Optional[str] = None
    format: Optional[str] = None
    all_of: Optional[list["SchemaNode"]] = None
    any_of: Optional[list["SchemaNode"]] = None
    one_of: Optional[list["SchemaNode"]] = None
    # --- extension keywords (EXTENSION_KEYWORDS; parsed only with
    # extensions=True, always None under the reference-parity default) ---
    not_schema: Optional["SchemaNode"] = None
    if_schema: Optional["SchemaNode"] = None
    then_schema: Optional["SchemaNode"] = None
    else_schema: Optional["SchemaNode"] = None
    multiple_of: Optional[float] = None
    exclusive_minimum: Optional[float] = None
    exclusive_maximum: Optional[float] = None
    min_properties: Optional[int] = None
    max_properties: Optional[int] = None
    dependent_required: Optional[dict[str, list[str]]] = None
    contains: Optional["SchemaNode"] = None
    min_contains: Optional[int] = None
    max_contains: Optional[int] = None
    prefix_items: Optional[list["SchemaNode"]] = None
    pattern_properties: Optional[dict[str, "SchemaNode"]] = None
    property_names: Optional["SchemaNode"] = None
    dependent_schemas: Optional[dict[str, "SchemaNode"]] = None
    content_encoding: Optional[str] = None
    content_media_type: Optional[str] = None
    content_schema: Optional["SchemaNode"] = None
    anchor: Optional[str] = None
    dynamic_anchor: Optional[str] = None
    dynamic_ref: Optional[str] = None
    # assertive `format` (E15, extensions only); core `format` keeps the
    # reference's annotation-except-uuid behavior
    ext_format: Optional[str] = None
    # ALLOW | FORBID | SchemaNode; None = absent (like additionalProperties)
    unevaluated_properties: Optional[Union[str, "SchemaNode"]] = None
    unevaluated_items: Optional[Union[str, "SchemaNode"]] = None
    # root-only: anchor name -> node, collected by parse_spec when
    # extensions are on (presence also flags extension mode to refs.py).
    # repr/compare excluded: the map may contain the root itself (a root
    # carrying $anchor), which would make dataclass repr/eq recurse.
    anchors: Optional[dict[str, "SchemaNode"]] = field(
        default=None, repr=False, compare=False)

    def children(self) -> "list[SchemaNode]":
        """Every direct sub-schema node (tree edges only, no $ref edges)."""
        out: list[SchemaNode] = []
        out.extend(self.properties.values())
        for m in (self.defs, self.definitions, self.pattern_properties,
                  self.dependent_schemas):
            if m:
                out.extend(m.values())
        for lst in (self.all_of, self.any_of, self.one_of,
                    self.prefix_items):
            if lst:
                out.extend(lst)
        for s in (self.items, self.not_schema, self.if_schema,
                  self.then_schema, self.else_schema, self.contains,
                  self.property_names, self.content_schema):
            if isinstance(s, SchemaNode):
                out.append(s)
        if isinstance(self.additional_properties, SchemaNode):
            out.append(self.additional_properties)
        for u in (self.unevaluated_properties, self.unevaluated_items):
            if isinstance(u, SchemaNode):
                out.append(u)
        return out

    @property
    def has_const(self) -> bool:
        return self.const is not _ABSENT

    def sorted_properties(self) -> list[tuple[str, "SchemaNode"]]:
        """Deterministic (BTreeMap) property order — json_schema.rs:306,
        design.md:50."""
        return sorted(self.properties.items())

    def fingerprint(self) -> str:
        """Cached STRUCTURAL identity — two independently parsed but
        byte-identical subtrees share one fingerprint. This is the key of
        the plan-level CSE pass (the analog of the reference codegen's
        content-addressed ``DedupeKey``, rust_backend.rs:1486-1840):
        keying on object identity would miss the common case of a schema
        repeating the same branch verbatim (or via copy-pasted $defs)."""
        fp = getattr(self, "_fp", None)
        if fp is None:
            fp = json.dumps(_node_repr(self), sort_keys=True,
                            separators=(",", ":"), default=repr)
            object.__setattr__(self, "_fp", fp)
        return fp


def _node_repr(n: "SchemaNode"):
    """Canonical nested-dict form of a node for fingerprinting. int vs
    float and bool vs int are distinguished (serde Value semantics)."""
    def val(v):
        if isinstance(v, SchemaNode):
            return _node_repr(v)
        if isinstance(v, dict):
            return {k: val(x) for k, x in sorted(v.items())}
        if isinstance(v, list):
            return [val(x) for x in v]
        if isinstance(v, bool):
            return ["b", v]
        if isinstance(v, int):
            return ["i", v]
        if isinstance(v, float):
            return ["f", repr(v)]
        return v
    out = {}
    for f_ in n.__dataclass_fields__:
        if f_ == "anchors":
            # derived index over the same tree (may contain the root
            # itself) — structurally identical trees collect identical
            # anchor maps, so it adds nothing and would recurse
            continue
        v = getattr(n, f_)
        if v is None or v is _ABSENT or (f_ == "properties" and not v):
            continue
        out[f_] = val(v)
    return out


def _expect(cond: bool, msg: str) -> None:
    if not cond:
        raise SpecParseError(msg)


def _parse_type(v: Any) -> Optional[str]:
    """`type` string-or-array-first-element (json_schema.rs:96-114)."""
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        _expect(len(v) > 0, "type array must be non-empty")
        _expect(isinstance(v[0], str), "type array elements must be strings")
        return v[0]
    raise SpecParseError(f"type must be a string or array of strings, got {v!r}")


def _parse_node_map(v: Any, what: str, strict: bool,
                    extensions: bool = False) -> dict[str, SchemaNode]:
    _expect(isinstance(v, dict), f"{what} must be an object")
    return {k: parse_node(sub, strict=strict, extensions=extensions)
            for k, sub in v.items()}


def _parse_uint(v: Any, what: str) -> int:
    _expect(isinstance(v, int) and not isinstance(v, bool) and v >= 0,
            f"{what} must be a non-negative integer")
    return v


def _parse_num(v: Any, what: str) -> float:
    _expect(isinstance(v, (int, float)) and not isinstance(v, bool),
            f"{what} must be a number")
    return float(v)


def parse_node(doc: Any, *, strict: bool = False,
               extensions: bool = False) -> SchemaNode:
    """Parse one schema object into a :class:`SchemaNode`.

    ``strict=True`` mirrors ``disallow_unknown_fields``
    (json_schema.rs:510-525): any key outside the reference vocabulary is a
    parse error. ``extensions=True`` additionally parses
    :data:`EXTENSION_KEYWORDS` (draft 2020-12 semantics; the reference's
    design.md TODO list) — off by default so the parity contract holds:
    extension keywords are ignored when lenient and unknown in strict mode,
    exactly like the reference.
    """
    _expect(isinstance(doc, dict), f"schema must be a JSON object, got {type(doc).__name__}")
    if strict:
        vocab = KNOWN_KEYWORDS | EXTENSION_KEYWORDS if extensions else KNOWN_KEYWORDS
        unknown = sorted(set(doc) - vocab)
        _expect(not unknown, f"unknown field(s) in strict mode: {', '.join(unknown)}")

    n = SchemaNode()
    n.schema_uri = doc.get("$schema")
    n.id = doc.get("$id")
    if "$ref" in doc:
        _expect(isinstance(doc["$ref"], str), "$ref must be a string")
        n.ref = doc["$ref"]
    if "type" in doc:
        n.type = _parse_type(doc["type"])
    if "$defs" in doc:
        n.defs = _parse_node_map(doc["$defs"], "$defs", strict, extensions)
    if "definitions" in doc:
        n.definitions = _parse_node_map(doc["definitions"], "definitions", strict, extensions)
    if "properties" in doc:
        n.properties = _parse_node_map(doc["properties"], "properties", strict, extensions)
    if "additionalProperties" in doc:
        ap = doc["additionalProperties"]
        if ap is True:
            n.additional_properties = ALLOW
        elif ap is False:
            n.additional_properties = FORBID
        elif isinstance(ap, dict):
            n.additional_properties = parse_node(ap, strict=strict,
                                                 extensions=extensions)
        else:
            raise SpecParseError("additionalProperties must be a bool or a schema")
    if "required" in doc:
        req = doc["required"]
        _expect(isinstance(req, list) and all(isinstance(x, str) for x in req),
                "required must be an array of strings")
        n.required = list(req)
    if "enum" in doc:
        _expect(isinstance(doc["enum"], list), "enum must be an array")
        n.enum = list(doc["enum"])
    if "const" in doc:
        n.const = doc["const"]
    if "items" in doc:
        n.items = parse_node(doc["items"], strict=strict,
                             extensions=extensions)
    if "uniqueItems" in doc:
        _expect(isinstance(doc["uniqueItems"], bool), "uniqueItems must be a bool")
        n.unique_items = doc["uniqueItems"]
    if "minItems" in doc:
        n.min_items = _parse_uint(doc["minItems"], "minItems")
    if "maxItems" in doc:
        n.max_items = _parse_uint(doc["maxItems"], "maxItems")
    if "minimum" in doc:
        n.minimum = _parse_num(doc["minimum"], "minimum")
    if "maximum" in doc:
        n.maximum = _parse_num(doc["maximum"], "maximum")
    if "minLength" in doc:
        n.min_length = _parse_uint(doc["minLength"], "minLength")
    if "maxLength" in doc:
        n.max_length = _parse_uint(doc["maxLength"], "maxLength")
    if "pattern" in doc:
        _expect(isinstance(doc["pattern"], str), "pattern must be a string")
        n.pattern = doc["pattern"]
    if "format" in doc:
        _expect(isinstance(doc["format"], str), "format must be a string")
        n.format = doc["format"]
    for kw, attr in (("allOf", "all_of"), ("anyOf", "any_of"), ("oneOf", "one_of")):
        if kw in doc:
            _expect(isinstance(doc[kw], list), f"{kw} must be an array")
            setattr(n, attr, [parse_node(s, strict=strict, extensions=extensions)
                              for s in doc[kw]])
    if extensions:
        _parse_extensions(n, doc, strict=strict)
    return n


def _parse_extensions(n: SchemaNode, doc: dict, *, strict: bool) -> None:
    """Parse :data:`EXTENSION_KEYWORDS` into their SchemaNode fields
    (draft 2020-12 value shapes; boolean-schema forms are not part of the
    model — sub-schemas must be objects, like everywhere else here)."""
    def sub(kw: str) -> SchemaNode:
        return parse_node(doc[kw], strict=strict, extensions=True)

    if "not" in doc:
        n.not_schema = sub("not")
    if "if" in doc:
        n.if_schema = sub("if")
    if "then" in doc:
        n.then_schema = sub("then")
    if "else" in doc:
        n.else_schema = sub("else")
    if "multipleOf" in doc:
        m = _parse_num(doc["multipleOf"], "multipleOf")
        _expect(m > 0, "multipleOf must be > 0")
        n.multiple_of = m
    if "exclusiveMinimum" in doc:
        n.exclusive_minimum = _parse_num(doc["exclusiveMinimum"], "exclusiveMinimum")
    if "exclusiveMaximum" in doc:
        n.exclusive_maximum = _parse_num(doc["exclusiveMaximum"], "exclusiveMaximum")
    if "minProperties" in doc:
        n.min_properties = _parse_uint(doc["minProperties"], "minProperties")
    if "maxProperties" in doc:
        n.max_properties = _parse_uint(doc["maxProperties"], "maxProperties")
    if "dependentRequired" in doc:
        dr = doc["dependentRequired"]
        _expect(isinstance(dr, dict) and all(
            isinstance(v, list) and all(isinstance(x, str) for x in v)
            for v in dr.values()),
            "dependentRequired must map property names to arrays of strings")
        n.dependent_required = {k: list(v) for k, v in dr.items()}
    if "contains" in doc:
        n.contains = sub("contains")
    if "minContains" in doc:
        n.min_contains = _parse_uint(doc["minContains"], "minContains")
    if "maxContains" in doc:
        n.max_contains = _parse_uint(doc["maxContains"], "maxContains")
    if "prefixItems" in doc:
        pi = doc["prefixItems"]
        _expect(isinstance(pi, list) and len(pi) > 0,
                "prefixItems must be a non-empty array of schemas")
        n.prefix_items = [parse_node(s, strict=strict, extensions=True)
                          for s in pi]
    if "patternProperties" in doc:
        # unlike `pattern` (whose invalid forms become
        # InvalidPatternInSchema VIOLATIONS for reference parity), an
        # invalid patternProperties key is a PARSE error: the extension
        # has no parity contract and a bad pattern can never match a name
        from ..functions import ecma_regex
        pp = doc["patternProperties"]
        _expect(isinstance(pp, dict), "patternProperties must be an object")
        for pat in pp:
            if not ecma_regex.translate(pat).valid:
                raise SpecParseError(
                    f'patternProperties pattern "{pat}" is not valid ECMA-262')
        n.pattern_properties = _parse_node_map(
            pp, "patternProperties", strict, extensions=True)
    if "propertyNames" in doc:
        # NOTE: the subschema is evaluated under the engine's TYPED
        # keyword ladder (the reference's typeless rule, V21): write it
        # as {"type": "string", ...} — a typeless {"minLength": 2}
        # asserts nothing, exactly as it would at any other node.
        n.property_names = sub("propertyNames")
    if "dependentSchemas" in doc:
        n.dependent_schemas = _parse_node_map(
            doc["dependentSchemas"], "dependentSchemas", strict,
            extensions=True)
    # content* (design.md:611-615 TODO): implemented ASSERTIVELY
    # (draft-07 style) because an opt-in extension that only annotates
    # would be inert here; 2020-12 downgraded these to annotations, so
    # this is deliberately stricter than 2020-12 — documented divergence
    if "contentEncoding" in doc:
        ce = doc["contentEncoding"]
        _expect(isinstance(ce, str), "contentEncoding must be a string")
        if ce != "base64":
            raise SpecParseError(
                f'contentEncoding "{ce}" is not supported (only "base64")')
        n.content_encoding = ce
    if "contentMediaType" in doc:
        mt = doc["contentMediaType"]
        _expect(isinstance(mt, str), "contentMediaType must be a string")
        if mt != "application/json":
            raise SpecParseError(
                f'contentMediaType "{mt}" is not supported '
                '(only "application/json")')
        n.content_media_type = mt
    if "contentSchema" in doc:
        _expect("contentMediaType" in doc,
                "contentSchema requires contentMediaType")
        n.content_schema = sub("contentSchema")
    # $anchor/$dynamicAnchor/$dynamicRef (design.md:201-223 TODOs): plain
    # "#name" fragments over the SINGLE schema resource this engine
    # supports. With one resource the dynamic scope is the document
    # itself, so $dynamicRef degenerates to (and is implemented as)
    # anchor lookup — spec-faithful for single-resource documents.
    for kw, attr in (("$anchor", "anchor"),
                     ("$dynamicAnchor", "dynamic_anchor")):
        if kw in doc:
            a = doc[kw]
            _expect(isinstance(a, str) and _ANCHOR_NAME_RE.match(a)
                    is not None, f"{kw} must be a valid anchor name")
            setattr(n, attr, a)
    if "$dynamicRef" in doc:
        dr = doc["$dynamicRef"]
        _expect(isinstance(dr, str), "$dynamicRef must be a string")
        n.dynamic_ref = dr
    # assertive `format` (E15): `format` itself is a CORE keyword (the
    # reference stores any string and validates only "uuid"); under
    # extensions the selected formats become assertions via ext_format.
    # Unknown formats stay annotations in BOTH modes (documented).
    if "format" in doc and doc["format"] in formats.EXT_FORMATS:
        n.ext_format = doc["format"]
    # unevaluatedProperties / unevaluatedItems (E16): this engine's
    # keyword ladder evaluates $ref/allOf/anyOf/oneOf EXCLUSIVELY
    # (validator/mod.rs precedence — siblings never run), so annotation
    # flow through them does not exist; combining unevaluated* with them
    # is a LOUD parse error, never a silent divergence. Likewise
    # unevaluatedProperties+additionalProperties (the jsonschema oracle
    # itself is inconsistent there: a failed additionalProperties child
    # is "unevaluated" but a failed properties child is not) and
    # unevaluatedItems+if/dependentSchemas (dynamic prefix widths).
    def _uneval(kw: str) -> Union[str, SchemaNode]:
        v = doc[kw]
        if v is True:
            return ALLOW
        if v is False:
            return FORBID
        _expect(isinstance(v, dict),
                f"{kw} must be a boolean or an object schema")
        return parse_node(v, strict=strict, extensions=True)

    _EXCLUSIVE = ("$ref", "$dynamicRef", "allOf", "anyOf", "oneOf")
    if "unevaluatedProperties" in doc:
        for kw in _EXCLUSIVE + ("additionalProperties",):
            _expect(kw not in doc,
                    f"unevaluatedProperties cannot be combined with {kw}"
                    " on the same schema node")
        n.unevaluated_properties = _uneval("unevaluatedProperties")
    if "unevaluatedItems" in doc:
        for kw in _EXCLUSIVE + ("if", "dependentSchemas"):
            _expect(kw not in doc,
                    f"unevaluatedItems cannot be combined with {kw}"
                    " on the same schema node")
        n.unevaluated_items = _uneval("unevaluatedItems")


def parse_spec(spec: Union[str, bytes, dict], *, strict: bool = False,
               extensions: bool = False) -> SchemaNode:
    """Parse a spec from a JSON string/bytes or an already-loaded dict
    (the analog of ``JsonSchema::new_from_{str,slice,serde_value}``,
    json_schema.rs:603-688). ``extensions`` opts into
    :data:`EXTENSION_KEYWORDS`."""
    if isinstance(spec, (str, bytes)):
        try:
            doc = json.loads(spec)
        except json.JSONDecodeError as e:
            raise SpecParseError(f"invalid JSON: {e}") from e
    else:
        doc = spec
    root = parse_node(doc, strict=strict, extensions=extensions)
    if extensions:
        anchors: dict[str, SchemaNode] = {}

        def collect(n: SchemaNode) -> None:
            for name in (n.anchor, n.dynamic_anchor):
                if name is not None:
                    if name in anchors and anchors[name] is not n:
                        raise SpecParseError(
                            f'duplicate anchor name "{name}"')
                    anchors[name] = n
            for c in n.children():
                collect(c)

        collect(root)
        root.anchors = anchors  # set (possibly empty) = extension mode
    return root


def resolved_spec_version(root: SchemaNode) -> str:
    """Resolve the draft from ``$schema``, defaulting to Draft 2020-12
    (settings.rs:70-79, spec_version.rs:8-17)."""
    if root.schema_uri is None:
        return DEFAULT_SPEC_VERSION
    return DRAFT_URIS.get(root.schema_uri, DEFAULT_SPEC_VERSION)
