"""Fragment-only ``$ref`` resolution against a root schema.

Mirrors `/root/reference/json_schema_rs/src/json_schema/ref_resolver.rs`:

- ``#`` / ``""`` -> root; ``#/$defs/<name>``; ``#/definitions/<name>``.
- Remote refs, anchors, ``$id``-relative resolution and deeper pointers are
  rejected (ref_resolver.rs:76-110).
- Transitive resolution with visited-set cycle detection
  (ref_resolver.rs:164-182).

Error ``reason`` strings in ``InvalidRef`` messages reproduce the Rust
``{e:?}`` Debug formatting of ``RefResolutionError``
(validator/mod.rs:68-82), e.g. ``RefCycle { ref_str: "#/$defs/A" }``.
"""

from __future__ import annotations

import re
from typing import Optional

from .spec import SchemaNode


class RefResolutionError(Exception):
    """One of the reference's RefResolutionError variants
    (ref_resolver.rs:13-31)."""

    def __init__(self, variant: str, ref_str: str, name: Optional[str] = None) -> None:
        self.variant = variant
        self.ref_str = ref_str
        self.name = name
        super().__init__(self.rust_debug())

    def rust_debug(self) -> str:
        """Byte-match Rust's derived ``Debug`` for the error enum, which is
        interpolated into InvalidRef messages via ``format!("{e:?}")``."""
        if self.name is None:
            return f'{self.variant} {{ ref_str: {_rust_str(self.ref_str)} }}'
        return (f'{self.variant} {{ ref_str: {_rust_str(self.ref_str)}, '
                f'name: {_rust_str(self.name)} }}')


def _rust_str(s: str) -> str:
    """Rust Debug formatting of a String (escaped, double-quoted)."""
    out = ['"']
    for ch in s:
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def _decode_segment(seg: str, ref_str: str) -> str:
    """JSON Pointer unescape, strict about dangling ``~``
    (ref_resolver.rs:40-64)."""
    if "~" not in seg:
        return seg
    out: list[str] = []
    i = 0
    while i < len(seg):
        c = seg[i]
        if c != "~":
            out.append(c)
            i += 1
            continue
        nxt = seg[i + 1] if i + 1 < len(seg) else None
        if nxt == "0":
            out.append("~")
        elif nxt == "1":
            out.append("/")
        else:
            raise RefResolutionError("InvalidPointerEscape", ref_str)
        i += 2
    return "".join(out)


def parse_ref(ref_str: str) -> tuple[str, Optional[str]]:
    """Parse into ("root", None) | ("$defs", name) | ("definitions", name)
    (ref_resolver.rs:72-110)."""
    if ref_str == "" or ref_str == "#":
        return ("root", None)
    if not ref_str.startswith("#"):
        raise RefResolutionError("UnsupportedRef", ref_str)
    frag = ref_str[1:]
    if frag == "":
        return ("root", None)
    if not frag.startswith("/"):
        raise RefResolutionError("UnsupportedFragment", ref_str)
    parts = frag[1:].split("/")
    if len(parts) != 2 or parts[0] == "" or parts[1] == "":
        raise RefResolutionError("UnsupportedFragment", ref_str)
    container, raw_name = parts
    name = _decode_segment(raw_name, ref_str)
    if container == "$defs":
        return ("$defs", name)
    if container == "definitions":
        return ("definitions", name)
    raise RefResolutionError("UnsupportedFragment", ref_str)


_ANCHOR_SHAPE = re.compile(r"^#[A-Za-z_][-A-Za-z0-9._]*$")


def resolve_ref(root: SchemaNode, ref_str: str) -> SchemaNode:
    """Single-step resolution (ref_resolver.rs:118-155). Extension: when
    the root was parsed with extensions on (``root.anchors`` is set),
    plain ``#name`` fragments resolve against the collected
    ``$anchor``/``$dynamicAnchor`` map; with extensions off the same ref
    falls through to the reference's UnsupportedFragment error."""
    if root.anchors is not None and _ANCHOR_SHAPE.match(ref_str):
        name = ref_str[1:]
        if name in root.anchors:
            return root.anchors[name]
        raise RefResolutionError("AnchorNotFound", ref_str, name)
    container, name = parse_ref(ref_str)
    if container == "root":
        return root
    if container == "$defs":
        if root.defs is None:
            raise RefResolutionError("DefsMissing", ref_str)
        if name not in root.defs:
            raise RefResolutionError("DefNotFound", ref_str, name)
        return root.defs[name]
    # definitions
    if root.definitions is None:
        raise RefResolutionError("DefinitionsMissing", ref_str)
    if name not in root.definitions:
        raise RefResolutionError("DefinitionNotFound", ref_str, name)
    return root.definitions[name]


def resolve_transitive(root: SchemaNode, schema: SchemaNode) -> SchemaNode:
    """Follow ``$ref`` until the effective node has none; cycle detection on
    the ref strings encountered (ref_resolver.rs:164-182). Note that a node
    with ``$ref`` has its sibling keywords **replaced** by the target
    (draft-07-style semantics, as the reference does)."""
    current = schema
    visited: set[str] = set()
    while current.ref is not None or current.dynamic_ref is not None:
        # $ref wins when both are present (replace semantics, like $ref)
        ref_str = current.ref if current.ref is not None \
            else current.dynamic_ref
        if ref_str in visited:
            raise RefResolutionError("RefCycle", ref_str)
        visited.add(ref_str)
        current = resolve_ref(root, ref_str)
    return current
