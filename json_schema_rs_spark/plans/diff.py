"""Spec evolution diff: classify the change between two constraint specs.

The operational question behind schema migration on a validated corpus:
after a spec change, does previously-validated data need revalidation?

- **widening** — every instance valid under OLD is valid under NEW
  (constraints were relaxed). Safe deploy: ledger verdicts stay sound,
  no revalidation of historical partitions.
- **narrowing** — every instance valid under NEW is valid under OLD
  (constraints were tightened). Historical data must be REvalidated;
  previously-failed rows stay failed.
- **identical** — no semantic change.
- **unknown** — incomparable or mixed (some keywords widened, others
  narrowed, or a change whose direction cannot be decided keyword-wise,
  e.g. a pattern rewrite). Treat as full revalidation.

Reference anchor: the reference regenerates code whenever the schema
changes (`/root/reference/json_schema_rs/src/code_gen/generate.rs` —
any spec edit produces a new type); it has no migration classifier.
This module is the engine extension that makes spec changes *operable*
at 10^12-turn scale, where "just revalidate everything" is a real cost.

Design: a sound-but-incomplete keyword-wise lattice. Each keyword
comparator returns a direction in {EQUAL, WIDER, NARROWER, UNKNOWN};
directions combine as a meet (EQUAL is identity, WIDER+NARROWER or
anything+UNKNOWN -> UNKNOWN). Soundness contract (property-tested by
``tests/test_spec_diff.py`` against the interpreter on generated
instances): if the verdict is ``widening`` then old-valid => new-valid
for every instance; if ``narrowing`` then new-valid => old-valid.
Incompleteness is deliberate: anything non-monotone (oneOf arity, not,
pattern rewrites, $ref target changes) degrades to UNKNOWN rather than
guess.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Optional

from .spec import ALLOW, FORBID, _ABSENT, SchemaNode, parse_spec

EQUAL = "equal"
WIDER = "wider"
NARROWER = "narrower"
UNKNOWN = "unknown"

_VERDICT = {EQUAL: "identical", WIDER: "widening",
            NARROWER: "narrowing", UNKNOWN: "unknown"}


@dataclass(frozen=True)
class DiffEntry:
    """One keyword-level change: ``path`` is the schema JSON-pointer."""
    path: str
    keyword: str
    old: Optional[str]       # JSON repr; None when absent
    new: Optional[str]
    direction: str           # wider | narrower | unknown (never equal)


def _meet(a: str, b: str) -> str:
    if a == EQUAL:
        return b
    if b == EQUAL:
        return a
    if a == b:
        return a
    return UNKNOWN


def _jrepr(v: Any) -> Optional[str]:
    if v is None or v is _ABSENT:
        return None
    if isinstance(v, SchemaNode):
        return "<schema>"
    try:
        return json.dumps(v, sort_keys=True)
    except TypeError:
        return str(v)


class _Diff:
    def __init__(self, defs_opaque: bool = False,
                 old_root: Optional[SchemaNode] = None,
                 new_root: Optional[SchemaNode] = None) -> None:
        self.entries: list[DiffEntry] = []
        self.direction = EQUAL
        # parsed roots, for single-value interpreter probes (const)
        self.old_root = old_root
        self.new_root = new_root
        # True when either spec contains a polarity-inverting /
        # non-monotone context anywhere (not, if/then/else, oneOf,
        # $dynamicRef, unevaluated*): def-body edits then degrade to
        # UNKNOWN instead of carrying a direction through $ref
        self.defs_opaque = defs_opaque

    def note(self, path: str, kw: str, old: Any, new: Any,
             direction: str) -> None:
        if direction == EQUAL:
            return
        self.entries.append(DiffEntry(path, kw, _jrepr(old), _jrepr(new),
                                      direction))
        self.direction = _meet(self.direction, direction)


def _num_bound(old: Optional[float], new: Optional[float],
               *, lower: bool) -> str:
    """minimum-family (lower=True): higher bound -> narrower; absent is
    -inf. maximum-family mirrors."""
    if old == new:
        return EQUAL
    if lower:
        o = float("-inf") if old is None else old
        n = float("-inf") if new is None else new
        return NARROWER if n > o else WIDER
    o = float("inf") if old is None else old
    n = float("inf") if new is None else new
    return NARROWER if n < o else WIDER


def _set_dir(old: Optional[list], new: Optional[list],
             *, bigger_is_wider: bool) -> str:
    """enum (bigger allows more -> wider) / required (bigger demands
    more -> narrower). Absent enum = unconstrained; absent required =
    empty set."""
    if old is None and new is None:
        return EQUAL
    if bigger_is_wider:           # enum semantics: absent = everything
        if old is None:
            return NARROWER       # constraint introduced
        if new is None:
            return WIDER
    oset = {json.dumps(v, sort_keys=True) for v in (old or [])}
    nset = {json.dumps(v, sort_keys=True) for v in (new or [])}
    if oset == nset:
        return EQUAL
    if nset > oset:
        return WIDER if bigger_is_wider else NARROWER
    if nset < oset:
        return NARROWER if bigger_is_wider else WIDER
    return UNKNOWN


_NUMERIC_WIDENS = {("integer", "number")}    # every integer is a number


def _type_dir(old: Optional[str], new: Optional[str]) -> str:
    if old == new:
        return EQUAL
    if old is None:
        return NARROWER           # typeless -> typed constrains
    if new is None:
        return WIDER
    if (old, new) in _NUMERIC_WIDENS:
        return WIDER
    if (new, old) in _NUMERIC_WIDENS:
        return NARROWER
    return UNKNOWN                # disjoint types: old-valid all fail new


def _presence_dir(old: Any, new: Any) -> str:
    """Keyword whose presence constrains but whose values are
    incomparable (pattern, format...). NOT for const: these keywords
    never carry a legal null value, so None doubles as absent."""
    if old == new:
        return EQUAL
    if old is None or old is _ABSENT:
        return NARROWER
    if new is None or new is _ABSENT:
        return WIDER
    return UNKNOWN


def _has_dispatch_keywords(n: SchemaNode) -> bool:
    """True when the node carries any keyword evaluated in the
    type-dispatch step — exactly the checks that anyOf / oneOf /
    non-empty allOf on the SAME node skip (combinators are handled
    exclusively, validator/mod.rs:109-171), and that a present const
    short-circuits past. const / enum / not / if-then-else run BEFORE
    combinator dispatch and stay live, so they don't count."""
    return any((
        n.type is not None, bool(n.properties),
        n.additional_properties is not None, n.required is not None,
        n.pattern is not None, n.format is not None,
        n.ext_format is not None, n.items is not None,
        n.prefix_items is not None, n.contains is not None,
        n.min_contains is not None, n.max_contains is not None,
        n.unique_items is not None, n.min_items is not None,
        n.max_items is not None, n.min_length is not None,
        n.max_length is not None, n.minimum is not None,
        n.maximum is not None, n.exclusive_minimum is not None,
        n.exclusive_maximum is not None, n.multiple_of is not None,
        n.min_properties is not None, n.max_properties is not None,
        n.dependent_required is not None,
        bool(n.dependent_schemas), bool(n.pattern_properties),
        n.property_names is not None, n.content_encoding is not None,
        n.content_media_type is not None, n.content_schema is not None,
        n.unevaluated_properties is not None,
        n.unevaluated_items is not None,
    ))


def _const_dir(d: "_Diff", old_node: SchemaNode,
               new_node: SchemaNode) -> str:
    """const uses the _ABSENT sentinel: ``const: null`` is a real
    constraint (only JSON null passes), distinct from const-absent.
    A PRESENT const short-circuits every other check on the node
    (match -> valid, mismatch -> invalid; validator/mod.rs const step),
    so the node's valid set is exactly ``{const}``. Introduction is
    therefore narrowing iff the const value was valid under the OLD
    node, and removal is widening iff it is valid under the NEW node —
    decided by running the interpreter twin on the single value."""
    old, new = old_node.const, new_node.const
    o_absent, n_absent = old is _ABSENT, new is _ABSENT
    if o_absent and n_absent:
        return EQUAL
    from .pyvalidator import validate_with_root
    if o_absent:                  # introduced: new-valid == {const}
        ok = not validate_with_root(d.old_root, old_node, new)
        return NARROWER if ok else UNKNOWN
    if n_absent:                  # removed: old-valid == {const}
        ok = not validate_with_root(d.new_root, new_node, old)
        return WIDER if ok else UNKNOWN
    # both present: valid sets are {old} and {new} — compare by JSON
    # repr so 1 / 1.0 / true don't conflate under Python's True == 1
    return EQUAL if _jrepr(old) == _jrepr(new) else UNKNOWN


def _ap_dir(old, new) -> str:
    """additionalProperties: absent == allow; forbid is the tightest;
    schema-valued is incomparable with anything but itself."""
    o = ALLOW if old is None else old
    n = ALLOW if new is None else new
    if isinstance(o, SchemaNode) or isinstance(n, SchemaNode):
        # structurally identical schema values are no change; any other
        # schema-valued transition is incomparable keyword-wise
        same = (isinstance(o, SchemaNode) and isinstance(n, SchemaNode)
                and _node_json(o) == _node_json(n))
        return EQUAL if same else UNKNOWN
    if o == n:
        return EQUAL
    return NARROWER if n == FORBID else WIDER


def _multiple_of_dir(old: Optional[float], new: Optional[float]) -> str:
    if old == new:
        return EQUAL
    if old is None:
        return NARROWER
    if new is None:
        return WIDER
    # multipleOf 4 implies multipleOf 2: new a multiple of old -> narrower
    if old and new and (new / old) == int(new / old):
        return NARROWER
    if old and new and (old / new) == int(old / new):
        return WIDER
    return UNKNOWN


def _node_json(n: Optional[SchemaNode]) -> str:
    # stable structural fingerprint for list-membership comparisons
    from dataclasses import fields
    if n is None:
        return "null"

    def enc(x):
        if isinstance(x, SchemaNode):
            return {f.name: enc(getattr(x, f.name)) for f in fields(x)
                    if f.compare and getattr(x, f.name) is not None
                    and getattr(x, f.name) is not _ABSENT
                    and getattr(x, f.name) != {}}
        if isinstance(x, dict):
            return {k: enc(v) for k, v in x.items()}
        if isinstance(x, list):
            return [enc(v) for v in x]
        return x

    return json.dumps(enc(n), sort_keys=True)


def _list_dir(old: Optional[list], new: Optional[list],
              *, more_is_narrower: bool) -> str:
    """allOf (more conjuncts -> narrower) / anyOf (more alternatives ->
    wider), compared as multisets of structural fingerprints."""
    oset = sorted(_node_json(s) for s in (old or []))
    nset = sorted(_node_json(s) for s in (new or []))
    if oset == nset:
        return EQUAL
    ocount: dict[str, int] = {}
    for s in oset:
        ocount[s] = ocount.get(s, 0) + 1
    ncount: dict[str, int] = {}
    for s in nset:
        ncount[s] = ncount.get(s, 0) + 1
    superset = all(ncount.get(s, 0) >= c for s, c in ocount.items())
    subset = all(ocount.get(s, 0) >= c for s, c in ncount.items())
    if superset and not subset:
        return NARROWER if more_is_narrower else WIDER
    if subset and not superset:
        return WIDER if more_is_narrower else NARROWER
    return UNKNOWN


def _bool_constraint_dir(old: Optional[bool], new: Optional[bool]) -> str:
    """uniqueItems: absent/False unconstrained, True constrains."""
    o, n = bool(old), bool(new)
    if o == n:
        return EQUAL
    return NARROWER if n else WIDER


def _diff_node(d: _Diff, path: str, old: SchemaNode,
               new: SchemaNode) -> None:
    p = path or ""

    d.note(p, "type", old.type, new.type, _type_dir(old.type, new.type))
    d.note(p, "enum", old.enum, new.enum,
           _set_dir(old.enum, new.enum, bigger_is_wider=True))
    d.note(p, "required", old.required, new.required,
           _set_dir(old.required, new.required, bigger_is_wider=False))
    # display: "null" marks a present const:null; None marks absence
    d.note(p, "const",
           None if old.const is _ABSENT
           else ("null" if old.const is None else old.const),
           None if new.const is _ABSENT
           else ("null" if new.const is None else new.const),
           _const_dir(d, old, new))
    d.note(p, "pattern", old.pattern, new.pattern,
           _presence_dir(old.pattern, new.pattern))
    fmt_dir = _presence_dir(old.format, new.format)
    # core `format` is annotation-only except uuid (reference parity):
    # only transitions involving "uuid" change behavior
    if "uuid" not in (old.format, new.format):
        fmt_dir = EQUAL
    d.note(p, "format", old.format, new.format, fmt_dir)
    d.note(p, "ext_format", old.ext_format, new.ext_format,
           _presence_dir(old.ext_format, new.ext_format))

    for kw, ov, nv, lower in (
        ("minimum", old.minimum, new.minimum, True),
        ("exclusiveMinimum", old.exclusive_minimum,
         new.exclusive_minimum, True),
        ("minLength", old.min_length, new.min_length, True),
        ("minItems", old.min_items, new.min_items, True),
        ("minProperties", old.min_properties, new.min_properties, True),
        ("maximum", old.maximum, new.maximum, False),
        ("exclusiveMaximum", old.exclusive_maximum,
         new.exclusive_maximum, False),
        ("maxLength", old.max_length, new.max_length, False),
        ("maxItems", old.max_items, new.max_items, False),
        ("maxProperties", old.max_properties, new.max_properties, False),
    ):
        d.note(p, kw, ov, nv, _num_bound(ov, nv, lower=lower))

    # min/maxContains are effective only when `contains` is present, and
    # absent minContains defaults to 1 (pyvalidator.py:542) — NOT -inf:
    # absent↔0 transitions really change behavior. Inert (no contains in
    # either spec) -> no note; a contains mismatch itself already
    # degrades the verdict via the fingerprint comparison below.
    if old.contains is not None or new.contains is not None:
        omc = 1 if old.min_contains is None else old.min_contains
        nmc = 1 if new.min_contains is None else new.min_contains
        d.note(p, "minContains", old.min_contains, new.min_contains,
               _num_bound(omc, nmc, lower=True))
        d.note(p, "maxContains", old.max_contains, new.max_contains,
               _num_bound(old.max_contains, new.max_contains,
                          lower=False))

    d.note(p, "multipleOf", old.multiple_of, new.multiple_of,
           _multiple_of_dir(old.multiple_of, new.multiple_of))
    d.note(p, "uniqueItems", old.unique_items, new.unique_items,
           _bool_constraint_dir(old.unique_items, new.unique_items))
    d.note(p, "additionalProperties",
           None if old.additional_properties is None
           else ("<schema>" if isinstance(old.additional_properties,
                                          SchemaNode)
                 else old.additional_properties),
           None if new.additional_properties is None
           else ("<schema>" if isinstance(new.additional_properties,
                                          SchemaNode)
                 else new.additional_properties),
           _ap_dir(old.additional_properties, new.additional_properties))

    # Combinators are handled EXCLUSIVELY by the engine (validator/
    # mod.rs:109-171): when present, sibling type-dispatch keywords are
    # skipped. An absent<->present transition therefore both toggles the
    # combinator AND re-arms/disables the siblings — only a node bare of
    # dispatch keywords on BOTH sides carries a provable direction.
    dispatch_kw = (_has_dispatch_keywords(old)
                   or _has_dispatch_keywords(new))
    # allOf: empty list behaves exactly like absent (len>0 gate in the
    # engine), so presence is "non-empty list"
    o_all = old.all_of if old.all_of else None
    n_all = new.all_of if new.all_of else None
    if (o_all is None) != (n_all is None):
        if dispatch_kw:
            d.note(p, "allOf", None, None, UNKNOWN)
        else:
            d.note(p, "allOf", None, None,
                   NARROWER if o_all is None else WIDER)
    else:
        d.note(p, "allOf", None, None,
               _list_dir(o_all, n_all, more_is_narrower=True))
    # anyOf: absent = UNCONSTRAINED; the empty list is unsatisfiable
    # (NoSubschemaMatched on every instance), so None vs [] is a real
    # transition, not equality
    if (old.any_of is None) != (new.any_of is None):
        if dispatch_kw:
            d.note(p, "anyOf", None, None, UNKNOWN)
        else:
            d.note(p, "anyOf", None, None,
                   NARROWER if old.any_of is None else WIDER)
    else:
        d.note(p, "anyOf", None, None,
               _list_dir(old.any_of, new.any_of, more_is_narrower=False))
    # oneOf is NON-monotone (adding an alternative can invalidate values
    # that previously matched exactly one): any change -> UNKNOWN.
    # None vs [] differ too (absent = unconstrained, [] = unsatisfiable).
    if ((old.one_of is None) != (new.one_of is None)
            or _node_json_list(old.one_of) != _node_json_list(new.one_of)):
        d.note(p, "oneOf", None, None, UNKNOWN)
    # direction-less structural keywords: any change -> UNKNOWN
    for kw, ov, nv in (
        ("$ref", old.ref, new.ref),
        # named-reference keywords re-route which subschema applies:
        # adding/moving an anchor or $dynamicRef can flip validity in
        # either direction while every other keyword stays identical
        ("$anchor", old.anchor, new.anchor),
        ("$dynamicAnchor", old.dynamic_anchor, new.dynamic_anchor),
        ("$dynamicRef", old.dynamic_ref, new.dynamic_ref),
        ("not", _node_json(old.not_schema), _node_json(new.not_schema)),
        ("if/then/else",
         (_node_json(old.if_schema), _node_json(old.then_schema),
          _node_json(old.else_schema)),
         (_node_json(new.if_schema), _node_json(new.then_schema),
          _node_json(new.else_schema))),
        ("dependentRequired", old.dependent_required,
         new.dependent_required),
        ("dependentSchemas", _map_json(old.dependent_schemas),
         _map_json(new.dependent_schemas)),
        ("patternProperties", _map_json(old.pattern_properties),
         _map_json(new.pattern_properties)),
        ("propertyNames", _node_json(old.property_names),
         _node_json(new.property_names)),
        ("contains", _node_json(old.contains), _node_json(new.contains)),
        ("prefixItems", _node_json_list(old.prefix_items),
         _node_json_list(new.prefix_items)),
        ("contentEncoding", old.content_encoding, new.content_encoding),
        ("contentMediaType", old.content_media_type,
         new.content_media_type),
        ("contentSchema", _node_json(old.content_schema),
         _node_json(new.content_schema)),
        ("unevaluatedProperties",
         _uneval_json(old.unevaluated_properties),
         _uneval_json(new.unevaluated_properties)),
        ("unevaluatedItems", _uneval_json(old.unevaluated_items),
         _uneval_json(new.unevaluated_items)),
    ):
        if ov != nv:
            d.note(p, kw, str(ov), str(nv), UNKNOWN)

    # properties: recurse on common. Added/removed subschemas interact
    # with additionalProperties: under the default allow, an added
    # subschema constrains rows CARRYING the key (narrower) and a
    # removed one relaxes them (wider) — but under FORBID the polarity
    # FLIPS (adding a property opens a previously-forbidden key: wider;
    # removing one closes it: narrower). Schema-valued AP /
    # patternProperties / unevaluatedProperties make the interaction
    # non-keyword-local -> UNKNOWN.
    okeys = set(old.properties)
    nkeys = set(new.properties)
    complicated = (
        isinstance(old.additional_properties, SchemaNode)
        or isinstance(new.additional_properties, SchemaNode)
        or old.pattern_properties or new.pattern_properties
        or old.unevaluated_properties is not None
        or new.unevaluated_properties is not None)
    for k in sorted(okeys | nkeys):
        cp = f"{p}/properties/{k}"
        if k in okeys and k in nkeys:
            _diff_node(d, cp, old.properties[k], new.properties[k])
        elif k in nkeys:  # added
            if complicated:
                d.note(cp, "<property>", None, "<schema>", UNKNOWN)
            elif old.additional_properties == FORBID:
                d.note(cp, "<property>", None, "<schema>", WIDER)
            else:
                d.note(cp, "<property>", None, "<schema>", NARROWER)
        else:             # removed
            if complicated:
                d.note(cp, "<property>", "<schema>", None, UNKNOWN)
            elif new.additional_properties == FORBID:
                d.note(cp, "<property>", "<schema>", None, NARROWER)
            else:
                d.note(cp, "<property>", "<schema>", None, WIDER)

    # items: recurse when both present; presence itself constrains —
    # EXCEPT under unevaluatedItems, where adding items marks every
    # element evaluated (making unevaluatedItems inert — a WIDENING
    # despite the added constraint) and removing it re-arms the
    # unevaluated check; the interaction is not keyword-local -> UNKNOWN
    if old.items is not None and new.items is not None:
        _diff_node(d, f"{p}/items", old.items, new.items)
    elif old.items is not None or new.items is not None:
        if (old.unevaluated_items is not None
                or new.unevaluated_items is not None):
            d.note(f"{p}/items", "items",
                   None if old.items is None else "<schema>",
                   None if new.items is None else "<schema>", UNKNOWN)
        else:
            d.note(f"{p}/items", "items",
                   None if old.items is None else "<schema>",
                   None if new.items is None else "<schema>",
                   NARROWER if old.items is None else WIDER)

    # $defs / definitions: a def body edit under a stable $ref name must
    # be seen, so same-named defs recurse — BUT only when no
    # polarity-inverting context exists anywhere in either spec. A def
    # referenced from under `not` (or `if`, or a `oneOf` branch — all
    # non-monotone) flips direction: narrowing the def body WIDENS the
    # enclosing schema, while the $ref string (the thing the keyword
    # comparison sees) stays identical. Direct edits under those
    # keywords are caught by their fingerprint comparison above; only
    # the ref indirection can smuggle a directional claim past it, so
    # with any inverting context present a def change degrades to
    # UNKNOWN (handled by the caller via _NONMONO on the root pair).
    for attr, label in (("defs", "$defs"), ("definitions", "definitions")):
        om = getattr(old, attr) or {}
        nm = getattr(new, attr) or {}
        for k in sorted(set(om) | set(nm)):
            cp = f"{p}/{label}/{k}"
            if k in om and k in nm:
                if d.defs_opaque:
                    if _node_json(om[k]) != _node_json(nm[k]):
                        d.note(cp, label, "<schema>", "<schema>", UNKNOWN)
                else:
                    _diff_node(d, cp, om[k], nm[k])
            elif _node_json(om.get(k)) != _node_json(nm.get(k)):
                d.note(cp, label, None if k not in om else "<schema>",
                       None if k not in nm else "<schema>", UNKNOWN)


def _map_json(m: Optional[dict]) -> str:
    if not m:
        return "null"
    return json.dumps({k: _node_json(v) for k, v in m.items()},
                      sort_keys=True)


def _node_json_list(lst: Optional[list]) -> str:
    return json.dumps([_node_json(s) for s in (lst or [])])


def _uneval_json(v) -> str:
    if v is None:
        return "null"
    return _node_json(v) if isinstance(v, SchemaNode) else str(v)


def spec_diff(old_spec: dict, new_spec: dict, *,
              extensions: bool = False,
              strict: bool = True) -> tuple[str, list[DiffEntry]]:
    """Classify the evolution from ``old_spec`` to ``new_spec``.

    Returns ``(verdict, entries)`` with verdict in ``identical |
    widening | narrowing | unknown`` and one :class:`DiffEntry` per
    changed keyword. Sound, not complete: ``widening`` guarantees
    old-valid => new-valid; ``narrowing`` guarantees new-valid =>
    old-valid; anything the lattice cannot prove is ``unknown``.
    """
    old = parse_spec(old_spec, strict=strict, extensions=extensions)
    new = parse_spec(new_spec, strict=strict, extensions=extensions)
    d = _Diff(defs_opaque=_has_nonmonotone(old) or _has_nonmonotone(new),
              old_root=old, new_root=new)
    _diff_node(d, "", old, new)
    return _VERDICT[d.direction], d.entries


def _has_nonmonotone(n: Optional[SchemaNode],
                     seen: Optional[set] = None) -> bool:
    """Any not / if / oneOf / $dynamicRef / unevaluated* anywhere —
    contexts where an inner schema's direction inverts or is
    annotation-sensitive."""
    if n is None or not isinstance(n, SchemaNode):
        return False
    seen = seen if seen is not None else set()
    if id(n) in seen:
        return False
    seen.add(id(n))
    if (n.not_schema is not None or n.if_schema is not None
            or n.one_of or n.dynamic_ref is not None
            or n.unevaluated_properties is not None
            or n.unevaluated_items is not None):
        return True
    kids: list = [n.items, n.contains, n.property_names, n.content_schema,
                  n.then_schema, n.else_schema]
    if isinstance(n.additional_properties, SchemaNode):
        kids.append(n.additional_properties)
    for m in (n.properties, n.defs, n.definitions, n.pattern_properties,
              n.dependent_schemas):
        if m:
            kids.extend(m.values())
    for lst in (n.all_of, n.any_of, n.prefix_items):
        if lst:
            kids.extend(lst)
    return any(_has_nonmonotone(k, seen) for k in kids)


def revalidation_plan(verdict: str) -> str:
    """The operational consequence of a verdict for a validated ledger."""
    return {
        "identical": "none",
        "widening": "none (prior verdicts remain sound; "
                    "previously-invalid rows may now pass — rerun only "
                    "the violation set to reclaim rows)",
        "narrowing": "revalidate previously-VALID partitions; "
                     "prior violations stand",
        "unknown": "full revalidation",
    }[verdict]
