"""Spec evolution diff: keyword-lattice classification + soundness.

The soundness contract is property-tested against the interpreter twin:
whenever spec_diff says ``widening``, every generated instance valid
under OLD must be valid under NEW (and mirrored for ``narrowing``) —
across randomized spec mutations including the $ref-under-not polarity
trap the lattice must refuse to classify.
"""

import random

import pytest

from json_schema_rs_spark.plans.diff import (
    revalidation_plan, spec_diff)
from json_schema_rs_spark.plans.pyvalidator import validate
from json_schema_rs_spark.plans.spec import parse_spec

BASE = {
    "type": "object",
    "required": ["role", "turn_idx"],
    "properties": {
        "role": {"type": "string", "enum": ["user", "assistant"]},
        "turn_idx": {"type": "integer", "minimum": 0, "maximum": 1000},
        "text": {"type": "string", "minLength": 1},
    },
}


def _mut(**over):
    import copy
    s = copy.deepcopy(BASE)
    for path, v in over.items():
        cur = s
        parts = path.split(".")
        for q in parts[:-1]:
            cur = cur[q]
        if v is None:
            cur.pop(parts[-1], None)
        else:
            cur[parts[-1]] = v
    return s


class TestVerdicts:
    def test_identical(self):
        verdict, entries = spec_diff(BASE, _mut())
        assert verdict == "identical" and entries == []
        assert revalidation_plan(verdict) == "none"

    @pytest.mark.parametrize("new,keyword", [
        (_mut(**{"properties.turn_idx.maximum": 2000}), "maximum"),
        (_mut(**{"properties.turn_idx.minimum": None}), "minimum"),
        (_mut(required=["role"]), "required"),
        (_mut(**{"properties.role.enum": ["user", "assistant", "tool"]}),
         "enum"),
        (_mut(**{"properties.text.minLength": None}), "minLength"),
        (_mut(**{"properties.text": None}), "<property>"),
    ])
    def test_widening(self, new, keyword):
        verdict, entries = spec_diff(BASE, new)
        assert verdict == "widening"
        assert [e.keyword for e in entries] == [keyword]
        assert entries[0].direction == "wider"

    @pytest.mark.parametrize("new,keyword", [
        (_mut(**{"properties.turn_idx.maximum": 500}), "maximum"),
        (_mut(required=["role", "turn_idx", "text"]), "required"),
        (_mut(**{"properties.role.enum": ["user"]}), "enum"),
        (_mut(**{"properties.text.pattern": "^a"}), "pattern"),
        (_mut(additionalProperties=False), "additionalProperties"),
        (_mut(**{"properties.tool": {"type": "string"}}), "<property>"),
    ])
    def test_narrowing(self, new, keyword):
        verdict, entries = spec_diff(BASE, new)
        assert verdict == "narrowing"
        assert [e.keyword for e in entries] == [keyword]
        assert entries[0].direction == "narrower"

    def test_mixed_is_unknown(self):
        new = _mut(**{"properties.turn_idx.maximum": 2000,   # wider
                      "properties.role.enum": ["user"]})     # narrower
        verdict, entries = spec_diff(BASE, new)
        assert verdict == "unknown"
        assert {e.direction for e in entries} == {"wider", "narrower"}
        assert revalidation_plan(verdict) == "full revalidation"

    @pytest.mark.parametrize("new", [
        _mut(**{"properties.role.type": "integer"}),     # disjoint types
        _mut(**{"properties.text.pattern": "^b"}),       # needs old pattern
    ])
    def test_incomparable_is_unknown(self, new):
        old = _mut(**{"properties.text.pattern": "^a"}) \
            if "pattern" in str(new["properties"]["text"]) else BASE
        verdict, _ = spec_diff(old, new)
        assert verdict == "unknown"

    def test_integer_to_number_widens(self):
        verdict, _ = spec_diff(
            BASE, _mut(**{"properties.turn_idx.type": "number"}))
        assert verdict == "widening"

    def test_widening_reval_plan_mentions_violation_set(self):
        assert "violation set" in revalidation_plan("widening")
        assert "revalidate" in revalidation_plan("narrowing")


class TestPropertyApInterplay:
    def test_identical_schema_valued_ap_is_identical(self):
        spec = _mut(additionalProperties={"type": "integer"})
        assert spec_diff(spec, spec)[0] == "identical"
        # any schema-valued transition is keyword-incomparable
        assert spec_diff(
            spec, _mut(additionalProperties={"type": "string"}),
        )[0] == "unknown"

    def test_property_removed_under_forbid_narrows(self):
        old = _mut(additionalProperties=False)
        new = _mut(additionalProperties=False,
                   **{"properties.text": None})
        verdict, _ = spec_diff(old, new)
        assert verdict == "narrowing"   # text keys are now forbidden

    def test_property_added_under_forbid_widens(self):
        old = _mut(additionalProperties=False)
        new = _mut(additionalProperties=False,
                   **{"properties.tool": {"type": "string"}})
        verdict, _ = spec_diff(old, new)
        assert verdict == "widening"    # a forbidden key is now allowed


class TestCombinators:
    def test_allof_conjunct_added_narrows(self):
        old = {"allOf": [{"type": "string"}]}
        new = {"allOf": [{"type": "string"}, {"minLength": 2}]}
        assert spec_diff(old, new)[0] == "narrowing"

    def test_anyof_alternative_added_widens(self):
        old = {"anyOf": [{"type": "string"}]}
        new = {"anyOf": [{"type": "string"}, {"type": "integer"}]}
        assert spec_diff(old, new)[0] == "widening"

    def test_oneof_any_change_is_unknown(self):
        old = {"oneOf": [{"type": "string"}]}
        new = {"oneOf": [{"type": "string"}, {"type": "integer"}]}
        assert spec_diff(old, new)[0] == "unknown"

    def test_def_body_narrowed_under_stable_ref(self):
        old = {"type": "object",
               "properties": {"s": {"$ref": "#/$defs/d"}},
               "$defs": {"d": {"type": "string", "minLength": 1}}}
        new = {"type": "object",
               "properties": {"s": {"$ref": "#/$defs/d"}},
               "$defs": {"d": {"type": "string", "minLength": 5}}}
        assert spec_diff(old, new)[0] == "narrowing"

    def test_def_change_under_not_context_is_unknown(self):
        # the polarity trap: narrowing a def that is $ref'd from inside
        # `not` actually WIDENS the spec — the lattice must refuse
        old = {"type": "object",
               "properties": {"s": {"not": {"$ref": "#/$defs/d"}}},
               "$defs": {"d": {"type": "string", "minLength": 5}}}
        new = {"type": "object",
               "properties": {"s": {"not": {"$ref": "#/$defs/d"}}},
               "$defs": {"d": {"type": "string", "minLength": 9}}}
        verdict, _ = spec_diff(old, new, extensions=True)
        assert verdict == "unknown"


    def test_def_change_under_nested_not_is_unknown(self):
        # the inverting context sits two levels down (anyOf -> not):
        # the whole-spec scan must still catch it
        def spec(minlen):
            return {"type": "object",
                    "properties": {"s": {"anyOf": [
                        {"not": {"$ref": "#/$defs/d"}},
                        {"type": "integer"}]}},
                    "$defs": {"d": {"type": "string",
                                    "minLength": minlen}}}
        verdict, _ = spec_diff(spec(5), spec(9), extensions=True)
        assert verdict == "unknown"


class TestExtensions:
    def test_multiple_of_coarser_narrows(self):
        old = {"type": "integer", "multipleOf": 2}
        new = {"type": "integer", "multipleOf": 4}
        assert spec_diff(old, new, extensions=True)[0] == "narrowing"
        assert spec_diff(new, old, extensions=True)[0] == "widening"

    def test_incommensurable_multiple_of_unknown(self):
        old = {"type": "integer", "multipleOf": 2}
        new = {"type": "integer", "multipleOf": 3}
        assert spec_diff(old, new, extensions=True)[0] == "unknown"

    def test_exclusive_bound_tightened(self):
        old = {"type": "number", "exclusiveMinimum": 0}
        new = {"type": "number", "exclusiveMinimum": 5}
        assert spec_diff(old, new, extensions=True)[0] == "narrowing"


# --------------------------------------------------------------------------
# Soundness property test: verdict direction vs the interpreter twin
# --------------------------------------------------------------------------

_STR_POOL = ["", "a", "ab", "abcde", "user", "assistant", "tool", "zz9"]


def _rand_base_spec(rng):
    props = {}
    props["s"] = {"type": "string"}
    if rng.random() < 0.6:
        props["s"]["minLength"] = rng.randrange(0, 4)
    if rng.random() < 0.4:
        props["s"]["maxLength"] = rng.randrange(2, 8)
    if rng.random() < 0.3:
        props["s"] = {"type": "string",
                      "enum": rng.sample(_STR_POOL, rng.randrange(2, 5))}
    props["i"] = {"type": "integer"}
    if rng.random() < 0.6:
        props["i"]["minimum"] = rng.randrange(-5, 5)
    if rng.random() < 0.6:
        props["i"]["maximum"] = rng.randrange(5, 60)
    spec = {"type": "object", "properties": props}
    req = [c for c in ("s", "i") if rng.random() < 0.4]
    if req:
        spec["required"] = req
    if rng.random() < 0.3:
        spec["additionalProperties"] = False
    return spec


def _mutate(rng, spec):
    import copy
    s = copy.deepcopy(spec)
    for _ in range(rng.randrange(1, 3)):
        which = rng.randrange(10)
        si, ii = s["properties"].get("s", {}), s["properties"].get("i", {})
        if which == 0 and "minimum" in ii:
            ii["minimum"] += rng.choice([-3, -1, 1, 3])
        elif which == 1 and "maximum" in ii:
            ii["maximum"] += rng.choice([-10, -2, 2, 10])
        elif which == 2 and "minLength" in si:
            si["minLength"] = max(0, si["minLength"]
                                  + rng.choice([-2, -1, 1, 2]))
        elif which == 3 and "enum" in si:
            if rng.random() < 0.5 and len(si["enum"]) > 1:
                si["enum"] = si["enum"][:-1]
            else:
                extra = [v for v in _STR_POOL if v not in si["enum"]]
                if extra:
                    si["enum"] = si["enum"] + [rng.choice(extra)]
        elif which == 4:
            req = set(s.get("required", []))
            c = rng.choice(["s", "i"])
            req.symmetric_difference_update([c])
            s["required"] = sorted(req)
            if not s["required"]:
                s.pop("required")
        elif which == 5:
            if s.get("additionalProperties") is False:
                if rng.random() < 0.5:
                    s.pop("additionalProperties")
            else:
                s["additionalProperties"] = False
        elif which == 6 and "s" in s["properties"]:
            if rng.random() < 0.5:
                si["pattern"] = rng.choice(["a", "^a", "b+"])
            else:
                si.pop("pattern", None)
        elif which == 7:
            if "x" in s["properties"]:
                del s["properties"]["x"]
            else:
                s["properties"]["x"] = {"type": "integer",
                                        "minimum": rng.randrange(0, 5)}
        elif which == 8:
            # anyOf absent<->present (the round-3 inversion bug class)
            if "anyOf" in si:
                si.pop("anyOf")
            else:
                si.pop("enum", None)
                si["anyOf"] = rng.choice([
                    [{"minLength": 1}],
                    [{"enum": ["a", "ab"]}, {"minLength": 4}],
                ])
        elif which == 9:
            # const absent<->present, including const:null (sentinel bug)
            if "const" in ii:
                ii.pop("const")
            else:
                ii.pop("minimum", None)
                ii.pop("maximum", None)
                ii["const"] = rng.choice([None, 0, 4, 9])
                if ii["const"] is None:
                    ii.pop("type", None)
    return s


def _rand_instance(rng):
    inst = {}
    if rng.random() < 0.85:
        inst["s"] = rng.choice(_STR_POOL)
    if rng.random() < 0.85:
        inst["i"] = rng.choice([-7, -1, 0, 1, 4, 9, 30, 70, None])
    if rng.random() < 0.3:
        inst["x"] = rng.choice([-1, 0, 2, 8])
    return inst


def test_verdict_soundness_against_interpreter():
    rng = random.Random(20260818)
    checked = widen_hits = narrow_hits = 0
    for trial in range(120):
        old_spec = _rand_base_spec(rng)
        new_spec = _mutate(rng, old_spec)
        verdict, _ = spec_diff(old_spec, new_spec)
        if verdict == "unknown":
            continue
        old = parse_spec(old_spec)
        new = parse_spec(new_spec)
        for _ in range(60):
            inst = _rand_instance(rng)
            ok_old = not validate(old, inst)
            ok_new = not validate(new, inst)
            if verdict in ("identical", "widening") and ok_old:
                assert ok_new, (
                    f"widening verdict violated: {old_spec} -> {new_spec} "
                    f"on {inst}")
                widen_hits += 1
            if verdict in ("identical", "narrowing") and ok_new:
                assert ok_old, (
                    f"narrowing verdict violated: {old_spec} -> {new_spec} "
                    f"on {inst}")
                narrow_hits += 1
            checked += 1
    # the test must actually exercise both directions
    assert checked > 1000 and widen_hits > 50 and narrow_hits > 50


# --------------------------------------------------------------------------
# Extensions-mode soundness: the keyword families whose absent<->present
# transitions the round-3 review found misclassified (minContains default,
# items-under-unevaluatedItems, anchor/$dynamicRef re-routing)
# --------------------------------------------------------------------------

def _rand_ext_spec(rng):
    a = {"type": "array"}
    if rng.random() < 0.7:
        a["contains"] = {"type": "integer"}
        if rng.random() < 0.5:
            a["minContains"] = rng.randrange(0, 3)
        if rng.random() < 0.3:
            a["maxContains"] = rng.randrange(2, 5)
    if rng.random() < 0.4:
        a["unevaluatedItems"] = rng.choice(
            [False, {"type": "string", "maxLength": 2}])
    elif rng.random() < 0.4:
        a["items"] = {"type": "integer", "minimum": -5}
    return {"type": "object", "properties": {"a": a}}


def _mutate_ext(rng, spec):
    import copy
    s = copy.deepcopy(spec)
    a = s["properties"]["a"]
    for _ in range(rng.randrange(1, 3)):
        which = rng.randrange(4)
        if which == 0:
            # minContains absent<->present (absent defaults to 1)
            if "minContains" in a:
                a.pop("minContains")
            else:
                a["minContains"] = rng.randrange(0, 3)
        elif which == 1:
            # items absent<->present (inerts unevaluatedItems)
            if "items" in a:
                a.pop("items")
            else:
                a["items"] = {"type": "integer", "minimum": -5}
        elif which == 2:
            if "unevaluatedItems" in a:
                a.pop("unevaluatedItems")
            else:
                a["unevaluatedItems"] = rng.choice(
                    [False, {"type": "string", "maxLength": 2}])
        elif which == 3:
            if "contains" in a:
                if rng.random() < 0.4:
                    a.pop("contains")
                    a.pop("minContains", None)
                    a.pop("maxContains", None)
                else:
                    a["maxContains"] = rng.randrange(2, 5)
            else:
                a["contains"] = {"type": "integer"}
    return s


_EXT_ARRS = [[], [1], [1, 2], ["x"], [1, "x"], ["ab", "cdef"],
             [1, 2, 3, 4], ["x", 7, "y"], [-9], [0, "z", 0]]


def test_ext_verdict_soundness_against_interpreter():
    rng = random.Random(20260819)
    checked = directional = 0
    for trial in range(150):
        old_spec = _rand_ext_spec(rng)
        new_spec = _mutate_ext(rng, old_spec)
        verdict, _ = spec_diff(old_spec, new_spec, extensions=True)
        if verdict == "unknown":
            continue
        if verdict != "identical":
            directional += 1
        old = parse_spec(old_spec, extensions=True)
        new = parse_spec(new_spec, extensions=True)
        for arr in _EXT_ARRS:
            inst = {"a": arr}
            ok_old = not validate(old, inst)
            ok_new = not validate(new, inst)
            if verdict in ("identical", "widening") and ok_old:
                assert ok_new, (f"widening violated: {old_spec} -> "
                                f"{new_spec} on {inst}")
            if verdict in ("identical", "narrowing") and ok_new:
                assert ok_old, (f"narrowing violated: {old_spec} -> "
                                f"{new_spec} on {inst}")
            checked += 1
    assert checked > 300 and directional > 10


def test_anchor_and_dynamic_ref_changes_not_identical():
    base = {"properties": {"x": {"$ref": "#t"}},
            "$defs": {"a": {"type": "string", "$anchor": "t"},
                      "b": {"type": "integer"}}}
    moved = {"properties": {"x": {"$ref": "#t"}},
             "$defs": {"a": {"type": "string"},
                       "b": {"type": "integer", "$anchor": "t"}}}
    assert spec_diff(base, moved, extensions=True)[0] == "unknown"

    plain = {"type": "object", "properties": {"k": {}},
             "$defs": {"t": {"type": "integer", "$dynamicAnchor": "d"}}}
    with_dyn = {"type": "object", "properties": {"k": {}},
                "$dynamicRef": "#d",
                "$defs": {"t": {"type": "integer", "$dynamicAnchor": "d"}}}
    assert spec_diff(plain, with_dyn, extensions=True)[0] == "unknown"


def test_const_null_vs_absent():
    old = {"type": "object", "properties": {"x": {"const": None}}}
    new = {"type": "object", "properties": {"x": {}}}
    # removing const:null RELAXES (any x now passes where only null did)
    assert spec_diff(old, new)[0] == "widening"
    assert spec_diff(new, old)[0] == "narrowing"


def test_min_contains_default_is_one():
    base = {"type": "array", "contains": {"type": "integer"}}
    zero = {"type": "array", "contains": {"type": "integer"},
            "minContains": 0}
    # absent minContains means 1; 0 admits arrays with no match -> wider
    assert spec_diff(base, zero, extensions=True)[0] == "widening"
    assert spec_diff(zero, base, extensions=True)[0] == "narrowing"


def test_items_added_under_unevaluated_items_is_unknown():
    old = {"type": "array", "unevaluatedItems": False}
    new = {"type": "array", "unevaluatedItems": False, "items": {}}
    # adding items makes unevaluatedItems inert: a WIDENING in disguise
    assert spec_diff(old, new, extensions=True)[0] == "unknown"
    assert spec_diff(new, old, extensions=True)[0] == "unknown"


def test_anyof_absent_to_present_narrows():
    old = {"type": "object", "properties": {"x": {}}}
    new = {"type": "object",
           "properties": {"x": {"anyOf": [{"type": "string"}]}}}
    assert spec_diff(old, new)[0] == "narrowing"
    assert spec_diff(new, old)[0] == "widening"
