"""Three-way differential: the engine's interpreter vs the independent
``jsonschema`` package (Draft 2020-12) on randomized specs and rows.

tests/test_differential_fuzz.py proves the vectorized compiler and the
Python interpreter agree with each other — two implementations by the
same author. This layer brings in a THIRD implementation nobody here
wrote: per-row VALIDITY VERDICTS (not message bytes — those are
reference-specific) must match ``jsonschema.Draft202012Validator``.

Known deliberate dialect differences of the reference (and therefore of
this engine) vs standard JSON Schema, and why they cannot fire here:

- ``type: integer`` rejects integral floats like 0.0 (json_schema_rs
  validator/mod.rs:259-275 via serde_json's i64/u64 test; JSON Schema
  accepts them). The corpus DOES reach this: the random
  ``additionalProperties: {"type": "integer"}`` schema applies to the
  double column when it is the undeclared property. Those rows are
  classified below and asserted to diverge only in the reference's
  documented direction (we reject, jsonschema accepts).
- ``pattern`` is ECMA-262 (the reference embeds the `regress` crate);
  ``jsonschema`` uses Python ``re`` on the raw pattern. The fuzz pools
  draw only dual-dialect patterns. A verdict mismatch that disappears
  when the pattern keyword is stripped is classified as a
  pattern-dialect divergence and asserted to be zero for these pools —
  if one ever appears, it is a finding to document, not noise.
- ``uniqueItems``/``enum`` numeric equality (1 vs 1.0): serde_json
  distinguishes them, Python doesn't. The array pool is integer-only.
"""

from __future__ import annotations

import random

import pytest

jsonschema = pytest.importorskip("jsonschema")

from json_schema_rs_spark.plans.pyvalidator import validate  # noqa: E402
from json_schema_rs_spark.plans.spec import parse_spec  # noqa: E402
from tests.test_differential_fuzz import _rand_row, _rand_spec  # noqa: E402

N_SPECS = 60
N_ROWS = 200
NAMES = ("s", "i", "x", "a")


def _is_integral_float(data: dict, path: str) -> bool:
    """True when the value at a (flat or /arr/i) instance path is a float
    with no fractional part — the known integer-dialect case."""
    parts = [p for p in path.split("/") if p]
    v = data
    for p in parts:
        try:
            v = v[int(p)] if isinstance(v, list) else v[p]
        except (KeyError, IndexError, ValueError):
            return False
    return isinstance(v, float) and v.is_integer()


def _strip_patterns(node):
    if isinstance(node, dict):
        return {k: _strip_patterns(v) for k, v in node.items()
                if k != "pattern"}
    if isinstance(node, list):
        return [_strip_patterns(v) for v in node]
    return node


def _cases():
    rng = random.Random(99_2026)
    return [(_rand_spec(rng), [_rand_row(rng) for _ in range(N_ROWS)])
            for _ in range(N_SPECS)]


@pytest.mark.parametrize("case_idx", range(N_SPECS))
def test_interpreter_verdicts_match_jsonschema(case_idx):
    spec, rows = _cases()[case_idx]
    root = parse_spec(spec)
    v3 = jsonschema.Draft202012Validator(spec)
    v3_stripped = jsonschema.Draft202012Validator(_strip_patterns(spec))
    mismatches, dialect, int_dialect = [], [], []
    invalid_seen = 0
    for row in rows:
        data = {n: v for n, v in zip(NAMES, row) if v is not None}
        viols = validate(root, data)
        ours = not viols
        try:
            theirs = v3.is_valid(data)
        except Exception:
            # jsonschema applies Python `re` to the raw ECMA pattern and
            # some Annex-B-valid draws (e.g. [\d-x]) do not compile in
            # that dialect at all — our engine translates them instead.
            # Compare on the pattern-stripped spec for such rows.
            if (not validate(parse_spec(_strip_patterns(spec)), data)) \
                    != v3_stripped.is_valid(data):
                mismatches.append((data, ours, "uncompilable-pattern"))
            continue
        if ours != theirs:
            # known direction-1 divergence: reference rejects integral
            # floats as integers, standard JSON Schema accepts them
            int_viols = [v for v in viols if v.code == "ExpectedInteger"]
            if (not ours and theirs and int_viols
                    and all(_is_integral_float(data, v.path)
                            for v in int_viols)
                    and not [v for v in viols
                             if v.code != "ExpectedInteger"]):
                int_dialect.append((data, [v.path for v in int_viols]))
                continue
            root_stripped = parse_spec(_strip_patterns(spec))
            ours_s = not validate(root_stripped, data)
            theirs_s = v3_stripped.is_valid(data)
            if ours_s == theirs_s:
                dialect.append((data, ours, theirs))
            else:
                mismatches.append((data, ours, theirs))
        if not ours:
            invalid_seen += 1
    assert not mismatches, (
        f"spec #{case_idx} {spec}: {len(mismatches)} verdict mismatches "
        f"vs jsonschema; first: {mismatches[0]}")
    # the dual-dialect pattern pools must not diverge either; a nonzero
    # count here is a real finding about the translation layer
    assert not dialect, (
        f"spec #{case_idx}: pattern-dialect divergence: {dialect[0]}")


def test_corpus_exercises_both_verdicts():
    """Meta-check: the random corpus actually produces a healthy mix of
    valid and invalid rows (a fuzz suite that only sees one verdict
    proves nothing)."""
    valid = invalid = 0
    for spec, rows in _cases():
        root = parse_spec(spec)
        for row in rows:
            data = {n: v for n, v in zip(NAMES, row) if v is not None}
            if validate(root, data):
                invalid += 1
            else:
                valid += 1
    assert valid > 200 and invalid > 200, (valid, invalid)
