"""Suite-case harness over tests/cases/*.json — the analog of the
reference's JSON-Schema-Test-Suite harness
(`/root/reference/json_schema_rs/tests/json_schema_test_suite.rs:68-163`),
with our ``expected_errors`` extension asserting byte-exact Display lines.

Comparison contract (SURVEY.md §5): error lists sorted by
(instance_path, code/message) before equality, like the reference sorts
ambiguous-order error lists (validator/mod.rs:667-681).
"""

import json
from pathlib import Path

import pytest

from json_schema_rs_spark.plans.pyvalidator import validate
from json_schema_rs_spark.plans.spec import parse_spec

CASES_DIR = Path(__file__).parent / "cases"


def _load_cases():
    out = []
    for path in sorted(CASES_DIR.glob("*.json")):
        for group in json.loads(path.read_text()):
            schema = group["schema"]
            for test in group["tests"]:
                out.append(pytest.param(
                    schema, test,
                    id=f"{path.stem}::{group['description']}::{test['description']}",
                ))
    return out


@pytest.mark.parametrize("schema,test", _load_cases())
def test_suite_case(schema, test):
    root = parse_spec(schema)
    violations = validate(root, test["data"])
    if test["valid"]:
        assert violations == [], [v.message for v in violations]
    else:
        assert violations != [], "expected violations, got none"
        if "expected_errors" in test:
            actual = sorted(v.message for v in violations)
            expected = sorted(test["expected_errors"])
            assert actual == expected
