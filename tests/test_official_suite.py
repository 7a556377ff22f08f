"""Drop-in harness for the official JSON Schema Test Suite.

The reference runs the entire external suite
(`/root/reference/json_schema_rs/tests/json_schema_test_suite.rs:68-163`,
format at :21-33). The corpus cannot be fetched in this environment (no
network, no package installs), so this harness auto-discovers a vendored
copy: drop the suite's draft directory (e.g. ``tests/draft2020-12/*.json``
from json-schema-org/JSON-Schema-Test-Suite) into
``tests/cases/official/`` and every file runs through the interpreter
with the reference's policy — STRICT spec parse, so files exercising
unsupported keywords skip loudly (named, counted), while every case
whose schema parses must produce the exact expected verdict.

Until the corpus is vendored this reports one pinned skip (same pattern
as the Iceberg branch test) — the harness is live code, not a promise.
The equivalent generated corpus (676 cases, tests/suite_gen.py) plus the
differential fuzz layer stand in for coverage meanwhile.
"""

import json
import os
from pathlib import Path

import pytest

from json_schema_rs_spark.plans.pyvalidator import validate
from json_schema_rs_spark.plans.spec import SpecParseError, parse_spec

OFFICIAL_DIR = Path(__file__).parent / "cases" / "official"


def _discover():
    if not OFFICIAL_DIR.is_dir():
        return None
    files = sorted(OFFICIAL_DIR.rglob("*.json"))
    return files or None


FILES = _discover()


@pytest.mark.skipif(FILES is not None, reason="official suite vendored")
def test_official_suite_absent_is_pinned():
    """Loud pin: the official corpus is not vendored here (cannot be
    fetched in this sandbox). Dropping the suite's JSON files into
    tests/cases/official/ activates test_official_suite_file below."""
    pytest.skip(
        "Official JSON Schema Test Suite not vendored (no network in this "
        "environment). Place json-schema-org/JSON-Schema-Test-Suite draft "
        "files under tests/cases/official/ to run them through this "
        "harness with strict-parse skip accounting.")


@pytest.mark.parametrize(
    "path", FILES or [],
    ids=[os.path.relpath(str(f), str(OFFICIAL_DIR)) for f in (FILES or [])])
def test_official_suite_file(path):
    groups = json.loads(Path(path).read_text())
    ran = failed = skipped = 0
    failures = []
    for g in groups:
        try:
            root = parse_spec(g["schema"], strict=True)
        except (SpecParseError, TypeError):
            # unsupported keyword / non-object schema: loud skip, counted
            skipped += len(g["tests"])
            continue
        for t in g["tests"]:
            ran += 1
            try:
                verdict = not validate(root, t["data"])
            except Exception as e:  # noqa: BLE001 — report, don't mask
                verdict = f"EXCEPTION {e!r}"
            if verdict is not t["valid"]:
                failed += 1
                failures.append(
                    f"{g['description']}::{t['description']}: "
                    f"expected valid={t['valid']}, got {verdict}")
    assert not failures, (
        f"{failed}/{ran} failed ({skipped} skipped as unsupported):\n"
        + "\n".join(failures[:20]))
