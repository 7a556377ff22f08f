"""Seeded CI slice of the ECMA-regex cross-dialect fuzz
(tools/regex_fuzz.py): random ECMA patterns, random texts, Java find ==
Python search wherever both translations exist. The long sweep runs
standalone; this slice keeps the generator and the agreement contract
exercised on every CI run.

This harness found the `[\\S1]`-union coverage gap (classes mixing \\S
with other members were valid-but-untranslatable while the reference
handles them); the fix and its pinned cases live in
functions/ecma_regex.py / test_ecma_regex.py.
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.regex_fuzz import sweep  # noqa: E402


def test_fuzz_slice_no_divergence(spark):
    rng = random.Random(13)
    findings, stats = sweep(spark._jvm.java.util.regex.Pattern, rng,
                            n_patterns=150, n_texts=12)
    assert findings == [], findings
    # the generator must actually exercise the dual path
    assert stats["both"] >= 40, stats
    assert stats["checks"] > 400, stats


def test_s_union_classes_translate():
    # the coverage-gap regression: mixed-\S classes must translate on
    # BOTH paths now (they raised UnsupportedPatternError before)
    from json_schema_rs_spark.functions.ecma_regex import translate
    for pat in (r"[\S1]", r"[^\S1]", r"[a-\S]", r"[\S-a]", r"[\Sxy]{2}"):
        t = translate(pat)
        assert t.valid and t.java is not None and t.python is not None, \
            (pat, t)
