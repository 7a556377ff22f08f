"""ECMA-262 regex audit/translation tests.

Each case is ``(pattern, text, expected)`` where ``expected`` is the
match verdict of an ECMA-262(+Annex B) engine with no flags — the
reference's ``regress::Regex::new(p).find(text)`` semantics
(`/root/reference/json_schema_rs/src/validator/mod.rs:259-277`), derived
from the ECMA-262 spec (§22.2 + Annex B §B.1.2). Both translations are
executed for real: the Java one against the JVM's ``java.util.regex``
(through the Spark session), the Python one against ``re``.
"""

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from json_schema_rs_spark.functions.ecma_regex import (  # noqa: E402
    PY_FLAGS,
    UnsupportedPatternError,
    compile_python,
    translate,
)

# (pattern, text, expected ECMA partial-match verdict)
MATCH_CASES = [
    # Annex B dangling brace: literal `{` (naive Java: COMPILE ERROR)
    ("a{", "xa{y", True),
    ("a{", "a", False),
    ("a{,5}", "a{,5}", True),
    ("a{,5}", "aaa", False),
    ("a{2}", "aa", True),
    ("a{2}", "ab", False),
    ("a{2,3}", "aa", True),
    # $ / ^ are absolute anchors in ECMA (naive Java/Python: also pre-\n)
    ("c$", "abc", True),
    ("c$", "abc\n", False),
    ("^a", "a", True),
    ("^a", "ba", False),
    ("^$", "", True),
    ("^$", "\n", False),
    # `.` excludes exactly \n \r     (Java also )
    (".", "\n", False),
    (".", "\r", False),
    (".", " ", False),
    (".", "", True),
    (".", "a", True),
    # \s is ECMA whitespace incl. NBSP + BOM (Java: ASCII only)
    ("\\s", " ", True),
    ("\\s", "﻿", True),
    ("\\s", " ", True),
    ("\\s", "a", False),
    ("\\S", " ", False),
    ("\\S", "x", True),
    ("[\\s]", " ", True),
    ("[^\\s]", " ", False),
    ("[\\S]", " ", False),
    ("[\\S]", "x", True),
    ("[^\\S]", " ", True),
    # \d \w \b are ASCII in ECMA (Python naive: Unicode)
    ("\\d", "٣", False),            # ARABIC-INDIC DIGIT THREE
    ("\\d", "7", True),
    ("\\w", "é", False),
    ("\\w", "e", True),
    ("a\\b", "aé", True),           # é is not an ECMA word char
    ("a\\b", "ab", False),
    ("[\\d]", "٣", False),
    ("[\\w]", "é", False),
    ("[^\\w]", "é", True),
    ("[\\D]", "٣", True),
    ("[\\W]", "é", True),
    # \cX control escapes (naive Python: COMPILE ERROR)
    ("\\cJ", "a\nb", True),
    ("\\cj", "a\nb", True),
    ("\\cM", "\r", True),
    # Annex B: \c with no control letter -> literal backslash, then `c`
    ("\\c5", "\\c5", True),
    ("\\c5", "c5", False),
    ("\\c*", "\\ccc", True),        # quantifier binds the literal `c`
    ("[\\c5]", "\x15", True),       # in-class: ClassControlLetter incl 0-9
    ("[\\c]", "\\", True),
    ("[\\c]", "c", True),
    # named groups (naive Python: needs ?P<>)
    ("(?<year>\\d{4})", "1999", True),
    ("(?<year>\\d{4})", "19x9", False),
    ("(?<a>x)\\k<a>", "xx", True),
    ("(?<a>x)\\k<a>", "xy", False),
    # \p without u flag: identity escape -> literal p (naive Java: property)
    ("\\p{L}", "p{L}", True),
    ("\\p{L}", "A", False),
    # Annex B identity escapes (naive Java/Python: COMPILE ERROR)
    ("\\q", "q", True),
    ("\\q", "Q", False),
    ("\\-", "-", True),
    ("\\ ", " ", True),
    # empty classes
    ("x[]", "x", False),            # [] matches nothing
    ("[^]", "\n", True),            # [^] matches anything incl. newline
    # decimal escapes: backref when group exists, else Annex B octal/identity
    ("(a)\\1", "aa", True),
    ("(a)\\1", "ab", False),
    ("\\8", "8", True),             # no 8th group -> identity
    ("\\12", "\n", True),           # no groups -> octal 012 = LF
    ("\\0", "\x00", True),
    ("\\101", "A", True),           # octal 101 = 'A'
    # class ranges + Annex B dash-after-escape
    ("[a-c]", "b", True),
    ("[a-c]", "d", False),
    ("[\\w-x]", "-", True),         # dash literal after class escape
    ("[\\w-x]", "q", True),
    ("[a-\\d]", "-", True),         # dash literal before class escape
    ("[a-\\d]", "5", True),
    ("[-a]", "-", True),
    ("[a-]", "-", True),
    # quantified lookahead (Annex B; naive Python: COMPILE ERROR)
    ("(?=a)*a", "a", True),
    ("(?=a)?b", "b", True),
    # stray ] } literals (Annex B)
    ("]", "]", True),
    ("}", "}", True),
    # hex/unicode escapes, incomplete -> Annex B identity
    ("\\x41", "A", True),
    ("\\x4g", "x4g", True),
    ("\\u0041", "A", True),
    ("\\u12", "u12x", True),
    # alternation with empty arm matches everywhere
    ("a|", "zzz", True),
    ("x\\v", "x\x0b", True),
    # lookahead / negative lookahead
    ("a(?=b)", "ab", True),
    ("a(?=b)", "ac", False),
    ("a(?!b)", "ac", True),
    # non-capturing / nested groups
    ("(?:ab)+c", "ababc", True),
    ("((a)b)\\2", "aba", True),
    # \S unioned with other class members (round-4: was valid-but-
    # untranslatable; now the set-algebra construction — found by
    # tools/regex_fuzz.py). ECMA \S = complement of the unicode WS set,
    # so NBSP must stay OUT of [\S1] and IN [^\S1].
    ("[\\S1]", "1", True),
    ("[\\S1]", "x", True),
    ("[\\S1]", " ", False),
    ("[\\S1]", " ", False),
    ("[^\\S1]", " ", True),
    ("[^\\S1]", " ", True),
    ("[^\\S1]", "1", False),
    ("[^\\S1]", "x", False),
    ("[\\S1]{2}", "1x", True),      # quantifier on the (?:...) atom
    ("[\\S1]{2}", "1 ", False),
    ("[a-\\S]", "-", True),         # dash before \S is a literal dash
    ("[a-\\S]", " ", False),
    ("[\\S-a]", "-", True),         # dash after \S is a literal dash
    ("[\\S\\S]", "x", True),        # repeated \S alone stays one class
    ("[\\S\\S]", " ", False),
]

INVALID_CASES = [
    "(?i)abc",        # inline flags are ECMA syntax errors
    "(?s)a.",
    "(?m)^a",
    "(?P<a>x)",       # Python-ism, not ECMA
    "(?>atomic)",
    "(a",             # unterminated group
    "a)",             # unmatched )
    "*a",             # nothing to repeat
    "a**",
    "+",
    "a{3,1}",         # range out of order
    "{2}",            # InvalidBracedQuantifier (Annex B B.1.2)
    "[z-a]",          # class range out of order
    "[abc",           # unterminated class
    "\\k<nope>",      # \k names a group that doesn't exist... but only
                      # invalid when a named group exists elsewhere:
]
# ...make the last case actually contain a named group
INVALID_CASES[-1] = "(?<g>x)\\k<nope>"


@pytest.fixture(scope="module")
def jpattern(spark):
    return spark._jvm.java.util.regex.Pattern


def _java_find(jpattern, pat: str, text: str) -> bool:
    return bool(jpattern.compile(pat).matcher(text).find())


@pytest.mark.parametrize("pattern,text,expected", MATCH_CASES,
                         ids=[f"{i}:{p!r}" for i, (p, _, _) in enumerate(MATCH_CASES)])
def test_translation_matches_ecma(jpattern, pattern, text, expected):
    t = translate(pattern)
    assert t.valid, f"{pattern!r} wrongly judged invalid"
    assert t.java is not None or t.python is not None, \
        f"{pattern!r} has no translation at all"
    if t.java is not None:
        got = _java_find(jpattern, t.java, text)
        assert got == expected, \
            f"java path: {pattern!r} -> {t.java!r} on {text!r}: {got}"
    if t.python is not None:
        got = re.compile(t.python, PY_FLAGS).search(text) is not None
        assert got == expected, \
            f"python path: {pattern!r} -> {t.python!r} on {text!r}: {got}"


@pytest.mark.parametrize("pattern", INVALID_CASES)
def test_invalid_ecma_patterns(pattern):
    t = translate(pattern)
    assert not t.valid, f"{pattern!r} wrongly judged valid ECMA"
    assert compile_python(pattern) is None


def test_java_hot_path_coverage():
    """The overwhelmingly common pattern shapes must stay on the rlike
    fast path (java is not None) — the pandas fallback is for rarities."""
    for p in ["^[a-z]+$", "(spark|window)", "\\d{4}-\\d{2}-\\d{2}",
              "^(en|de)$", "a{", "\\cJ", "(?<y>\\d+)", "[]", "[^]",
              "^https?://", "\\w+@\\w+\\.[a-z]{2,}"]:
        t = translate(p)
        assert t.valid and t.java is not None, p


def test_lookbehind_leaves_java_path():
    t = translate("(?<=a)b")
    assert t.valid
    assert t.java is None            # Java lookbehind semantics differ
    assert t.python is not None      # fixed-width: Python handles it
    assert re.compile(t.python, PY_FLAGS).search("ab") is not None
    assert re.compile(t.python, PY_FLAGS).search("xb") is None


def test_variable_lookbehind_unsupported_is_loud():
    t = translate("(?<=a*)b")        # valid ECMA, inexpressible here
    assert t.valid and t.java is None and t.python is None
    with pytest.raises(UnsupportedPatternError):
        compile_python("(?<=a*)b")


def test_naive_divergence_is_real(jpattern):
    """Document that the naive pass-through actually diverges — these are
    the behaviors the translation exists to fix."""
    # naive Java: dangling { is a PatternSyntaxException -> job abort
    with pytest.raises(Exception):
        jpattern.compile("a{")
    # naive Java: $ also matches before a trailing newline
    assert _java_find(jpattern, "c$", "abc\n") is True      # ECMA: False
    # naive Python: \cJ does not compile
    with pytest.raises(re.error):
        re.compile("\\cJ")
    # naive Python: \d is Unicode-aware
    assert re.compile("\\d").search("٣") is not None        # ECMA: False


def test_compiler_pattern_paths(spark, sf_dir):
    """Plan shapes: a translated-Java pattern stays in pure codegen
    (shuffle-free); a lookbehind routes to the ArrowEvalPython fallback,
    which on a small single-file input picks up the local-parallelism
    repartition guard — both agreeing with the reference semantics."""
    from json_schema_rs_spark import ValidationEngine
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fast = ValidationEngine(
        {"type": "object",
         "properties": {"text": {"type": "string", "pattern": "batch{"}}},
        key_cols=("doc_id",)).validate(docs)
    plan = fast.flagged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "ArrowEvalPython" not in plan
    assert fast.violations.count() > 0   # `{` literal: fires on most docs

    slow = ValidationEngine(
        {"type": "object",
         "properties": {"text": {"type": "string",
                                 "pattern": "(?<=spark) window"}}},
        key_cols=("doc_id",)).validate(docs)
    plan2 = slow.flagged._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan2
    if docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        # python-stage plans get the parallelism guard (runner.validate)
        assert "Exchange" in plan2
    exp = sum(1 for r in docs.select("text").collect()
              if re.search("(?<=spark) window", r.text) is None)
    assert slow.violations.count() == exp


def test_empty_iteration_min2_routes_off_java():
    """ECMA counts zero-width iterations toward a quantifier's MINIMUM
    (RepeatMatcher rejects empty iterations only once min is exhausted);
    Java's loop assumes iterations are position-independent and aborts on
    a zero-width match — `(\\Aa?){2}b` misses "ab" in Java while ECMA and
    Python match it (empty first iteration, consuming second). Nullable
    groups containing a position-dependent element (anchor / boundary /
    backref / lookaround) under min >= 2 must therefore leave the Java
    path. Found by the random-pattern cross-dialect fuzz sweep."""
    from json_schema_rs_spark.functions.ecma_regex import PY_FLAGS, translate

    diverging = ["(^a?){2}b", "(^|a){2}b", "(^z?){2,3}b",
                 "^(^\\t*?|^\\.{2,}0*?[a-z0-9]){2}[0-9]*[0-9]{2}"]
    for p in diverging:
        t = translate(p)
        assert t.valid and t.java is None and t.python is not None, p
    # the Python translation follows ECMA on the witness probes
    assert re.compile(translate("(^a?){2}b").python, PY_FLAGS).search("ab")
    assert re.compile(translate("(^|a){2}b").python, PY_FLAGS).search("b")
    # non-diverging neighbors keep the Java hot path: min < 2, consuming
    # group, or no position-dependent element inside the repeated group
    for p in ["(a?){2}b", "(a|b){2}c", "(^a)+b", "(^a?)?b", "(a*){2}b",
              "(?=a)*b", "(ab){2}", "[a-z]{2,}", "^ab$", "(\\ba){2}"]:
        t = translate(p)
        assert t.valid and t.java is not None, p


def test_ecma_B_matches_in_empty_string():
    """ECMA \\B: both edges of an empty string are non-word, so \\B
    matches; CPython's native \\B never matches in an empty string
    (quirk through 3.11) — the Python translation must be the spelled
    lookaround form. Found by the random-pattern cross-dialect sweep."""
    from json_schema_rs_spark.functions.ecma_regex import PY_FLAGS, translate

    t = translate("\\B")
    assert t.java is not None and t.python is not None
    assert "\\B" not in t.python        # spelled form, not native \B
    assert re.compile(t.python, PY_FLAGS).search("") is not None
    assert re.compile(t.python, PY_FLAGS).search("%%") is not None
    assert re.compile(t.python, PY_FLAGS).search("ab") is not None
    t2 = translate("x\\By")
    assert re.compile(t2.python, PY_FLAGS).search("xy") is not None
    assert re.compile(t2.python, PY_FLAGS).search("x y") is None


def test_maybe_unset_backref_unsupported():
    """Backreference to a group that may be unset at match time: ECMA
    matches empty, Java and Python both fail the backref — neither
    dialect is sound, so both translations must come back None (compiler
    raises UnsupportedPatternError loudly). Backward references to
    definitely-matched groups keep both dialects."""
    from json_schema_rs_spark.functions.ecma_regex import translate

    for p in ["(a)?\\1", "(a)*\\1", "(a|b(c))\\2", "((a)b|c)\\2",
              "(?:(a)|b)\\1", "(?=(a))x\\1", "(a){0,2}\\1"]:
        t = translate(p)
        assert t.valid and t.java is None and t.python is None, p
    for p in ["(ab)\\1", "(a+)b\\1", "(?<g1>ab)\\k<g1>", "((a)b)\\2",
              "(a)(b)\\1\\2", "(a)+\\1", "(a){2}b\\1"]:
        t = translate(p)
        assert t.valid and t.java is not None and t.python is not None, p
