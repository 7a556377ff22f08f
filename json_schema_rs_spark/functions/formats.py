"""Assertive ``format`` extension rules (E15) shared by both engines.

The reference validates only ``format:"uuid"`` (validator/mod.rs:280-289);
draft 2020-12 makes ``format`` annotation-only by default. With
``extensions=True`` this engine asserts a selected set of formats — the
ones the ``jsonschema`` package's ``FormatChecker`` can differentially
verify in this environment — and leaves every other format value an
inert annotation (reference behavior), documented rather than silently
widened.

Cross-engine contract: ONE regex string per format, written in the
dialect intersection of Java (``rlike``) and Python ``re`` — explicit
``[0-9]`` (never ``\\d``, which is Unicode-wide in Python but ASCII in
Java), ``\\A``/``\\z`` anchors (``$`` matches before a final newline in
both dialects), no inline flags, no lookaround. ``date``/``date-time``
add a calendar-validity check computed with the SAME integer arithmetic
on both sides (substring -> int, days-in-month with the Gregorian leap
rule) instead of either engine's date parser (Java's SMART resolver and
Python's ``fromisoformat`` both accept shapes the other rejects).

Verdict parity with ``jsonschema.FormatChecker`` is pinned by
``tests/test_formats.py`` over enumerated edges and random fuzz:

- ``date``: strict ``YYYY-MM-DD``, real calendar date, year >= 1
  (``datetime.date`` has no year 0) — basic/week/ordinal ISO forms that
  ``date.fromisoformat`` would take are NOT valid RFC 3339 full-dates
  and jsonschema rejects them too.
- ``date-time``: RFC 3339 shape with mandatory seconds and offset,
  case-insensitive T/Z, any-length ``.fraction`` (no comma), offset
  hours 00-23 — and NO leap second: jsonschema validates via
  ``datetime.fromisoformat``, which rejects ``:60`` (stricter than RFC
  3339; we match jsonschema).
- ``ipv4``: strict dotted quad, 0-255, no leading zeros (the
  ``ipaddress`` module's post-CVE-2021-29921 rule).
- ``ipv6``: RFC 4291 textual forms incl. ``::`` compression and
  embedded IPv4; no zone id (``%eth0`` — ``ipaddress.IPv6Address``
  rejects it too).
- ``email``: presence of ``@`` — exactly jsonschema's checker.
- ``json-pointer``: RFC 6901 (``~`` only as ``~0``/``~1``).

- ``relative-json-pointer``: draft ABNF — a non-negative integer with
  no leading zero, then ``#`` or a JSON pointer. ASCII digits ONLY
  (the ABNF is ``%x30-39``); jsonschema's checker uses ``str.isdigit``
  and so also accepts Unicode digit strings like ``"١٢"`` — we follow
  the spec, and the differential test pins agreement on ASCII inputs
  with the Unicode divergence documented.
- ``regex``: draft 2020-12 says the value "SHOULD be a valid regular
  expression according to the ECMA-262 dialect" — asserted with this
  engine's own from-scratch ECMA(+Annex B) auditor
  (:mod:`.ecma_regex`), the SAME contract the ``pattern`` keyword
  compiles under, so a spec cannot contain a pattern the format check
  would bless and the compiler reject. jsonschema's checker merely
  ``re.compile``s (Python dialect: accepts ``(?i)``/``(?P<n>…)``,
  rejects some Annex B forms) — agreement holds on the common subset
  and every divergence is dialect-classified in the tests. Spark side
  is an Arrow-batched pandas UDF (per-VALUE regex audit is not
  expressible as a JVM expression); format:"regex" columns are
  metadata-sized in practice.

``time`` is deliberately NOT asserted: jsonschema's checker diverges
from RFC 3339 (rejects ``23:59:59Z``, accepts offset-less ``10:00:00``),
so there is no stable contract to match. ``hostname``/``uri``/
``duration`` need format plugins absent from this environment — they
stay annotations.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pyspark imported lazily — spec.py/pyvalidator.py
    from pyspark.sql import Column  # stay importable without Spark

_H16 = "[0-9A-Fa-f]{1,4}"
_V4OCT = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_V4 = rf"({_V4OCT}\.){{3}}{_V4OCT}"
# RFC 3986 IPv6address ABNF, ls32 = h16:h16 | IPv4address
_LS32 = rf"({_H16}:{_H16}|{_V4})"
_V6 = (
    rf"(({_H16}:){{6}}{_LS32}"
    rf"|::({_H16}:){{5}}{_LS32}"
    rf"|({_H16})?::({_H16}:){{4}}{_LS32}"
    rf"|(({_H16}:)?{_H16})?::({_H16}:){{3}}{_LS32}"
    rf"|(({_H16}:){{0,2}}{_H16})?::({_H16}:){{2}}{_LS32}"
    rf"|(({_H16}:){{0,3}}{_H16})?::{_H16}:{_LS32}"
    rf"|(({_H16}:){{0,4}}{_H16})?::{_LS32}"
    rf"|(({_H16}:){{0,5}}{_H16})?::{_H16}"
    rf"|(({_H16}:){{0,6}}{_H16})?::)"
)
_TIME = (
    r"([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](\.[0-9]+)?"
    r"([Zz]|[+-]([01][0-9]|2[0-3]):[0-5][0-9])"
)

# the ONE pattern per format, used verbatim by Java rlike and Python re
REGEX = {
    "date": r"\A[0-9]{4}-[0-9]{2}-[0-9]{2}\z",
    "date-time": rf"\A[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}[Tt]{_TIME}\z",
    "ipv4": rf"\A{_V4}\z",
    "ipv6": rf"\A{_V6}\z",
    # no ambiguity between the nested stars: the outer iteration must
    # consume a "/", the inner class can't — linear, no backtracking trap
    "json-pointer": r"\A(/([^/~]|~[01])*)*\z",
    # non-negative integer (no leading zero, ASCII digits per the ABNF),
    # then terminal "#" or a (possibly empty) json-pointer
    "relative-json-pointer":
        r"\A(0|[1-9][0-9]*)(#|(/([^/~]|~[01])*)*)\z",
}

# formats asserted under extensions=True ("uuid" stays a core keyword)
EXT_FORMATS = frozenset(REGEX) | {"email", "regex"}

# Python's strict end-of-string anchor is \Z (it has no \z before 3.14);
# Java's \z is the same semantics (\Z in Java allows a final newline —
# never use it). One stored pattern, one mechanical translation.
_PY_RX = {k: re.compile(v.replace(r"\z", r"\Z")) for k, v in REGEX.items()}


def _days_in_month(y: int, m: int) -> int:
    if m == 2:
        leap = (y % 4 == 0 and y % 100 != 0) or y % 400 == 0
        return 29 if leap else 28
    return 30 if m in (4, 6, 9, 11) else 31


def _py_date_ok(s: str) -> bool:
    """Calendar validity of a shape-checked YYYY-MM-DD prefix."""
    y, m, d = int(s[0:4]), int(s[5:7]), int(s[8:10])
    return y >= 1 and 1 <= m <= 12 and 1 <= d <= _days_in_month(y, m)


def python_valid(fmt: str, s: str) -> bool:
    """Python-side validity — the pyvalidator (JSON mode) twin."""
    if fmt == "email":
        return "@" in s
    if fmt == "regex":
        from .ecma_regex import translate
        return translate(s).valid
    if _PY_RX[fmt].match(s) is None:
        return False
    if fmt in ("date", "date-time"):
        return _py_date_ok(s)
    return True


def _spark_date_ok(s: "Column") -> "Column":
    """Same integer arithmetic as :func:`_py_date_ok`; only evaluated
    where the shape regex already matched, so the casts never fail."""
    from pyspark.sql import functions as F
    y = F.substring(s, 1, 4).cast("int")
    m = F.substring(s, 6, 2).cast("int")
    d = F.substring(s, 9, 2).cast("int")
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    dim = (F.when(m == 2, F.when(leap, 29).otherwise(28))
           .when(m.isin(4, 6, 9, 11), F.lit(30)).otherwise(F.lit(31)))
    return (y >= 1) & (m >= 1) & (m <= 12) & (d >= 1) & (d <= dim)


def spark_valid(fmt: str, s: "Column") -> "Column":
    """Vectorized validity Column — JVM-side, whole-stage-codegen-able;
    NULL input yields NULL (callers gate on presence, like every other
    string check)."""
    from pyspark.sql import functions as F
    if fmt == "email":
        return F.instr(s, "@") > 0
    if fmt == "regex":
        # per-VALUE ECMA audit — inexpressible as a JVM expression;
        # Arrow-batched, same dialect contract as the pattern keyword
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        def _ecma_ok_fn(col):
            from .ecma_regex import translate
            return col.map(
                lambda x: None if x is None else translate(x).valid)

        # annotations set as OBJECTS: this module's postponed-annotations
        # mode would stringify inline hints, which pyspark's pandas_udf
        # signature inference cannot resolve
        _ecma_ok_fn.__annotations__ = {"col": pd.Series, "return": pd.Series}
        return pandas_udf(_ecma_ok_fn, "boolean")(s)
    shaped = s.rlike(REGEX[fmt])
    if fmt in ("date", "date-time"):
        return F.when(shaped, _spark_date_ok(s)).otherwise(F.lit(False))
    return shaped
