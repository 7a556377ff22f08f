"""Table-level expectations: aggregate constraints with pass/fail rows.

The reference's bounds keywords constrain one VALUE (`minimum`,
`maxLength`, …; `validator/mod.rs:299-318`); these are the same
contracts lifted to the AGGREGATE grain — "this table has at least N
rows", "role is never more than 0.1% null", "value's mean sits inside
[a, b]" — the Great-Expectations-style suite a production feed is gated
on before training consumes it. Each expectation emits one verdict row
whether it passes or fails (the north rule's pass/fail-verdict shape,
like ``violation_verdicts``), so a clean table still produces an
auditable report.

Spec shape (plain dict, mirroring the keyword style of the row specs)::

    {"min_rows": 1, "max_rows": 10**12,
     "columns": {
         "role":  {"max_null_frac": 0.001, "min_distinct": 3},
         "value": {"min_value": 0, "max_value": 1e6,
                   "min_mean": 10, "max_mean": 500},
     }}

Scale shape: ONE :func:`~.stats.profile` pass computes every observed
statistic (wide codegen'd aggregate with map-side partial combine; the
exact-distinct variant adds the documented second scan), a single tiny
row reaches the driver, and the verdict table is assembled there —
nothing else moves. Constraint math runs on the profile's values, so
the expectations inherit the profile's oracle-proven semantics.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.exprs import arrow_local_df

from .stats import is_numeric_dtype, profile

_TABLE_KEYS = {"min_rows", "max_rows"}
_COL_KEYS = {"max_null_frac", "min_distinct", "max_distinct",
             "min_value", "max_value", "min_mean", "max_mean"}
_NUMERIC_ONLY = {"min_value", "max_value", "min_mean", "max_mean"}

_SCHEMA = T.StructType([
    T.StructField("scope", T.StringType()),        # 'table' | column name
    T.StructField("rule", T.StringType()),
    T.StructField("observed", T.DoubleType()),
    T.StructField("bound", T.DoubleType()),
    T.StructField("ok", T.BooleanType()),
    T.StructField("message", T.StringType()),
])


def _fmt(x: float) -> str:
    """Deterministic number rendering for messages: integral doubles
    print as ints (the observed values are mostly counts). NaN/Infinity
    (Spark aggregates propagate them) render as repr — they must reach
    the verdict row as a failing observation, not crash the gate."""
    if not math.isfinite(x):
        return repr(x)
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    return repr(x)


def _row(scope: str, rule: str, observed: float, bound: float,
         ok: bool) -> dict:
    verdict = "within" if ok else "OUTSIDE"
    return {"scope": scope, "rule": rule,
            "observed": observed, "bound": bound, "ok": ok,
            "message": f"{scope}: {rule} observed {_fmt(observed)} "
                       f"{verdict} bound {_fmt(bound)}"}


def table_expectations(df: DataFrame, spec: dict, *,
                       exact_distinct: bool = True,
                       round_digits: int = 6) -> DataFrame:
    """Evaluate an expectation ``spec`` against ``df``; returns one row
    per expectation: ``(scope, rule, observed, bound, ok, message)``.

    Unknown keys, constraints on absent columns, and value/mean bounds
    on non-numeric columns raise ``ValueError`` at build time (the
    strict-spec stance of the row compiler). ``exact_distinct=False``
    switches distinct counts to HyperLogLog for the 100 TB path —
    document the tolerance in the bound when you do."""
    unknown = set(spec) - _TABLE_KEYS - {"columns"}
    if unknown:
        raise ValueError(f"unknown table expectation keys: {sorted(unknown)}")
    cols_spec: dict[str, dict] = spec.get("columns", {})
    dtypes = dict(df.dtypes)
    for c, cs in cols_spec.items():
        if c not in dtypes:
            raise ValueError(f"expectation on absent column {c!r}")
        bad = set(cs) - _COL_KEYS
        if bad:
            raise ValueError(f"unknown expectation keys for {c!r}: "
                             f"{sorted(bad)}")
        non_num = set(cs) & _NUMERIC_ONLY
        if non_num and not is_numeric_dtype(dtypes[c]):
            raise ValueError(
                f"{sorted(non_num)} require a numeric column; "
                f"{c!r} is {dtypes[c]}")

    # table-only specs (no column constraints) need just a row count —
    # never the all-columns profile (whose exact-distinct variant adds a
    # second full scan per column of a possibly-wide table)
    if cols_spec:
        prof = {r["column"]: r.asDict() for r in profile(
            df, list(cols_spec), exact_distinct=exact_distinct,
            quantiles=()).collect()}
        n_rows = next(iter(prof.values()))["count"]
    else:
        prof = {}
        n_rows = df.count()

    rows: list[dict] = []
    if "min_rows" in spec:
        b = float(spec["min_rows"])
        rows.append(_row("table", "min_rows", float(n_rows), b,
                         n_rows >= b))
    if "max_rows" in spec:
        b = float(spec["max_rows"])
        rows.append(_row("table", "max_rows", float(n_rows), b,
                         n_rows <= b))
    for c in sorted(cols_spec):
        cs, p = cols_spec[c], prof[c]
        if "max_null_frac" in cs:
            frac = round(p["null_count"] / n_rows, round_digits) \
                if n_rows else 0.0
            b = float(cs["max_null_frac"])
            rows.append(_row(c, "max_null_frac", frac, b, frac <= b))
        if "min_distinct" in cs:
            b = float(cs["min_distinct"])
            d = float(p["distinct_count"])
            rows.append(_row(c, "min_distinct", d, b, d >= b))
        if "max_distinct" in cs:
            b = float(cs["max_distinct"])
            d = float(p["distinct_count"])
            rows.append(_row(c, "max_distinct", d, b, d <= b))
        # profile stores min/max as strings (one schema for all column
        # types); numeric-only constraints parse them back — NULL when
        # the column is all-NULL (vacuously ok, like row checks on
        # absent values)
        if "min_value" in cs and p["min"] is not None:
            o, b = float(p["min"]), float(cs["min_value"])
            rows.append(_row(c, "min_value", o, b, o >= b))
        if "max_value" in cs and p["max"] is not None:
            o, b = float(p["max"]), float(cs["max_value"])
            rows.append(_row(c, "max_value", o, b, o <= b))
        if "min_mean" in cs and p["mean"] is not None:
            o = round(p["mean"], round_digits)
            b = float(cs["min_mean"])
            rows.append(_row(c, "min_mean", o, b, o >= b))
        if "max_mean" in cs and p["mean"] is not None:
            o = round(p["mean"], round_digits)
            b = float(cs["max_mean"])
            rows.append(_row(c, "max_mean", o, b, o <= b))
    return arrow_local_df(df.sparkSession, rows, _SCHEMA)


def expectations_pass(report: DataFrame) -> bool:
    """True iff every expectation row is ok (one tiny aggregate)."""
    from pyspark.sql import functions as F
    row = report.agg(F.min("ok").alias("all_ok")).collect()[0]
    return bool(row["all_ok"] if row["all_ok"] is not None else True)
