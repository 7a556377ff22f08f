"""Vectorized expression helpers shared by the compiler.

All helpers return JVM-side ``Column`` expressions (whole-stage-codegen
friendly, no Python in the row path). They reproduce, expression-side, the
same formatting the driver-side :mod:`.formatting` module produces in
Python, so messages built from *column values* byte-match messages built
from *literals*.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# uuid::Uuid::parse_str grammar (validator/mod.rs:279-289): hyphenated,
# simple (32 hex), urn:uuid:, and braced forms. \A/\z (not ^/$): Java's $
# also matches before a trailing newline, which Uuid::parse_str rejects.
_HY = "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"
UUID_REGEX = f"\\A(?:{_HY}|[0-9a-fA-F]{{32}}|urn:uuid:{_HY}|\\{{{_HY}\\}})\\z"


def json_quote(col: Column) -> Column:
    """serde_json string serialization of a string column: double-quoted
    with ``\\``, ``"``, newline, CR, tab escaped (the escapes that occur in
    realistic transcript text; other control characters would need
    ``\\u00XX`` and are handled by the pandas-UDF JSON mode)."""
    escaped = F.regexp_replace(col, r"\\", r"\\\\")
    escaped = F.regexp_replace(escaped, '"', '\\\\"')
    escaped = F.regexp_replace(escaped, "\n", "\\\\n")
    escaped = F.regexp_replace(escaped, "\r", "\\\\r")
    escaped = F.regexp_replace(escaped, "\t", "\\\\t")
    return F.concat(F.lit('"'), escaped, F.lit('"'))


def fmt_f64_col(col: Column) -> Column:
    """Rust ``Display``-for-f64 of a numeric column: integral values print
    without ``.0`` (``31`` not ``31.0``), fractional values as Spark's
    double-to-string (matches ryu/Rust in the range where Java's
    ``Double.toString`` is non-scientific, |x| in [1e-3, 1e7))."""
    d = col.cast("double")
    return (
        F.when(d.isNull(), F.lit(None).cast("string"))
        .when((d == F.floor(d)) & (F.abs(d) < F.lit(1e15)),
              d.cast("long").cast("string"))
        .otherwise(d.cast("string"))
    )


def serde_json_number(col: Column, *, is_float: bool) -> Column:
    """serde_json serialization of a numeric column value: integers as-is,
    floats always with a decimal point (``1.0`` stays ``1.0``)."""
    if not is_float:
        return col.cast("long").cast("string")
    d = col.cast("double")
    return (
        F.when((d == F.floor(d)) & (F.abs(d) < F.lit(1e15)),
               F.concat(d.cast("long").cast("string"), F.lit(".0")))
        .otherwise(d.cast("string"))
    )


def serde_json_bool(col: Column) -> Column:
    return F.when(col, F.lit("true")).otherwise(F.lit("false"))


def bool_and(cols: list[Column]) -> Column:
    out = None
    for c in cols:
        out = c if out is None else (out & c)
    return F.lit(True) if out is None else out


def bool_or(cols: list[Column]) -> Column:
    out = None
    for c in cols:
        out = c if out is None else (out | c)
    return F.lit(False) if out is None else out
