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


# C0 control characters serde escapes as \u00XX (everything below 0x20
# except the five shorthand escapes \b \t \n \f \r)
_U_ESCAPED = [c for c in range(0x20) if c not in (0x08, 0x09, 0x0A, 0x0C, 0x0D)]


def json_quote(col: Column) -> Column:
    """serde_json string serialization of a string column: double-quoted;
    ``\\`` ``"`` and the C0 range escaped exactly like serde
    (``\\b \\t \\n \\f \\r`` shorthands, ``\\u00XX`` lowercase for the
    rest). The 27 rare ``\\u00XX`` replacements are gated behind a single
    contains-test so clean strings pay one regexp scan, not 27."""
    escaped = F.regexp_replace(col, r"\\", r"\\\\")
    escaped = F.regexp_replace(escaped, '"', '\\\\"')
    escaped = F.regexp_replace(escaped, "\x08", "\\\\b")
    escaped = F.regexp_replace(escaped, "\t", "\\\\t")
    escaped = F.regexp_replace(escaped, "\n", "\\\\n")
    escaped = F.regexp_replace(escaped, "\x0c", "\\\\f")
    escaped = F.regexp_replace(escaped, "\r", "\\\\r")
    rare = escaped
    for o in _U_ESCAPED:
        rare = F.regexp_replace(rare, f"\\x{o:02x}", f"\\\\u{o:04x}")
    probe = "[" + "".join(f"\\x{o:02x}" for o in _U_ESCAPED) + "]"
    escaped = F.when(escaped.rlike(probe), rare).otherwise(escaped)
    return F.concat(F.lit('"'), escaped, F.lit('"'))


def arrow_local_df(spark, rows, schema):
    """Small driver-local DataFrame via a pyarrow Table (LocalTableScan).

    ``spark.createDataFrame(<python list>)`` routes through
    ``applySchemaToPythonRDD``: the data becomes a pickled Python RDD
    whose scan is a real distributed stage that launches Python workers
    on the executors — measured ~4 s on first use (worker pool spin-up)
    and a Python stage in EVERY downstream job thereafter. A pyarrow
    Table converts driver-side into a ``LocalTableScan``: no Python
    stage ever, and broadcasting it (vocabularies, centroids) ships
    plain rows instead of scheduling Python on the cluster. Falls back
    to the classic path for anything Arrow can't represent.

    ``rows``: list of tuples (matched positionally to ``schema``) or
    dicts. ``schema``: DDL string or StructType.
    """
    from pyspark.sql import types as T
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema
        names = schema.fieldNames()
        dicts = [r if isinstance(r, dict) else dict(zip(names, r))
                 for r in rows]
        return spark.createDataFrame(
            pa.Table.from_pylist(dicts, schema=to_arrow_schema(schema)))
    except Exception:
        return spark.createDataFrame(list(rows), schema)


def bind_once(col: Column, f) -> Column:
    """Evaluate ``f`` with ``col`` bound ONCE as a lambda variable
    (``get(transform(array(col), f), 0)``). Chained ``F.when`` Columns
    re-inline their whole upstream subtree at every reference, so a
    multi-stage string computation otherwise grows combinatorially —
    a bounds-check message measured ~30k expression nodes, blowing past
    JIT limits and slowing the render path ~8x. A lambda variable is a
    leaf reference, so each bound stage contributes its own nodes once.

    Negative result (measured, keep the HOF): higher-order functions are
    CodegenFallback, so any plan node whose expression embeds a
    ``bind_once`` evaluates that node interpreted (e.g. the violation
    Generate loses whole-stage codegen). Inlining ``f(col)`` instead
    recovers codegen but duplicates every bound subtree for real —
    measured SLOWER (v_ext_numeric sf0.1: 1.69 s HOF vs 3.13 s inlined
    codegen), because interpreted CASE WHEN short-circuits while the
    codegen'd Generate pays the duplicated subtrees on every row."""
    return F.get(F.transform(F.array(col), f), 0)


def _sci_parts(v: Column) -> Column:
    """Stage 1 of expand_sci: ``d.dddE±n`` -> struct(neg, digits, flen,
    exp). ``v`` is a lambda variable (leaf)."""
    neg = v.startswith("-")
    a = F.when(neg, F.substring(v, 2, 2147483647)).otherwise(v)
    mant = F.substring_index(a, "E", 1)
    exp = F.substring_index(a, "E", -1).cast("int")
    intp = F.substring_index(mant, ".", 1)
    frac0 = F.substring_index(mant, ".", -1)
    frac = F.when(frac0 == "0", F.lit("")).otherwise(frac0)
    return F.struct(
        neg.alias("neg"),
        F.concat(intp, frac).alias("digits"),
        F.length(frac).alias("flen"),
        exp.alias("exp"),
    )


def _sci_render(t: Column) -> Column:
    """Stage 2 of expand_sci: struct -> plain-decimal string."""
    digits, flen, exp = t.getField("digits"), t.getField("flen"), t.getField("exp")
    body = (
        # 1.5E8 -> 150000000 (point moves past all fraction digits)
        F.when(exp >= flen, F.concat(digits, F.repeat(F.lit("0"), exp - flen)))
        # 1.2345E2 -> 123.45 (point lands inside the digits)
        .when(exp >= 0, F.concat(
            F.substring(digits, 1, F.lit(1) + exp),
            F.lit("."),
            F.substring(digits, F.lit(2) + exp, F.lit(2147483647))))
        # 1.5E-4 -> 0.00015
        .otherwise(F.concat(F.lit("0."), F.repeat(F.lit("0"), -exp - 1), digits))
    )
    return F.when(t.getField("neg"), F.concat(F.lit("-"), body)).otherwise(body)


def expand_sci(s: Column) -> Column:
    """Expand Java's ``d.dddE±n`` double rendering into plain decimal
    (Rust ``Display`` never uses scientific notation). Plain inputs pass
    through unchanged. Built as two ``bind_once`` stages over a NULL-gated
    copy of the input: the expression tree stays linear (~150 nodes, vs
    combinatorial growth when chained whens re-inline their inputs), and
    non-scientific rows short-circuit the hoisted ops via null
    propagation."""
    out = bind_once(bind_once(F.when(s.contains("E"), s), _sci_parts),
                    _sci_render)
    return F.when(s.contains("E"), out).otherwise(s)


def fmt_f64_col(col: Column) -> Column:
    """Rust ``Display``-for-f64 of a numeric column: integral values print
    without ``.0`` (``31`` not ``31.0``); everything else as plain decimal
    with NO scientific notation (Java's scientific rendering for |x| out
    of [1e-3, 1e7) is expanded textually). Residual caveat: for a tiny
    fraction of doubles JDK 17 emits more significand digits than the
    true shortest form (pre-Ryu algorithm, fixed in JDK 19) — digits, not
    value, differ there. tests/test_f64_display_golden.py pins the exact
    divergent set and proves byte-parity for |x| in [1e-7, 2^53); checks
    whose bounds live outside that envelope should use the pandas path
    (byte-exact via formatting.fmt_f64)."""
    d = col.cast("double")
    return (
        F.when(d.isNull(), F.lit(None).cast("string"))
        .when((d == F.floor(d)) & (F.abs(d) < F.lit(1e15)),
              d.cast("long").cast("string"))
        .otherwise(expand_sci(d.cast("string")))
    )


def serde_json_number(col: Column, *, is_float: bool) -> Column:
    """serde_json serialization of a numeric column value: integers as-is;
    floats always carry a decimal point in the plain range (``1.0`` stays
    ``1.0``) and switch to ``1e21``-style scientific form at the same
    magnitudes as the Python twin (:func:`..formatting._serde_float`,
    repr thresholds: |x| >= 1e16 or 0 < |x| < 1e-4)."""
    if not is_float:
        return col.cast("long").cast("string")
    d = col.cast("double")
    ad = F.abs(d)
    sci_range = (ad >= F.lit(1e16)) | ((ad > F.lit(0.0)) & (ad < F.lit(1e-4)))
    java = d.cast("string")
    # Java "1.234E17"/"1.0E-7" -> ryu/repr-style "1.234e17"/"1e-7"
    mant = F.substring_index(java, "E", 1)
    mant = F.when(mant.endswith(".0"),
                  F.substring(mant, 1, F.length(mant) - 2)).otherwise(mant)
    sci = F.concat(mant, F.lit("e"), F.substring_index(java, "E", -1))
    plain = bind_once(
        expand_sci(java),
        lambda p: F.when(p.contains("."), p)
                   .otherwise(F.concat(p, F.lit(".0"))))
    return (
        F.when(d.isNull(), F.lit(None).cast("string"))
        .when((d == F.floor(d)) & (ad < F.lit(1e15)),
              F.concat(d.cast("long").cast("string"), F.lit(".0")))
        .when(sci_range, sci)
        .otherwise(plain)
    )


def explode_rows(df, keep, arr: Column, alias: str):
    """``explode`` that does NOT re-evaluate the array expression.

    Catalyst's ``InferFiltersFromGenerate`` inserts
    ``Filter(size(e) > 0 AND isnotnull(e))`` beneath every inner explode;
    predicate pushdown then substitutes any column alias so the FULL
    array-building expression ``e`` is duplicated into that Filter —
    which is also evaluated interpreted, outside whole-stage codegen.
    Measured 20x slowdown on the shingle-hash explode (0.15s -> 3.3s).
    ``explode_outer`` is exempt from the rule; the one extra row it emits
    per empty/null array is dropped by an attribute-level null filter.

    CAVEAT — only valid for arrays with no NULL **elements**: the null
    filter cannot distinguish the outer-explode sentinel row from a
    genuine NULL element, so NULL elements are dropped where inner
    explode would keep them as rows. All call sites here (shingle
    hashes, band structs, violation arrays, token splits) build their
    arrays from non-null expressions; do not reuse this helper on arrays
    that may contain NULL elements.

    ``keep``: columns (names or Columns) carried alongside the exploded
    ``alias`` column.

    The array is projected into a named column FIRST and the Generate
    explodes that attribute. Catalyst keeps the Project as the Generate's
    child (it never inlines a child Project into the generator), so the
    array expression evaluates once inside a whole-stage-codegen'd
    Project and the Generate itself codegens — with the expression
    inline, GenerateExec drops out of codegen entirely and evaluates the
    whole tree interpreted per row (measured 3.2x on the violation
    explode: v_ext_numeric sf0.1 1.84 s -> 0.57 s).
    """
    tmp = f"__xr_{alias}"
    projected = df.select(*keep, arr.alias(tmp))
    keep_names = projected.columns[:-1]
    return (projected
            .select(*keep_names, F.explode_outer(F.col(tmp)).alias(alias))
            .filter(F.col(alias).isNotNull()))


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
