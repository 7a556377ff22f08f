"""Reverse path: infer a constraint spec from a DataFrame schema.

The analog of the reference's ``ToJsonSchema`` derive
(`/root/reference/json_schema_rs/src/reverse_code_gen/mod.rs:14-17,
37-80`), which maps Rust types to schema nodes with exact range bounds
(e.g. ``i8 -> {"type": "integer", "minimum": -128, "maximum": 127}``).
Here the source of truth is a Spark ``StructType``: integral types get
their value-range bounds, non-nullable fields become ``required``, nested
structs/arrays recurse. The emitted dict round-trips through
:func:`..plans.spec.parse_spec` and is a valid starting point for a
constraint spec a human then tightens (enums, patterns, lengths).
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# reverse_code_gen/mod.rs:37-80 — numeric types carry their exact bounds
_INT_BOUNDS = {
    T.ByteType: (-128, 127),
    T.ShortType: (-32768, 32767),
    T.IntegerType: (-2147483648, 2147483647),
    T.LongType: (-9223372036854775808, 9223372036854775807),
}


def _node_for(dtype: T.DataType) -> dict:
    for t, (lo, hi) in _INT_BOUNDS.items():
        if isinstance(dtype, t):
            return {"type": "integer", "minimum": lo, "maximum": hi}
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return {"type": "number"}
    if isinstance(dtype, T.StringType):
        return {"type": "string"}
    if isinstance(dtype, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(dtype, (T.TimestampType, T.DateType)):
        # engine convention: timestamps validate as their string form
        return {"type": "string"}
    if isinstance(dtype, T.ArrayType):
        return {"type": "array", "items": _node_for(dtype.elementType)}
    if isinstance(dtype, T.StructType):
        return _object_for(dtype)
    return {}  # map/binary/...: no constraint (annotation-only node)


def _object_for(schema: T.StructType) -> dict:
    node: dict = {"type": "object", "properties": {}}
    required = [f.name for f in schema.fields if not f.nullable]
    for f in schema.fields:
        node["properties"][f.name] = _node_for(f.dataType)
    if required:
        node["required"] = required
    return node


def infer_spec(source: Union[DataFrame, T.StructType]) -> dict:
    """Schema -> spec dict (the table row as the root object)."""
    schema = source.schema if isinstance(source, DataFrame) else source
    return _object_for(schema)


def spec_from_profile(
    df: DataFrame,
    columns: "Union[list, tuple, None]" = None,
    *,
    enum_max_distinct: int = 16,
    required_max_null_rate: float = 0.0,
) -> dict:
    """MEASURED stats -> constraint spec: the "per-column stats feed
    constraint predicates" path (BASELINE.json north_star). Where
    :func:`infer_spec` derives constraints from declared TYPES, this
    profiles a reference snapshot and tightens to its observed DATA:

    - numeric columns get ``minimum``/``maximum`` = the observed range
      (``float`` columns parse the bound back through float32 so the
      spec bound equals the engine's float->double widening of the
      column value — a double-parsed "0.1" would sit BELOW the widened
      0.10000000149... and false-fire on the very row that defined the
      max); a NaN endpoint is omitted (NaN sorts greatest in Spark, so
      one NaN row would otherwise disable AboveMaximum forever and emit
      a non-JSON bound);
    - string columns with 1..``enum_max_distinct`` distinct values
      become an ``enum`` of the observed values (sorted — deterministic
      message bytes), otherwise plain ``{"type": "string"}``; an
      all-NULL column stays un-enumed (an empty enum would be skipped
      by the compiler and silently disable the vocabulary check);
    - boolean columns get ``{"type": "boolean"}``;
    - columns whose null rate <= ``required_max_null_rate`` go in
      ``required``;
    - other dtypes (timestamp, array, map, ...) are skipped — profile
      stats don't translate to row predicates for them.

    By construction, validating the PROFILED snapshot with the returned
    spec yields zero violations (every bound/enum/required fact was
    measured on it); validating the NEXT snapshot turns any drift past
    the observed envelope into typed violation rows — compile with
    ``ValidationEngine(spec_from_profile(baseline)).validate(current)``.

    Cost: one :func:`..operators.stats.profile` aggregate pass (O(1)
    rows to the driver) plus ONE more aggregate job covering every enum
    candidate at once (size-capped sorted ``collect_set`` per
    candidate; the HLL gate bounds each set's cardinality and the
    server-side ``slice`` bounds what moves to the driver) — the job
    count is independent of how many columns qualify.
    """
    import math

    from ..operators.stats import is_numeric_dtype, profile

    dtypes = dict(df.dtypes)
    columns = list(columns if columns is not None else df.columns)
    unknown = [c for c in columns if c not in dtypes]
    if unknown:
        raise ValueError(f"columns not in DataFrame: {unknown}")
    prof = {r["column"]: r for r in
            profile(df, columns, quantiles=()).collect()}

    # approx gate with slack (HLL estimate is +-~2.5%, so candidates
    # within 1.5x + 8 get the exact check), then one agg job resolves
    # ALL candidates exactly: sort_array(collect_set) is UTF8-byte
    # ordered == Python str ordering for the message-byte determinism,
    # slice caps driver transfer at k+1 values per column
    enum_cand = [c for c in columns if dtypes[c] == "string"
                 and (prof[c]["distinct_count"] or 0)
                 <= enum_max_distinct * 1.5 + 8]
    enum_vals: dict = {}
    if enum_cand:
        from pyspark.sql import functions as F
        row = df.agg(*[
            F.slice(F.sort_array(F.collect_set(F.col(c))),
                    1, enum_max_distinct + 1).alias(c)
            for c in enum_cand
        ]).collect()[0]
        for c in enum_cand:
            vals = row[c]
            if vals and len(vals) <= enum_max_distinct:
                enum_vals[c] = list(vals)

    props: dict = {}
    required: list = []
    for c in columns:
        p, dt = prof[c], dtypes[c]
        node: dict = {}
        if is_numeric_dtype(dt):
            is_int = dt in ("tinyint", "smallint", "int", "bigint")
            node["type"] = "integer" if is_int else "number"
            if p["min"] is not None:
                if is_int:
                    mn, mx = int(p["min"]), int(p["max"])
                elif dt == "float":
                    # parse through float32: the engine compares the
                    # column widened to double, and float32("0.1")
                    # widens to 0.10000000149..., not double("0.1")
                    import numpy as np
                    mn = float(np.float32(p["min"]))
                    mx = float(np.float32(p["max"]))
                else:
                    mn, mx = float(p["min"]), float(p["max"])
                if is_int or not math.isnan(mn):
                    node["minimum"] = mn
                if is_int or not math.isnan(mx):
                    node["maximum"] = mx
        elif dt == "string":
            node["type"] = "string"
            if c in enum_vals:
                node["enum"] = enum_vals[c]
        elif dt == "boolean":
            node["type"] = "boolean"
        else:
            continue  # no row-predicate translation for this dtype
        props[c] = node
        nr = p["null_rate"]
        if nr is not None and nr <= required_max_null_rate:
            required.append(c)

    spec: dict = {"type": "object", "properties": props}
    if required:
        spec["required"] = required
    return spec
