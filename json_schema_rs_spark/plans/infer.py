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
