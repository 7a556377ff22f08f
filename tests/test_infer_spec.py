"""Reverse path (schema -> spec), mirroring the reference's ToJsonSchema
bounds mapping (reverse_code_gen/mod.rs:37-80)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

from json_schema_rs_spark.plans.infer import infer_spec  # noqa: E402
from json_schema_rs_spark.plans.spec import parse_spec  # noqa: E402


def test_integral_bounds_match_reference_mapping():
    schema = T.StructType([
        T.StructField("b", T.ByteType(), True),
        T.StructField("s", T.ShortType(), True),
        T.StructField("i", T.IntegerType(), False),
        T.StructField("l", T.LongType(), True),
    ])
    spec = infer_spec(schema)
    p = spec["properties"]
    assert p["b"] == {"type": "integer", "minimum": -128, "maximum": 127}
    assert p["s"] == {"type": "integer", "minimum": -32768, "maximum": 32767}
    assert p["i"]["maximum"] == 2147483647
    assert p["l"]["minimum"] == -9223372036854775808
    assert spec["required"] == ["i"]


def test_nested_and_roundtrip():
    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("meta", T.StructType([
            T.StructField("tool", T.StringType(), True),
            T.StructField("latency_ms", T.LongType(), False),
        ]), True),
    ])
    spec = infer_spec(schema)
    assert spec["properties"]["tags"] == {
        "type": "array", "items": {"type": "string"}}
    assert spec["properties"]["meta"]["required"] == ["latency_ms"]
    assert spec["properties"]["ts"] == {"type": "string"}
    # round-trips through the spec parser (both modes)
    parse_spec(spec)
    parse_spec(spec, strict=True)


def test_inferred_spec_validates_conforming_frame(spark):
    df = spark.createDataFrame(
        [("c0", 0), ("c1", 1)], "conv_id string, turn_idx int")
    from json_schema_rs_spark import ValidationEngine
    report = ValidationEngine(infer_spec(df)).validate(df)
    assert report.summary()["violation_count"] == 0
