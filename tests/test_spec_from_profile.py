"""spec_from_profile: measured stats -> constraint predicates.

Core contract: validating the profiled snapshot with its own generated
spec yields ZERO violations; drift past the observed envelope on a later
snapshot yields typed violations."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from json_schema_rs_spark import ValidationEngine
from json_schema_rs_spark.plans.infer import spec_from_profile


@pytest.fixture(scope="module")
def baseline(spark):
    return spark.createDataFrame(
        [Row(id=i, kind=["a", "b", "c"][i % 3], score=float(i) / 2,
             note=f"note-{i}" if i % 4 else None)
         for i in range(30)],
        "id long, kind string, score double, note string")


class TestSpecFromProfile:
    def test_shape(self, baseline):
        spec = spec_from_profile(baseline)
        assert spec["properties"]["id"] == {
            "type": "integer", "minimum": 0, "maximum": 29}
        assert spec["properties"]["score"] == {
            "type": "number", "minimum": 0.0, "maximum": 14.5}
        assert spec["properties"]["kind"] == {
            "type": "string", "enum": ["a", "b", "c"]}
        # note has nulls -> not required, and 23 distinct values < 16? no:
        # 22 distinct > 16 -> plain string, no enum
        assert spec["properties"]["note"] == {"type": "string"}
        assert sorted(spec["required"]) == ["id", "kind", "score"]

    def test_self_consistency_zero_violations(self, baseline):
        spec = spec_from_profile(baseline)
        report = ValidationEngine(spec, key_cols=("id",)).validate(baseline)
        assert report.violations.count() == 0

    def test_drift_produces_typed_violations(self, spark, baseline):
        spec = spec_from_profile(baseline)
        drifted = spark.createDataFrame(
            [Row(id=100, kind="d", score=99.0, note="x"),   # enum + max
             Row(id=-1, kind="a", score=-0.5, note=None),   # min + min
             Row(id=5, kind=None, score=3.0, note=None)],   # required
            "id long, kind string, score double, note string")
        v = ValidationEngine(spec, key_cols=("id",)).validate(drifted)
        codes = {(r["id"], r["code"]) for r in v.violations.collect()}
        assert (100, "NotInEnum") in codes
        assert (100, "AboveMaximum") in codes
        assert (-1, "BelowMinimum") in codes
        assert (5, "MissingRequired") in codes

    def test_enum_gate_and_column_subset(self, spark):
        df = spark.createDataFrame(
            [Row(k=f"v{i}", n=i) for i in range(40)], "k string, n int")
        spec = spec_from_profile(df, ["k"], enum_max_distinct=8)
        assert spec["properties"]["k"] == {"type": "string"}
        assert "n" not in spec["properties"]
        with pytest.raises(ValueError, match="columns"):
            spec_from_profile(df, ["missing"])

    def test_unsupported_dtypes_skipped(self, spark):
        df = spark.createDataFrame(
            [Row(id=1, ts=None, tags=["x"])],
            "id long, ts timestamp, tags array<string>")
        spec = spec_from_profile(df)
        assert set(spec["properties"]) == {"id"}

    def test_float32_bounds_match_widened_values(self, spark):
        # float32 0.1f/0.7f widen to 0.10000000149.../0.699999988...;
        # a double-parsed "0.1" bound would false-fire AboveMaximum on
        # the very row that defined the max (review finding)
        df = spark.createDataFrame(
            [Row(id=1, x=0.7), Row(id=2, x=0.1)], "id long, x float")
        spec = spec_from_profile(df)
        import numpy as np
        assert spec["properties"]["x"]["maximum"] == float(np.float32("0.7"))
        assert spec["properties"]["x"]["minimum"] == float(np.float32("0.1"))
        report = ValidationEngine(spec, key_cols=("id",)).validate(df)
        assert report.violations.count() == 0

    def test_nan_endpoint_omitted(self, spark):
        # NaN sorts greatest in Spark: max would be NaN, disabling
        # AboveMaximum forever and emitting a non-JSON bound
        import json
        df = spark.createDataFrame(
            [Row(id=1, x=1.0), Row(id=2, x=float("nan")),
             Row(id=3, x=5.0)], "id long, x double")
        spec = spec_from_profile(df)
        node = spec["properties"]["x"]
        assert "maximum" not in node
        assert node["minimum"] == 1.0
        json.dumps(spec)  # NaN bound would make this invalid JSON

    def test_all_null_string_gets_no_empty_enum(self, spark):
        # enum: [] would be silently skipped by the compiler, disabling
        # the vocabulary check while looking like a constraint
        df = spark.createDataFrame(
            [Row(id=1, k=None), Row(id=2, k=None)], "id long, k string")
        spec = spec_from_profile(df)
        assert spec["properties"]["k"] == {"type": "string"}

    def test_explicit_empty_column_list(self, spark):
        # [] must mean "no columns", not fall through to df.columns
        df = spark.createDataFrame([Row(id=1)], "id long")
        spec = spec_from_profile(df, [])
        assert spec["properties"] == {}
        assert "required" not in spec

    def test_multi_candidate_enums_resolved_in_one_agg(self, spark):
        df = spark.createDataFrame(
            [Row(id=i, a=["x", "y"][i % 2], b=["p", "q", "r"][i % 3])
             for i in range(12)], "id long, a string, b string")
        spec = spec_from_profile(df)
        assert spec["properties"]["a"]["enum"] == ["x", "y"]
        assert spec["properties"]["b"]["enum"] == ["p", "q", "r"]
