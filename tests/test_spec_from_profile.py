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
