"""JSONL source: two-tier file-instance validation.

The JVM fast path must carry every cleanly-mapped line through the
vectorized plan; everything else (malformed JSON, non-objects, type
mismatches) must fall to the interpreter with reference-parity
violations — InvalidJson for unparseable lines (the reference CLI's
abort, `cli/validate.rs:21-29`, as a row), typed violations otherwise.
"""

import json

import pytest

from json_schema_rs_spark.sources.jsonl import (
    read_jsonl, validate_jsonl)

SPEC = {"type": "object", "required": ["conv_id", "turn_idx", "role"],
        "properties": {
            "role": {"type": "string", "enum": ["user", "assistant"]},
            "turn_idx": {"type": "integer", "minimum": 0}}}

DDL = "conv_id string, turn_idx int, role string"

LINES = [
    '{"conv_id": "A", "turn_idx": 0, "role": "user"}',       # clean
    '{"conv_id": "A", "turn_idx": 1, "role": "robot"}',      # enum fail
    '{oops',                                                 # malformed
    '123',                                                   # non-object
    '{"conv_id": "B", "turn_idx": "x", "role": "user"}',     # type clash
    '',                                                      # blank
    '{"conv_id": "B", "role": "user"}',                      # missing req
]


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    (d / "a.jsonl").write_text("\n".join(LINES))
    return str(d)


class TestReadJsonl:
    def test_split_counts(self, spark, jsonl_dir):
        ok, bad = read_jsonl(spark, jsonl_dir, DDL)
        assert ok.count() == 3          # clean, enum-fail, missing-req
        assert bad.count() == 3         # malformed, non-object, type clash
        assert ok.columns == ["conv_id", "turn_idx", "role"]
        assert bad.columns == ["line"]

    def test_declaring_corrupt_col_rejected(self, spark, jsonl_dir):
        with pytest.raises(ValueError, match="_corrupt_record"):
            read_jsonl(spark, jsonl_dir, DDL + ", _corrupt_record string")


class TestValidateJsonl:
    @pytest.fixture(scope="class")
    def result(self, spark, jsonl_dir):
        report, lv = validate_jsonl(spark, jsonl_dir, SPEC, DDL)
        return report, {tuple(r) for r in lv.collect()}

    def test_fast_path_summary(self, result):
        report, _ = result
        assert report.summary() == {"rows": 3, "valid_rows": 1,
                                    "invalid_rows": 2, "violation_count": 2}

    def test_fast_path_violations_are_typed(self, result):
        report, _ = result
        v = {(r["conv_id"], r["code"]) for r in report.violations.collect()}
        assert v == {("A", "NotInEnum"), ("B", "MissingRequired")}

    def test_malformed_line_is_invalid_json(self, result):
        _, lv = result
        row = next(r for r in lv if r[0] == "{oops")
        assert row[2] == "InvalidJson"
        # the message embeds the parser error, byte-reproducible
        json_err = None
        try:
            json.loads("{oops")
        except ValueError as e:
            json_err = str(e)
        assert row[3] == f"invalid JSON line: {json_err}"

    def test_non_object_gets_typed_violation(self, result):
        _, lv = result
        row = next(r for r in lv if r[0] == "123")
        assert row[2] == "ExpectedObject"
        assert row[3] == "root: expected object, got number"

    def test_type_clash_falls_back_with_exact_violation(self, result):
        _, lv = result
        row = next(r for r in lv if '"x"' in r[0])
        assert (row[1], row[2]) == ("/turn_idx", "ExpectedInteger")

    def test_valid_unmappable_line_contributes_no_rows(self, spark,
                                                       tmp_path):
        # a line the JVM can't map but the interpreter accepts: spec
        # without the turn_idx property, string turn_idx clashes with the
        # DDL int but validates fine -> zero violation rows, matching the
        # reference verdict for the raw document
        d = tmp_path / "ok"
        d.mkdir()
        (d / "x.jsonl").write_text(
            '{"conv_id": "A", "turn_idx": "zero", "role": "user"}')
        spec = {"type": "object", "required": ["conv_id", "role"],
                "properties": {"role": {"type": "string"}}}
        report, lv = validate_jsonl(spark, str(d), spec, DDL)
        assert report.summary()["rows"] == 0
        assert lv.count() == 0

    def test_stream_matches_batch(self, spark, jsonl_dir, result):
        # the unbounded variant must produce byte-identical rows to the
        # batch operator over the same files, across micro-batches
        from json_schema_rs_spark.sources.jsonl import (
            jsonl_violation_streams)
        report, batch_lines = result
        vs, ls = jsonl_violation_streams(
            spark, jsonl_dir, SPEC, DDL, max_files_per_trigger=1)
        qs = []
        try:
            qs.append(vs.writeStream.outputMode("append").format("memory")
                      .queryName("jl_v").start())
            qs.append(ls.writeStream.outputMode("append").format("memory")
                      .queryName("jl_l").start())
            for q in qs:
                q.processAllAvailable()
        finally:
            for q in qs:
                q.stop()
        sv = {tuple(r) for r in spark.sql("SELECT * FROM jl_v").collect()}
        bv = {tuple(r) for r in report.violations.collect()}
        assert sv == bv
        sl = {tuple(r) for r in spark.sql("SELECT * FROM jl_l").collect()}
        assert sl == batch_lines

    def test_fast_path_plan_is_vectorized(self, spark, jsonl_dir):
        # the typed branch must stay in the JVM: no Python evaluation
        report, _ = validate_jsonl(spark, jsonl_dir, SPEC, DDL)
        plan = report.violations._jdf.queryExecution().executedPlan() \
            .toString()
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
