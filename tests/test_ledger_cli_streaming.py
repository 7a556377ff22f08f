"""Checkpoint/resume ledger, CLI exit codes, streaming validation."""

import json

import pytest
from pyspark.sql import functions as F

from json_schema_rs_spark import ValidationEngine
from json_schema_rs_spark.sources.ledger import (
    ValidationLedger,
    revalidate_incremental,
    run_checkpointed_validation,
)
from json_schema_rs_spark.sources.synth import synth_transcripts_pandas
from json_schema_rs_spark.streaming.validate_stream import run_file_stream_once

SPEC = {
    "type": "object",
    "required": ["conv_id", "turn_idx", "role", "text"],
    "properties": {
        "role": {"type": "string",
                 "enum": ["system", "user", "assistant", "tool"]},
        "text": {"type": "string", "minLength": 1, "maxLength": 4000},
    },
}

SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts timestamp")


@pytest.fixture(scope="module")
def tdf(spark):
    pdf = synth_transcripts_pandas(n_conversations=80, turns_per_conv=6,
                                   seed=11, violation_rate=0.15)
    return spark.createDataFrame(pdf, schema=SCHEMA).cache()


class TestLedgerResume:
    def test_full_run_then_rerun_skips_everything(self, spark, tdf, tmp_path):
        out = str(tmp_path / "run1")
        s1 = run_checkpointed_validation(
            spark, tdf, SPEC, out, run_id="r1", n_buckets=8, buckets_per_chunk=3)
        assert sorted(s1["processed_buckets"]) == list(range(8))
        assert s1["rows"] == tdf.count()
        # rerun: nothing to do
        s2 = run_checkpointed_validation(
            spark, tdf, SPEC, out, run_id="r1", n_buckets=8)
        assert s2["processed_buckets"] == []
        assert s2["skipped_buckets"] == list(range(8))

    def test_crash_then_resume_completes(self, spark, tdf, tmp_path):
        out = str(tmp_path / "run2")
        s1 = run_checkpointed_validation(
            spark, tdf, SPEC, out, run_id="r2", n_buckets=8,
            buckets_per_chunk=2, fail_after_chunks=2)  # simulate crash
        assert len(s1["processed_buckets"]) == 4
        assert len(s1["remaining_buckets"]) == 4
        s2 = run_checkpointed_validation(
            spark, tdf, SPEC, out, run_id="r2", n_buckets=8, buckets_per_chunk=2)
        assert sorted(s1["processed_buckets"] + s2["processed_buckets"]) \
            == list(range(8))
        # resumed totals cover only the second half; union of ledger rows
        # covers the whole table
        ledger = ValidationLedger(spark, f"{out}/ledger")
        total = ledger.entries("r2").agg(F.sum("rows")).collect()[0][0]
        assert total == tdf.count()

    def test_violations_written_partitioned_and_complete(self, spark, tdf, tmp_path):
        out = str(tmp_path / "run3")
        run_checkpointed_validation(
            spark, tdf, SPEC, out, run_id="r3", n_buckets=4)
        written = spark.read.parquet(f"{out}/violations")
        direct = ValidationEngine(SPEC).validate(tdf).violations
        got = sorted(map(tuple, written.select(
            "conv_id", "turn_idx", "instance_path", "code", "message").collect()))
        want = sorted(map(tuple, direct.collect()))
        assert got == want
        assert "bucket" in written.columns  # partition pruning on re-read

    def test_ledger_metrics_match_summary(self, spark, tdf, tmp_path):
        out = str(tmp_path / "run4")
        s = run_checkpointed_validation(
            spark, tdf, SPEC, out, run_id="r4", n_buckets=4)
        ledger = ValidationLedger(spark, f"{out}/ledger").entries("r4")
        agg = ledger.agg(F.sum("rows"), F.sum("valid_rows"),
                         F.sum("violation_count")).collect()[0]
        assert (agg[0], agg[1], agg[2]) == (
            s["rows"], s["valid_rows"], s["violation_count"])
        fps = [r.spec_fingerprint for r in ledger.collect()]
        assert len(set(fps)) == 1 and len(fps[0]) == 16


WIDER_SPEC = {
    # drops the role enum and the text length cap: every old-valid row
    # stays valid by construction; quarantine rows may be reclaimed
    "type": "object",
    "required": ["conv_id", "turn_idx", "role", "text"],
    "properties": {
        "role": {"type": "string"},
        "text": {"type": "string", "minLength": 1},
    },
}

NARROWER_SPEC = {
    # tightens the role enum: previously-failed rows stay failed
    "type": "object",
    "required": ["conv_id", "turn_idx", "role", "text"],
    "properties": {
        "role": {"type": "string", "enum": ["system", "user", "assistant"]},
        "text": {"type": "string", "minLength": 1, "maxLength": 4000},
    },
}


class TestIncrementalRevalidation:
    @pytest.fixture(scope="class")
    def routed_run(self, spark, tdf, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("reval") / "run")
        run_checkpointed_validation(
            spark, tdf, SPEC, out, run_id="base", n_buckets=4,
            route_rows=True)
        return out

    def _full_valid_count(self, spec, tdf):
        rep = ValidationEngine(spec).validate(tdf)
        return rep.summary()["valid_rows"]

    def test_identical_rescans_nothing(self, spark, tdf, routed_run):
        s = revalidate_incremental(spark, routed_run, "base", SPEC, SPEC)
        assert s["verdict"] == "identical"
        assert s["rows_rescanned"] == 0
        assert s["valid_rows"] == self._full_valid_count(SPEC, tdf)

    def test_widening_rescans_only_quarantine(self, spark, tdf, routed_run):
        s = revalidate_incremental(spark, routed_run, "base", SPEC,
                                   WIDER_SPEC)
        assert s["verdict"] == "widening"
        old_invalid = tdf.count() - self._full_valid_count(SPEC, tdf)
        assert s["rows_rescanned"] == old_invalid      # quarantine only
        assert s["rows_rescanned"] < s["rows_total"]
        # incremental result == full revalidation under the new spec
        assert s["valid_rows"] == self._full_valid_count(WIDER_SPEC, tdf)
        assert s["newly_valid"] > 0                    # rows reclaimed

    def test_narrowing_rescans_only_clean(self, spark, tdf, routed_run):
        s = revalidate_incremental(spark, routed_run, "base", SPEC,
                                   NARROWER_SPEC)
        assert s["verdict"] == "narrowing"
        assert s["rows_rescanned"] == self._full_valid_count(SPEC, tdf)
        assert s["valid_rows"] == self._full_valid_count(NARROWER_SPEC, tdf)
        assert s["newly_invalid"] > 0                  # tool role rows fall

    def test_cli_revalidate_prints_summary_and_exit_code(
            self, spark, tdf, routed_run, tmp_path, capsys):
        from json_schema_rs_spark.cli import main
        old_f, new_f = tmp_path / "old.json", tmp_path / "new.json"
        old_f.write_text(json.dumps(SPEC))
        new_f.write_text(json.dumps(WIDER_SPEC))
        rc = main(["revalidate", "--output", routed_run, "--run-id",
                   "base", "--old-spec", str(old_f),
                   "--new-spec", str(new_f)])
        out = json.loads(capsys.readouterr().out.splitlines()[-1])
        assert out["verdict"] == "widening"
        assert out["rows_rescanned"] < out["rows_total"]
        invalid = out["rows_total"] - out["valid_rows"]
        assert invalid == tdf.count() - self._full_valid_count(
            WIDER_SPEC, tdf)
        assert rc == (1 if invalid > 0 else 0)

    def test_unknown_rescans_everything(self, spark, tdf, routed_run):
        mixed = json.loads(json.dumps(WIDER_SPEC))
        mixed["properties"]["role"]["enum"] = ["user"]   # narrow + widen
        s = revalidate_incremental(spark, routed_run, "base", SPEC, mixed)
        assert s["verdict"] == "unknown"
        assert s["rows_rescanned"] == s["rows_total"] == tdf.count()
        assert s["valid_rows"] == self._full_valid_count(mixed, tdf)
        # newly_valid / newly_invalid are PER-ROW verdict flips, not the
        # net valid-count delta: verify against an explicit per-row join
        # of the two engines' flagged outputs
        old_f = ValidationEngine(SPEC).validate(tdf).flagged \
            .select("conv_id", "turn_idx", F.col("valid").alias("ov"))
        new_f = ValidationEngine(mixed).validate(tdf).flagged \
            .select("conv_id", "turn_idx", F.col("valid").alias("nv"))
        j = old_f.join(new_f, ["conv_id", "turn_idx"])
        flips = j.agg(
            F.sum((F.col("nv") & ~F.col("ov")).cast("long")).alias("fv"),
            F.sum((~F.col("nv") & F.col("ov")).cast("long")).alias("fi"),
        ).collect()[0]
        assert s["newly_valid"] == int(flips["fv"] or 0)
        assert s["newly_invalid"] == int(flips["fi"] or 0)
        # this mixed spec flips rows in BOTH directions; the old net
        # computation would have reported one side as zero
        assert s["newly_valid"] > 0 and s["newly_invalid"] > 0


class TestCli:
    def test_route_rows_clean_and_quarantine(self, spark, tdf, tmp_path):
        out = str(tmp_path / "routed1")
        s1 = run_checkpointed_validation(
            spark, tdf, SPEC, out, run_id="rr1", n_buckets=8,
            buckets_per_chunk=3, route_rows=True)
        routed = spark.read.parquet(f"{out}/routed")
        # every input row lands in exactly one partition
        assert routed.count() == tdf.count()
        clean = routed.filter("valid = 'true'")
        quarantine = routed.filter("valid = 'false'")
        # routing agrees with the engine's own valid flag, row by key
        eng = ValidationEngine(SPEC, key_cols=("conv_id", "turn_idx"))
        expect = eng.validate(tdf).flagged
        assert clean.count() == expect.filter("valid").count()
        exp_keys = {(r["conv_id"], r["turn_idx"])
                    for r in expect.filter("NOT valid")
                    .select("conv_id", "turn_idx").collect()}
        got_keys = {(r["conv_id"], r["turn_idx"])
                    for r in quarantine.select("conv_id", "turn_idx")
                    .collect()}
        assert got_keys == exp_keys
        # quarantine rows carry their rendered violations for repair
        assert quarantine.filter(F.size("violations") == 0).count() == 0
        # observe()-riding metrics equal a groupBy recount
        assert s1["valid_rows"] == clean.count()
        assert s1["rows"] == tdf.count()

    def test_route_rows_metrics_match_unrouted_run(self, spark, tdf,
                                                   tmp_path):
        a = run_checkpointed_validation(
            spark, tdf, SPEC, str(tmp_path / "ra"), run_id="ra",
            n_buckets=8, route_rows=True)
        b = run_checkpointed_validation(
            spark, tdf, SPEC, str(tmp_path / "rb"), run_id="rb",
            n_buckets=8, route_rows=False)
        for k in ("rows", "valid_rows", "violation_count"):
            assert a[k] == b[k]
        # ledger rows byte-compatible: same per-bucket counts
        la = {(r["bucket"], r["rows"], r["valid_rows"], r["violation_count"])
              for r in ValidationLedger(
                  spark, f"{tmp_path / 'ra'}/ledger").entries("ra").collect()}
        lb = {(r["bucket"], r["rows"], r["valid_rows"], r["violation_count"])
              for r in ValidationLedger(
                  spark, f"{tmp_path / 'rb'}/ledger").entries("rb").collect()}
        assert la == lb

    def test_route_rows_crash_resume_no_duplicates(self, spark, tdf,
                                                   tmp_path):
        out = str(tmp_path / "routed2")
        run_checkpointed_validation(
            spark, tdf, SPEC, out, run_id="rr2", n_buckets=8,
            buckets_per_chunk=2, fail_after_chunks=2, route_rows=True)
        s2 = run_checkpointed_validation(
            spark, tdf, SPEC, out, run_id="rr2", n_buckets=8,
            buckets_per_chunk=2, route_rows=True)
        assert s2["remaining_buckets"] == []
        routed = spark.read.parquet(f"{out}/routed")
        assert routed.count() == tdf.count()
        assert (routed.select("conv_id", "turn_idx").distinct().count()
                == tdf.select("conv_id", "turn_idx").distinct().count())

    def test_cli_validate_exit_code_and_output(self, spark, tdf, tmp_path, capsys):
        from json_schema_rs_spark.cli import main
        inp = str(tmp_path / "input")
        tdf.write.parquet(inp)
        spec_file = tmp_path / "spec.json"
        spec_file.write_text(json.dumps(SPEC))
        rc = main(["validate", "--spec", str(spec_file), "--input", inp,
                   "--output", str(tmp_path / "out"), "--run-id", "cli1",
                   "--buckets", "4"])
        captured = capsys.readouterr()
        assert rc == 1  # injected violations -> non-zero, like the reference CLI
        summary = json.loads(captured.out.strip().splitlines()[-1])
        assert summary["rows"] == tdf.count()
        assert "validation failed with" in captured.err

    def test_cli_clean_data_exit_zero(self, spark, tmp_path, capsys):
        from json_schema_rs_spark.cli import main
        pdf = synth_transcripts_pandas(n_conversations=10, turns_per_conv=4,
                                       seed=5, violation_rate=0.0)
        df = spark.createDataFrame(pdf, schema=SCHEMA)
        inp = str(tmp_path / "clean")
        df.write.parquet(inp)
        spec_file = tmp_path / "spec.json"
        spec_file.write_text(json.dumps(SPEC))
        rc = main(["validate", "--spec", str(spec_file), "--input", inp,
                   "--output", str(tmp_path / "out"), "--buckets", "2"])
        assert rc == 0

    def test_cli_generate_emits_plan_manifest(self, spark, tmp_path, capsys):
        # EP3 analog: the manifest on stdout must equal what the lineage
        # table would persist — fingerprint, one entry per check, SQL text
        from json_schema_rs_spark.cli import main
        from json_schema_rs_spark.sources.ledger import spec_fingerprint
        spec_file = tmp_path / "spec.json"
        spec_file.write_text(json.dumps(SPEC))
        rc = main(["generate", "--spec", str(spec_file),
                   "--schema", SCHEMA])
        assert rc == 0
        manifest = json.loads(capsys.readouterr().out)
        assert manifest["spec_fingerprint"] == spec_fingerprint(SPEC)
        codes = {c["code"] for c in manifest["checks"]
                 if c["kind"] == "scalar"}
        assert {"MissingRequired", "NotInEnum",
                "TooShort", "TooLong"} <= codes
        # every scalar check carries executable SQL text
        for c in manifest["checks"]:
            if c["kind"] == "scalar":
                assert c["predicate"] and c["message"]
        assert set(manifest["referenced_columns"]) <= {
            "conv_id", "turn_idx", "role", "text"}

    def test_cli_generate_schema_from_parquet(self, spark, tdf, tmp_path,
                                              capsys):
        from json_schema_rs_spark.cli import main
        inp = str(tmp_path / "gen_input")
        tdf.write.parquet(inp)
        spec_file = tmp_path / "spec.json"
        spec_file.write_text(json.dumps(SPEC))
        out_file = str(tmp_path / "manifest.json")
        rc = main(["generate", "--spec", str(spec_file), "--input", inp,
                   "--out", out_file])
        assert rc == 0
        with open(out_file) as f:
            manifest = json.load(f)
        assert manifest["checks"]

    def test_cli_infer_round_trips_through_generate(self, spark, tdf,
                                                    tmp_path, capsys):
        # reverse path: infer a spec from the table, then compile it back
        # against the same table — a valid spec by construction
        from json_schema_rs_spark.cli import main
        inp = str(tmp_path / "infer_input")
        tdf.write.parquet(inp)
        spec_out = str(tmp_path / "inferred.json")
        assert main(["infer", "--input", inp, "--out", spec_out]) == 0
        with open(spec_out) as f:
            spec = json.load(f)
        assert spec["type"] == "object"
        assert set(spec["properties"]) == set(tdf.columns)
        assert main(["generate", "--spec", spec_out, "--input", inp]) == 0
        manifest = json.loads(capsys.readouterr().out)
        assert manifest["checks"]

    def test_cli_diff_exit_codes_mirror_reval_need(self, tmp_path, capsys):
        # widening -> 0 (ledger verdicts stay sound); narrowing -> 1
        from json_schema_rs_spark.cli import main
        old_f = tmp_path / "old.json"
        new_f = tmp_path / "new.json"
        old_f.write_text(json.dumps(
            {"type": "object",
             "properties": {"i": {"type": "integer", "maximum": 10}}}))
        new_f.write_text(json.dumps(
            {"type": "object",
             "properties": {"i": {"type": "integer", "maximum": 20}}}))
        assert main(["diff", "--old", str(old_f), "--new", str(new_f)]) == 0
        rep = json.loads(capsys.readouterr().out)
        assert rep["verdict"] == "widening"
        assert rep["changes"][0]["keyword"] == "maximum"
        assert main(["diff", "--old", str(new_f), "--new", str(old_f)]) == 1
        rep = json.loads(capsys.readouterr().out)
        assert rep["verdict"] == "narrowing"
        assert "revalidate" in rep["revalidation"]


class TestCliExpect:
    def test_expect_exit_codes(self, spark, tdf, tmp_path, capsys):
        from json_schema_rs_spark.cli import main
        inp = str(tmp_path / "expect_in")
        tdf.write.parquet(inp)
        ok_spec = tmp_path / "ok.json"
        ok_spec.write_text(json.dumps(
            {"min_rows": 1,
             "columns": {"role": {"min_distinct": 2}}}))
        assert main(["expect", "--spec", str(ok_spec),
                     "--input", inp]) == 0
        rows = json.loads(capsys.readouterr().out)
        assert all(r["ok"] for r in rows) and len(rows) == 2
        bad_spec = tmp_path / "bad.json"
        bad_spec.write_text(json.dumps({"max_rows": 1}))
        assert main(["expect", "--spec", str(bad_spec),
                     "--input", inp]) == 1
        cap = capsys.readouterr()
        assert "expectations failed: 1 of 1" in cap.err


class TestStreaming:
    def test_stream_matches_batch(self, spark, tdf, tmp_path):
        inp = str(tmp_path / "stream_in")
        tdf.repartition(4).write.parquet(inp)
        engine = ValidationEngine(SPEC)
        streamed = run_file_stream_once(
            spark, engine, inp, SCHEMA, query_name="v1",
            max_files_per_trigger=2)  # force multiple micro-batches
        batch = engine.validate(spark.read.parquet(inp)).violations
        got = sorted(map(tuple, streamed.collect()))
        want = sorted(map(tuple, batch.collect()))
        assert got == want and len(got) > 0


class TestPlanLineage:
    """Compiled-plan manifest persisted next to the ledger, linked by
    spec_fingerprint (the generate.rs:106-134 persist-artifacts analog)."""

    def test_manifest_roundtrip_and_ledger_link(self, spark, tdf, tmp_path):
        from json_schema_rs_spark.sources.ledger import (
            PlanLineage,
            ValidationLedger,
            spec_fingerprint,
        )
        out = str(tmp_path / "lineage")
        s = run_checkpointed_validation(
            spark, tdf, SPEC, out, n_buckets=4, buckets_per_chunk=4)
        fp = spec_fingerprint(SPEC)
        lineage = PlanLineage(spark, f"{out}/plans")
        m = lineage.manifest_for(fp)
        assert m is not None
        assert m["spec_fingerprint"] == fp
        codes = {c["code"] for c in m["checks"] if c["kind"] == "scalar"}
        assert codes   # every scalar check carries its error code
        assert all(c.get("predicate") for c in m["checks"]
                   if c["kind"] == "scalar")
        # every ledger row joins to exactly this manifest
        led = ValidationLedger(spark, f"{out}/ledger").entries(s["run_id"])
        fps = {r.spec_fingerprint for r in led.collect()}
        assert fps == {fp}
        # idempotent across reruns: one manifest row per fingerprint
        run_checkpointed_validation(
            spark, tdf, SPEC, out, run_id=s["run_id"],
            n_buckets=4, buckets_per_chunk=4)
        plans = spark.read.parquet(f"{out}/plans")
        assert plans.filter(plans.spec_fingerprint == fp).count() == 1

    def test_backend_selection_documented(self, spark, tmp_path):
        """In this container the Iceberg runtime jar is absent, so the
        ledger must transparently run on the parquet backend even when an
        Iceberg table name is requested; the Iceberg branch is live code
        for environments that ship the jar."""
        from json_schema_rs_spark.sources.ledger import (
            ValidationLedger,
            iceberg_available,
        )
        if iceberg_available(spark):
            pytest.skip("Iceberg runtime present: parquet-fallback "
                        "selection does not apply (covered by "
                        "test_iceberg_branch_end_to_end instead)")
        led = ValidationLedger(spark, str(tmp_path / "led"),
                               table="cat.db.ledger")
        assert led.table is None     # fell back to parquet
        led.append([{"run_id": "r", "bucket": 0, "status": "done",
                     "rows": 1, "valid_rows": 1, "violation_count": 0,
                     "wall_time_sec": 0.1, "spec_fingerprint": "f" * 16,
                     "finished_at": None}])
        assert led.completed_buckets("r") == {0}

    def test_iceberg_branch_end_to_end(self, spark, tmp_path):
        """Runs the REAL Iceberg ledger branch (catalog table create +
        append + snapshot-history rerun via ``VERSION AS OF``) whenever
        the runtime jar is on the classpath. In this container the jar is
        absent and CANNOT be fetched (no package installs), so this test
        pins that unsupported status with a loud skip instead of letting
        the branch rot silently — SURVEY.md §2.4 resumability stays
        designed-and-testable, executed wherever the jar ships."""
        from json_schema_rs_spark.sources.ledger import (
            ValidationLedger,
            iceberg_available,
        )
        if not iceberg_available(spark):
            pytest.skip(
                "Iceberg runtime jar absent in this environment (pip/apt "
                "installs unavailable; org.apache.iceberg.spark.SparkCatalog "
                "not on classpath). Parquet fallback is the supported mode "
                "here; this test executes the Iceberg branch as soon as a "
                "jar is present.")
        from pyspark.sql import SparkSession
        wh = str(tmp_path / "iceberg_wh")
        s = (SparkSession.builder.master("local[2]")
             .appName("iceberg-ledger-test")
             .config("spark.sql.catalog.it",
                     "org.apache.iceberg.spark.SparkCatalog")
             .config("spark.sql.catalog.it.type", "hadoop")
             .config("spark.sql.catalog.it.warehouse", wh)
             .getOrCreate())
        try:
            led = ValidationLedger(s, str(tmp_path / "led_fallback"),
                                   table="it.db.ledger")
            assert led.table == "it.db.ledger"
            row = {"run_id": "r", "bucket": 0, "status": "done", "rows": 1,
                   "valid_rows": 1, "violation_count": 0,
                   "wall_time_sec": 0.1, "spec_fingerprint": "f" * 16,
                   "finished_at": None}
            led.append([row])
            led.append([{**row, "bucket": 1}])
            assert led.completed_buckets("r") == {0, 1}
            # snapshot history: the first snapshot sees only bucket 0
            snaps = s.sql(
                "SELECT snapshot_id FROM it.db.ledger.snapshots "
                "ORDER BY committed_at").collect()
            assert len(snaps) >= 2
            first = s.sql(
                f"SELECT bucket FROM it.db.ledger "
                f"VERSION AS OF {snaps[0].snapshot_id}").collect()
            assert {r.bucket for r in first} == {0}
        finally:
            s.stop()


PROTOCOL = ([("system", "user"), ("user", "assistant"),
             ("assistant", "user"), ("assistant", "tool"),
             ("tool", "assistant"), ("tool", "tool")],
            ["system", "user"])


class TestLedgerTableChecks:
    def test_cross_row_checks_ride_the_resumable_run(self, spark, tdf,
                                                     tmp_path):
        from json_schema_rs_spark.operators.pipeline import (
            cross_row_violations,
        )
        out = str(tmp_path / "run_tc")
        s = run_checkpointed_validation(
            spark, tdf, SPEC, out, run_id="tc1", n_buckets=8,
            buckets_per_chunk=3, table_checks=True,
            role_protocol=PROTOCOL, tool_pairing=True)
        viol = spark.read.parquet(f"{out}/violations")
        batch_tv = cross_row_violations(
            tdf, role_protocol=PROTOCOL, tool_pairing=True)
        batch_rv = ValidationEngine(SPEC).validate(tdf).violations
        # the sink holds row-local + cross-row violations, exactly
        want = sorted(
            (r.conv_id, r.turn_idx, r.instance_path, r.code, r.message)
            for r in batch_tv.unionByName(batch_rv).collect())
        got = sorted(
            (r.conv_id, r.turn_idx, r.instance_path, r.code, r.message)
            for r in viol.collect())
        assert got == want
        assert s["violation_count"] == len(want)
        # protocol codes actually present (the injector produces them)
        codes = {r.code for r in viol.collect()}
        assert codes & {"BadRoleTransition", "BadFirstRole",
                        "ToolResultWithoutCall", "ToolCallWithoutResult"}

    def test_crash_resume_with_table_checks_is_exact(self, spark, tdf,
                                                     tmp_path):
        from json_schema_rs_spark.operators.pipeline import (
            cross_row_violations,
        )
        out = str(tmp_path / "run_tc2")
        kw = dict(n_buckets=8, buckets_per_chunk=2, table_checks=True,
                  role_protocol=PROTOCOL, tool_pairing=True)
        run_checkpointed_validation(spark, tdf, SPEC, out, run_id="tc2",
                                    fail_after_chunks=2, **kw)
        s2 = run_checkpointed_validation(spark, tdf, SPEC, out,
                                         run_id="tc2", **kw)
        assert not s2["remaining_buckets"]
        viol = spark.read.parquet(f"{out}/violations")
        batch_n = (cross_row_violations(tdf, role_protocol=PROTOCOL,
                                        tool_pairing=True).count()
                   + ValidationEngine(SPEC).validate(tdf)
                     .violations.count())
        # no duplicates, no gaps after the resume
        assert viol.count() == batch_n

    def test_cli_protocol_flag(self, spark, tdf, tmp_path, capsys):
        from json_schema_rs_spark import cli
        src = str(tmp_path / "src")
        tdf.write.parquet(src)
        spec_f = str(tmp_path / "spec.json")
        with open(spec_f, "w") as f:
            json.dump(SPEC, f)
        proto_f = str(tmp_path / "protocol.json")
        with open(proto_f, "w") as f:
            json.dump({"allowed_transitions": PROTOCOL[0],
                       "allowed_first": PROTOCOL[1],
                       "tool_pairing": True}, f)
        rc = cli.main(["validate", "--spec", spec_f, "--input", src,
                       "--output", str(tmp_path / "out"),
                       "--run-id", "cli-tc", "--buckets", "4",
                       "--protocol", proto_f])
        assert rc == 1  # dirty data -> non-zero, reference contract
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        viol = spark.read.parquet(str(tmp_path / "out" / "violations"))
        assert summary["violation_count"] == viol.count()
        assert {r.code for r in viol.collect()} & {"BadRoleTransition",
                                                   "ToolResultWithoutCall"}


class TestRoutedIdempotence:
    def test_partial_append_cleared_on_resume(self, spark, tdf, tmp_path):
        # crash AFTER a data append but BEFORE its ledger commit row:
        # simulate by planting stray parquet rows in a pending bucket
        # dir; the resume must clear them, not duplicate them
        out = str(tmp_path / "ridem")
        run_checkpointed_validation(
            spark, tdf, SPEC, out, run_id="ri", n_buckets=4,
            buckets_per_chunk=1, fail_after_chunks=2, route_rows=True)
        from json_schema_rs_spark.sources.ledger import ValidationLedger
        done = ValidationLedger(spark, f"{out}/ledger") \
            .completed_buckets("ri")
        pending = [b for b in range(4) if b not in done]
        stray = tdf.limit(7).withColumn("violations", F.array()) \
            .withColumn("valid", F.lit(True))
        (stray.write.mode("append")
              .parquet(f"{out}/routed/run_id=ri/bucket={pending[0]}/"
                       f"valid=true"))
        (tdf.limit(3).select(
            "conv_id", "turn_idx",
            F.lit("/x").alias("instance_path"), F.lit("E").alias("code"),
            F.lit("m").alias("message"))
         .write.mode("append")
         .parquet(f"{out}/violations/run_id=ri/bucket={pending[0]}"))
        run_checkpointed_validation(
            spark, tdf, SPEC, out, run_id="ri", n_buckets=4,
            buckets_per_chunk=1, route_rows=True)
        routed = spark.read.parquet(f"{out}/routed")
        assert routed.count() == tdf.count()  # strays gone, no dupes
        viol = spark.read.parquet(f"{out}/violations")
        direct = ValidationEngine(SPEC).validate(tdf).violations
        assert viol.count() == direct.count()
        assert viol.filter("code = 'E'").count() == 0

    def test_two_runs_never_interleave(self, spark, tdf, tmp_path):
        out = str(tmp_path / "rtwo")
        for rid in ("ra", "rb"):
            run_checkpointed_validation(
                spark, tdf, SPEC, out, run_id=rid, n_buckets=4,
                route_rows=True)
        routed = spark.read.parquet(f"{out}/routed")
        # run_id surfaces as a partition column; each run holds exactly
        # one full copy
        assert routed.filter("run_id = 'ra'").count() == tdf.count()
        assert routed.filter("run_id = 'rb'").count() == tdf.count()

    def test_route_rows_rejects_colliding_columns(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("a", 0, "user", "hello text!", None, None, 1)],
            SCHEMA + ", bucket int")
        with pytest.raises(ValueError, match="bucket"):
            run_checkpointed_validation(
                spark, df, SPEC, str(tmp_path / "clash"), run_id="rc",
                n_buckets=2, route_rows=True)


class TestCliPrep:
    def test_cli_prep_writes_survivors_and_summary(self, spark, tmp_path,
                                                   capsys):
        from json_schema_rs_spark.cli import main
        # 7 content classes with disjoint token vocabularies: dedup
        # keeps one doc per class, decontamination can only hit the
        # benchmarked classes (no cross-class shingle overlap)
        docs = spark.createDataFrame(
            [(i, " ".join(f"tok{i % 7}x{j}" for j in range(60)))
             for i in range(40)],
            "doc_id bigint, text string")
        inp = str(tmp_path / "docs")
        docs.write.parquet(inp)
        # benchmark = 3 docs verbatim from the corpus -> their whole
        # duplicate families must be decontaminated away
        bench = str(tmp_path / "bench")
        docs.filter("doc_id IN (0, 1, 2)").write.parquet(bench)
        out = str(tmp_path / "prepped")
        rc = main(["prep", "--input", inp, "--benchmark", bench,
                   "--output", out, "--min-quality", "0.3"])
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip()
                             .splitlines()[-1])
        assert summary["input_rows"] == 40
        got = spark.read.parquet(out)
        assert got.count() == summary["survivors"]
        # dedup: one survivor per distinct suffix class, minus the
        # 3 decontaminated classes -> 7 - 3 = 4
        assert summary["survivors"] == 4

    def test_cli_prep_sharded_output(self, spark, tmp_path, capsys):
        from json_schema_rs_spark.cli import main
        docs = spark.createDataFrame(
            [(i, f"unique document number {i} with plenty of the and of "
                 "and to words in it " * 5) for i in range(30)],
            "doc_id bigint, text string")
        inp = str(tmp_path / "docs2")
        docs.write.parquet(inp)
        bench = str(tmp_path / "bench2")
        docs.limit(0).write.parquet(bench)
        out = str(tmp_path / "sharded")
        rc = main(["prep", "--input", inp, "--benchmark", bench,
                   "--output", out, "--min-quality", "0.1",
                   "--shards", "4"])
        assert rc == 0
        import os as _os
        dirs = sorted(d for d in _os.listdir(out) if d.startswith("shard="))
        assert len(dirs) == 4
        got = spark.read.parquet(out)
        assert got.count() == 30
        # in-shard positions are contiguous from 0
        for r in (got.groupBy("shard")
                     .agg(F.min("pos").alias("lo"), F.max("pos").alias("hi"),
                          F.count("*").alias("n")).collect()):
            assert r["lo"] == 0 and r["hi"] == r["n"] - 1
