"""Table-level checks + stats/drift operators."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from json_schema_rs_spark.functions.tdigest import TDigest, ks_from_digests
from json_schema_rs_spark.operators import stats as S
from json_schema_rs_spark.operators.table_checks import (
    monotonic_ts_violations,
    referential_violations,
    turn_gap_violations,
    uniqueness_violations,
)

SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts timestamp")


@pytest.fixture(scope="module")
def dirty(spark):
    import datetime as dt
    t0 = dt.datetime(2026, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # conv A: clean 0,1,2
        ("A", 0, "system", "s", None, t0),
        ("A", 1, "user", "u", None, t0 + m),
        ("A", 2, "assistant", "a", None, t0 + 2 * m),
        # conv B: duplicate turn 1, gap (no 2), bad role
        ("B", 0, "system", "s", None, t0),
        ("B", 1, "user", "u", None, t0 + m),
        ("B", 1, "narrator", "dup", None, t0 + m),
        ("B", 3, "assistant", "a", None, t0 + 3 * m),
        # conv C: starts at 1, non-monotonic ts, unknown tool
        ("C", 1, "user", "u", None, t0 + m),
        ("C", 2, "tool", "t", "teleport", t0),
    ]
    return rows


@pytest.fixture(scope="module")
def ddf(spark, dirty):
    return spark.createDataFrame(dirty, schema=SCHEMA).cache()


class TestTableChecks:
    def test_uniqueness(self, ddf):
        v = uniqueness_violations(ddf).collect()
        assert len(v) == 1
        r = v[0]
        assert (r.conv_id, r.turn_idx, r.code) == ("B", 1, "DuplicateKey")
        assert r.message == ("root: duplicate key (conv_id, turn_idx) has 2 "
                             "occurrences, expected 1")

    def test_uniqueness_salted_same_result(self, ddf):
        plain = {tuple(r) for r in uniqueness_violations(ddf).collect()}
        salted = {tuple(r) for r in uniqueness_violations(ddf, salt=8).collect()}
        assert plain == salted

    def test_referential_vocab_df(self, spark, ddf):
        roles = spark.createDataFrame(
            [("system",), ("user",), ("assistant",), ("tool",)], "role string")
        v = referential_violations(ddf, "role", roles, vocab_name="roles").collect()
        assert len(v) == 1
        assert v[0].message == '/role: value "narrator" not in vocabulary "roles"'

    def test_referential_literal_vocab_broadcast_plan(self, spark, ddf):
        # literal vocab compiles to isin: no join at all
        v = referential_violations(
            ddf, "tool", ["search", "calculator", "code_exec", "browser"])
        plan = v._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        rows = v.collect()
        assert [r.message for r in rows] == [
            '/tool: value "teleport" not in vocabulary "tool"']

    def test_referential_nulls_never_violate(self, spark, ddf):
        v = referential_violations(ddf, "tool", ["search"]).collect()
        assert all(r.conv_id == "C" for r in v)  # nulls skipped

    def test_turn_gaps(self, ddf):
        v = sorted((r.conv_id, r.turn_idx, r.message)
                   for r in turn_gap_violations(ddf).collect())
        # B: dup 1 -> second occupies position 2; 3 at position 3 OK;
        # C: starts at 1 -> both turns offset
        assert v == [
            ("B", 1, "/turn_idx: turn index 1 at position 2 breaks gap-free ordering"),
            ("C", 1, "/turn_idx: turn index 1 at position 0 breaks gap-free ordering"),
            ("C", 2, "/turn_idx: turn index 2 at position 1 breaks gap-free ordering"),
        ]

    def test_monotonic_ts(self, ddf):
        v = monotonic_ts_violations(ddf).collect()
        assert len(v) == 1
        assert (v[0].conv_id, v[0].turn_idx, v[0].code) == ("C", 2, "NonMonotonicTs")


class TestProfile:
    def test_profile_exact_parts(self, spark):
        rows = [(1, "a", 1.0), (2, "b", None), (3, "a", 3.0), (4, None, 4.0)]
        df = spark.createDataFrame(rows, "id int, cat string, x double")
        p = {r.column: r for r in
             S.profile(df, exact_distinct=True).collect()}
        assert p["id"]["count"] == 4 and p["id"].null_count == 0
        assert p["cat"].null_count == 1 and abs(p["cat"].null_rate - 0.25) < 1e-12
        assert p["cat"].distinct_count == 2
        assert p["x"].min == "1.0" and p["x"].max == "4.0"
        assert abs(p["x"].mean - (8.0 / 3)) < 1e-9
        assert p["cat"].mean is None

    def test_profile_single_aggregate_pass(self, spark):
        df = spark.range(100).withColumn("x", F.col("id").cast("double"))
        plan = S.profile(df)._jdf.queryExecution().executedPlan().toString()
        # one partial+final aggregate pair, no join, no extra scans
        assert plan.count("Scan ") <= 1


def _chi2_manual(ca: dict, cb: dict) -> float:
    cats = set(ca) | set(cb)
    ta, tb = sum(ca.values()), sum(cb.values())
    tot = ta + tb
    stat = 0.0
    for c in cats:
        a, b = ca.get(c, 0), cb.get(c, 0)
        ea, eb = ta * (a + b) / tot, tb * (a + b) / tot
        if ea > 0:
            stat += (a - ea) ** 2 / ea
        if eb > 0:
            stat += (b - eb) ** 2 / eb
    return stat


class TestDrift:
    def test_chi2_matches_manual(self, spark):
        ca = {"x": 50, "y": 30, "z": 20}
        cb = {"x": 30, "y": 45, "w": 10}
        rows_a = [(k,) for k, n in ca.items() for _ in range(n)]
        rows_b = [(k,) for k, n in cb.items() for _ in range(n)]
        da = spark.createDataFrame(rows_a, "role string")
        db = spark.createDataFrame(rows_b, "role string")
        r = S.chi2_two_sample(da, db, "role").collect()[0]
        assert abs(r.chi2 - _chi2_manual(ca, cb)) < 1e-9
        assert r.dof == 3 and r.n_a == 100 and r.n_b == 85

    def test_ks_exact_matches_numpy(self, spark):
        rng = random.Random(1)
        a = [rng.gauss(0, 1) for _ in range(400)]
        b = [rng.gauss(0.5, 1.2) for _ in range(300)]
        da = spark.createDataFrame([(x,) for x in a], "v double")
        db = spark.createDataFrame([(x,) for x in b], "v double")
        ks = S.ks_exact(da, db, "v").collect()[0].ks
        # manual two-sample KS
        xs = sorted(set(a) | set(b))
        sa, sb = np.sort(a), np.sort(b)
        d = max(abs(np.searchsorted(sa, x, side="right") / len(a)
                    - np.searchsorted(sb, x, side="right") / len(b))
                for x in xs)
        assert abs(ks - d) < 1e-9

    def test_ks_sketch_close_to_exact(self, spark):
        rng = random.Random(2)
        a = [rng.gauss(0, 1) for _ in range(4000)]
        b = [rng.gauss(0.8, 1.0) for _ in range(4000)]
        da = spark.createDataFrame([(x,) for x in a], "v double").repartition(8)
        db = spark.createDataFrame([(x,) for x in b], "v double").repartition(8)
        exact = S.ks_exact(da, db, "v").collect()[0].ks
        approx = S.ks_sketch(da, db, "v")
        assert abs(approx - exact) < 0.03
        assert approx > 0.25  # the shift is detected

    def test_cvm_matches_manual_with_ties(self, spark):
        rng = random.Random(3)
        # round to force ties — the grouped-ECDF form must handle them
        a = [round(rng.gauss(0, 1), 1) for _ in range(400)]
        b = [round(rng.gauss(0.3, 1.2), 1) for _ in range(300)]
        da = spark.createDataFrame([(x,) for x in a], "v double")
        db = spark.createDataFrame([(x,) for x in b], "v double")
        r = S.cvm_two_sample(da, db, "v").collect()[0]
        sa, sb = np.sort(a), np.sort(b)
        pooled = sorted(set(a) | set(b))
        t = sum((a.count(v) + b.count(v))
                * (np.searchsorted(sa, v, side="right") / len(a)
                   - np.searchsorted(sb, v, side="right") / len(b)) ** 2
                for v in pooled) * len(a) * len(b) / (len(a) + len(b)) ** 2
        assert abs(r.cvm - t) < 1e-9
        assert r.n_a == 400 and r.n_b == 300

    def test_cvm_broad_shift_vs_ks(self, spark):
        # a uniform mean-shift moves EVERY quantile a little: CvM (L2,
        # integrates all gaps) must clearly separate it from the
        # identical-distribution case
        rng = random.Random(4)
        a = [rng.gauss(0, 1) for _ in range(2000)]
        b = [x + 0.25 for x in a]
        da = spark.createDataFrame([(x,) for x in a], "v double")
        db = spark.createDataFrame([(x,) for x in b], "v double")
        shifted = S.cvm_two_sample(da, db, "v").collect()[0].cvm
        same = S.cvm_two_sample(da, da, "v").collect()[0].cvm
        assert shifted > 10 * max(same, 1e-12)
        assert same < 1e-9  # identical samples -> identical ECDFs

    def test_ks_same_distribution_near_zero(self, spark):
        df = spark.range(5000).select(
            (F.rand(seed=7)).alias("v"))
        half_a = df.filter(F.col("v") < 2).sample(0.5, seed=1)
        half_b = df.subtract(half_a)
        approx = S.ks_sketch(half_a, half_b, "v")
        assert approx < 0.08


class TestTableExpectations:
    def _df(self, spark):
        from pyspark.sql import Row
        return spark.createDataFrame(
            [Row(role="user", v=1.0), Row(role="assistant", v=3.0),
             Row(role="user", v=None), Row(role=None, v=8.0)],
            "role string, v double")

    def test_verdict_rows_and_gate(self, spark):
        from json_schema_rs_spark.operators.expectations import (
            expectations_pass, table_expectations)
        rep = table_expectations(self._df(spark), {
            "min_rows": 2, "max_rows": 3,          # max_rows fails (4 rows)
            "columns": {
                "role": {"max_null_frac": 0.25, "min_distinct": 3},
                "v": {"min_value": 0, "max_value": 5,  # max_value fails (8)
                      "min_mean": 1, "max_mean": 10}}})
        rows = {(r["scope"], r["rule"]): r for r in rep.collect()}
        assert rows[("table", "min_rows")].ok
        assert not rows[("table", "max_rows")].ok
        assert rows[("role", "max_null_frac")].observed == 0.25
        assert rows[("role", "max_null_frac")].ok
        assert not rows[("role", "min_distinct")].ok     # 2 distinct < 3
        assert not rows[("v", "max_value")].ok
        assert rows[("v", "min_mean")].observed == 4.0   # (1+3+8)/3
        assert not expectations_pass(rep)
        assert "OUTSIDE" in rows[("table", "max_rows")].message

    def test_all_green_gate(self, spark):
        from json_schema_rs_spark.operators.expectations import (
            expectations_pass, table_expectations)
        rep = table_expectations(self._df(spark),
                                 {"min_rows": 1, "columns": {}})
        assert expectations_pass(rep)

    def test_all_null_numeric_bounds_vacuous(self, spark):
        from pyspark.sql import Row
        from json_schema_rs_spark.operators.expectations import (
            table_expectations)
        df = spark.createDataFrame([Row(v=None), Row(v=None)],
                                   "v double")
        rep = table_expectations(
            df, {"columns": {"v": {"min_value": 0, "min_mean": 1,
                                   "max_null_frac": 0.5}}})
        rows = {r["rule"]: r for r in rep.collect()}
        assert set(rows) == {"max_null_frac"}   # value/mean rows vacuous
        assert not rows["max_null_frac"].ok     # 1.0 > 0.5

    @pytest.mark.parametrize("spec,msg", [
        ({"min_rowz": 1}, "unknown table"),
        ({"columns": {"absent": {"min_distinct": 1}}}, "absent column"),
        ({"columns": {"role": {"min_mean": 1}}}, "numeric column"),
        ({"columns": {"role": {"min_distinkt": 1}}}, "unknown expectation"),
    ])
    def test_strict_spec_errors(self, spark, spec, msg):
        from json_schema_rs_spark.operators.expectations import (
            table_expectations)
        with pytest.raises(ValueError, match=msg):
            table_expectations(self._df(spark), spec)

    def test_nan_observed_fails_instead_of_crashing(self, spark):
        # Spark mean/max propagate NaN; the verdict row must FAIL the
        # bound (NaN compares False) and render 'nan' in the message —
        # not abort the whole gate with int(nan)
        from pyspark.sql import Row
        from json_schema_rs_spark.operators.expectations import (
            expectations_pass, table_expectations)
        df = spark.createDataFrame(
            [Row(v=1.0), Row(v=float("nan")), Row(v=2.0)], "v double")
        rep = table_expectations(
            df, {"columns": {"v": {"min_mean": 0, "max_value": 10}}})
        rows = {r["rule"]: r for r in rep.collect()}
        assert not rows["min_mean"].ok and "nan" in rows["min_mean"].message
        assert not rows["max_value"].ok
        assert not expectations_pass(rep)

    def test_table_only_spec_skips_profile(self, spark, monkeypatch):
        # min_rows/max_rows alone need ONE count scan — never the
        # all-columns profile (+ its exact-distinct second scan)
        from json_schema_rs_spark.operators import expectations as E
        monkeypatch.setattr(E, "profile", lambda *a, **k: (_ for _ in ())
                            .throw(AssertionError("profile must not run")))
        rep = E.table_expectations(self._df(spark), {"min_rows": 2})
        rows = rep.collect()
        assert len(rows) == 1 and rows[0].ok


class TestVocabDrift:
    def _df(self, spark, texts):
        from pyspark.sql import Row
        return spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)])

    def test_identical_corpora_zero_chi2(self, spark):
        from json_schema_rs_spark.operators.textstats import vocab_drift
        texts = ["alpha beta gamma", "beta beta delta"] * 5
        r = vocab_drift(self._df(spark, texts), self._df(spark, texts),
                        k=3).collect()[0]
        assert r.chi2 == pytest.approx(0.0, abs=1e-12)
        assert r.n_a == r.n_b == 30

    def test_shifted_vocabulary_registers(self, spark):
        from json_schema_rs_spark.operators.textstats import vocab_drift
        a = ["alpha beta gamma delta"] * 10
        b = ["epsilon zeta eta theta"] * 10   # fully out-of-vocabulary
        r = vocab_drift(self._df(spark, a), self._df(spark, b),
                        k=4).collect()[0]
        # every b token folds into <other>: maximal divergence on a
        # 5-category table with equal totals -> chi2 = n_a + n_b
        assert r.chi2 == pytest.approx(80.0)
        assert r.dof == 4                      # 4 vocab cats + other - 1

    def test_oov_folds_into_other_not_new_category(self, spark):
        from json_schema_rs_spark.operators.textstats import vocab_drift
        a = ["x y", "x y"]
        b = ["x q", "x r"]                     # q, r both OOV
        r = vocab_drift(self._df(spark, a), self._df(spark, b),
                        k=2).collect()[0]
        assert r.dof == 2                      # {x, y, <other>} - 1


class TestEmbeddingDrift:
    def _df(self, spark, vecs):
        from pyspark.sql import Row
        return spark.createDataFrame(
            [Row(vec_id=i, embedding=v) for i, v in enumerate(vecs)],
            "vec_id bigint, embedding array<double>")

    def test_identical_snapshots(self, spark):
        from json_schema_rs_spark.operators.similarity import embedding_drift
        vs = [[1.0, 0.0, 2.0], [0.0, 3.0, 1.0], [2.0, 1.0, 0.0]]
        r = embedding_drift(self._df(spark, vs),
                            self._df(spark, vs)).collect()[0]
        assert r.cos_means == pytest.approx(1.0)
        assert r.norm_ratio == pytest.approx(1.0)
        assert r.n_a == r.n_b == 3

    def test_scaling_moves_ratio_not_cosine(self, spark):
        from json_schema_rs_spark.operators.similarity import embedding_drift
        vs = [[1.0, 2.0], [3.0, 1.0]]
        scaled = [[2 * x for x in v] for v in vs]
        r = embedding_drift(self._df(spark, vs),
                            self._df(spark, scaled)).collect()[0]
        assert r.cos_means == pytest.approx(1.0)
        assert r.norm_ratio == pytest.approx(2.0)

    def test_rotation_moves_cosine(self, spark):
        from json_schema_rs_spark.operators.similarity import embedding_drift
        a = [[1.0, 0.0]] * 4
        b = [[0.0, 1.0]] * 4                  # orthogonal mean
        r = embedding_drift(self._df(spark, a),
                            self._df(spark, b)).collect()[0]
        assert r.cos_means == pytest.approx(0.0, abs=1e-9)
        assert r.norm_ratio == pytest.approx(1.0)

    def test_null_and_empty_vectors_excluded(self, spark):
        from json_schema_rs_spark.operators.similarity import embedding_drift
        a = self._df(spark, [[1.0, 0.0], None, []])
        b = self._df(spark, [[1.0, 0.0]])
        r = embedding_drift(a, b).collect()[0]
        assert r.n_a == 1 and r.cos_means == pytest.approx(1.0)

    def test_empty_side_yields_nulls(self, spark):
        from json_schema_rs_spark.operators.similarity import embedding_drift
        a = self._df(spark, [[1.0, 0.0]])
        b = self._df(spark, [])
        r = embedding_drift(a, b).collect()[0]
        assert r.cos_means is None and r.n_b == 0


class TestTDigest:
    def test_quantiles_accuracy(self):
        rng = np.random.default_rng(0)
        data = rng.normal(10, 3, size=50_000)
        d = TDigest(200)
        for chunk in np.array_split(data, 17):
            d.add(chunk)
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            true = float(np.quantile(data, q))
            got = d.quantile(q)
            assert abs(got - true) < 0.08, (q, got, true)

    def test_merge_associative(self):
        rng = np.random.default_rng(1)
        data = rng.exponential(2.0, size=30_000)
        parts = np.array_split(data, 10)
        whole = TDigest(200)
        whole.add(data)
        merged = TDigest.merge_all([_digest_of(p) for p in parts])
        for q in (0.1, 0.5, 0.9):
            assert abs(whole.quantile(q) - merged.quantile(q)) < 0.05

    def test_cdf_bounds(self):
        d = _digest_of(np.arange(1000, dtype="float64"))
        assert d.cdf(-1) == 0.0 and d.cdf(999) == 1.0
        assert abs(d.cdf(499.5) - 0.5) < 0.01

    def test_serialization_roundtrip(self):
        d = _digest_of(np.random.default_rng(3).normal(size=5000))
        m, w, mn, mx = d.to_arrays()
        d2 = TDigest.from_arrays(m, w, mn, mx)
        assert abs(d.quantile(0.5) - d2.quantile(0.5)) < 1e-12
        assert abs(ks_from_digests(d, d2)) < 1e-9


def _digest_of(arr):
    d = TDigest(200)
    d.add(arr)
    return d


class TestViolationVerdicts:
    def test_clean_groups_report_pass(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            violation_verdicts)
        tx = spark.createDataFrame(
            [("a", 0), ("a", 1), ("b", 0), ("c", 0)],
            "conv_id string, turn_idx int")
        viol = spark.createDataFrame(
            [("a", 0, "/x", "E", "m"), ("a", 0, "/y", "E", "m"),
             ("a", 1, "/x", "E", "m")],
            "conv_id string, turn_idx int, instance_path string, "
            "code string, message string")
        got = {r["conv_id"]: (r["n_violations"], r["n_turns_flagged"],
                              r["verdict"])
               for r in violation_verdicts(tx, viol).collect()}
        assert got == {"a": (3, 2, "fail"),
                       "b": (0, 0, "pass"),
                       "c": (0, 0, "pass")}

    def test_no_wide_shuffle(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            violation_verdicts)
        tx = spark.createDataFrame([("a", 0, "payload " * 100)],
                                   "conv_id string, turn_idx int, t string")
        viol = spark.createDataFrame(
            [], "conv_id string, turn_idx int, instance_path string, "
                "code string, message string")
        plan = (violation_verdicts(tx, viol)
                ._jdf.queryExecution().executedPlan().toString())
        # the verdict table shuffles only conv_id keys and count columns,
        # never the corpus' wide payload columns
        assert "t#" not in plan.split("Exchange", 1)[-1] or \
            "hashpartitioning(conv_id" in plan


class TestViolationStats:
    def test_counts_and_null_keys(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            violation_stats)
        viol = spark.createDataFrame(
            [("a", 0, "/x", "TooShort", "m"),
             ("a", 0, "/x", "TooShort", "m"),   # same key, same check
             ("b", 1, "/x", "TooShort", "m"),
             (None, 2, "/conv_id", "MissingRequired", "m"),
             (None, 3, "/conv_id", "MissingRequired", "m")],
            "conv_id string, turn_idx int, instance_path string, "
            "code string, message string")
        got = {(r["code"], r["instance_path"]):
               (r["n_violations"], r["n_keys"])
               for r in violation_stats(viol).collect()}
        # NULL conv_id keys must COUNT (distinct on substituted key),
        # not vanish under SQL any-NULL distinct semantics
        assert got == {("TooShort", "/x"): (3, 2),
                       ("MissingRequired", "/conv_id"): (2, 2)}

    def test_rejects_absent_key_columns(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            violation_stats)
        viol = spark.createDataFrame(
            [("a", 0, "/x", "E", "m")],
            "conv_id string, turn_idx int, instance_path string, "
            "code string, message string")
        with pytest.raises(ValueError, match="key columns"):
            violation_stats(viol, key_cols=("conv_id", "turn_id"))

    def test_partial_aggregate_shape(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            violation_stats)
        viol = spark.createDataFrame(
            [("a", 0, "/x", "E", "m")],
            "conv_id string, turn_idx int, instance_path string, "
            "code string, message string")
        plan = (violation_stats(viol)
                ._jdf.queryExecution().executedPlan().toString())
        # map-side partial aggregation before the exchange
        assert "partial" in plan.lower()


class TestProfileDrift:
    def test_schema_changes_and_deltas(self, spark):
        from json_schema_rs_spark.operators.stats import profile_drift
        a = spark.createDataFrame(
            [(1, "x", 1.0), (2, "y", None), (3, "z", 3.0)],
            "id bigint, kept string, val double")
        b = spark.createDataFrame(
            [(4, 1, "n"), (5, 2, "n")],
            "id bigint, val int, brand_new string")
        got = {r["column"]: r for r in
               profile_drift(a, b, exact_distinct=True).collect()}
        assert got["kept"]["schema_change"] == "removed"
        assert got["kept"]["count_b"] is None
        assert got["brand_new"]["schema_change"] == "added"
        assert got["brand_new"]["null_rate_b"] == 0.0
        assert got["val"]["schema_change"] == "type_changed"
        assert abs(got["val"]["null_rate_delta"] - (0.0 - 1 / 3)) < 1e-12
        assert got["val"]["mean_delta"] == 1.5 - 2.0
        assert got["id"]["schema_change"] is None
        assert got["id"]["distinct_a"] == 3 and got["id"]["distinct_b"] == 2

    def test_row_order_is_sorted_by_column(self, spark):
        from json_schema_rs_spark.operators.stats import profile_drift
        df = spark.createDataFrame([(1, 2)], "b int, a int")
        assert [r["column"] for r in profile_drift(df, df).collect()] \
            == ["a", "b"]


class TestTranscriptDiff:
    def _diff(self, spark, rows_a, rows_b):
        from json_schema_rs_spark.operators.table_checks import (
            transcript_diff)
        schema = "conv_id string, turn_idx int, text string"
        return {(r["conv_id"], r["turn_idx"]): (r["code"], r["message"])
                for r in transcript_diff(
                    spark.createDataFrame(rows_a, schema),
                    spark.createDataFrame(rows_b, schema)).collect()}

    def test_three_codes_and_null_safety(self, spark):
        a = [("c", 0, "same"), ("c", 1, "old"), ("c", 2, "only-a"),
             ("c", 4, None), ("c", 5, None)]
        b = [("c", 0, "same"), ("c", 1, "new!"), ("c", 3, "only-b"),
             ("c", 4, None), ("c", 5, "was-null")]
        got = self._diff(spark, a, b)
        assert got[("c", 1)] == ("TextMismatch", "/text: 3 -> 4")
        assert got[("c", 2)][0] == "TurnMissingInB"
        assert got[("c", 3)][0] == "TurnMissingInA"
        assert got[("c", 3)][1] == "/text: null -> 6"
        assert ("c", 4) not in got          # NULL == NULL: equal
        assert got[("c", 5)] == ("TextMismatch", "/text: null -> 8")
        assert ("c", 0) not in got

    def test_text_never_shuffles(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            transcript_diff)
        schema = "conv_id string, turn_idx int, text string"
        a = spark.createDataFrame([("c", 0, "payload " * 50)], schema)
        df = transcript_diff(a, a)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # both sides project to (keys, digest, length) before the join:
        # no Exchange may carry the text attribute itself
        for part in plan.split("Exchange")[1:]:
            assert "text#" not in part.split("\n")[0]
        assert df.count() == 0


class TestContextBudget:
    SCHEMA = "conv_id string, turn_idx int, text string"

    def test_flags_from_first_overflow(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            context_budget_violations)
        rows = [
            ("A", 0, "one two three"),    # 3 -> cum 3
            ("A", 1, "four five"),        # 2 -> cum 5
            ("A", 2, None),               # NULL text costs 0 -> cum 5
            ("A", 3, "six seven eight"),  # 3 -> cum 8  (first overflow)
            ("A", 4, "nine"),             # 1 -> cum 9
            ("B", 0, "a b c d e f g"),    # 7 -> cum 7 (first turn overflows)
            ("C", 0, "fits"),             # 1 -> never flagged
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = context_budget_violations(df, 6).collect()
        assert all(r.code == "ContextBudgetExceeded" and
                   r.instance_path == "/text" for r in out)
        got = sorted((r.conv_id, r.turn_idx, r.message) for r in out)
        assert got == [
            ("A", 3, "/text: cumulative 8 whitespace tokens exceeds "
                     "context budget 6"),
            ("A", 4, "/text: cumulative 9 whitespace tokens exceeds "
                     "context budget 6"),
            ("B", 0, "/text: cumulative 7 whitespace tokens exceeds "
                     "context budget 6"),
        ]

    def test_overhead_counts_per_turn(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            context_budget_violations)
        # 3 turns x (1 token + 2 overhead) = cum 3, 6, 9
        rows = [("A", i, "t") for i in range(3)]
        df = spark.createDataFrame(rows, self.SCHEMA)
        got = sorted(r.turn_idx for r in context_budget_violations(
            df, 6, per_turn_overhead=2).collect())
        assert got == [2]

    def test_single_skinny_exchange(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            context_budget_violations)
        df = spark.createDataFrame(
            [("A", 0, "payload " * 50)], self.SCHEMA)
        v = context_budget_violations(df, 10)
        plan = v._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
        # the exchange carries (conv_id, turn_idx, bigint) - never text
        for part in plan.split("Exchange")[1:]:
            assert "text#" not in part.split("\n")[0]
        assert v.count() == 1

    def test_duplicate_idx_ties_share_inclusive_cumsum(self, spark):
        # RANGE frame (the ANSI default): both rows of a duplicated
        # turn_idx see the same inclusive cumulative value, so output is
        # deterministic even on tables that also fail uniqueness
        from json_schema_rs_spark.operators.table_checks import (
            context_budget_violations)
        rows = [("A", 0, "a b"), ("A", 1, "c d"), ("A", 1, "e f")]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = context_budget_violations(df, 3).collect()
        # cum at idx 1 = 2 + 2 + 2 = 6 for BOTH tied rows
        assert sorted((r.turn_idx, r.message) for r in out) == [
            (1, "/text: cumulative 6 whitespace tokens exceeds "
                "context budget 3"),
            (1, "/text: cumulative 6 whitespace tokens exceeds "
                "context budget 3"),
        ]


class TestViolationTrend:
    def test_rates_by_bucket_and_code(self, spark):
        import datetime as dt
        from json_schema_rs_spark.operators.table_checks import (
            violation_trend)
        d1 = dt.datetime(2026, 3, 1, 10, 0)
        d2 = dt.datetime(2026, 3, 2, 9, 30)
        tx = spark.createDataFrame(
            [("A", 0, d1), ("A", 1, d1), ("B", 0, d1), ("B", 1, d2),
             ("C", 0, d2)],
            "conv_id string, turn_idx int, ts timestamp")
        viols = spark.createDataFrame(
            [("A", 0, "/text", "TooShort", "m"),
             ("A", 1, "/text", "TooShort", "m"),
             ("A", 1, "/role", "NotInEnum", "m"),
             ("B", 1, "/text", "TooShort", "m"),
             # conversation-scoped row: no turn -> excluded from the trend
             ("B", None, "", "TooFewTurns", "m")],
            "conv_id string, turn_idx int, instance_path string, "
            "code string, message string")
        got = {(r.window_start.day, r.code):
               (r.n_violations, r.n_turns, r.violation_rate)
               for r in violation_trend(tx, viols).collect()}
        assert got == {
            (1, "TooShort"): (2, 3, round(2 / 3, 6)),
            (1, "NotInEnum"): (1, 3, round(1 / 3, 6)),
            (2, "TooShort"): (1, 2, 0.5),
        }

    def test_zero_violation_run_is_empty(self, spark):
        import datetime as dt
        from json_schema_rs_spark.operators.table_checks import (
            violation_trend)
        tx = spark.createDataFrame(
            [("A", 0, dt.datetime(2026, 3, 1))],
            "conv_id string, turn_idx int, ts timestamp")
        empty_v = spark.createDataFrame(
            [], "conv_id string, turn_idx int, instance_path string, "
                "code string, message string")
        assert violation_trend(tx, empty_v).count() == 0


class TestReindexTurns:
    """reindex_turns: dense-renumber repair (dedupe + gap-fill)."""

    def _run(self, ddf, **kw):
        from json_schema_rs_spark.operators.table_checks import reindex_turns
        out = reindex_turns(ddf, order_cols=("ts", "text"), **kw)
        return {(r.conv_id, r.turn_idx): (r.orig_turn_idx, r.text)
                for r in out.collect()}, out

    def test_drop_duplicates_and_fill_gaps(self, ddf):
        got, out = self._run(ddf)
        # clean conversation untouched
        assert got[("A", 0)] == (0, "s")
        assert got[("A", 1)] == (1, "u")
        assert got[("A", 2)] == (2, "a")
        # B: duplicate key 1 resolved by (ts, text) order — tie on ts,
        # "dup" < "u" -> the narrator row survives; gap at 2 closed
        assert got[("B", 0)] == (0, "s")
        assert got[("B", 1)] == (1, "dup")
        assert got[("B", 2)] == (3, "a")
        assert ("B", 3) not in got
        # C: offset start 1,2 -> 0,1
        assert got[("C", 0)] == (1, "u")
        assert got[("C", 1)] == (2, "t")
        assert len(got) == 3 + 3 + 2
        # dtype of the repaired index matches the input column
        assert dict(out.dtypes)["turn_idx"] == "int"

    def test_keep_duplicate_keys(self, ddf):
        got, _ = self._run(ddf, keep_duplicate_keys=True)
        assert len(got) == 9
        # duplicates become consecutive distinct turns in sort order
        assert got[("B", 1)] == (1, "dup")
        assert got[("B", 2)] == (1, "u")
        assert got[("B", 3)] == (3, "a")

    def test_single_exchange(self, ddf):
        from json_schema_rs_spark.operators.table_checks import reindex_turns
        out = reindex_turns(ddf, order_cols=("ts", "text"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        # both window passes share the conv partitioning: ONE exchange
        assert plan.count("Exchange") == 1


class TestHotKeyStats:
    def test_ranks_and_flags(self, spark):
        from json_schema_rs_spark.operators.table_checks import hot_key_stats
        # conv H: 60 rows (hot), A/B/C: 10/10/20 -> mean 25, hot_factor 2
        rows = ([("H",)] * 60 + [("A",)] * 10 + [("B",)] * 10 + [("C",)] * 20)
        df = spark.createDataFrame(rows, "conv_id string")
        got = hot_key_stats(df, ("conv_id",), top=3, hot_factor=2.0).collect()
        assert [(r.conv_id, r.n_rows, r.is_hot) for r in got] == [
            ("H", 60, True), ("C", 20, False), ("A", 10, False)]
        assert got[0].frac == pytest.approx(0.6)
        assert got[0].skew_ratio == pytest.approx(2.4)

    def test_tie_break_is_total(self, spark):
        from json_schema_rs_spark.operators.table_checks import hot_key_stats
        rows = [("B",)] * 5 + [("A",)] * 5 + [("C",)] * 5
        df = spark.createDataFrame(rows, "conv_id string")
        got = [r.conv_id for r in
               hot_key_stats(df, ("conv_id",), top=2).collect()]
        assert got == ["A", "B"]

    def test_plan_shape(self, spark):
        from json_schema_rs_spark.operators.table_checks import hot_key_stats
        df = spark.range(1000).select((F.col("id") % 7).alias("k"))
        out = hot_key_stats(df, ("k",), top=5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # totals attach via broadcast; top-N is TakeOrdered, no global sort
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        assert "TakeOrderedAndProject" in plan


class TestTreeViolations:
    # conv "ok": valid binary tree (root 0; 1,2 -> 0; 3 -> 1)
    # conv "fw": turn 2's parent is itself -> ForwardParent
    # conv "or": turn 2 references absent backward parent -3 -> OrphanParent
    # conv "mr": two NULL-parent turns -> MultipleRoots
    # conv "nr": no NULL-parent turn; 0 -> 1 is also a forward edge
    ROWS = [
        ("ok", 0, None), ("ok", 1, 0), ("ok", 2, 0), ("ok", 3, 1),
        ("fw", 0, None), ("fw", 1, 0), ("fw", 2, 2),
        ("or", 0, None), ("or", 1, 0), ("or", 2, -3),
        ("mr", 0, None), ("mr", 1, None), ("mr", 2, 1),
        ("nr", 0, 1), ("nr", 1, 0),
    ]

    def _got(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            tree_violations)
        df = spark.createDataFrame(
            self.ROWS, "conv_id string, turn_idx int, parent_idx int")
        key = lambda t: (t[0], t[1] is None, t[1] or 0, t[2])  # noqa: E731
        return sorted(((r["conv_id"], r["turn_idx"], r["code"])
                       for r in tree_violations(df).collect()), key=key)

    def test_all_codes_fire_exactly_where_expected(self, spark):
        got = self._got(spark)
        assert got == sorted([
            ("fw", 2, "ForwardParent"),
            ("or", 2, "OrphanParent"),
            ("mr", None, "MultipleRoots"),
            ("nr", 0, "ForwardParent"),   # 0 -> 1 goes forward
            ("nr", None, "NoRoot"),
        ], key=lambda t: (t[0], t[1] is None, t[1] or 0, t[2]))

    def test_valid_tree_is_silent(self, spark):
        got = self._got(spark)
        assert not [g for g in got if g[0] == "ok"]

    def test_messages_and_paths(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            tree_violations)
        df = spark.createDataFrame(
            self.ROWS, "conv_id string, turn_idx int, parent_idx int")
        rows = {(r["conv_id"], r["code"]): r
                for r in tree_violations(df).collect()}
        fw = rows[("fw", "ForwardParent")]
        assert fw["instance_path"] == "/parent_idx"
        assert fw["message"] == \
            "/parent_idx: parent 2 does not precede turn 2"
        orp = rows[("or", "OrphanParent")]
        assert orp["message"] == \
            "/parent_idx: parent -3 not found in conversation"
        mr = rows[("mr", "MultipleRoots")]
        assert mr["instance_path"] == ""
        assert mr["message"] == \
            "root: conversation has 2 root turns, expected exactly 1"
        assert rows[("nr", "NoRoot")]["message"] == \
            "root: conversation has 0 root turns, expected exactly 1"

    def test_no_cartesian_in_orphan_join(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            tree_violations)
        df = spark.createDataFrame(
            self.ROWS, "conv_id string, turn_idx int, parent_idx int")
        plan = (tree_violations(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Cartesian" not in plan
        assert "BroadcastNestedLoop" not in plan


class TestNearRetryViolations:
    ROWS = [
        # conv "a": assistant turn 2 is a near-dup rewrite of turn 0
        # (5 of 6 distinct words shared -> J = 5/7), user turn between
        ("a", 0, "assistant", "the sky is very blue today"),
        ("a", 1, "user", "unrelated question entirely here"),
        ("a", 2, "assistant", "the sky is very blue tonight"),
        # conv "b": byte-identical repeat -> NOT flagged (loop territory)
        ("b", 0, "assistant", "same text"),
        ("b", 1, "assistant", "same text"),
        # conv "c": different role, near-dup text -> NOT flagged
        ("c", 0, "user", "alpha beta gamma delta"),
        ("c", 1, "assistant", "alpha beta gamma epsilon"),
        # conv "d": J exactly at the 0.5 threshold (2 shared, 2 unique
        # each: i=2, u=6... use 3 shared of 4/4: i=3 u=5 -> 0.6) and a
        # clearly-below pair
        ("d", 0, "tool", "w1 w2 w3 w4"),
        ("d", 1, "tool", "w1 w2 w3 w9"),          # J=3/5=0.6 -> fires
        ("d", 2, "tool", "x1 x2 x3 x4"),          # J=3/5 vs turn 1? no:
        # turn 2 vs turn 1 share nothing -> silent
        # NULL text never fires
        ("e", 0, "assistant", None),
        ("e", 1, "assistant", None),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.ROWS, "conv_id string, turn_idx int, role string, "
                       "text string")

    def test_flags_exactly_the_near_dups(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            near_retry_violations)
        got = sorted((r["conv_id"], r["turn_idx"], r["prev_idx"],
                      r["code"], r["jaccard"])
                     for r in near_retry_violations(self._df(spark))
                     .collect())
        assert got == [
            ("a", 2, 0, "NearDuplicateTurn", round(5 / 7, 6)),
            ("d", 1, 0, "NearDuplicateTurn", 0.6),
        ]

    def test_message_and_path(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            near_retry_violations)
        rows = {r["conv_id"]: r
                for r in near_retry_violations(self._df(spark)).collect()}
        assert rows["a"]["instance_path"] == "/text"
        assert rows["a"]["message"] == \
            "/text: near-duplicate of same-role turn 0"

    def test_threshold_boundary_inclusive(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            near_retry_violations)
        df = spark.createDataFrame(
            [("z", 0, "a", "p q"), ("z", 1, "a", "p r")],
            "conv_id string, turn_idx int, role string, text string")
        # i=1 (p), u=3 (p q r) -> 1/3 < 0.5 silent; at min_jaccard=1/3 fires
        assert near_retry_violations(df).collect() == []
        got = near_retry_violations(df, min_jaccard=1 / 3).collect()
        assert len(got) == 1 and got[0]["turn_idx"] == 1

    def test_single_exchange_plan(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            near_retry_violations)
        plan = (near_retry_violations(self._df(spark))
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") <= 2  # hash + the test-input round
        assert "Join" not in plan


class TestReviewQueue:
    def _violations(self, spark, n=50, parts=8):
        rows = [(f"c{i}", i % 7, "/text", "TooLong" if i % 3 else "NotInEnum",
                 f"msg {i}") for i in range(n)]
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, instance_path string, "
                  "code string, message string").repartition(parts)

    def _brute(self, spark, df, per_code):
        import hashlib
        rows = df.collect()
        def rk(r):
            s = "#".join([r["conv_id"] or "<NULL>",
                          str(r["turn_idx"]) if r["turn_idx"] is not None
                          else "<NULL>",
                          r["instance_path"] or "", r["code"]])
            return hashlib.md5(s.encode()).hexdigest()
        by_code = {}
        for r in sorted(rows, key=rk):
            q = by_code.setdefault(r["code"], [])
            if len(q) < per_code:
                q.append((r["conv_id"], r["turn_idx"], r["code"],
                          len(q) + 1))
        return sorted(x for q in by_code.values() for x in q)

    def test_exact_and_layout_independent(self, spark):
        from json_schema_rs_spark.operators.table_checks import review_queue
        df = self._violations(spark)
        got = sorted((r["conv_id"], r["turn_idx"], r["code"],
                      r["review_rank"])
                     for r in review_queue(df, per_code=5).collect())
        assert got == self._brute(spark, df, 5)
        # different partition layout, same result
        got2 = sorted((r["conv_id"], r["turn_idx"], r["code"],
                       r["review_rank"])
                      for r in review_queue(df.repartition(3),
                                            per_code=5).collect())
        assert got2 == got

    def test_small_groups_survive_whole(self, spark):
        from json_schema_rs_spark.operators.table_checks import review_queue
        df = self._violations(spark, n=6)
        got = review_queue(df, per_code=100).collect()
        assert len(got) == 6  # fewer rows than per_code: all kept

    def test_rank_contiguous_from_one(self, spark):
        from json_schema_rs_spark.operators.table_checks import review_queue
        rows = review_queue(self._violations(spark), per_code=4).collect()
        by_code = {}
        for r in rows:
            by_code.setdefault(r["code"], []).append(r["review_rank"])
        for ranks in by_code.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))

    def test_final_window_input_is_pruned(self, spark):
        from json_schema_rs_spark.operators.table_checks import review_queue
        df = self._violations(spark, n=400, parts=4)
        plan = (review_queue(df, per_code=3)
                ._jdf.queryExecution().executedPlan().toString())
        # the local top-N phase runs before the one window exchange
        assert "MapInPandas" in plan or "ArrowEvalPython" in plan
        assert plan.count("Window [") == 1
        # and the Python local-top-N phase sits BELOW the window exchange
        assert plan.index("MapInPandas") > plan.index("Window [")


class TestTrendAnomalies:
    def _trend(self, spark, rates, code="TooLong"):
        import datetime as dt
        rows = [(dt.datetime(2026, 1, 1 + i), code, 1, 100,
                 round(r, 6)) for i, r in enumerate(rates)]
        return spark.createDataFrame(
            rows, "window_start timestamp, code string, "
                  "n_violations bigint, n_turns bigint, "
                  "violation_rate double")

    def test_spike_flagged_flat_history_silent(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            trend_anomalies)
        # noisy-but-stable history, then a real spike
        got = trend_anomalies(
            self._trend(spark, [0.01, 0.012, 0.011, 0.009, 0.25]),
            z=3.0).collect()
        assert len(got) == 1
        r = got[0]
        assert r["violation_rate"] == 0.25 and r["n_history"] == 4
        assert r["mean_rate"] == round((0.01 + 0.012 + 0.011 + 0.009) / 4, 6)

    def test_zero_std_any_increase_flags(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            trend_anomalies)
        got = trend_anomalies(
            self._trend(spark, [0.01, 0.01, 0.01, 0.0100041]),
            z=3.0).collect()
        assert [r["violation_rate"] for r in got] == [0.010004]

    def test_min_history_gate(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            trend_anomalies)
        # the spike is the 3rd point: only 2 prior buckets -> suppressed
        got = trend_anomalies(self._trend(spark, [0.01, 0.01, 0.9]),
                              z=3.0).collect()
        assert got == []

    def test_codes_independent(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            trend_anomalies)
        a = self._trend(spark, [0.01, 0.01, 0.01, 0.5], code="A")
        b = self._trend(spark, [0.5, 0.5, 0.5, 0.5], code="B")
        got = trend_anomalies(a.unionByName(b)).collect()
        assert [(r["code"], r["violation_rate"]) for r in got] == \
            [("A", 0.5)]

    def test_decrease_never_flags(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            trend_anomalies)
        got = trend_anomalies(
            self._trend(spark, [0.5, 0.5, 0.5, 0.0001])).collect()
        assert got == []


class TestCoerceVocabulary:
    def _df(self, spark):
        return spark.createDataFrame(
            [("A", 0, "system"), ("A", 1, "narrator"),
             ("B", 0, None), ("B", 1, "user")],
            "conv_id string, turn_idx int, role string")

    VOCAB = ["system", "user", "assistant", "tool"]

    def test_literal_vocab_coerces_and_marks(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            coerce_vocabulary)
        out = {(r["conv_id"], r["turn_idx"]): r for r in
               coerce_vocabulary(self._df(spark), "role", self.VOCAB,
                                 fallback="unknown").collect()}
        assert out[("A", 1)]["role"] == "unknown"
        assert out[("A", 1)]["was_coerced"]
        assert out[("A", 0)]["role"] == "system"
        assert not out[("A", 0)]["was_coerced"]
        # NULL passes through: never a referential violation
        assert out[("B", 0)]["role"] is None
        assert not out[("B", 0)]["was_coerced"]

    def test_repaired_table_passes_the_check(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            coerce_vocabulary, referential_violations)
        fixed = coerce_vocabulary(self._df(spark), "role",
                                  self.VOCAB + ["unknown"],
                                  fallback="unknown")
        assert referential_violations(
            fixed, "role", self.VOCAB + ["unknown"]).collect() == []

    def test_dataframe_vocab_broadcast(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            coerce_vocabulary)
        vocab = spark.createDataFrame([(v,) for v in self.VOCAB],
                                      "role string")
        out = coerce_vocabulary(self._df(spark), "role", vocab,
                                fallback=None)
        rows = {(r["conv_id"], r["turn_idx"]): r for r in out.collect()}
        assert rows[("A", 1)]["role"] is None
        assert rows[("A", 1)]["was_coerced"]
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan
        assert "SortMergeJoin" not in plan

    def test_literal_vocab_zero_shuffle(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            coerce_vocabulary)
        plan = (coerce_vocabulary(self._df(spark), "role", self.VOCAB)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan and "Join" not in plan


class TestPsiMatrix:
    def test_pairwise_matches_two_sample_psi(self, spark):
        import random
        rng = random.Random(11)
        rows = ([("s1", rng.gauss(10, 2)) for _ in range(300)]
                + [("s2", rng.gauss(13, 2)) for _ in range(250)]
                + [("s3", rng.gauss(10, 2)) for _ in range(200)])
        df = spark.createDataFrame(rows, "source string, v double")
        mat = {(r["src_a"], r["src_b"]): r for r in
               S.psi_matrix(df, "v", lo=0.0, hi=20.0,
                            nbins=10).collect()}
        assert set(mat) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
        for (a, b), r in mat.items():
            two = S.psi(df.filter(F.col("source") == a),
                        df.filter(F.col("source") == b),
                        "v", lo=0.0, hi=20.0, nbins=10).collect()[0]
            assert abs(r["psi"] - two["psi"]) < 1e-6
            assert (r["n_a"], r["n_b"]) == (two["n_a"], two["n_b"])
        # same-distribution pair drifts less than the shifted pair
        assert mat[("s1", "s3")]["psi"] < mat[("s1", "s2")]["psi"]
        assert mat[("s1", "s2")]["psi"] > 0.25

    def test_null_groups_and_values_dropped(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", None), (None, 2.0), ("b", 3.0)],
            "source string, v double")
        rows = S.psi_matrix(df, "v", lo=0.0, hi=4.0, nbins=4).collect()
        assert len(rows) == 1
        assert (rows[0]["n_a"], rows[0]["n_b"]) == (1, 1)

    def test_one_corpus_scan(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("b", 2.0)], "source string, v double")
        plan = (S.psi_matrix(df, "v", lo=0.0, hi=4.0, nbins=4)
                ._jdf.queryExecution().executedPlan().toString())
        # the corpus scan happened once, at the eager checkpoint; the
        # matrix plan reads only the checkpointed (group, bin) counts
        assert "ExistingRDD[source" not in plan
        assert "CartesianProduct" not in plan


class TestExactQuantiles:
    def test_differential_vs_duckdb(self, spark):
        import random
        import duckdb
        from json_schema_rs_spark.operators.stats import exact_quantiles
        rng = random.Random(11)
        vals = ([rng.uniform(-50, 50) for _ in range(400)]
                + [3.5] * 57 + [-7.25] * 23)      # heavy duplicates
        rng.shuffle(vals)
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        qs = (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
        got = {r["q"]: r["value"] for r in
               exact_quantiles(df, "x", qs, bins=16,
                               max_collect=8).collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest(?) AS x", [vals])
        for q in qs:
            want = con.execute(
                "SELECT quantile_disc(x, ?) FROM t", [q]).fetchone()[0]
            assert got[q] == want, (q, got[q], want)

    def test_tiny_buckets_force_rounds(self, spark):
        from json_schema_rs_spark.operators.stats import exact_quantiles
        df = spark.createDataFrame([(float(i),) for i in range(1000)],
                                   "x double")
        out = {r["q"]: r["value"] for r in
               exact_quantiles(df, "x", (0.5,), bins=4,
                               max_collect=2).collect()}
        assert out[0.5] == 499.0                  # ceil(0.5*1000)-1
    def test_constant_and_empty(self, spark):
        from json_schema_rs_spark.operators.stats import exact_quantiles
        const = spark.createDataFrame([(5.0,)] * 9, "x double")
        r = exact_quantiles(const, "x", (0.5,)).collect()[0]
        assert r["value"] == 5.0 and r["n"] == 9
        empty = spark.createDataFrame([], "x double")
        r = exact_quantiles(empty, "x", (0.5,)).collect()[0]
        assert r["value"] is None and r["n"] == 0
        withnull = spark.createDataFrame([(None,), (2.0,)], "x double")
        r = exact_quantiles(withnull, "x", (1.0,)).collect()[0]
        assert r["value"] == 2.0 and r["n"] == 1


class TestExactCorr:
    def test_matches_numpy(self, spark):
        import numpy as np
        from json_schema_rs_spark.operators.stats import exact_corr
        rng = np.random.RandomState(3)
        x = np.round(rng.uniform(0, 1, 300), 6)
        y = np.round(0.7 * x + 0.3 * rng.uniform(0, 1, 300), 6)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)],
            "x double, y double")
        r = exact_corr(df, "x", "y").collect()[0]
        assert r["n"] == 300
        assert r["r"] == round(float(np.corrcoef(x, y)[0, 1]), 6)

    def test_grouped_nulls_and_zero_variance(self, spark):
        from json_schema_rs_spark.operators.stats import exact_corr
        rows = ([("a", float(i), float(2 * i)) for i in range(10)]
                + [("b", 5.0, float(i)) for i in range(10)]   # x const
                + [("a", None, 1.0), ("a", 1.0, None)])       # dropped
        df = spark.createDataFrame(rows, "g string, x double, y double")
        out = {r["g"]: r for r in
               exact_corr(df, "x", "y", group_col="g").collect()}
        assert out["a"]["n"] == 10 and out["a"]["r"] == 1.0
        assert out["b"]["r"] is None                # zero variance

    def test_one_exchange_group_sized(self, spark):
        from json_schema_rs_spark.operators.stats import exact_corr
        df = spark.createDataFrame([("a", 1.0, 2.0)],
                                   "g string, x double, y double")
        plan = (exact_corr(df, "x", "y", group_col="g")
                ._jdf.queryExecution().executedPlan().toString())
        assert "Join" not in plan and "Python" not in plan


class TestExactQuantilesBy:
    def test_differential_vs_duckdb_per_group(self, spark):
        import random
        import duckdb
        from json_schema_rs_spark.operators.stats import exact_quantiles_by
        rng = random.Random(5)
        rows = []
        for g, n in (("a", 217), ("b", 64), ("c", 5)):
            vs = [rng.uniform(-10, 10) for _ in range(n)] + [1.25] * 11
            rows += [(g, v) for v in vs]
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, "g string, x double")
        qs = (0.1, 0.5, 0.95)
        got = {(r["g"], r["q"]): r["value"] for r in
               exact_quantiles_by(df, "g", "x", qs, bins=8,
                                  max_collect=4).collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE t (g VARCHAR, x DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        for g in ("a", "b", "c"):
            for q in qs:
                want = con.execute(
                    "SELECT quantile_disc(x, ?) FROM t WHERE g = ?",
                    [q, g]).fetchone()[0]
                assert got[(g, q)] == want, (g, q, got[(g, q)], want)

    def test_constant_group_and_row_counts(self, spark):
        from json_schema_rs_spark.operators.stats import exact_quantiles_by
        df = spark.createDataFrame(
            [("k", 7.0)] * 5 + [("m", 1.0), ("m", 2.0)],
            "g string, x double")
        out = {(r["g"], r["q"]): (r["value"], r["n"]) for r in
               exact_quantiles_by(df, "g", "x", (0.5,)).collect()}
        assert out[("k", 0.5)] == (7.0, 5)
        assert out[("m", 0.5)] == (1.0, 2)   # ceil(0.5*2)-1 = 0


class TestWinsorize:
    def test_clip_values_flags_and_dtype(self, spark):
        from json_schema_rs_spark.operators.stats import winsorize
        rows = [(i, v) for i, v in enumerate(
            [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
        df = spark.createDataFrame(rows, "id long, v int")
        out = winsorize(df, "v", 0.1, 0.9)
        assert dict(out.dtypes)["v_winsorized"] == "int"  # dtype kept
        got = {r.id: (r.v_winsorized, r.was_clipped)
               for r in out.collect()}
        # n=10: rank(0.1)=ceil(1)-1=0 -> lo=1; rank(0.9)=ceil(9)-1=8 -> hi=9
        assert got[9] == (9, True)     # 1000 clipped to p90
        assert got[0] == (1, False)
        assert all(not c for i, (_, c) in got.items() if i != 9)

    def test_null_passthrough_and_empty(self, spark):
        from json_schema_rs_spark.operators.stats import winsorize
        df = spark.createDataFrame([(1, None), (2, 5.0), (3, -99.0)],
                                   "id long, v double")
        got = {r.id: (r.v_winsorized, r.was_clipped)
               for r in winsorize(df, "v", 0.5, 0.5).collect()}
        assert got[1] == (None, False)
        # both quantiles = median (5.0 at n=2? ranks: ceil(0.5*2)-1=0 -> -99)
        empty = spark.createDataFrame([], "id long, v double")
        out = winsorize(empty, "v").collect()
        assert out == []

    def test_matches_sorted_rank_definition(self, spark):
        from json_schema_rs_spark.operators.stats import winsorize
        import math, random
        rng = random.Random(11)
        vals = [rng.uniform(-50, 50) for _ in range(137)]
        df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                   "id long, v double")
        sv = sorted(vals)
        n = len(sv)
        lo = sv[max(math.ceil(0.05 * n) - 1, 0)]
        hi = sv[max(math.ceil(0.95 * n) - 1, 0)]
        got = {r.id: r.v_winsorized
               for r in winsorize(df, "v", 0.05, 0.95).collect()}
        for i, v in enumerate(vals):
            assert got[i] == min(max(v, lo), hi)

    def test_repair_plan_is_zero_shuffle(self, spark):
        from json_schema_rs_spark.operators.stats import winsorize
        df = spark.createDataFrame([(i, float(i)) for i in range(50)],
                                   "id long, v double")
        plan = winsorize(df, "v")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan


class TestHistogram:
    def test_dense_bins_clamp_and_frac(self, spark):
        from json_schema_rs_spark.operators.stats import histogram
        df = spark.createDataFrame(
            [(float(v),) for v in [-5, 0, 1, 9, 10, 19, 25, 99]]
            + [(None,)], "v double")
        out = [(r.bin, r.lo_edge, r.hi_edge, r.n, r.frac)
               for r in histogram(df, "v", lo=0.0, hi=20.0,
                                  nbins=2).collect()]
        # -5 clamps into bin 0; 25/99 clamp into bin 1; NULL dropped
        assert out == [(0, 0.0, 10.0, 4, 0.5), (1, 10.0, 20.0, 4, 0.5)]

    def test_drop_mode_and_empty_bins_present(self, spark):
        from json_schema_rs_spark.operators.stats import histogram
        df = spark.createDataFrame([(0.0,), (25.0,)], "v double")
        out = {r.bin: r.n for r in histogram(
            df, "v", lo=0.0, hi=20.0, nbins=4, clamp=False).collect()}
        assert out == {0: 1, 1: 0, 2: 0, 3: 0}

    def test_matches_psi_binning(self, spark):
        # the histogram and the PSI that alerts on it share edge rules:
        # per-bin counts must agree with psi's internal binning
        from json_schema_rs_spark.operators.stats import histogram, psi
        import random
        rng = random.Random(5)
        rows = [(rng.uniform(-10, 110),) for _ in range(300)]
        df = spark.createDataFrame(rows, "v double")
        h = {r.bin: r.n for r in histogram(df, "v", lo=0.0, hi=100.0,
                                           nbins=10).collect()}
        assert sum(h.values()) == 300
        r = psi(df, df, "v", lo=0.0, hi=100.0, nbins=10).collect()[0]
        assert r.psi == 0.0 and r.n_a == 300


class TestMadOutliers:
    def test_flags_match_manual_mad(self, spark):
        from json_schema_rs_spark.operators.stats import mad_outliers
        import statistics
        vals = [10.0, 11.0, 12.0, 10.5, 11.5, 9.5, 10.2, 11.8, 50.0]
        df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                   "id long, v double")
        out = {r.id: r for r in mad_outliers(df, "v", k=3.5).collect()}
        sv = sorted(vals)
        import math
        med = sv[max(math.ceil(0.5 * len(sv)) - 1, 0)]
        devs = sorted(abs(v - med) for v in vals)
        mad = devs[max(math.ceil(0.5 * len(devs)) - 1, 0)]
        for i, v in enumerate(vals):
            expect = abs(v - med) > 3.5 * mad / 0.6745
            assert out[i].is_outlier == expect, (i, v)
        assert out[8].is_outlier  # the planted extreme

    def test_degenerate_mad_and_nulls(self, spark):
        from json_schema_rs_spark.operators.stats import mad_outliers
        df = spark.createDataFrame(
            [(0, 5.0), (1, 5.0), (2, 5.0), (3, 7.0), (4, None)],
            "id long, v double")
        out = {r.id: r for r in mad_outliers(df, "v").collect()}
        # MAD == 0: any deviation from the median is an outlier
        assert out[3].is_outlier is True and out[3].robust_z is None
        assert out[0].is_outlier is False
        assert out[4].is_outlier is False   # NULL unflagged


class TestSketchLedger:
    """sketch_snapshot + drift_from_sketches: drift from PERSISTED
    sketches, no corpus rescan — the 100 TB day-over-day monitor."""

    def _snapshots(self, spark):
        import random
        rng = random.Random(11)
        a = [(rng.gauss(0, 1), rng.uniform(0, 10)) for _ in range(4000)]
        b = [(rng.gauss(0.8, 1.0), rng.uniform(0, 10)) for _ in range(4000)]
        da = spark.createDataFrame(a, "x double, y double").repartition(8)
        db = spark.createDataFrame(b, "x double, y double").repartition(8)
        return da, db

    def test_ledger_roundtrip_drift_matches_direct_sketch(self, spark,
                                                          tmp_path):
        import json_schema_rs_spark.operators.stats as S
        da, db = self._snapshots(spark)
        ska = S.sketch_snapshot(da, ["x", "y"], snapshot_id="day1")
        skb = S.sketch_snapshot(db, ["x", "y"], snapshot_id="day2")
        # persist to the ledger and read back — drift from the ledger
        # rows must be BIT-IDENTICAL to drift from the fresh frames
        path = str(tmp_path / "sketch_ledger")
        ska.unionByName(skb).write.mode("overwrite").parquet(path)
        led = spark.read.parquet(path)
        fresh = {r.column: r for r in
                 S.drift_from_sketches(ska, skb).collect()}
        replay = {r.column: r for r in S.drift_from_sketches(
            led.filter("snapshot_id = 'day1'"),
            led.filter("snapshot_id = 'day2'")).collect()}
        assert set(fresh) == {"x", "y"}
        for c in fresh:
            assert fresh[c].ks == replay[c].ks
            assert fresh[c].w1 == replay[c].w1
        assert fresh["x"].n_a == 4000.0 and fresh["x"].n_b == 4000.0

    def test_sketch_drift_tracks_exact(self, spark):
        import json_schema_rs_spark.operators.stats as S
        da, db = self._snapshots(spark)
        ska = S.sketch_snapshot(da, ["x", "y"], snapshot_id="a")
        skb = S.sketch_snapshot(db, ["x", "y"], snapshot_id="b")
        got = {r.column: r for r in
               S.drift_from_sketches(ska, skb).collect()}
        ks_exact = S.ks_exact(da, db, "x").collect()[0].ks
        assert abs(got["x"].ks - ks_exact) < 0.03
        assert got["x"].ks > 0.25        # the x shift is detected
        assert got["y"].ks < 0.08        # y is same-distribution

    def test_shared_columns_only_and_cap(self, spark):
        import pytest as _pytest
        import json_schema_rs_spark.operators.stats as S
        da, db = self._snapshots(spark)
        ska = S.sketch_snapshot(da, ["x"], snapshot_id="a")
        skb = S.sketch_snapshot(db, ["x", "y"], snapshot_id="b")
        out = S.drift_from_sketches(ska, skb).collect()
        assert [r.column for r in out] == ["x"]   # y has no a-side sketch
        with _pytest.raises(ValueError, match="max_rows"):
            S.drift_from_sketches(ska, skb, max_rows=0)

    def test_all_null_column_emits_no_sketch_row(self, spark):
        import json_schema_rs_spark.operators.stats as S
        df = spark.createDataFrame([(1.0, None), (2.0, None)],
                                   "x double, z double")
        sk = S.sketch_snapshot(df, ["x", "z"], snapshot_id="s")
        assert [r.column for r in sk.collect()] == ["x"]
