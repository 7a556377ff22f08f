"""Conversation-protocol checks (role DFA, tool pairing, per-conversation
bounds) and the PSI / Jensen-Shannon / Wasserstein-1 drift measures —
exact-semantics unit tests plus physical-plan shape asserts."""

import datetime as dt
import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from json_schema_rs_spark.operators import stats as S
from json_schema_rs_spark.operators.table_checks import (
    conversation_bounds_violations,
    role_transition_violations,
    tool_pairing_violations,
)

SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts timestamp")

ALLOWED = [("system", "user"), ("user", "assistant"), ("assistant", "user"),
           ("assistant", "tool"), ("tool", "assistant"), ("tool", "tool")]
FIRST = ["system", "user"]

T0 = dt.datetime(2026, 1, 1)
M = dt.timedelta(minutes=1)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def convs(spark):
    rows = [
        # A: fully legal incl. a proper tool call/result pair
        ("A", 0, "system", "s", None, T0),
        ("A", 1, "user", "u", None, T0 + M),
        ("A", 2, "assistant", "a", "search", T0 + 2 * M),
        ("A", 3, "tool", "t", None, T0 + 3 * M),
        ("A", 4, "assistant", "a", None, T0 + 4 * M),
        # B: starts with assistant (BadFirstRole), then user->user
        ("B", 0, "assistant", "a", None, T0),
        ("B", 1, "user", "u", None, T0 + M),
        ("B", 2, "user", "u", None, T0 + 2 * M),
        # C: tool result with no call; assistant call with no result
        ("C", 0, "user", "u", None, T0),
        ("C", 1, "tool", "t", None, T0 + M),
        ("C", 2, "assistant", "a", "browse", T0 + 2 * M),
        # D: NULL role never violates the role DFA (required owns it)
        ("D", 0, None, "x", None, T0),
        ("D", 1, "user", "u", None, T0 + M),
    ]
    return spark.createDataFrame(rows, schema=SCHEMA).cache()


class TestRoleProtocol:
    def test_exact_violations(self, convs):
        got = {(r.conv_id, r.turn_idx, r.code)
               for r in role_transition_violations(
                   convs, ALLOWED, FIRST).collect()}
        assert got == {
            ("B", 0, "BadFirstRole"),
            ("B", 2, "BadRoleTransition"),
            # C1: user -> tool is not an allowed transition
            ("C", 1, "BadRoleTransition"),
            # D: neither turn violates — D0's NULL role is owned by the
            # row-local `required` check, and D1 sees a NULL predecessor
            # (lag returns D0's NULL role) so it validates under the
            # first-turn rule, where "user" is allowed
        }

    def test_messages(self, convs):
        rows = {(r.conv_id, r.turn_idx): r
                for r in role_transition_violations(
                    convs, ALLOWED, FIRST).collect()}
        b0 = rows[("B", 0)]
        assert b0.instance_path == "/role"
        assert b0.message == ('/role: conversation must start with one of '
                              '("system", "user"), got "assistant"')
        b2 = rows[("B", 2)]
        assert b2.message == '/role: transition "user" -> "user" not allowed'

    def test_single_skinny_exchange(self, convs):
        plan = _plan(role_transition_violations(convs, ALLOWED, FIRST))
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan  # transition set compiles to isin


class TestToolPairing:
    def test_exact_violations(self, convs):
        got = {(r.conv_id, r.turn_idx, r.code)
               for r in tool_pairing_violations(convs).collect()}
        assert got == {
            ("C", 1, "ToolResultWithoutCall"),
            ("C", 2, "ToolCallWithoutResult"),
        }

    def test_messages(self, convs):
        rows = {(r.conv_id, r.turn_idx): r
                for r in tool_pairing_violations(convs).collect()}
        c1 = rows[("C", 1)]
        assert c1.instance_path == "/role"
        assert c1.message == ('/role: "tool" turn not preceded by a '
                              '"assistant" turn calling a tool '
                              '(previous role: "user")')
        c2 = rows[("C", 2)]
        assert c2.instance_path == "/tool"
        assert c2.message == ('/tool: tool call "browse" not followed by '
                              'a "tool" turn')

    def test_call_at_conversation_end_is_orphan(self, spark):
        rows = [("E", 0, "user", "u", None, T0),
                ("E", 1, "assistant", "a", "grep", T0 + M)]
        df = spark.createDataFrame(rows, schema=SCHEMA)
        got = tool_pairing_violations(df).collect()
        assert [(r.conv_id, r.turn_idx, r.code) for r in got] == \
            [("E", 1, "ToolCallWithoutResult")]

    def test_single_skinny_exchange(self, convs):
        plan = _plan(tool_pairing_violations(convs))
        assert plan.count("Exchange hashpartitioning") == 1


class TestConversationBounds:
    def test_all_three_bounds(self, spark):
        rows = (
            [("short", i, "user", "u", None, T0 + i * M) for i in range(2)]
            + [("long", i, "user", "u", None, T0 + i * M) for i in range(9)]
            + [("slow", 0, "user", "u", None, T0),
               ("slow", 1, "user", "u", None, T0 + M),
               ("slow", 2, "user", "u", None, T0 + dt.timedelta(hours=3))]
            + [("ok", i, "user", "u", None, T0 + i * M) for i in range(4)]
        )
        df = spark.createDataFrame(rows, schema=SCHEMA)
        got = {(r.conv_id, r.code): r for r in conversation_bounds_violations(
            df, min_turns=3, max_turns=8,
            max_duration_seconds=3600).collect()}
        assert set(got) == {("short", "TooFewTurns"),
                            ("long", "TooManyTurns"),
                            ("slow", "ConversationTooLong")}
        assert all(r.turn_idx is None for r in got.values())
        assert got[("short", "TooFewTurns")].message == \
            "root: conversation has 2 turns, minimum is 3"
        assert got[("slow", "ConversationTooLong")].message == \
            "/ts: conversation spans 10800 seconds, maximum is 3600"

    def test_duration_counts_second_boundaries(self, spark):
        # 0.9s -> 2.1s: floor-per-endpoint = 2 boundary crossings, while
        # floor-of-difference would be 1 — the check uses the former
        rows = [("F", 0, "user", "u", None,
                 T0 + dt.timedelta(seconds=0, microseconds=900_000)),
                ("F", 1, "user", "u", None,
                 T0 + dt.timedelta(seconds=2, microseconds=100_000))]
        df = spark.createDataFrame(rows, schema=SCHEMA)
        got = conversation_bounds_violations(
            df, max_duration_seconds=1).collect()
        assert len(got) == 1
        assert "spans 2 seconds" in got[0].message

    def test_requires_a_bound(self, convs):
        with pytest.raises(ValueError):
            conversation_bounds_violations(convs)

    def test_one_aggregate_exchange(self, convs):
        plan = _plan(conversation_bounds_violations(convs, min_turns=1))
        assert plan.count("Exchange hashpartitioning") == 1
        assert "partial_count" in plan  # map-side combine absorbs skew


def _psi_manual(a, b, lo, hi, nbins, eps=1e-6):
    step = (hi - lo) / nbins
    bins = lambda xs: np.clip(((np.asarray(xs) - lo) // step).astype(int),
                              0, nbins - 1)
    pa = np.bincount(bins(a), minlength=nbins) / len(a)
    pb = np.bincount(bins(b), minlength=nbins) / len(b)
    pa, pb = np.maximum(pa, eps), np.maximum(pb, eps)
    return float(np.sum((pa - pb) * np.log(pa / pb)))


class TestPSI:
    def test_matches_manual(self, spark):
        rng = random.Random(3)
        a = [rng.uniform(0, 100) for _ in range(500)]
        b = [rng.uniform(20, 120) for _ in range(400)]
        da = spark.createDataFrame([(x,) for x in a], "v double")
        db = spark.createDataFrame([(x,) for x in b], "v double")
        r = S.psi(da, db, "v", lo=0.0, hi=100.0, nbins=10).collect()[0]
        assert abs(r.psi - _psi_manual(a, b, 0.0, 100.0, 10)) < 1e-9
        assert r.n_a == 500 and r.n_b == 400 and r.nbins == 10

    def test_identical_distribution_is_zero(self, spark):
        df = spark.range(1000).select((F.col("id") % 100).cast("double")
                                      .alias("v"))
        r = S.psi(df, df, "v", lo=0.0, hi=100.0, nbins=10).collect()[0]
        assert abs(r.psi) < 1e-12

    def test_empty_bin_uses_eps_not_inf(self, spark):
        da = spark.createDataFrame([(5.0,)] * 10, "v double")
        db = spark.createDataFrame([(95.0,)] * 10, "v double")
        r = S.psi(da, db, "v", lo=0.0, hi=100.0, nbins=10).collect()[0]
        assert math.isfinite(r.psi) and r.psi > 10  # 2 * (1-eps)*ln(1/eps)

    def test_out_of_range_clamps_to_edge_bins(self, spark):
        da = spark.createDataFrame([(-50.0,), (0.0,)], "v double")
        db = spark.createDataFrame([(999.0,), (99.0,)], "v double")
        r = S.psi(da, db, "v", lo=0.0, hi=100.0, nbins=10).collect()[0]
        # all of a in bin 0, all of b in bin 9 -> same as the eps case
        assert math.isfinite(r.psi) and r.psi > 10


class TestJSDivergence:
    def test_matches_manual_and_symmetric(self, spark):
        ca = {"x": 50, "y": 30, "z": 20}
        cb = {"x": 30, "y": 45, "w": 10}
        da = spark.createDataFrame(
            [(k,) for k, n in ca.items() for _ in range(n)], "role string")
        db = spark.createDataFrame(
            [(k,) for k, n in cb.items() for _ in range(n)], "role string")
        cats = set(ca) | set(cb)
        p = np.array([ca.get(c, 0) for c in sorted(cats)], float)
        q = np.array([cb.get(c, 0) for c in sorted(cats)], float)
        p, q = p / p.sum(), q / q.sum()
        m = (p + q) / 2
        kl = lambda u, v: float(np.sum(np.where(u > 0,
                                                u * np.log(u / v), 0.0)))
        want = 0.5 * kl(p, m) + 0.5 * kl(q, m)
        r = S.js_divergence(da, db, "role").collect()[0]
        assert abs(r.js - want) < 1e-9
        assert r.n_a == 100 and r.n_b == 85
        r2 = S.js_divergence(db, da, "role").collect()[0]
        assert abs(r.js - r2.js) < 1e-12

    def test_identical_zero_and_disjoint_ln2(self, spark):
        da = spark.createDataFrame([("x",)] * 7 + [("y",)] * 3, "c string")
        db = spark.createDataFrame([("u",)] * 5, "c string")
        same = S.js_divergence(da, da, "c").collect()[0].js
        assert abs(same) < 1e-12
        disjoint = S.js_divergence(da, db, "c").collect()[0].js
        assert abs(disjoint - math.log(2)) < 1e-12


class TestWasserstein1:
    def test_point_masses_distance(self, spark):
        da = spark.createDataFrame([(1.0,)] * 5, "v double")
        db = spark.createDataFrame([(4.5,)] * 3, "v double")
        w1 = S.wasserstein1_exact(da, db, "v").collect()[0].w1
        assert abs(w1 - 3.5) < 1e-12

    def test_matches_numpy(self, spark):
        rng = random.Random(5)
        a = [rng.gauss(0, 1) for _ in range(300)]
        b = [rng.gauss(0.7, 1.3) for _ in range(200)]
        da = spark.createDataFrame([(x,) for x in a], "v double")
        db = spark.createDataFrame([(x,) for x in b], "v double")
        got = S.wasserstein1_exact(da, db, "v").collect()[0].w1
        # manual: integrate |Fa - Fb| over the merged grid
        xs = np.array(sorted(set(a) | set(b)))
        sa, sb = np.sort(a), np.sort(b)
        fa = np.searchsorted(sa, xs, side="right") / len(a)
        fb = np.searchsorted(sb, xs, side="right") / len(b)
        want = float(np.sum(np.abs(fa - fb)[:-1] * np.diff(xs)))
        assert abs(got - want) < 1e-9

    def test_identical_is_zero(self, spark):
        df = spark.range(500).select(F.rand(seed=9).alias("v"))
        w1 = S.wasserstein1_exact(df, df, "v").collect()[0].w1
        assert abs(w1) < 1e-12

    def test_shift_equals_delta_for_same_shape(self, spark):
        # W1 between X and X + c is exactly |c|
        vals = [float(i) for i in range(100)]
        da = spark.createDataFrame([(x,) for x in vals], "v double")
        db = spark.createDataFrame([(x + 2.5,) for x in vals], "v double")
        w1 = S.wasserstein1_exact(da, db, "v").collect()[0].w1
        assert abs(w1 - 2.5) < 1e-9

    def test_sketch_close_to_exact(self, spark):
        rng = random.Random(11)
        a = [rng.gauss(0, 1) for _ in range(4000)]
        b = [rng.gauss(0.8, 1.0) for _ in range(4000)]
        da = spark.createDataFrame([(x,) for x in a],
                                   "v double").repartition(8)
        db = spark.createDataFrame([(x,) for x in b],
                                   "v double").repartition(8)
        exact = S.wasserstein1_exact(da, db, "v").collect()[0].w1
        approx = S.w1_sketch(da, db, "v")
        assert abs(approx - exact) < 0.05 * max(exact, 1.0)
        assert approx > 0.5  # the 0.8 shift is detected

    def test_sketch_same_digest_is_zero(self):
        from json_schema_rs_spark.functions.tdigest import (
            TDigest,
            w1_from_digests,
        )
        d = TDigest(100)
        d.add(np.arange(1000, dtype=float))
        assert w1_from_digests(d, d) == 0.0


class TestConversationProfile:
    def test_values_and_single_exchange(self, spark):
        from json_schema_rs_spark.operators.table_checks import (
            conversation_profile,
        )
        rows = [
            ("A", 0, "user", "hello", None, T0),
            ("A", 1, "assistant", "hi!", "search", T0 + M),
            ("A", 2, "tool", None, None, T0 + 2 * M),
            ("B", 5, "user", "yo", None, T0),
        ]
        df = spark.createDataFrame(rows, schema=SCHEMA)
        prof = {r.conv_id: r for r in conversation_profile(df).collect()}
        a = prof["A"]
        assert (a.n_turns, a.min_idx, a.max_idx) == (3, 0, 2)
        assert a.duration_s == 120
        assert a.n_roles == 3
        assert (a.user_turns, a.assistant_turns) == (1, 1)
        assert a.total_text_chars == 8  # 'hello' + 'hi!' ; NULL -> 0
        assert abs(a.avg_text_len - 4.0) < 1e-12  # NULL excluded from avg
        assert a.tool_calls == 1
        b = prof["B"]
        assert (b.n_turns, b.min_idx, b.max_idx, b.duration_s) == (1, 5, 5, 0)
        plan = _plan(conversation_profile(df))
        assert plan.count("Exchange hashpartitioning") == 1
        assert "partial_count" in plan  # map-side combine, single pass


# ---------------------------------------------------------------------------
# turn_loop_stats (stuck-agent loop detection)
# ---------------------------------------------------------------------------

def _loops(spark, rows):
    from json_schema_rs_spark.operators.table_checks import turn_loop_stats
    df = spark.createDataFrame(
        [(c, i, r, t, None, T0 + i * M) for (c, i, r, t) in rows], SCHEMA)
    return {r["conv_id"]: r.asDict() for r in turn_loop_stats(df).collect()}


def test_turn_loops_interleaved_repeats(spark):
    # the assistant repeats itself with user turns wedged between —
    # the interleaving must NOT reset the streak
    got = _loops(spark, [
        ("c1", 0, "user", "hi"),
        ("c1", 1, "assistant", "let me retry"),
        ("c1", 2, "user", "still broken"),
        ("c1", 3, "assistant", "let me retry"),
        ("c1", 4, "user", "still broken"),
        ("c1", 5, "assistant", "let me retry"),
    ])["c1"]
    assert got["n_turns"] == 6
    assert got["loop_turns"] == 3    # 2 assistant repeats + 1 user repeat
    assert got["max_run"] == 3       # 'let me retry' x3
    assert got["verdict"] == "loop"


def test_turn_loops_clean_conversation(spark):
    got = _loops(spark, [
        ("c2", 0, "user", "a"),
        ("c2", 1, "assistant", "b"),
        ("c2", 2, "user", "c"),
        ("c2", 3, "assistant", "d"),
    ])["c2"]
    assert (got["loop_turns"], got["max_run"], got["verdict"]) == (0, 1, "ok")


def test_turn_loops_null_text_never_loops_null_roles_group(spark):
    got = _loops(spark, [
        ("c3", 0, "user", None),
        ("c3", 1, "user", None),         # NULL text: not a loop
        ("c3", 2, None, "x"),
        ("c3", 3, None, "x"),            # NULL roles compare as one role
    ])["c3"]
    assert got["loop_turns"] == 1
    assert got["max_run"] == 2
    # ratio 0.25 < 0.3 and run 2 < 3 -> ok
    assert got["verdict"] == "ok"


def test_turn_loops_ratio_trigger(spark):
    # short conversation, 1/2 turns repeated -> ratio 0.5 >= 0.3
    got = _loops(spark, [
        ("c4", 0, "assistant", "z"),
        ("c4", 1, "assistant", "z"),
    ])["c4"]
    assert got["loop_ratio"] == 0.5 and got["verdict"] == "loop"


def test_turn_loops_one_exchange(spark):
    from json_schema_rs_spark.operators.table_checks import turn_loop_stats
    df = spark.createDataFrame(
        [("c", i, "user", "t", None, T0) for i in range(10)], SCHEMA)
    plan = turn_loop_stats(df)._jdf.queryExecution() \
        .executedPlan().toString()
    # the window's conv_id partitioning is reused by the aggregate
    assert plan.count("Exchange") == 1
