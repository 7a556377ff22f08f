"""Greedy contiguous sequence packing (operators/packing.py).

Expected pack assignments are recomputed by a plain-Python streaming
concatenator; the DuckDB window-function twin runs through the
x_pack_chunks oracle entry.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from json_schema_rs_spark.operators.packing import (
    chunk_windows, pack_sequences)


def _reference_packing(rows, budget):
    """Streaming concatenator: walk docs in id order per group, cut at
    each budget boundary of the running token offset."""
    out = {}
    by_group = {}
    for gid, did, toks in rows:
        by_group.setdefault(gid, []).append((did, toks))
    for gid, docs in by_group.items():
        offset = 0
        for did, toks in sorted(docs):
            out[(gid, did)] = (offset, offset // budget)
            offset += toks
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "lang string, doc_id bigint, toks bigint")


def _got(df, budget):
    packed = pack_sequences(df, "toks", budget, group_col="lang")
    return {(r["lang"], r["doc_id"]): (r["_pack_offset"], r["pack_id"])
            for r in packed.collect()}


def test_matches_streaming_concatenator(spark):
    rows = [("en", i, (i * 37) % 900 + 50) for i in range(40)]
    rows += [("de", i, (i * 53) % 1200 + 10) for i in range(25)]
    assert _got(_df(spark, rows), 2000) == _reference_packing(rows, 2000)


def test_groups_pack_independently(spark):
    rows = [("en", 1, 1500), ("en", 2, 1500), ("de", 3, 1500)]
    got = _got(_df(spark, rows), 2000)
    assert got[("en", 1)] == (0, 0)
    assert got[("en", 2)] == (1500, 0)   # starts inside window 0
    assert got[("de", 3)] == (0, 0)      # fresh offset per group


def test_oversize_doc_gets_own_window(spark):
    rows = [("en", 1, 5000), ("en", 2, 100)]
    got = _got(_df(spark, rows), 2000)
    assert got[("en", 1)] == (0, 0)
    assert got[("en", 2)] == (5000, 2)   # next doc starts at offset 5000


def test_packs_are_contiguous_runs(spark):
    rows = [("en", i, 700) for i in range(30)]
    got = _got(_df(spark, rows), 2000)
    ids_by_pack = {}
    for (_, did), (_, pid) in got.items():
        ids_by_pack.setdefault(pid, []).append(did)
    for ids in ids_by_pack.values():
        ids.sort()
        assert ids == list(range(ids[0], ids[0] + len(ids)))


def test_single_exchange_on_group_key(spark):
    df = _df(spark, [("en", 1, 10), ("de", 2, 20)])
    plan = (pack_sequences(df, "toks", 100, group_col="lang")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1


def test_rejects_nonpositive_budget(spark):
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(_df(spark, [("en", 1, 10)]), "toks", 0,
                       group_col="lang")


def _reference_chunks(text, window, stride):
    """First-principles sliding window over whitespace tokens."""
    toks = text.split(" ")
    n = len(toks)
    n_chunks = 1 if n <= window else -((n - window) // -stride) + 1
    out = []
    for i in range(n_chunks):
        start = i * stride          # 0-indexed here; operator is 1-indexed
        length = min(window, n - start)
        out.append((i, start + 1, length, " ".join(toks[start:start + length])))
    return out


class TestChunkWindows:
    def _got(self, spark, text, window, stride):
        df = spark.createDataFrame([Row(doc_id=0, text=text)])
        rows = (chunk_windows(df, window=window, stride=stride)
                .orderBy("chunk_idx").collect())
        return [(r["chunk_idx"], r["start_tok"], r["n_toks"], r["chunk_text"])
                for r in rows]

    @pytest.mark.parametrize("n,window,stride", [
        (10, 4, 2), (10, 4, 4), (9, 4, 2), (3, 4, 2), (4, 4, 2),
        (5, 4, 2), (1, 4, 2), (100, 16, 8), (17, 16, 1),
    ])
    def test_matches_reference_sliding_window(self, spark, n, window, stride):
        text = " ".join(f"t{i}" for i in range(n))
        assert (self._got(spark, text, window, stride)
                == _reference_chunks(text, window, stride))

    def test_overlap_and_tail(self, spark):
        got = self._got(spark, "a b c d e f g", 4, 2)
        assert got == [(0, 1, 4, "a b c d"),
                       (1, 3, 4, "c d e f"),
                       (2, 5, 3, "e f g")]

    def test_short_doc_single_chunk(self, spark):
        assert self._got(spark, "a b", 4, 2) == [(0, 1, 2, "a b")]

    def test_every_token_covered(self, spark):
        text = " ".join(f"t{i}" for i in range(53))
        got = self._got(spark, text, 8, 5)
        covered = set()
        for _, start, n_toks, _ in got:
            covered.update(range(start, start + n_toks))
        assert covered == set(range(1, 54))

    def test_zero_shuffle(self, spark):
        df = spark.createDataFrame([Row(doc_id=0, text="a b c d e")])
        plan = (chunk_windows(df, window=2, stride=1)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan

    def test_rejects_bad_params(self, spark):
        df = spark.createDataFrame([Row(doc_id=0, text="a")])
        with pytest.raises(ValueError, match="positive"):
            chunk_windows(df, window=0, stride=1)
        with pytest.raises(ValueError, match="drop"):
            chunk_windows(df, window=4, stride=5)


class TestRenderConversations:
    ROWS = [
        # conv "a": out-of-order arrival, NULL text on turn 1
        ("a", 2, "assistant", "fine thanks"),
        ("a", 0, "user", "hello there"),
        ("a", 1, "assistant", None),
        # conv "b": single turn, NULL role
        ("b", 0, None, "lone turn"),
    ]

    def _df(self, spark, rows=None):
        return spark.createDataFrame(
            rows or self.ROWS,
            "conv_id string, turn_idx int, role string, text string")

    def _got(self, spark, **kw):
        from json_schema_rs_spark.operators.packing import (
            render_conversations)
        return {r["conv_id"]: r
                for r in render_conversations(self._df(spark), **kw)
                .collect()}

    def test_stable_order_and_null_conventions(self, spark):
        got = self._got(spark)
        assert got["a"]["text"] == (
            "<|user|>\nhello there\n<|assistant|>\n\n"
            "<|assistant|>\nfine thanks")
        assert got["a"]["n_turns"] == 3
        assert got["b"]["text"] == "<|unknown|>\nlone turn"
        assert got["b"]["n_turns"] == 1

    def test_token_count_is_whitespace_chunks(self, spark):
        got = self._got(spark)
        # "<|user|>\nhello there\n<|assistant|>\n\n<|assistant|>\nfine
        # thanks" -> \s+ chunks: <|user|> hello there <|assistant|>
        # <|assistant|> fine thanks = 7
        assert got["a"]["n_tokens"] == 7
        # "<|unknown|>\nlone turn" -> <|unknown|> lone turn = 3
        assert got["b"]["n_tokens"] == 3

    def test_custom_template_and_sep(self, spark):
        got = self._got(spark, turn_template="{role}: {text}", sep=" | ")
        assert got["b"]["text"] == "unknown: lone turn"
        assert got["a"]["text"].startswith("user: hello there | ")

    def test_max_turns_truncates_from_end(self, spark):
        got = self._got(spark, max_turns=2)
        assert got["a"]["n_turns"] == 2
        assert got["a"]["text"] == "<|user|>\nhello there\n<|assistant|>\n"

    def test_duplicate_turn_idx_renders_deterministically(self, spark):
        # an upstream DuplicateKey violation must not make rendering
        # ambiguous: the full (idx, role, text) struct ordering breaks
        # the tie the same way everywhere ("x" < "y")
        rows = [("c", 0, "user", "y"), ("c", 0, "user", "x")]
        from json_schema_rs_spark.operators.packing import (
            render_conversations)
        out = render_conversations(self._df(spark, rows)).collect()[0]
        assert out["text"] == "<|user|>\nx\n<|user|>\ny"

    def test_single_exchange_no_window(self, spark):
        from json_schema_rs_spark.operators.packing import (
            render_conversations)
        plan = (render_conversations(self._df(spark))
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") == 1
        assert "Window" not in plan

    def test_rejects_bad_max_turns(self, spark):
        from json_schema_rs_spark.operators.packing import (
            render_conversations)
        with pytest.raises(ValueError, match="positive"):
            render_conversations(self._df(spark), max_turns=0)


class TestSftSpans:
    ROWS = TestRenderConversations.ROWS

    def _df(self, spark, rows=None):
        return spark.createDataFrame(
            rows or self.ROWS,
            "conv_id string, turn_idx int, role string, text string")

    def test_spans_index_into_rendered_text(self, spark):
        # the core invariant: full_text[start:end] is exactly the turn's
        # rendered piece, for every turn of every conversation
        from json_schema_rs_spark.operators.packing import (
            render_conversations, sft_spans)
        df = self._df(spark)
        full = {r["conv_id"]: r["text"]
                for r in render_conversations(df).collect()}
        spans = sft_spans(df).collect()
        assert len(spans) == len(self.ROWS)
        seen = set()
        for r in spans:
            role = r["role"] if r["role"] is not None else "unknown"
            piece = full[r["conv_id"]][r["char_start"]:r["char_end"]]
            assert piece.startswith(f"<|{role}|>\n")
            seen.add((r["conv_id"], r["turn_idx"]))
        assert len(seen) == len(self.ROWS)
        # conv "a" turn 1 has NULL text -> piece is exactly the header
        t1 = next(r for r in spans
                  if r["conv_id"] == "a" and r["turn_idx"] == 1)
        assert full["a"][t1["char_start"]:t1["char_end"]] \
            == "<|assistant|>\n"

    def test_train_mask_and_null_role(self, spark):
        from json_schema_rs_spark.operators.packing import sft_spans
        got = {(r["conv_id"], r["turn_idx"]): r["train"]
               for r in sft_spans(self._df(spark)).collect()}
        assert got[("a", 0)] is False          # user
        assert got[("a", 1)] is True           # assistant
        assert got[("a", 2)] is True
        assert got[("b", 0)] is False          # NULL role never trains

    def test_custom_template_sep_and_roles(self, spark):
        from json_schema_rs_spark.operators.packing import (
            render_conversations, sft_spans)
        df = self._df(spark)
        kw = dict(turn_template="{role}: {text}", sep=" | ")
        full = {r["conv_id"]: r["text"]
                for r in render_conversations(df, **kw).collect()}
        spans = sft_spans(df, train_roles=("user",), **kw).collect()
        for r in spans:
            piece = full[r["conv_id"]][r["char_start"]:r["char_end"]]
            role = r["role"] if r["role"] is not None else "unknown"
            assert piece.startswith(f"{role}: ")
            assert r["train"] == (r["role"] == "user")

    def test_duplicate_idx_offsets_are_deterministic(self, spark):
        # ties have identical pieces -> identical (start, end) pairs
        rows = [("c", 0, "user", "x"), ("c", 0, "user", "x"),
                ("c", 1, "user", "z")]
        from json_schema_rs_spark.operators.packing import sft_spans
        got = sorted((r["char_start"], r["char_end"])
                     for r in sft_spans(self._df(spark, rows)).collect())
        # piece "<|user|>\nx" = 10 chars, sep 1
        assert got == [(0, 10), (11, 21), (22, 32)]

    def test_single_exchange(self, spark):
        from json_schema_rs_spark.operators.packing import sft_spans
        plan = (sft_spans(self._df(spark))
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") == 1


class TestTruncateToBudget:
    # conv "a": system(2tk) pinned + turns of 3/4/5 tokens; budget 11:
    #   pinned cost 2 -> remaining 9 -> suffix 4+5=9 fits, +3 would be 12
    # conv "b": no system; budget 11 -> suffix 5+4=9 fits, +3 = 12 drops 0
    # conv "c": system alone (12tk) over budget -> only system survives
    ROWS = [
        ("a", 0, "system", "sys p"),
        ("a", 1, "user", "one two three"),
        ("a", 2, "assistant", "a b c d"),
        ("a", 3, "user", "v w x y z"),
        ("b", 0, "user", "one two three"),
        ("b", 1, "assistant", "a b c d"),
        ("b", 2, "user", "v w x y z"),
        ("c", 0, "system", "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12"),
        ("c", 1, "user", "hello"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.ROWS,
            "conv_id string, turn_idx int, role string, text string")

    def _kept(self, spark, **kw):
        from json_schema_rs_spark.operators.packing import truncate_to_budget
        return sorted((r["conv_id"], r["turn_idx"])
                      for r in truncate_to_budget(self._df(spark), 11,
                                                  **kw).collect())

    def test_suffix_fit_with_pinned_system(self, spark):
        assert self._kept(spark) == [
            ("a", 0), ("a", 2), ("a", 3),
            ("b", 1), ("b", 2),
            ("c", 0),
        ]

    def test_no_pin_roles_plain_suffix(self, spark):
        got = self._kept(spark, pin_roles=())
        # conv a: plain suffix 3+4+5: 5+4=9 fits, +3=12 no, sys(2)+... no
        assert [t for t in got if t[0] == "a"] == [("a", 2), ("a", 3)]
        # conv c: 12-token system no longer pinned and alone over budget
        assert [t for t in got if t[0] == "c"] == [("c", 1)]

    def test_agrees_with_budget_check_formula(self, spark):
        # every surviving non-pinned suffix must NOT fire the check with
        # the same budget/overhead once re-indexed densely
        from json_schema_rs_spark.operators.packing import truncate_to_budget
        from json_schema_rs_spark.operators.table_checks import (
            context_budget_violations)
        kept = truncate_to_budget(self._df(spark), 11,
                                  pin_roles=()).cache()
        v = context_budget_violations(kept, 11).collect()
        assert v == []

    def test_turn_tokens_column_and_overhead(self, spark):
        from json_schema_rs_spark.operators.packing import truncate_to_budget
        rows = {(r["conv_id"], r["turn_idx"]): r["turn_tokens"]
                for r in truncate_to_budget(self._df(spark), 100,
                                            per_turn_overhead=2).collect()}
        assert rows[("a", 1)] == 5  # 3 words + 2 overhead
        assert rows[("a", 0)] == 4

    def test_single_exchange_no_join(self, spark):
        from json_schema_rs_spark.operators.packing import truncate_to_budget
        plan = (truncate_to_budget(self._df(spark), 11)
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") == 1
        assert "Join" not in plan


class TestTurnWindows:
    ROWS = [
        ("a", 0, "w1 w2"), ("a", 1, "x"), ("a", 2, "y1 y2 y3"),
        ("a", 3, "z"),
        ("b", 0, "only"), ("b", 1, "two here"),
        ("c", 0, "solo"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.ROWS, "conv_id string, turn_idx int, text string")

    def test_windows_and_token_sums(self, spark):
        from json_schema_rs_spark.operators.packing import turn_windows
        got = sorted((r["conv_id"], r["window_pos"], r["start_idx"],
                      r["end_idx"], r["n_tokens"])
                     for r in turn_windows(self._df(spark), 2).collect())
        assert got == [
            ("a", 0, 0, 1, 3), ("a", 1, 1, 2, 4), ("a", 2, 2, 3, 4),
            ("b", 0, 0, 1, 3),
        ]  # conv c has no full 2-window

    def test_stride_disjoint(self, spark):
        from json_schema_rs_spark.operators.packing import turn_windows
        got = sorted((r["conv_id"], r["window_pos"])
                     for r in turn_windows(self._df(spark), 2,
                                           stride=2).collect())
        assert got == [("a", 0), ("a", 2), ("b", 0)]

    def test_k_larger_than_conv_emits_nothing(self, spark):
        from json_schema_rs_spark.operators.packing import turn_windows
        got = turn_windows(self._df(spark), 5).collect()
        assert got == []

    def test_single_exchange(self, spark):
        from json_schema_rs_spark.operators.packing import turn_windows
        plan = (turn_windows(self._df(spark), 2)
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") == 1
        assert "Join" not in plan


class TestPackReport:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, toks bigint, grp string")

    def test_exact_pack_counts_and_fill(self, spark):
        from json_schema_rs_spark.operators.packing import pack_report
        df = self._df(spark, [
            (1, 600, "a"), (2, 600, "a"), (3, 300, "a"),  # 1500/1000 -> 2
            (4, 1000, "b"),                               # exactly full
            (5, 0, "c"), (6, None, "c"),                  # token-less
        ])
        out = {r.grp: r for r in pack_report(df, "toks", 1000,
                                             group_col="grp").collect()}
        a = out["a"]
        assert (a.n_docs, a.total_tokens, a.n_packs, a.capacity,
                a.fill_frac) == (3, 1500, 2, 2000, 0.75)
        b = out["b"]
        assert (b.n_packs, b.capacity, b.fill_frac) == (1, 1000, 1.0)
        c = out["c"]
        assert (c.n_docs, c.total_tokens, c.n_packs, c.capacity,
                c.fill_frac) == (2, 0, 0, 0, None)

    def test_consistent_with_pack_sequences(self, spark):
        # n_packs must equal the distinct chunk count the packed offsets
        # imply: ceil(total/budget) == floor((total-1)/budget)+1
        from json_schema_rs_spark.operators.packing import (
            pack_report, pack_sequences)
        import random
        rng = random.Random(7)
        rows = [(i, rng.randrange(1, 900), f"g{i % 3}") for i in range(60)]
        df = self._df(spark, rows)
        rep = {r.grp: r.n_packs
               for r in pack_report(df, "toks", 1000,
                                    group_col="grp").collect()}
        packed = pack_sequences(df, "toks", 1000, group_col="grp",
                                id_col="doc_id")
        import collections
        totals = collections.Counter()
        for r in df.collect():
            totals[r.grp] += r.toks or 0
        for g, tot in totals.items():
            assert rep[g] == (tot + 999) // 1000

    def test_bad_budget_raises(self, spark):
        from json_schema_rs_spark.operators.packing import pack_report
        import pytest as _pytest
        with _pytest.raises(ValueError):
            pack_report(self._df(spark, [(1, 1, "a")]), "toks", 0,
                        group_col="grp")
