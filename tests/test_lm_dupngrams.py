"""Cross-document duplicated-ngram coverage + unigram-LM quality score.

First-principles expectations on hand-built corpora; plan-shape asserts
(broadcast vocab join, no corpus-text shuffle) ride along. The DuckDB
value oracle runs in the driver gate (x_dup_ngrams / x_lm_quality).
"""

import math

import pytest
from pyspark.sql import Row

from json_schema_rs_spark.operators.textstats import (
    duplicated_ngram_coverage, lm_quality, remove_duplicated_spans,
    unigram_lm_table)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([
        # docs 0 and 1 share the 3-gram "the quick brown"; doc 0 also
        # repeats it internally (two occurrences, both corpus-duplicated)
        Row(doc_id=0, text="the quick brown fox the quick brown"),
        Row(doc_id=1, text="the quick brown cat sleeps"),
        Row(doc_id=2, text="completely unrelated words appear here"),
        Row(doc_id=3, text="tiny doc"),       # < n words -> 0 ngrams
        Row(doc_id=4, text=""),               # empty text
        Row(doc_id=5, text=None),             # NULL text
    ])


class TestDuplicatedNgramCoverage:
    def test_counts_and_fraction(self, corpus):
        out = {r["doc_id"]: r for r in
               duplicated_ngram_coverage(corpus, n=3).collect()}
        assert len(out) == 6
        # doc 0: 5 3-grams, the two "the quick brown" occurrences are
        # duplicated (shared with doc 1); its internal repeat counts both
        assert out[0]["total_ngrams"] == 5
        assert out[0]["dup_ngrams"] == 2
        assert out[0]["dup_ngram_frac"] == pytest.approx(0.4)
        # doc 1: 3 3-grams, one shared
        assert out[1]["total_ngrams"] == 3
        assert out[1]["dup_ngrams"] == 1
        # doc 2: no gram appears elsewhere
        assert out[2]["total_ngrams"] == 3
        assert out[2]["dup_ngrams"] == 0
        assert out[2]["dup_ngram_frac"] == 0.0
        # short / empty / NULL docs report zeros, not missing rows
        for d in (3, 4, 5):
            assert out[d]["total_ngrams"] == 0
            assert out[d]["dup_ngrams"] == 0
            assert out[d]["dup_ngram_frac"] == 0.0

    def test_min_docs_threshold(self, spark):
        df = spark.createDataFrame([
            Row(doc_id=i, text="a b c filler%d" % i) for i in range(3)])
        # "a b c" appears in 3 docs: duplicated at min_docs<=3, not at 4
        at3 = {r["doc_id"]: r["dup_ngrams"] for r in
               duplicated_ngram_coverage(df, n=3, min_docs=3).collect()}
        at4 = {r["doc_id"]: r["dup_ngrams"] for r in
               duplicated_ngram_coverage(df, n=3, min_docs=4).collect()}
        assert all(v == 1 for v in at3.values())
        assert all(v == 0 for v in at4.values())

    def test_within_doc_repeat_alone_is_not_cross_doc(self, spark):
        # a gram repeated inside ONE doc only is not "duplicated":
        # doc-frequency is counted over distinct docs, not occurrences
        df = spark.createDataFrame(
            [Row(doc_id=0, text="x y z x y z"),
             Row(doc_id=1, text="totally different words here")])
        out = {r["doc_id"]: r for r in
               duplicated_ngram_coverage(df, n=3).collect()}
        assert out[0]["total_ngrams"] == 4
        assert out[0]["dup_ngrams"] == 0

    def test_no_corpus_text_in_any_exchange(self, corpus):
        plan = duplicated_ngram_coverage(corpus, n=3)._jdf.queryExecution() \
            .executedPlan().toString()
        # the gram pipeline shuffles hashes and counts, never text
        for line in plan.splitlines():
            if "Exchange" in line:
                assert "text" not in line


_SPAN10 = "one two three four five six seven eight nine ten"


class TestRemoveDuplicatedSpans:
    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame([Row(doc_id=i, text=t)
                                    for i, t in enumerate(rows)])
        return {r["doc_id"]: r for r in
                remove_duplicated_spans(df, k=10, **kw).collect()}

    def test_cross_doc_span_removed_from_both(self, spark):
        out = self._run(spark, [
            "aa bb cc " + _SPAN10 + " dd ee",
            _SPAN10 + " xx yy zz ww vv uu",
            "clean words that are never repeated anywhere else at all",
        ])
        assert out[0]["clean_text"] == "aa bb cc dd ee"
        assert out[0]["n_removed"] == 10 and out[0]["n_tokens"] == 15
        assert out[1]["clean_text"] == "xx yy zz ww vv uu"
        # the clean doc and its stats pass through untouched
        assert out[2]["n_removed"] == 0
        assert out[2]["clean_text"].startswith("clean words")
        assert out[2]["removed_frac"] == 0.0

    def test_within_doc_repeat_counts_as_duplicated(self, spark):
        # Lee et al.'s rule is any-second-occurrence, including within
        # one document: both copies (and the bridging windows) go
        out = self._run(spark, [_SPAN10 + " bridge " + _SPAN10])
        assert out[0]["clean_text"] == "bridge"
        assert out[0]["n_removed"] == 20 and out[0]["n_tokens"] == 21

    def test_overlapping_windows_merge_coverage(self, spark):
        # 11 shared tokens -> two overlapping duplicated windows whose
        # union covers all 11 positions exactly once
        span11 = _SPAN10 + " eleven"
        out = self._run(spark, [span11 + " tail words here",
                                "head tokens " + span11])
        assert out[0]["clean_text"] == "tail words here"
        assert out[0]["n_removed"] == 11
        assert out[1]["clean_text"] == "head tokens"

    def test_fully_duplicated_doc_becomes_empty(self, spark):
        out = self._run(spark, [_SPAN10, _SPAN10])
        for i in (0, 1):
            assert out[i]["clean_text"] == ""
            assert out[i]["removed_frac"] == 1.0

    def test_short_and_empty_docs_pass_through(self, spark):
        out = self._run(spark, ["under ten tokens here", "", None])
        assert out[0]["clean_text"] == "under ten tokens here"
        assert out[0]["n_removed"] == 0
        assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 0
        # NULL text coalesces to "" (one empty word, no windows)
        assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 0

    def test_min_count_three_spares_a_pair(self, spark):
        out = self._run(spark, [_SPAN10, _SPAN10], min_count=3)
        assert out[0]["n_removed"] == 0
        out3 = self._run(spark, [_SPAN10, _SPAN10, _SPAN10], min_count=3)
        assert all(out3[i]["clean_text"] == "" for i in range(3))

    def test_no_cartesian_in_plan(self, spark):
        df = spark.createDataFrame([Row(doc_id=0, text=_SPAN10)])
        plan = remove_duplicated_spans(df, k=10)._jdf \
            .queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan


class TestLmQuality:
    def test_head_token_scores_higher(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=0, text="common common common common")] +
            [Row(doc_id=i, text="common filler%d" % i) for i in range(1, 5)] +
            [Row(doc_id=9, text="zzz qqq www vvv")])     # all tail/OOV
        out = {r["doc_id"]: r for r in lm_quality(df, vocab_size=3).collect()}
        # the all-head doc outscores the all-OOV doc
        assert out[0]["avg_logp"] > out[9]["avg_logp"]
        assert out[0]["n_tokens"] == 4 and out[9]["n_tokens"] == 4

    def test_micro_nats_match_closed_form(self, spark):
        # 2 docs, tiny vocab: recompute the expected integers by hand
        df = spark.createDataFrame([Row(doc_id=0, text="a a b"),
                                    Row(doc_id=1, text="c")])
        rows, n, v = unigram_lm_table(df, vocab_size=10)
        assert n == 4 and v == 3
        by_tok = {t: (c, m) for t, c, m in rows}
        denom = float(n + v + 1)
        for t, c in (("a", 2), ("b", 1), ("c", 1)):
            assert by_tok[t][0] == c
            assert by_tok[t][1] == int(
                math.floor(math.log((c + 1) / denom) * 1_000_000))
        out = {r["doc_id"]: r for r in
               lm_quality(df, lm=(rows, n, v)).collect()}
        exp0 = 2 * by_tok["a"][1] + by_tok["b"][1]
        assert out[0]["logp_micro"] == exp0
        assert out[0]["avg_logp"] == math.floor(exp0 / 3) / 1_000_000.0

    def test_reference_corpus_lm(self, spark):
        # train on a reference corpus, score a different one: OOV-heavy
        # target docs score at the floor
        ref = spark.createDataFrame(
            [Row(doc_id=i, text="good clean text") for i in range(3)])
        lm = unigram_lm_table(ref, vocab_size=100)
        target = spark.createDataFrame(
            [Row(doc_id=0, text="good clean text"),
             Row(doc_id=1, text="garble zxqv wvut")])
        out = {r["doc_id"]: r["avg_logp"] for r in
               lm_quality(target, lm=lm).collect()}
        assert out[0] > out[1]
        rows, n, v = lm
        oov = int(math.floor(math.log(1.0 / (n + v + 1)) * 1_000_000))
        assert out[1] == math.floor(oov / 1) / 1_000_000.0

    def test_vocab_join_is_broadcast(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=i, text="w%d common" % i) for i in range(20)])
        plan = lm_quality(df, vocab_size=8)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_null_and_empty_text_score(self, spark):
        df = spark.createDataFrame([Row(doc_id=0, text="a a a"),
                                    Row(doc_id=1, text=""),
                                    Row(doc_id=2, text=None)])
        out = {r["doc_id"]: r for r in lm_quality(df, vocab_size=4).collect()}
        # "" and NULL both tokenize to the single token "" — one row each
        assert len(out) == 3
        assert out[1]["n_tokens"] == 1 and out[2]["n_tokens"] == 1
        assert out[1]["logp_micro"] == out[2]["logp_micro"]


class TestRemoveContaminatedSpans:
    def _tables(self, spark):
        bench = spark.createDataFrame(
            [(100, "q1 q2 q3 q4 q5")], "doc_id bigint, text string")
        df = spark.createDataFrame([
            # quotes the benchmark 5-gram in the middle: only it dies
            (0, "keep1 keep2 q1 q2 q3 q4 q5 keep3 keep4"),
            # clean doc: untouched
            (1, "a fully clean document with no overlap at all"),
            # shorter than k: passes through even if words overlap
            (2, "q1 q2 q3"),
        ], "doc_id bigint, text string")
        return df, bench

    def test_surgical_removal(self, spark):
        from json_schema_rs_spark.operators.textstats import (
            remove_contaminated_spans)
        df, bench = self._tables(spark)
        out = {r["doc_id"]: r for r in remove_contaminated_spans(
            df, bench, k=5).collect()}
        assert out[0]["clean_text"] == "keep1 keep2 keep3 keep4"
        assert out[0]["n_removed"] == 5
        assert out[1]["clean_text"].startswith("a fully clean")
        assert out[1]["n_removed"] == 0
        assert out[2]["clean_text"] == "q1 q2 q3"

    def test_matches_doc_drop_on_full_copies(self, spark):
        # a verbatim full copy of a benchmark doc becomes empty text --
        # consistent with what doc-level decontamination would drop
        from json_schema_rs_spark.operators.textstats import (
            remove_contaminated_spans)
        df, bench = self._tables(spark)
        copy = spark.createDataFrame([(9, "q1 q2 q3 q4 q5")],
                                     "doc_id bigint, text string")
        out = remove_contaminated_spans(copy, bench, k=5).collect()[0]
        assert out["clean_text"] == "" and out["removed_frac"] == 1.0

    def test_bench_grams_broadcast(self, spark):
        from json_schema_rs_spark.operators.textstats import (
            remove_contaminated_spans)
        df, bench = self._tables(spark)
        plan = (remove_contaminated_spans(df, bench, k=5)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastExchange" in plan
        assert "CartesianProduct" not in plan
