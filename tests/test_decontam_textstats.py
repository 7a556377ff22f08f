"""Decontamination + corpus-vocabulary + repetition-filter operators.

First-principles expectations on hand-built corpora; plan-shape asserts
(broadcast probe join, no corpus exchange before the probe) ride along.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from json_schema_rs_spark.operators.decontam import (
    benchmark_shingles, contamination_hits, decontaminate,
    fuzzy_contamination_pairs, fuzzy_decontaminate)
from json_schema_rs_spark.operators.textstats import (
    top_ngram_fraction, top_tokens)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([
        Row(doc_id=0, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=1, text="pack my box with five dozen liquor jugs"),
        Row(doc_id=2, text="the quick brown cat sits very still today"),
        Row(doc_id=3, text="completely unrelated words appear here now"),
        Row(doc_id=4, text="tiny"),          # < n words -> no shingles
        Row(doc_id=5, text=""),              # empty text
    ])


@pytest.fixture(scope="module")
def bench_set(spark):
    # shares the 3-gram "the quick brown" with docs 0 and 2, and
    # "five dozen liquor" with doc 1; nothing from docs 3-5
    return spark.createDataFrame([
        Row(doc_id=100, text="the quick brown bear"),
        Row(doc_id=101, text="exactly five dozen liquor bottles"),
    ])


class TestDecontaminate:
    def test_mark_hits_and_clean(self, corpus, bench_set):
        out = {r["doc_id"]: r for r in
               decontaminate(corpus, bench_set, n=3).collect()}
        assert len(out) == 6
        assert out[0]["contaminated"] and out[0]["n_hit_shingles"] == 1
        assert out[2]["contaminated"] and out[2]["n_hit_shingles"] == 1
        assert out[1]["contaminated"] and out[1]["n_hit_shingles"] == 1
        for clean in (3, 4, 5):
            assert not out[clean]["contaminated"]
            assert out[clean]["n_hit_shingles"] == 0
        # original columns survive the mark
        assert set(out[0].asDict()) == {"doc_id", "text", "n_hit_shingles",
                                        "contaminated"}

    def test_multi_shingle_hit_counts_distinct_shingles(self, spark):
        bench = spark.createDataFrame(
            [Row(doc_id=0, text="a b c d e")])          # shingles abc bcd cde
        train = spark.createDataFrame(
            [Row(doc_id=1, text="a b c d x"),           # hits abc bcd
             Row(doc_id=2, text="a b c a b c")])        # distinct: hits abc (+bca cab clean)
        hits = {r["doc_id"]: r["n_hit_shingles"] for r in
                contamination_hits(train, bench, n=3).collect()}
        assert hits == {1: 2, 2: 1}

    def test_drop_mode_keeps_schema_and_clean_rows(self, corpus, bench_set):
        kept = decontaminate(corpus, bench_set, n=3, mode="drop")
        assert kept.columns == corpus.columns
        assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4, 5]

    def test_bad_mode_raises(self, corpus, bench_set):
        with pytest.raises(ValueError, match="mark.*drop|drop.*mark"):
            decontaminate(corpus, bench_set, mode="purge")

    def test_benchmark_shingles_distinct(self, spark):
        bench = spark.createDataFrame(
            [Row(doc_id=0, text="x y z"), Row(doc_id=1, text="x y z")])
        assert benchmark_shingles(bench, n=3).count() == 1

    def test_probe_join_is_broadcast(self, corpus, bench_set):
        plan = decontaminate(corpus, bench_set, n=3)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan


_BENCH_14 = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lam mu nu xi")                       # 14 words -> 12 shingles


@pytest.fixture(scope="module")
def fuzzy_tables(spark):
    # doc 1: last word edited -> 11 of 12 shingles shared,
    #        J = 11 / (12+12-11) = 11/13 ~ 0.846 >= 0.8  (near-copy)
    # doc 2: shares exactly ONE shingle ("alpha beta gamma") -> exact
    #        decontam flags it, fuzzy must NOT (J = 1/20 = 0.05)
    # doc 3: shingle-less (sentinel signature) -> excluded from banding
    bench = spark.createDataFrame([Row(doc_id=100, text=_BENCH_14)])
    train = spark.createDataFrame([
        Row(doc_id=1, text=_BENCH_14.rsplit(" ", 1)[0] + " omicron"),
        Row(doc_id=2, text="alpha beta gamma completely different words "
                           "follow here in this sentence"),
        Row(doc_id=3, text="tiny"),
    ])
    return train, bench


class TestFuzzyDecontaminate:
    def test_near_copy_flagged_common_phrase_not(self, fuzzy_tables):
        train, bench = fuzzy_tables
        pairs = fuzzy_contamination_pairs(train, bench).collect()
        assert [(r["doc_id"], r["bench_id"]) for r in pairs] == [(1, 100)]
        assert pairs[0]["jaccard"] == pytest.approx(11 / 13)

    def test_exact_catches_phrase_fuzzy_does_not(self, fuzzy_tables):
        # the precision contrast that motivates the operator pair:
        # doc 2 shares one common shingle -> exact flags, fuzzy doesn't
        train, bench = fuzzy_tables
        exact = {r["doc_id"]: r["contaminated"] for r in
                 decontaminate(train, bench).collect()}
        fuzzy = {r["doc_id"]: r["contaminated"] for r in
                 fuzzy_decontaminate(train, bench).collect()}
        assert exact == {1: True, 2: True, 3: False}
        assert fuzzy == {1: True, 2: False, 3: False}

    def test_mark_columns_and_clean_defaults(self, fuzzy_tables):
        train, bench = fuzzy_tables
        out = {r["doc_id"]: r for r in
               fuzzy_decontaminate(train, bench).collect()}
        assert out[1]["n_bench_matches"] == 1
        assert out[1]["max_jaccard"] == pytest.approx(11 / 13)
        assert out[2]["n_bench_matches"] == 0
        assert out[2]["max_jaccard"] is None
        assert set(out[1].asDict()) == {"doc_id", "text", "n_bench_matches",
                                        "max_jaccard", "contaminated"}

    def test_drop_mode(self, fuzzy_tables):
        train, bench = fuzzy_tables
        kept = fuzzy_decontaminate(train, bench, mode="drop")
        assert kept.columns == train.columns
        assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]

    def test_bad_mode_raises(self, fuzzy_tables):
        train, bench = fuzzy_tables
        with pytest.raises(ValueError, match="mark.*drop|drop.*mark"):
            fuzzy_decontaminate(train, bench, mode="purge")

    def test_threshold_gates_the_near_copy(self, fuzzy_tables):
        train, bench = fuzzy_tables
        assert fuzzy_contamination_pairs(train, bench,
                                         threshold=0.9).count() == 0

    def test_no_sort_merge_join_no_cartesian(self, fuzzy_tables):
        # bench side broadcast everywhere; candidate + verify joins are
        # broadcast hash joins, corpus never sort-merge-shuffles
        train, bench = fuzzy_tables
        plan = fuzzy_decontaminate(train, bench)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan


class TestTopTokens:
    def test_counts_and_total_order(self, spark):
        df = spark.createDataFrame([
            Row(doc_id=0, text="b a a"),
            Row(doc_id=1, text="a b c"),
        ])
        rows = top_tokens(df, k=10).collect()
        assert [(r["token"], r["n_occurrences"], r["n_docs"])
                for r in rows] == [("a", 3, 2), ("b", 2, 2), ("c", 1, 1)]

    def test_k_limits_with_deterministic_ties(self, spark):
        df = spark.createDataFrame([Row(doc_id=0, text="z y x w")])
        rows = top_tokens(df, k=2).collect()
        # all counts tie at 1 -> token asc breaks the tie
        assert [r["token"] for r in rows] == ["w", "x"]


class TestTopNgramFraction:
    def test_repetitive_vs_diverse(self, spark):
        df = spark.createDataFrame([
            Row(doc_id=0, text="spam spam spam spam spam"),   # 4x same 2-gram
            Row(doc_id=1, text="all words differ here now"),  # 4 distinct
            Row(doc_id=2, text="one"),                        # < n words
        ])
        out = {r["doc_id"]: r for r in top_ngram_fraction(df, n=2).collect()}
        assert len(out) == 3
        assert out[0]["total_ngrams"] == 4
        assert out[0]["top_ngram_count"] == 4
        assert out[0]["top_ngram_frac"] == 1.0
        assert out[1]["top_ngram_count"] == 1
        assert out[1]["top_ngram_frac"] == 0.25
        assert out[2]["total_ngrams"] == 0
        assert out[2]["top_ngram_frac"] == 0.0

    def test_mixed_repetition(self, spark):
        # "a b" occurs 3 times out of 6 bigrams
        df = spark.createDataFrame([Row(doc_id=0, text="a b a b a b c")])
        r = top_ngram_fraction(df, n=2).collect()[0]
        assert (r["total_ngrams"], r["top_ngram_count"]) == (6, 3)
        assert r["top_ngram_frac"] == 0.5

    def test_ngram_size_three(self, spark):
        df = spark.createDataFrame([Row(doc_id=0, text="a b c a b c a b c")])
        r = top_ngram_fraction(df, n=3).collect()[0]
        # 7 trigrams; "a b c" occurs 3 times
        assert (r["total_ngrams"], r["top_ngram_count"]) == (7, 3)


class TestNormalizeText:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _one(self, spark, text, **kw):
        from json_schema_rs_spark.operators.textstats import normalize_text
        df = self._df(spark, [(0, text)])
        return normalize_text(df, **kw).collect()[0]["text_norm"]

    def test_control_strip_keeps_tab_newline(self, spark):
        assert self._one(spark, "a\x07b\x00c\td\ne\x7f",
                         collapse_ws=False) == "abc\td\ne"

    def test_nfc_composes_combining_chars(self, spark):
        import unicodedata
        decomposed = "Café au lait"
        got = self._one(spark, decomposed)
        assert got == unicodedata.normalize("NFC", decomposed) == "Café au lait"

    def test_nfc_matches_duckdb(self, spark):
        import duckdb
        s = "é̴å"  # stacked combining marks
        got = self._one(spark, s, strip_control=False, collapse_ws=False)
        want = duckdb.connect().execute(
            "SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert got == want

    def test_collapse_and_trim(self, spark):
        assert self._one(spark, "  a \t\t b  c  ") == "a b c"
        # newlines are NOT collapsed (paragraph structure survives)
        assert self._one(spark, "a\n\nb") == "a\n\nb"

    def test_null_text_stays_null(self, spark):
        assert self._one(spark, None) is None

    def test_lowercase_option(self, spark):
        assert self._one(spark, "AbC", lowercase=True) == "abc"

    def test_python_only_when_nfc(self, spark):
        from json_schema_rs_spark.operators.textstats import normalize_text
        df = self._df(spark, [(0, "x")])
        plan_no = (normalize_text(df, nfc=False)
                   ._jdf.queryExecution().executedPlan().toString())
        assert "Python" not in plan_no and "Exchange" not in plan_no
        plan_yes = (normalize_text(df)
                    ._jdf.queryExecution().executedPlan().toString())
        assert "ArrowEvalPython" in plan_yes      # Arrow batches, not rows
        assert "BatchEvalPython" not in plan_yes
        assert "Exchange" not in plan_yes

# ---------------------------------------------------------------------------
# corpus_report
# ---------------------------------------------------------------------------

def test_corpus_report_counts_and_gates(spark):
    from json_schema_rs_spark.operators.textstats import corpus_report
    long_good = ("the fox and the dog went to the park and it is a good "
                 "day for all of them to be out in the sun ") * 8
    df = spark.createDataFrame(
        [(1, long_good, "web"),
         (2, "tiny", "web"),
         (3, None, "web"),
         (4, long_good, "books")],
        "doc_id bigint, text string, source string")
    got = {r["source"]: r.asDict()
           for r in corpus_report(df, ("source",)).collect()}
    web = got["web"]
    assert web["n_docs"] == 3
    assert web["total_chars"] == len(long_good) + 4  # NULL counts 0
    assert web["n_short"] == 2                       # 'tiny' + NULL
    assert web["n_below_gate"] == 1                  # 'tiny'; NULL q skipped
    assert got["books"]["n_docs"] == 1
    assert got["books"]["n_below_gate"] == 0
    # avg over the one scored-high + one scored-low web doc
    assert 0 < web["avg_quality"] < 1


def test_corpus_report_one_exchange(spark):
    from json_schema_rs_spark.operators.textstats import corpus_report
    df = spark.createDataFrame(
        [(i, "some text here", "s") for i in range(50)],
        "doc_id bigint, text string, source string")
    plan = corpus_report(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial" in plan.lower()  # map-side combine before the wire


class TestHeavyHitters:
    def _corpus(self, spark, n_docs=400):
        # 'the' in every doc (3x), 'rare###' unique per doc -> huge tail
        rows = [Row(doc_id=i, text=f"the the the mid{i % 10} rare{i}")
                for i in range(n_docs)]
        return spark.createDataFrame(rows).repartition(8, "doc_id")

    def test_exact_counts_and_threshold(self, spark):
        from json_schema_rs_spark.operators.textstats import heavy_hitters
        df = self._corpus(spark)
        # N = 400*5 = 2000; min_frac .02 -> threshold 40:
        # 'the' (1200) and each mid% (40) qualify; rare* (1) never do
        got = [(r["token"], r["n_occurrences"])
               for r in heavy_hitters(df, min_frac=0.02).collect()]
        want = [("the", 1200)] + [(f"mid{d}", 40) for d in range(10)]
        assert got == sorted(want, key=lambda t: (-t[1], t[0]))

    def test_matches_brute_force_on_fuzzy_corpus(self, spark):
        from json_schema_rs_spark.operators.textstats import heavy_hitters
        import hashlib
        rows = []
        for i in range(300):
            h = hashlib.md5(f"hh{i}".encode()).hexdigest()
            words = [f"w{int(h[j], 16) % (3 + j)}" for j in range(10)]
            rows.append(Row(doc_id=i, text=" ".join(words)))
        df = spark.createDataFrame(rows).repartition(16, "doc_id")
        got = [(r["token"], r["n_occurrences"])
               for r in heavy_hitters(df, min_frac=0.01).collect()]
        toks = [t for r in rows for t in r.text.split(" ")]
        import collections
        import math
        cnt = collections.Counter(toks)
        thr = math.ceil(0.01 * len(toks))
        want = sorted(((t, c) for t, c in cnt.items() if c >= thr),
                      key=lambda t: (-t[1], t[0]))
        assert got == want

    def test_tiny_sketch_still_exact(self, spark):
        # sketch_k far below the true HH count: candidates may miss only
        # if the guarantee is broken -- with k=2/min_frac it never is;
        # here force k=12 (> 1/0.1=10) and verify output stays exact
        from json_schema_rs_spark.operators.textstats import heavy_hitters
        df = self._corpus(spark, n_docs=100)
        got = [(r["token"], r["n_occurrences"])
               for r in heavy_hitters(df, min_frac=0.1,
                                      sketch_k=12).collect()]
        # N=500, threshold 50: only 'the' (300) qualifies
        assert got == [("the", 300)]

    def test_plan_shape(self, spark):
        from json_schema_rs_spark.operators.textstats import heavy_hitters
        df = self._corpus(spark)
        plan = (heavy_hitters(df, min_frac=0.02)
                ._jdf.queryExecution().executedPlan().toString())
        # candidate + total attach via broadcast; no vocab sort-merge
        assert "BroadcastExchange" in plan or "BroadcastNestedLoop" in plan
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan


class TestSourceOverlap:
    def _df(self, spark):
        return spark.createDataFrame([
            # srcA and srcB share the 3-gram "p q r"; srcB ⊂ srcA ∪ extra
            Row(doc_id=0, source="srcA", text="p q r s t"),
            Row(doc_id=1, source="srcA", text="only in a corpus"),
            Row(doc_id=2, source="srcB", text="p q r"),
            # srcC shares nothing
            Row(doc_id=3, source="srcC", text="fully disjoint text here"),
            # short doc: no 3-grams at all
            Row(doc_id=4, source="srcC", text="too short"),
        ])

    def test_pairs_counts_and_ratios(self, spark):
        from json_schema_rs_spark.operators.decontam import source_overlap
        rows = source_overlap(self._df(spark)).collect()
        assert len(rows) == 1
        r = rows[0]
        # srcA: {pqr, qrs, rst} + {oia, ia c? ...} -> "only in a corpus"
        # has 2 grams; n_a = 5. srcB: {pqr}; shared = 1
        assert (r["src_a"], r["src_b"]) == ("srcA", "srcB")
        assert r["shared_ngrams"] == 1 and r["n_a"] == 5 and r["n_b"] == 1
        assert r["containment"] == 1.0          # srcB fully contained
        assert r["jaccard"] == 0.2

    def test_identical_sources_full_overlap(self, spark):
        from json_schema_rs_spark.operators.decontam import source_overlap
        df = spark.createDataFrame([
            Row(doc_id=0, source="x", text="a b c d"),
            Row(doc_id=1, source="y", text="a b c d"),
        ])
        r = source_overlap(df).collect()[0]
        assert r["containment"] == 1.0 and r["jaccard"] == 1.0

    def test_no_cartesian_and_broadcast_sizes(self, spark):
        from json_schema_rs_spark.operators.decontam import source_overlap
        plan = (source_overlap(self._df(spark))
                ._jdf.queryExecution().executedPlan().toString())
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
        assert "BroadcastExchange" in plan  # the size joins


class TestEncodingDamage:
    def _df(self, spark):
        return spark.createDataFrame([
            Row(doc_id=0, text="perfectly clean ascii text"),
            Row(doc_id=1, text="bad char � here"),
            Row(doc_id=2, text="moji Ã© and Ã¼ twice"),
            Row(doc_id=3, text="curly â€™ quote"),
            Row(doc_id=4, text="ctrl\x07bell and\x00nul"),
            Row(doc_id=5, text="tabs\tand\nnewlines are fine"),
            Row(doc_id=6, text=""),
        ])

    def test_counters_exact(self, spark):
        from json_schema_rs_spark.operators.textstats import encoding_damage
        out = {r["doc_id"]: r for r in
               encoding_damage(self._df(spark)).collect()}
        assert out[0]["verdict"] == "clean"
        assert out[1]["n_replacement"] == 1
        assert out[1]["verdict"] == "damaged"   # any U+FFFD flags
        assert out[2]["n_mojibake"] == 2
        assert out[3]["n_mojibake"] == 1
        assert out[4]["n_control"] == 2
        assert out[5]["n_control"] == 0 and out[5]["verdict"] == "clean"
        assert out[6]["damage_ratio"] == 0.0 and out[6]["verdict"] == "clean"

    def test_ratio_threshold(self, spark):
        from json_schema_rs_spark.operators.textstats import encoding_damage
        # 1 mojibake in 1000+ chars stays under a loose threshold
        df = spark.createDataFrame(
            [Row(doc_id=0, text=("x" * 2000) + "Ã©")])
        out = encoding_damage(df, max_ratio=0.01).collect()[0]
        assert out["n_mojibake"] == 1 and out["verdict"] == "clean"
        strict = encoding_damage(df, max_ratio=0.0001).collect()[0]
        assert strict["verdict"] == "damaged"

    def test_zero_shuffle_plan(self, spark):
        from json_schema_rs_spark.operators.textstats import encoding_damage
        plan = (encoding_damage(self._df(spark))
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan


class TestNoveltyScore:
    def test_fraction_exact(self, spark):
        from json_schema_rs_spark.operators.decontam import novelty_score
        ref = spark.createDataFrame(
            [Row(doc_id=100, text="a b c d e")])   # grams: abc bcd cde
        df = spark.createDataFrame([
            Row(doc_id=0, text="a b c d e"),        # all 3 known -> 0.0
            Row(doc_id=1, text="a b c x y z"),      # abc known, bcx bxy/... 3 novel of 4
            Row(doc_id=2, text="p q r s"),          # 2 grams, all novel
            Row(doc_id=3, text="too short"),        # no grams -> novelty 1.0
        ])
        out = {r["doc_id"]: r for r in novelty_score(df, ref).collect()}
        assert out[0]["novelty"] == 0.0 and out[0]["n_known"] == 3
        assert out[1]["n_shingles"] == 4 and out[1]["n_known"] == 1
        assert out[1]["novelty"] == 0.75
        assert out[2]["novelty"] == 1.0
        assert out[3]["n_shingles"] == 0 and out[3]["novelty"] == 1.0
        assert len(out) == 4

    def test_reference_broadcast_corpus_never_shuffled_wide(self, spark):
        from json_schema_rs_spark.operators.decontam import novelty_score
        ref = spark.createDataFrame([Row(doc_id=9, text="a b c d")])
        df = spark.createDataFrame([Row(doc_id=0, text="a b c d e f")])
        plan = (novelty_score(df, ref)
                ._jdf.queryExecution().executedPlan().toString())
        # reference probe joins broadcast; the id-grain join-back may be
        # SMJ (corpus-grain both sides — the correct at-scale shape)
        assert "BroadcastExchange" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan


class TestConversationQuality:
    def _df(self, spark):
        return spark.createDataFrame([
            ("good", 0, "the cat sat of the mat and it was that good for"),
            ("good", 1, "a tale of the kind that is told in the evening"),
            ("bad", 0, "x"), ("bad", 1, "!!!"),
            ("nul", 0, None),
        ], "conv_id string, turn_idx int, text string")

    def test_verdicts_and_exact_mean(self, spark):
        from json_schema_rs_spark.operators.textstats import (
            conversation_quality, quality_score)
        out = {r["conv_id"]: r for r in
               conversation_quality(self._df(spark),
                                    min_quality=0.3).collect()}
        assert out["good"]["verdict"] == "keep"
        assert out["bad"]["verdict"] == "drop"
        assert out["nul"]["n_turns"] == 1   # NULL text still counts
        # mean equals the integer-micro average of per-turn 6dp scores
        per = {(r["doc_id"]): r["quality"] for r in quality_score(
            self._df(spark).filter("conv_id = 'good'")
                .selectExpr("turn_idx AS doc_id", "text")).collect()}
        want = round((round(per[0] * 1e6) + round(per[1] * 1e6))
                     / (2 * 1e6), 6)
        assert out["good"]["mean_quality"] == want
        assert out["good"]["min_turn_quality"] == min(per.values())

    def test_single_exchange_text_not_shuffled(self, spark):
        from json_schema_rs_spark.operators.textstats import (
            conversation_quality)
        plan = (conversation_quality(self._df(spark))
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") == 1
        assert "text" not in plan.split("Exchange", 1)[1].split(
            "HashAggregate", 1)[0]  # only (conv, ints) cross the wire


class TestVocabGrowth:
    def test_new_token_accounting(self, spark):
        import datetime as dt
        from json_schema_rs_spark.operators.textstats import vocab_growth
        d1, d2 = dt.datetime(2026, 1, 1, 5), dt.datetime(2026, 1, 2, 9)
        df = spark.createDataFrame([
            ("a b a", d1), ("c", d1),        # day1: a,b,c all new
            ("a b d", d2), ("d e", d2),      # day2: d,e new; a,b seen
        ], "text string, ts timestamp")
        out = {r["window_start"].day: r for r in
               vocab_growth(df).collect()}
        assert out[1]["n_tokens"] == 4 and out[1]["n_distinct"] == 3
        assert out[1]["n_new"] == 3 and out[1]["new_rate"] == 1.0
        assert out[2]["n_tokens"] == 5 and out[2]["n_distinct"] == 4
        assert out[2]["n_new"] == 2 and out[2]["new_rate"] == 0.5

    def test_full_recrawl_rate_zero(self, spark):
        import datetime as dt
        from json_schema_rs_spark.operators.textstats import vocab_growth
        df = spark.createDataFrame([
            ("x y z", dt.datetime(2026, 1, 1)),
            ("x y z", dt.datetime(2026, 1, 2)),
        ], "text string, ts timestamp")
        out = {r["window_start"].day: r["new_rate"] for r in
               vocab_growth(df).collect()}
        assert out == {1: 1.0, 2: 0.0}


class TestCharStats:
    def test_values_exact(self, spark):
        import math
        from json_schema_rs_spark.operators.textstats import char_stats
        df = spark.createDataFrame(
            [(0, "aabb"), (1, ""), (2, None), (3, "aA1 ")],
            "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in char_stats(df).collect()}
        assert out[0]["char_entropy"] == round(math.log(2), 6)
        assert out[3]["char_entropy"] == round(math.log(4), 6)
        assert out[3]["digit_ratio"] == 0.25
        assert out[3]["upper_ratio"] == 0.25
        assert out[3]["space_ratio"] == 0.25
        for empty in (1, 2):
            r = out[empty]
            assert r["n_chars"] == 0 and r["char_entropy"] == 0.0

    def test_gibberish_scores_higher_than_prose(self, spark):
        from json_schema_rs_spark.operators.textstats import char_stats
        df = spark.createDataFrame([
            (0, "the cat sat on the mat and then the cat sat again"),
            (1, "qZ3k9LmX2vR8pT5wYb7NcJ4hF6sD1gA0eU"),   # key-dump shape
        ], "doc_id bigint, text string")
        out = {r["doc_id"]: r["char_entropy"] for r in
               char_stats(df).collect()}
        assert out[1] > out[0] > 0

    def test_zero_shuffle(self, spark):
        from json_schema_rs_spark.operators.textstats import char_stats
        df = spark.createDataFrame([(0, "abc")],
                                   "doc_id bigint, text string")
        plan = (char_stats(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan and "Join" not in plan


class TestLineRepetition:
    def test_values_exact(self, spark):
        from json_schema_rs_spark.operators.textstats import line_repetition
        df = spark.createDataFrame([
            (0, "a\na\nb"),
            (1, "hello world\nhello world\n\nxx\n\nxx"),
            (2, "a\r\na"),              # CRLF
            (3, "  a  \na"),            # trim before comparing
            (4, "a\n\n\na"),            # empty segments dropped
            (5, ""),
            (6, None),
        ], "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in line_repetition(df).collect()}

        r = out[0]
        assert r["n_lines"] == 3 and r["dup_line_frac"] == round(1 / 3, 6)
        assert r["dup_line_char_frac"] == round(1 / 3, 6)
        assert r["n_paras"] == 1 and r["dup_para_frac"] == 0.0

        r = out[1]
        assert r["n_lines"] == 4 and r["dup_line_frac"] == 0.5
        assert r["dup_line_char_frac"] == 0.5          # 13 of 26 chars
        assert r["n_paras"] == 3
        assert r["dup_para_frac"] == round(1 / 3, 6)
        assert r["dup_para_char_frac"] == round(2 / 27, 6)

        for d in (2, 3, 4):
            assert out[d]["n_lines"] == 2
            assert out[d]["dup_line_frac"] == 0.5

        for d in (5, 6):
            r = out[d]
            assert r["n_lines"] == 0 and r["n_paras"] == 0
            assert r["dup_line_frac"] == 0.0
            assert r["dup_line_char_frac"] == 0.0
            assert r["dup_para_frac"] == 0.0
            assert r["dup_para_char_frac"] == 0.0

    def test_loop_scores_above_prose(self, spark):
        from json_schema_rs_spark.operators.textstats import line_repetition
        loop = "\n".join(["I will comply."] * 8 + ["done"])
        prose = "\n".join(f"line number {i} is different" for i in range(9))
        df = spark.createDataFrame([(0, loop), (1, prose)],
                                   "doc_id bigint, text string")
        out = {r["doc_id"]: r["dup_line_frac"] for r in
               line_repetition(df).collect()}
        assert out[0] > 0.7 and out[1] == 0.0

    def test_zero_shuffle(self, spark):
        from json_schema_rs_spark.operators.textstats import line_repetition
        df = spark.createDataFrame([(0, "a\nb")],
                                   "doc_id bigint, text string")
        plan = (line_repetition(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan and "Join" not in plan
        assert "Python" not in plan


class TestC4Clean:
    def test_line_rules(self, spark):
        from json_schema_rs_spark.operators.textstats import c4_clean
        text = "\n".join([
            "This is a proper sentence.",          # kept
            "no terminal punctuation here",        # dropped: no punct
            "Too short.",                          # dropped: < 3 words
            "Enable javascript to continue.",      # dropped: javascript
            'He said "stop right there."',         # kept (quote end ok)
            "  Trimmed line stays fine.  ",        # kept after trim
        ])
        df = spark.createDataFrame([(0, text)],
                                   "doc_id bigint, text string")
        r = c4_clean(df, min_sentences=1).collect()[0]
        assert r["n_lines_kept"] == 3 and r["n_lines_dropped"] == 3
        assert r["clean_text"] == (
            'This is a proper sentence.\nHe said "stop right there."\n'
            "Trimmed line stays fine.")
        assert r["keep_doc"] is True

    def test_doc_rules(self, spark):
        from json_schema_rs_spark.operators.textstats import c4_clean
        good = "\n".join(["This is sentence number %d." % i
                          for i in range(6)])
        df = spark.createDataFrame([
            (0, good),
            (1, good + "\nAlso some Lorem Ipsum filler text here."),
            (2, good + "\nvar f = function() { return 1; }"),
            (3, "Just one good sentence here."),   # < 5 sentences
            (4, ""),
            (5, None),
        ], "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in c4_clean(df).collect()}
        assert out[0]["keep_doc"] is True
        assert out[1]["keep_doc"] is False         # lorem ipsum
        assert out[2]["keep_doc"] is False         # curly braces
        assert out[3]["keep_doc"] is False         # too few sentences
        for d in (4, 5):
            r = out[d]
            assert r["keep_doc"] is False and r["n_lines_kept"] == 0
            assert r["clean_text"] == ""

    def test_zero_shuffle(self, spark):
        from json_schema_rs_spark.operators.textstats import c4_clean
        df = spark.createDataFrame([(0, "A line here.")],
                                   "doc_id bigint, text string")
        plan = (c4_clean(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan and "Join" not in plan
        assert "Python" not in plan


class TestGopherGate:
    def test_signal_values(self, spark):
        from json_schema_rs_spark.operators.textstats import gopher_gate
        df = spark.createDataFrame([
            (0, "the cat and dog sat"),                 # 5 words
            (1, "• one thing\n• two thing\nplain tail"),
            (2, "going on...\nnormal line here"),
            (3, "### ### words here"),
            (4, ""),
            (5, None),
        ], "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in
               gopher_gate(df, min_words=3).collect()}
        r = out[0]
        assert r["n_words"] == 5
        assert r["mean_word_len"] == round(15 / 5, 6)
        assert r["n_stopwords_present"] == 2            # the, and
        assert out[1]["bullet_line_frac"] == round(2 / 3, 6)
        assert out[2]["ellipsis_line_frac"] == 0.5
        r = out[3]
        assert r["symbol_ratio"] == 1.5                 # 6 '#' / 4 words
        assert r["alpha_word_frac"] == 0.5
        for d in (4, 5):
            assert out[d]["n_words"] == 0
            assert out[d]["keep"] is False

    def test_gate_polarities(self, spark):
        from json_schema_rs_spark.operators.textstats import gopher_gate
        good = ("the cat and dog have fun with all of that stuff "
                "going around here today for sure")  # 16 words, stops ok
        df = spark.createDataFrame([
            (0, good),
            (1, good + "\n" + "\n".join(["• b item here"] * 30)),
            (2, good + " " + "### " * 30),
            (3, "zz " * 20),                        # no stopwords/alpha ok but stops=0
        ], "doc_id bigint, text string")
        out = {r["doc_id"]: r["keep"] for r in
               gopher_gate(df, min_words=10).collect()}
        assert out[0] is True
        assert out[1] is False                      # bullets > 90%
        assert out[2] is False                      # symbols + alpha
        assert out[3] is False                      # stopwords < 2

    def test_zero_shuffle(self, spark):
        from json_schema_rs_spark.operators.textstats import gopher_gate
        df = spark.createDataFrame([(0, "a b")],
                                   "doc_id bigint, text string")
        plan = (gopher_gate(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan and "Join" not in plan
        assert "Python" not in plan


class TestDupNgramWithin:
    def test_exact_coverage(self, spark):
        from json_schema_rs_spark.operators.textstats import dup_ngram_within
        df = spark.createDataFrame([
            # "a b c" occurs twice; windows 1..5, dups at starts 1 and 5:
            # covered word positions {1,2,3} U {5,6,7} -> 6 of 7
            (0, "a b c xx a b c"),
            (1, "all words here are unique today"),
            (2, ""),
            (3, None),
        ], "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in
               dup_ngram_within(df, n=3).collect()}
        r = out[0]
        assert r["n_words"] == 7 and r["dup_words"] == 6
        assert r["dup_word_frac"] == round(6 / 7, 6)
        assert r["dup_chars"] == 6              # a,b,c,a,b,c
        assert r["dup_char_frac"] == round(6 / 8, 6)  # total chars 3+2+3
        assert out[1]["dup_words"] == 0
        assert out[1]["dup_word_frac"] == 0.0
        for d in (2, 3):
            assert out[d]["dup_words"] == 0
            assert out[d]["dup_char_frac"] == 0.0

    def test_fully_repeated_doc(self, spark):
        from json_schema_rs_spark.operators.textstats import dup_ngram_within
        df = spark.createDataFrame([(0, "x y z x y z x y z")],
                                   "doc_id bigint, text string")
        r = dup_ngram_within(df, n=3).collect()[0]
        assert r["dup_word_frac"] == 1.0 and r["dup_char_frac"] == 1.0

    def test_text_never_shuffles(self, spark):
        from json_schema_rs_spark.operators.textstats import dup_ngram_within
        df = spark.createDataFrame([(0, "a b c a b c")],
                                   "doc_id bigint, text string")
        plan = (dup_ngram_within(df, n=3)
                ._jdf.queryExecution().executedPlan().toString())
        import re
        for ex in re.findall(r"Exchange [^\n]*", plan):
            assert "text" not in ex
        assert "CartesianProduct" not in plan


class TestBlockwordStats:
    def test_whole_word_matching(self, spark):
        from json_schema_rs_spark.operators.textstats import blockword_stats
        df = spark.createDataFrame([
            (0, "visit our Casino! today"),          # punct-stripped hit
            (1, "the casinos are closed"),           # plural: no hit
            (2, "(casino) casino CASINO"),           # three hits
            (3, "perfectly clean text here"),
            (4, ""),
            (5, None),
        ], "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in
               blockword_stats(df, ["casino", "jackpot"]).collect()}
        assert out[0]["n_blocked"] == 1 and out[0]["has_blocked"] is True
        assert out[1]["n_blocked"] == 0 and out[1]["has_blocked"] is False
        assert out[2]["n_blocked"] == 3
        for d in (3, 4, 5):
            assert out[d]["n_blocked"] == 0
            assert out[d]["has_blocked"] is False

    def test_empty_blocklist_raises(self, spark):
        from json_schema_rs_spark.operators.textstats import blockword_stats
        df = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
        import pytest as _pt
        with _pt.raises(ValueError):
            blockword_stats(df, [])

    def test_zero_shuffle(self, spark):
        from json_schema_rs_spark.operators.textstats import blockword_stats
        df = spark.createDataFrame([(0, "a b")], "doc_id bigint, text string")
        plan = (blockword_stats(df, ["x"])
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan and "Join" not in plan
        assert "Python" not in plan


class TestNgramDiversity:
    """ngram_diversity: per-group distinct-n corpus diversity."""

    def _run(self, spark, rows, n=2):
        from json_schema_rs_spark.operators.textstats import ngram_diversity
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, source string")
        return {r.source: r for r in ngram_diversity(df, n=n).collect()}

    def test_templated_source_scores_low(self, spark):
        rows = (
            # s_tmpl re-emits one bigram stream 4x
            [(i, "buy now click here buy now", "s_tmpl") for i in range(4)]
            # s_div: all-distinct bigrams
            + [(10, "alpha beta gamma delta", "s_div"),
               (11, "epsilon zeta eta theta", "s_div")]
        )
        out = self._run(spark, rows)
        assert out["s_div"].diversity == 1.0
        # 4 docs x 5 bigrams = 20 occurrences of 4 distinct bigrams
        # ("buy now" appears twice per doc)
        assert out["s_tmpl"].n_grams == 20
        assert out["s_tmpl"].n_distinct_grams == 4
        assert out["s_tmpl"].diversity == 0.2
        assert out["s_tmpl"].n_docs == 4

    def test_short_and_null_docs_report_zero_not_vanish(self, spark):
        out = self._run(spark, [(1, "one", "s"), (2, None, "s")], n=2)
        r = out["s"]
        assert (r.n_docs, r.n_grams, r.n_distinct_grams, r.diversity) == \
            (2, 0, 0, None)

    def test_two_stacked_aggregates_no_expand(self, spark):
        from json_schema_rs_spark.operators.textstats import ngram_diversity
        df = spark.createDataFrame([(1, "a b c", "s")],
                                   "doc_id long, text string, source string")
        plan = ngram_diversity(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Expand" not in plan      # no countDistinct over the grams
        assert "CartesianProduct" not in plan


class TestOovStats:
    def _run(self, spark, rows, vocab, **kw):
        from json_schema_rs_spark.operators.textstats import oov_stats
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r.doc_id: r for r in oov_stats(df, vocab, **kw).collect()}

    def test_rates_and_edge_handling(self, spark):
        out = self._run(spark, [
            (1, "the cat sat"),          # cat/sat OOV
            (2, "THE The the"),          # lowercase fold: all in-vocab
            (3, "dog!"),                 # punctuation NOT stripped -> OOV
            (4, ""), (5, None),          # token-less
            (6, "  the   cat  "),        # empty runs dropped
        ], vocab=["the", "dog"])
        assert (out[1].n_tokens, out[1].n_oov) == (3, 2)
        assert out[2].n_oov == 0 and out[2].oov_rate == 0.0
        assert (out[3].n_tokens, out[3].n_oov) == (1, 1)  # "dog!" != "dog"
        for i in (4, 5):
            assert (out[i].n_tokens, out[i].n_oov,
                    out[i].oov_rate) == (0, 0, None)
        assert (out[6].n_tokens, out[6].n_oov) == (2, 1)
        assert out[1].oov_rate == round(2 / 3, 6)

    def test_case_sensitive_mode_and_empty_vocab(self, spark):
        out = self._run(spark, [(1, "The the")], vocab=["the"],
                        lowercase=False)
        assert (out[1].n_tokens, out[1].n_oov) == (2, 1)
        import pytest as _pytest
        with _pytest.raises(ValueError):
            self._run(spark, [(1, "x")], vocab=[])

    def test_plan_is_row_local(self, spark):
        from json_schema_rs_spark.operators.textstats import oov_stats
        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        plan = oov_stats(df, ["a"])._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan


class TestTopTokensBy:
    def test_per_group_heads_exact(self, spark):
        from json_schema_rs_spark.operators.textstats import top_tokens_by
        rows = [
            (1, "a a a b b c", "g1"),
            (2, "b b", "g1"),
            (3, "z z y", "g2"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = [(r.lang, r.token, r.n_occurrences, r.rank)
               for r in top_tokens_by(df, "lang", k=2).collect()]
        assert out == [("g1", "b", 4, 1), ("g1", "a", 3, 2),
                       ("g2", "z", 2, 1), ("g2", "y", 1, 2)]

    def test_tie_break_is_token_asc(self, spark):
        from json_schema_rs_spark.operators.textstats import top_tokens_by
        df = spark.createDataFrame([(1, "b a c", "g")],
                                   "doc_id long, text string, lang string")
        out = [r.token for r in top_tokens_by(df, "lang", k=3).collect()]
        assert out == ["a", "b", "c"]

    def test_matches_global_head_on_single_group(self, spark, sf_dir):
        from json_schema_rs_spark.operators.textstats import (
            top_tokens, top_tokens_by)
        from pyspark.sql import functions as F
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .withColumn("one", F.lit("g"))
        a = [(r.token, r.n_occurrences)
             for r in top_tokens(docs, k=15).collect()]
        b = [(r.token, r.n_occurrences)
             for r in top_tokens_by(docs, "one", k=15).collect()]
        assert a == b


class TestLanguageMismatch:
    def test_flags_and_abstentions(self, spark):
        from json_schema_rs_spark.operators.textstats import (
            language_mismatch_violations)
        rows = [
            (1, "the cat is in the house and it is big", "en"),  # agree
            (2, "der hund ist nicht das und ein", "en"),         # de != en
            (3, "xqz wvu pqr", "en"),            # detector 'und': abstain
            (4, "the dog is here and it is fine", None),  # NULL: skip
            (5, "中文文本", "en"),        # zh != en
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = {r.doc_id: r
               for r in language_mismatch_violations(df).collect()}
        assert set(out) == {2, 5}
        assert out[2].code == "LanguageMismatch"
        assert out[2].message == \
            '/lang: declared language "en" but text reads as "de"'
        assert 'reads as "zh"' in out[5].message

    def test_plan_zero_shuffle(self, spark):
        from json_schema_rs_spark.operators.textstats import (
            language_mismatch_violations)
        df = spark.createDataFrame([(1, "the a", "en")],
                                   "doc_id long, text string, lang string")
        plan = language_mismatch_violations(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan


class TestVocabRepair:
    """vocab_remap_plan + remap_tokens: the acting complement of
    vocab_drift — casefold-drifted tokens re-mapped onto the baseline
    vocabulary, ambiguous collisions dropped, repair zero-shuffle."""

    def _base(self, spark):
        rows = [(0, "the key part of the table"),
                (1, "key value table the part"),
                (2, "the the key value part Table")]
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_plan_maps_case_drift_and_drops_ambiguous(self, spark):
        from json_schema_rs_spark.operators.textstats import (
            vocab_remap_plan)
        base = self._base(spark)
        # current snapshot drifts: KEY (unambiguous -> key), TABLE
        # (ambiguous: baseline vocab holds both 'table' and 'Table'),
        # VALUE (unambiguous), 'novel' (no casefold match)
        cur = spark.createDataFrame(
            [(10, "KEY VALUE TABLE novel the")],
            "doc_id bigint, text string")
        plan = {r.from_token: (r.to_token, r.n_cur)
                for r in vocab_remap_plan(base, cur, k=10).collect()}
        assert plan == {"KEY": ("key", 1), "VALUE": ("value", 1)}

    def test_remap_repairs_and_drift_falls(self, spark):
        from pyspark.sql import functions as F
        from json_schema_rs_spark.operators.textstats import (
            remap_tokens, vocab_drift, vocab_remap_plan)
        base = self._base(spark)
        cur = base.select("doc_id", F.upper("text").alias("text"))
        plan = vocab_remap_plan(base, cur, k=10)
        rep = remap_tokens(cur, plan, "text")
        chi_before = vocab_drift(base, cur, k=10).collect()[0]["chi2"]
        chi_after = vocab_drift(
            base, rep.select("doc_id",
                             F.col("clean_text").alias("text")),
            k=10).collect()[0]["chi2"]
        assert chi_after < chi_before
        # unambiguous tokens repair to the baseline form; TABLE stays
        # unmapped ('table' and 'Table' collide on casefold — ambiguous)
        out = {r.doc_id: r.clean_text for r in rep.collect()}
        assert out[1] == "key value TABLE the part"

    def test_remap_literal_path_zero_shuffle(self, spark):
        from json_schema_rs_spark.operators.textstats import remap_tokens
        df = self._base(spark)
        out = remap_tokens(df, {"key": "KEY"}, "text")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan
        got = {r.doc_id: r.clean_text for r in out.collect()}
        assert got[0] == "the KEY part of the table"

    def test_remap_null_and_empty_text(self, spark):
        from json_schema_rs_spark.operators.textstats import remap_tokens
        df = spark.createDataFrame([(0, None), (1, ""), (2, "a  b")],
                                   "doc_id bigint, text string")
        got = {r.doc_id: r.clean_text
               for r in remap_tokens(df, {"a": "x"}, "text").collect()}
        assert got[0] is None
        assert got[1] == ""
        assert got[2] == "x  b"   # double space preserved

    def test_join_path_matches_literal_path(self, spark):
        from json_schema_rs_spark.operators.textstats import remap_tokens
        df = self._base(spark)
        mdf = spark.createDataFrame(
            [("key", "k"), ("part", "p")],
            "from_token string, to_token string")
        lit = {r.doc_id: r.clean_text
               for r in remap_tokens(df, mdf, "text").collect()}
        # force the broadcast-join path by shrinking the literal cap
        join = {r.doc_id: r.clean_text
                for r in remap_tokens(df, mdf, "text",
                                      max_literal=1).collect()}
        assert lit == join
        assert lit[0] == "the k p of the table"

    def test_dict_over_cap_raises(self, spark):
        import pytest as _pytest
        from json_schema_rs_spark.operators.textstats import remap_tokens
        df = self._base(spark)
        big = {f"t{i}": "x" for i in range(20)}
        with _pytest.raises(ValueError, match="max_literal"):
            remap_tokens(df, big, "text", max_literal=10)
