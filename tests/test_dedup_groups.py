"""near_dup_groups: connected components over a near-dup pair table.

Verdicts are computed by an independent driver-side union-find, never by
the operator under test; the sf0.001 case additionally chains the real
LSH pair operator into groups.
"""

import math

import pytest
from pyspark.sql import functions as F

from json_schema_rs_spark.operators.dedup import (
    _cc_min_label,
    _cc_two_phase,
    minhash_lsh_pairs,
    near_dup_groups,
)


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "doc_a bigint, doc_b bigint")


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _check(spark, pairs, max_iter=25):
    # all algorithms must produce the identical grouping
    got = None
    for method in ("star", "label", "driver", "auto"):
        m = {r["doc_id"]: r["group_id"]
             for r in near_dup_groups(_pairs_df(spark, pairs),
                                      max_iter=max_iter,
                                      method=method).collect()}
        assert m == _union_find(pairs), method
        got = m
    return got


def test_transitive_chain_one_group(spark):
    # A~B, B~C, C~D: one group labelled by the min id even though A~D
    # was never a pair (near-dup is not transitive; grouping must be)
    got = _check(spark, [(10, 20), (20, 30), (30, 40)])
    assert set(got.values()) == {10}


def test_two_components_and_cycle(spark):
    got = _check(spark, [(1, 2), (2, 3), (3, 1), (7, 9)])
    assert got[1] == got[2] == got[3] == 1
    assert got[7] == got[9] == 7


def test_min_id_flows_against_pair_order(spark):
    # smallest id sits at one END of a chain listed high-to-low: the
    # label must flood the full diameter, not just one hop
    chain = [(i + 1, i) for i in range(1, 9)]  # (2,1),(3,2)...(9,8)
    got = _check(spark, chain)
    assert set(got.values()) == {1}


def test_empty_pairs(spark):
    out = near_dup_groups(_pairs_df(spark, []))
    assert out.columns == ["doc_id", "group_id"]
    assert out.count() == 0


def test_max_iter_partial_is_valid_labelling(spark):
    # one round on a 3-chain: every label is still a member of the
    # component (over-segmented, never cross-contaminated)
    got = {r["doc_id"]: r["group_id"]
           for r in near_dup_groups(
               _pairs_df(spark, [(5, 6), (6, 7)]), max_iter=1).collect()}
    assert set(got) == {5, 6, 7}
    assert all(lbl in {5, 6, 7} and lbl <= n for n, lbl in got.items())


def test_star_converges_in_log_rounds_on_long_chain(spark):
    """The adversarial case for min-label propagation: a path graph,
    where the min label must flood the full diameter (one hop per
    round). Large-star/small-star contracts it in O(log n) rounds —
    this is exactly why it is the scale path."""
    n = 64
    chain = [(i, i + 1) for i in range(n)]          # path 0-1-...-64
    edges = (_pairs_df(spark, chain)
             .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")))
    star_labels, star_rounds = _cc_two_phase(edges, max_iter=50)
    got = {r["doc_id"]: r["group_id"] for r in star_labels.collect()}
    assert got == {i: 0 for i in range(n + 1)}
    # Kiveris et al. bound: O(log n) alternating rounds; generous 2x
    # headroom over log2(65) ~ 6.02 still rejects any linear behavior
    assert star_rounds <= 2 * math.ceil(math.log2(n + 1)) + 2, star_rounds
    # and min-label genuinely needs ~diameter rounds on the same graph
    _, label_rounds = _cc_min_label(edges, max_iter=n + 5)
    assert label_rounds > star_rounds
    assert label_rounds >= n / 2


def test_near_dup_groups_rejects_unknown_method(spark):
    with pytest.raises(ValueError, match="method"):
        near_dup_groups(_pairs_df(spark, [(1, 2)]), method="bogus")


def test_auto_over_cap_falls_back_to_star(spark):
    # driver_max_edges=0 forces every auto call onto the distributed
    # star path; the grouping must be unchanged
    pairs = [(10, 20), (20, 30), (7, 9)]
    got = {r["doc_id"]: r["group_id"]
           for r in near_dup_groups(_pairs_df(spark, pairs),
                                    method="auto",
                                    driver_max_edges=0).collect()}
    assert got == _union_find(pairs)


def test_groups_from_lsh_pairs_sf0001(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, n=3, threshold=0.8, bands=32)
    edges = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    if not edges:
        pytest.skip("no near-dup pairs at this sf")
    got = {r["doc_id"]: r["group_id"]
           for r in near_dup_groups(pairs).collect()}
    assert got == _union_find(edges)


# ---------------------------------------------------------------------------
# canonical_docs (groups -> quality-argmax survivors)
# ---------------------------------------------------------------------------

def _scored_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, quality double")


def test_canonical_picks_best_quality_per_group(spark):
    from json_schema_rs_spark.operators.dedup import canonical_docs
    scored = _scored_df(spark, [(1, 0.2), (2, 0.9), (3, 0.5), (9, 0.1)])
    # groups: {1,2,3} -> group 1; 9 is a singleton (absent from groups)
    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id bigint, group_id bigint")
    out = {r["doc_id"]: (r["group_id"], r["group_size"], r["quality"])
           for r in canonical_docs(scored, groups).collect()}
    assert out == {2: (1, 3, 0.9),   # best quality in the group survives
                   9: (9, 1, 0.1)}   # singleton survives as its own group


def test_canonical_tie_breaks_on_min_id(spark):
    from json_schema_rs_spark.operators.dedup import canonical_docs
    scored = _scored_df(spark, [(5, 0.7), (3, 0.7), (8, 0.7)])
    groups = spark.createDataFrame(
        [(3, 3), (5, 3), (8, 3)], "doc_id bigint, group_id bigint")
    out = canonical_docs(scored, groups).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 3


def test_canonical_empty_groups_all_singletons(spark):
    from json_schema_rs_spark.operators.dedup import canonical_docs
    scored = _scored_df(spark, [(1, 0.2), (2, 0.9)])
    groups = spark.createDataFrame([], "doc_id bigint, group_id bigint")
    out = {r["doc_id"]: (r["group_id"], r["group_size"])
           for r in canonical_docs(scored, groups).collect()}
    assert out == {1: (1, 1), 2: (2, 1)}


def test_canonical_no_window_one_agg(spark):
    # scale shape: argmax is a hash aggregate (max of struct), never a
    # per-group window sort
    from json_schema_rs_spark.operators.dedup import canonical_docs
    scored = _scored_df(spark, [(1, 0.2), (2, 0.9), (3, 0.5)])
    groups = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id bigint, group_id bigint")
    plan = canonical_docs(scored, groups)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


def test_string_ids_supported_all_methods(spark):
    # UUID-ish string doc ids: id type passes through, min label is
    # lexicographic, all three algorithms agree
    from json_schema_rs_spark.operators.dedup import near_dup_groups
    pairs = spark.createDataFrame(
        [("b", "a", 0.9), ("b", "c", 0.9), ("x", "y", 0.85)],
        "doc_a string, doc_b string, jaccard double")
    want = {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}
    for m in ("driver", "star", "label"):
        got = {(r.doc_id, r.group_id)
               for r in near_dup_groups(pairs, method=m).collect()}
        assert got == want, m
        out = near_dup_groups(pairs, method=m)
        assert dict(out.dtypes) == {"doc_id": "string",
                                    "group_id": "string"}


def test_canonical_string_ids_and_null_scores(spark):
    # conv-grain usage: string ids order lexicographically for ties;
    # a scored copy always beats a NULL-scored one; an all-NULL group
    # falls back to min id with a NULL score
    from json_schema_rs_spark.operators.dedup import canonical_docs
    scored = spark.createDataFrame(
        [("b", 0.4), ("a", None), ("c", 0.4),       # group g1
         ("x", None), ("y", None)],                 # group g2: all NULL
        "doc_id string, quality double")
    groups = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")],
        "doc_id string, group_id string")
    out = {r["doc_id"]: (r["group_id"], r["group_size"], r["quality"])
           for r in canonical_docs(scored, groups).collect()}
    assert out == {"b": ("a", 3, 0.4),   # 0.4 tie -> min string id "b"
                   "x": ("x", 2, None)}  # all-NULL -> min id, NULL score
    dt = dict(canonical_docs(scored, groups).dtypes)
    assert dt["doc_id"] == "string" and dt["group_id"] == "string"


class TestIncrementalDedup:
    """incremental_dedup: append-only exact dedup against a digest ledger."""

    def test_batch_then_merge_equals_one_shot(self, spark):
        from json_schema_rs_spark.operators.dedup import (
            exact_dedup, incremental_dedup)
        texts = ["aa", "bb", "aa", "cc", "bb", "dd", "aa", "ee"]
        rows = [(i, t) for i, t in enumerate(texts)]
        corpus = spark.createDataFrame(rows, "doc_id bigint, text string")
        b1 = corpus.filter(F.col("doc_id") < 4)    # ids batch-monotone
        b2 = corpus.filter(F.col("doc_id") >= 4)
        empty = spark.createDataFrame([], "text_hash string")
        s1 = incremental_dedup(b1, empty)
        ledger = s1.select("text_hash")
        s2 = incremental_dedup(b2, ledger)
        got = sorted(r.doc_id for df in (s1, s2) for r in df.collect())
        want = sorted(r.doc_id for r in exact_dedup(corpus).collect())
        assert got == want == [0, 1, 3, 5, 7]

    def test_within_batch_min_id_survivor(self, spark):
        from json_schema_rs_spark.operators.dedup import incremental_dedup
        batch = spark.createDataFrame(
            [(9, "x"), (3, "x"), (5, "y")], "doc_id bigint, text string")
        empty = spark.createDataFrame([], "text_hash string")
        got = {r.doc_id for r in incremental_dedup(batch, empty).collect()}
        assert got == {3, 5}

    def test_output_carries_digest_and_all_columns(self, spark):
        from json_schema_rs_spark.operators.dedup import incremental_dedup
        batch = spark.createDataFrame(
            [(1, "x", "en")], "doc_id bigint, text string, lang string")
        empty = spark.createDataFrame([], "text_hash string")
        row = incremental_dedup(batch, empty).collect()[0]
        import hashlib
        assert row.text_hash == hashlib.md5(b"x").hexdigest()
        assert (row.doc_id, row.text, row.lang) == (1, "x", "en")

    def test_text_never_shuffles(self, spark):
        from json_schema_rs_spark.operators.dedup import incremental_dedup
        batch = spark.range(200).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("body-"), (F.col("id") % 50)).alias("text"))
        seen = spark.range(10).select(
            F.md5(F.concat(F.lit("body-"), F.col("id")).cast("binary"))
             .alias("text_hash"))
        out = incremental_dedup(batch, seen)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # every Exchange input is digest/id-grain: text appears only in
        # scan projections, never in an exchange's hashpartitioning keys
        for frag in plan.split("Exchange")[1:]:
            assert "text#" not in frag.split("\n")[0]


class TestIncrementalFuzzyDedup:
    """incremental_fuzzy_dedup: batch-vs-signature-ledger near-dup drop."""

    BASE = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest tonight")

    def _corpus(self, spark):
        # kept docs 0..2; doc 1's text will be near-duplicated in batch
        rows = [(0, self.BASE),
                (1, "completely different content about spark physical "
                    "plans and shuffle partitioning strategies here"),
                (2, "third unrelated document body with enough words to "
                    "shingle cleanly for the test")]
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def _batch(self, spark):
        # 10: near-dup of corpus 0 (one word changed) -> dropped
        # 11: fresh -> kept;  12: short/no shingles -> kept
        rows = [(10, self.BASE.replace("tonight", "today")),
                (11, "a genuinely novel batch document with entirely "
                     "new vocabulary and no overlap at all whatsoever"),
                (12, "too short")]
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def _ledger(self, spark, corpus):
        from json_schema_rs_spark.operators.dedup import minhash_signature
        return minhash_signature(corpus).select("doc_id", "minhash")

    def test_near_dup_dropped_fresh_kept(self, spark):
        from json_schema_rs_spark.operators.dedup import (
            incremental_fuzzy_dedup)
        corpus = self._corpus(spark)
        out = incremental_fuzzy_dedup(self._batch(spark),
                                      self._ledger(spark, corpus), corpus)
        kept = sorted(r["doc_id"] for r in out.collect())
        assert kept == [11, 12]

    def test_output_signatures_appendable(self, spark):
        from json_schema_rs_spark.operators.dedup import (
            incremental_fuzzy_dedup, minhash_signature)
        corpus = self._corpus(spark)
        led = self._ledger(spark, corpus)
        out = incremental_fuzzy_dedup(self._batch(spark), led, corpus)
        # survivors' signatures equal a fresh signature computation
        fresh = {r["doc_id"]: r["minhash"] for r in
                 minhash_signature(self._batch(spark)).collect()}
        for r in out.collect():
            assert r["minhash"] == fresh[r["doc_id"]]
        # and the ledger grows by exactly the survivors
        led2 = led.unionByName(out.select("doc_id", "minhash"))
        assert led2.count() == 5

    def test_second_batch_sees_first_batch_survivors(self, spark):
        from json_schema_rs_spark.operators.dedup import (
            incremental_fuzzy_dedup)
        corpus = self._corpus(spark)
        led = self._ledger(spark, corpus)
        b1 = self._batch(spark)
        out1 = incremental_fuzzy_dedup(b1, led, corpus)
        led2 = led.unionByName(out1.select("doc_id", "minhash"))
        corpus2 = corpus.unionByName(b1.join(
            out1.select("doc_id"), "doc_id"))
        # batch 2 re-sends doc 11's text -> dropped against batch-1 kept
        b2 = b1.filter("doc_id = 11").withColumn(
            "doc_id", F.col("doc_id") + 100)
        out2 = incremental_fuzzy_dedup(b2, led2, corpus2)
        assert out2.collect() == []

    def test_ledger_never_shuffles_batch_broadcast(self, spark):
        from json_schema_rs_spark.operators.dedup import (
            incremental_fuzzy_dedup)
        corpus = self._corpus(spark)
        out = incremental_fuzzy_dedup(self._batch(spark),
                                      self._ledger(spark, corpus), corpus)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
        assert "BroadcastExchange" in plan


class TestSourceDupStats:
    def test_counts_and_cross_source(self, spark):
        from json_schema_rs_spark.operators.dedup import source_dup_stats
        df = spark.createDataFrame([
            (0, "sA", "same text"), (1, "sA", "same text"),   # within-A dup
            (2, "sA", "unique a"),
            (3, "sB", "same text"),                           # cross-source
            (4, "sB", "unique b"), (5, "sB", "unique b2"),
        ], "doc_id bigint, source string, text string")
        out = {r["source"]: r for r in source_dup_stats(df).collect()}
        a, b = out["sA"], out["sB"]
        assert (a["n_docs"], a["n_dup_docs"], a["n_cross_source"]) \
            == (3, 2, 2)
        assert a["dup_rate"] == round(2 / 3, 6)
        assert (b["n_docs"], b["n_dup_docs"], b["n_cross_source"]) \
            == (3, 1, 1)

    def test_clean_corpus_all_zero(self, spark):
        from json_schema_rs_spark.operators.dedup import source_dup_stats
        df = spark.createDataFrame(
            [(i, "s", f"text {i}") for i in range(5)],
            "doc_id bigint, source string, text string")
        r = source_dup_stats(df).collect()[0]
        assert r["n_dup_docs"] == 0 and r["dup_rate"] == 0.0

    def test_digest_grain_shuffles_only(self, spark):
        from json_schema_rs_spark.operators.dedup import source_dup_stats
        df = spark.createDataFrame(
            [(i, "s", f"text {i}") for i in range(5)],
            "doc_id bigint, source string, text string")
        plan = (source_dup_stats(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "CartesianProduct" not in plan
        # the join key is the 16-byte digest, never text
        assert "text" not in plan.split("SortMergeJoin")[-1].split(
            "HashAggregate")[0] if "SortMergeJoin" in plan else True


class TestDedupSummary:
    def test_values_with_tokens(self, spark):
        from json_schema_rs_spark.operators.dedup import dedup_summary
        groups = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1),     # size-3 group, survivor 1
             (10, 10), (11, 10),         # size-2 group, survivor 10
             (20, 20), (21, 20)],        # size-2 group, survivor 20
            "doc_id bigint, group_id bigint")
        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b c"), (3, "a"),
             (10, "x y z w"), (11, "x"),
             (20, "p q"), (21, "p q")],
            "doc_id bigint, text string")
        out = {r["group_size"]: r for r in
               dedup_summary(groups, docs).collect()}
        assert set(out) == {2, 3}
        r = out[3]
        assert r["n_groups"] == 1 and r["n_docs"] == 3
        assert r["n_excess_docs"] == 2
        assert r["excess_tokens"] == 4          # (2+3+1) - 2
        r = out[2]
        assert r["n_groups"] == 2 and r["n_docs"] == 4
        assert r["n_excess_docs"] == 2
        assert r["excess_tokens"] == 1 + 2      # grp10: 5-4; grp20: 4-2

    def test_without_docs_and_missing_doc(self, spark):
        from json_schema_rs_spark.operators.dedup import dedup_summary
        groups = spark.createDataFrame([(1, 1), (2, 1)],
                                       "doc_id bigint, group_id bigint")
        out = dedup_summary(groups).collect()
        assert len(out) == 1
        assert out[0]["group_size"] == 2 and out[0]["n_excess_docs"] == 1
        assert "excess_tokens" not in out[0].asDict()
        # doc absent from the docs table counts 0 tokens, never NULLs
        docs = spark.createDataFrame([(1, "a b")],
                                     "doc_id bigint, text string")
        r = dedup_summary(groups, docs).collect()[0]
        assert r["excess_tokens"] in (0, 2)     # survivor is doc 1
        assert r["excess_tokens"] == 0          # doc 2 missing -> 0 - but
        # min-id survivor is doc 1 (2 tokens); excess = total(2) - 2 = 0

    def test_text_never_shuffles(self, spark):
        from json_schema_rs_spark.operators.dedup import dedup_summary
        groups = spark.createDataFrame([(1, 1), (2, 1)],
                                       "doc_id bigint, group_id bigint")
        docs = spark.createDataFrame([(1, "a b"), (2, "c")],
                                     "doc_id bigint, text string")
        plan = (dedup_summary(groups, docs)
                ._jdf.queryExecution().executedPlan().toString())
        import re
        # every Exchange moves only id/group/long columns, never text
        for ex in re.findall(r"Exchange [^\n]*", plan):
            assert "text" not in ex


# ---------------------------------------------------------------------------
# ngram_containment_pairs: the asymmetric (quote) near-dup detector
# ---------------------------------------------------------------------------


class TestContainmentPairs:
    def _pairs(self, spark, rows, **kw):
        from json_schema_rs_spark.operators.dedup import (
            ngram_containment_pairs)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {(r.doc_a, r.doc_b): r
                for r in ngram_containment_pairs(df, **kw).collect()}

    def test_quote_scores_containment_not_jaccard(self, spark):
        short = "alpha beta gamma delta epsilon zeta"
        long = ("intro one two three four five six seven eight nine ten "
                + short +
                " closing eleven twelve thirteen fourteen fifteen sixteen")
        out = self._pairs(spark, [(1, long), (2, short)], threshold=0.9)
        r = out[(1, 2)]
        # every 3-gram of the short doc occurs in the long one
        assert r.containment == 1.0
        assert r.size_b == r.n_inter
        assert r.jaccard < 0.25          # symmetric measure misses it
        # disjoint docs produce no pair at all
        out2 = self._pairs(spark, [(1, long), (2, "x y z w v u")],
                           threshold=0.0)
        assert (1, 2) not in out2

    def test_identical_docs_score_one_on_both(self, spark):
        t = "one two three four five six"
        r = self._pairs(spark, [(1, t), (2, t)], threshold=0.9)[(1, 2)]
        assert (r.containment, r.jaccard) == (1.0, 1.0)

    def test_matches_jaccard_operator_on_symmetric_pairs(self, spark):
        # the refactor must leave ngram_jaccard_pairs' values untouched:
        # the containment op's jaccard column equals the jaccard op's
        from json_schema_rs_spark.operators.dedup import (
            ngram_containment_pairs, ngram_jaccard_pairs)
        rows = [(i, f"shared common phrase body tail{i % 2} end{i % 3}")
                for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        jc = {(r.doc_a, r.doc_b): r.jaccard
              for r in ngram_jaccard_pairs(df, threshold=0.0).collect()}
        ct = {(r.doc_a, r.doc_b): r.jaccard
              for r in ngram_containment_pairs(df,
                                               threshold=0.0).collect()}
        assert jc == ct and jc
