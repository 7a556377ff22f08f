"""Deterministic sampling / train-eval split (operators/sampling.py).

Expected memberships are recomputed with hashlib on the driver — the
operator under test never supplies its own verdicts — and the DuckDB
cross-engine twin is exercised through the x_doc_sample /
x_split_counts oracle entries.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from json_schema_rs_spark.operators.sampling import (
    _threshold,
    bucket_hex,
    deterministic_sample,
    stratified_sample,
    train_eval_split,
)


def _bucket(key, salt="0"):
    return hashlib.md5(f"{key}#{salt}".encode()).hexdigest()[:8]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_threshold_hex():
    assert _threshold(0.0) == "00000000"
    assert _threshold(0.25) == "40000000"
    assert _threshold(0.5) == "80000000"
    assert int(_threshold(0.1), 16) == int(0.1 * 16 ** 8)
    assert _threshold(1.0) > "ffffffff"  # keeps everything
    with pytest.raises(ValueError, match="fraction"):
        _threshold(1.5)


def test_sample_matches_hashlib_exactly(docs):
    got = {r["doc_id"]
           for r in deterministic_sample(docs, "doc_id", 0.25,
                                         salt="s1").collect()}
    want = {r["doc_id"] for r in docs.select("doc_id").collect()
            if _bucket(r["doc_id"], "s1") < "40000000"}
    assert got == want
    assert 0 < len(got) < docs.count()


def test_sample_reproducible_and_salt_sensitive(docs):
    a = {r["doc_id"] for r in
         deterministic_sample(docs, "doc_id", 0.3).collect()}
    b = {r["doc_id"] for r in
         deterministic_sample(docs, "doc_id", 0.3).collect()}
    c = {r["doc_id"] for r in
         deterministic_sample(docs, "doc_id", 0.3, salt="other").collect()}
    assert a == b
    assert a != c


def test_sample_nested_fractions(docs):
    # buckets nest: the 10% sample is a subset of the 30% sample at the
    # same salt — the property that lets a pipeline grow a sample
    # without re-drawing it
    s10 = {r["doc_id"] for r in
           deterministic_sample(docs, "doc_id", 0.1).collect()}
    s30 = {r["doc_id"] for r in
           deterministic_sample(docs, "doc_id", 0.3).collect()}
    assert s10 <= s30


def test_split_disjoint_exhaustive_key_coherent(spark):
    # conversation-grain coherence: every turn of a conv_id lands on the
    # same side, eval+train partition the input exactly
    rows = [(f"c{i % 7}", j) for i in range(21) for j in range(5)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int")
    out = train_eval_split(df, "conv_id", 0.5, salt="s")
    assert out.count() == df.count()
    sides = (out.groupBy("conv_id")
                .agg(F.countDistinct("split").alias("k")).collect())
    assert all(r["k"] == 1 for r in sides)
    by_key = {r["conv_id"]: r["split"]
              for r in out.select("conv_id", "split").distinct().collect()}
    for k, side in by_key.items():
        want = "eval" if _bucket(k, "s") < _threshold(0.5) else "train"
        assert side == want, k


def test_null_keys_bucket_deterministically(spark):
    df = spark.createDataFrame([(None,), ("x",)], "k string")
    out = {(r["k"], r["split"])
           for r in train_eval_split(df, "k", 0.5, salt="z").collect()}
    null_side = "eval" if _bucket("", "z") < _threshold(0.5) else "train"
    assert (None, null_side) in out
    assert len(out) == 2  # the NULL row is labelled, not dropped


def test_sample_fraction_is_calibrated(spark):
    # 4000 keys at 25%: binomial 3-sigma band ~ [850, 1150]
    df = spark.range(4000).withColumnRenamed("id", "k")
    n = deterministic_sample(df, "k", 0.25, salt="cal").count()
    assert 850 <= n <= 1150, n


def test_sample_plan_is_shuffle_free(docs):
    plan = (deterministic_sample(docs, "doc_id", 0.25)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_stratified_matches_per_stratum_hashlib(docs):
    fr = {"de": 1.0, "zh": 0.5, "en": 0.25}
    got = {r["doc_id"] for r in
           stratified_sample(docs, "doc_id", "lang", fr,
                             default_fraction=0.1, salt="t").collect()}
    want = set()
    for r in docs.select("doc_id", "lang").collect():
        cut = _threshold(fr.get(r["lang"], 0.1))
        if _bucket(r["doc_id"], "t") < cut:
            want.add(r["doc_id"])
    assert got == want
    # full-keep stratum really keeps everything
    n_de = docs.where(F.col("lang") == "de").count()
    kept_de = (stratified_sample(docs, "doc_id", "lang", fr,
                                 default_fraction=0.1, salt="t")
               .where(F.col("lang") == "de").count())
    assert kept_de == n_de


def test_stratified_consistent_with_flat_sample(docs):
    # a stratum at fraction f keeps exactly the keys the flat f-sample
    # keeps (same salt): mixes can be re-balanced without re-drawing
    strat = {r["doc_id"] for r in
             stratified_sample(docs, "doc_id", "lang", {"en": 0.25},
                               salt="c").collect()}
    flat = {r["doc_id"] for r in
            deterministic_sample(docs.where(F.col("lang") == "en"),
                                 "doc_id", 0.25, salt="c").collect()}
    assert strat == flat


def test_stratified_null_stratum_uses_default(spark):
    df = spark.createDataFrame(
        [(i, None) for i in range(200)], "k bigint, g string")
    out = stratified_sample(df, "k", "g", {"x": 1.0},
                            default_fraction=0.5, salt="n")
    want = sum(1 for i in range(200) if _bucket(i, "n") < _threshold(0.5))
    assert out.count() == want


def test_stratified_plan_is_shuffle_free(docs):
    plan = (stratified_sample(docs, "doc_id", "lang", {"en": 0.5})
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_bucket_hex_exposed_column(spark):
    df = spark.createDataFrame([("a",), ("b",)], "k string")
    got = {r["k"]: r["b"] for r in
           df.select("k", bucket_hex("k", "q").alias("b")).collect()}
    assert got == {"a": _bucket("a", "q"), "b": _bucket("b", "q")}


def test_mix_sources_exact_thresholds(spark):
    from json_schema_rs_spark.operators.sampling import (_HEX_SPACE,
                                                         mix_sources)
    rows = [(i, ["web", "books", "code"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "k bigint, src string")
    out = mix_sources(df, "src", {"web": 5, "books": 3, "code": 2},
                      "k", salt="t")
    got = {r["src"]: 0 for r in out.collect()}
    for r in out.collect():
        got[r["src"]] = got.get(r["src"], 0) + 1
    # recompute the exact integer thresholds driver-side
    # (bottleneck = argmin n/w -> web; thr_i = w_i*n_b*16^8/(w_b*n_i))
    n = {"web": 100, "books": 100, "code": 100}
    wb, nb = 5, n["web"]
    for src, w in {"web": 5, "books": 3, "code": 2}.items():
        thr = w * nb * _HEX_SPACE // (wb * n[src])
        want = sum(1 for i in range(300)
                   if ["web", "books", "code"][i % 3] == src
                   and (thr >= _HEX_SPACE or
                        int(_bucket(i, "t"), 16) < thr))
        assert got.get(src, 0) == want
    # the bottleneck source (largest weight per row) is kept whole
    assert got["web"] == 100


def test_mix_sources_partitioning_invariant(spark):
    from json_schema_rs_spark.operators.sampling import mix_sources
    rows = [(i, "a" if i % 2 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "k bigint, src string")
    w = {"a": 3, "b": 1}
    one = {r["k"] for r in
           mix_sources(df.coalesce(1), "src", w, "k").collect()}
    many = {r["k"] for r in
            mix_sources(df.repartition(16), "src", w, "k").collect()}
    assert one == many


def test_mix_sources_drops_unweighted_and_rejects_missing(spark):
    from json_schema_rs_spark.operators.sampling import mix_sources
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "junk")], "k bigint, src string")
    out = mix_sources(df, "src", {"a": 1, "b": 1}, "k")
    assert {r["src"] for r in out.collect()} <= {"a", "b"}
    with pytest.raises(ValueError, match="no rows"):
        mix_sources(df, "src", {"a": 1, "ghost": 1}, "k")
    with pytest.raises(ValueError, match="non-negative"):
        mix_sources(df, "src", {"a": -1}, "k")


def test_mix_sources_filter_is_shuffle_free(spark):
    from json_schema_rs_spark.operators.sampling import mix_sources
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(50)],
        "k bigint, src string")
    plan = (mix_sources(df, "src", {"a": 1, "b": 1}, "k")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_mix_sources_token_budget(spark):
    from json_schema_rs_spark.operators.sampling import (_HEX_SPACE,
                                                         mix_sources)
    # source "big" has few docs but huge token counts: by-rows it would
    # be the bottleneck's peer; by-budget it must be thinned hard
    rows = [(i, "big", 1000) for i in range(10)] + \
           [(100 + i, "small", 10) for i in range(100)]
    df = spark.createDataFrame(rows, "k bigint, src string, toks int")
    out = mix_sources(df, "src", {"big": 1, "small": 1}, "k",
                      salt="b", budget_col="toks")
    # exact threshold recompute: bottleneck = small (1000 toks at
    # weight 1); thr_big = 1*1000*16^8 // (1*10000)
    n = {"big": 10000, "small": 1000}
    wb, nb = 1, n["small"]
    got = {}
    for r in out.collect():
        got[r["src"]] = got.get(r["src"], 0) + 1
    for src in n:
        thr = 1 * nb * _HEX_SPACE // (wb * n[src])
        want_keys = [k for k, s, _ in rows if s == src
                     and (thr >= _HEX_SPACE or
                          int(_bucket(k, "b"), 16) < thr)]
        assert got.get(src, 0) == len(want_keys)
    # the token-cheap source is kept whole, the token-heavy one thinned
    assert got["small"] == 100
    assert got.get("big", 0) < 10


def test_mix_sources_bottleneck_kept_whole_non_divisible(spark):
    # w_b does not divide n_b*W: the old capacity-T formula thinned the
    # bottleneck by floor rounding; the ratio formula keeps it whole
    from json_schema_rs_spark.operators.sampling import mix_sources
    rows = [(i, "a") for i in range(100)] + \
           [(1000 + i, "b") for i in range(100)]
    df = spark.createDataFrame(rows, "k bigint, src string")
    out = mix_sources(df, "src", {"a": 3, "b": 1}, "k", salt="nd")
    got = {}
    for r in out.collect():
        got[r["src"]] = got.get(r["src"], 0) + 1
    assert got["a"] == 100  # bottleneck (n/w = 33.3 vs 100) kept whole


def test_mix_sources_rejects_bad_configs(spark):
    from json_schema_rs_spark.operators.sampling import mix_sources
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 5)], "k bigint, src string, toks int")
    with pytest.raises(ValueError, match="at least one positive"):
        mix_sources(df, "src", {"a": 0}, "k")
    with pytest.raises(ValueError, match="NULL values"):
        mix_sources(df, "src", {"a": 1}, "k", budget_col="toks")


# ---------------------------------------------------------------------------
# shard_corpus
# ---------------------------------------------------------------------------

def _okey(key, salt="shard"):
    return int(hashlib.md5(f"{key}#{salt}".encode()).hexdigest()[:15], 16)


def test_shard_corpus_matches_first_principles(spark):
    from json_schema_rs_spark.operators.sampling import shard_corpus
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id bigint")
    got = {r["doc_id"]: (r["shard"], r["pos"])
           for r in shard_corpus(df, "doc_id", 8).collect()}
    # recompute the permutation on the driver with hashlib
    by_shard = {}
    for i in range(200):
        by_shard.setdefault(_okey(i) % 8, []).append(i)
    want = {}
    for sh, members in by_shard.items():
        for pos, i in enumerate(sorted(members, key=lambda i: (_okey(i), i))):
            want[i] = (sh, pos)
    assert got == want


def test_shard_corpus_is_a_permutation(spark):
    from json_schema_rs_spark.operators.sampling import shard_corpus
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id bigint")
    out = shard_corpus(df, "doc_id", 8).collect()
    assert len(out) == 2000
    per = {}
    for r in out:
        assert 0 <= r["shard"] < 8
        per.setdefault(r["shard"], []).append(r["pos"])
    # positions are 0..n-1 contiguous within every shard
    for poss in per.values():
        assert sorted(poss) == list(range(len(poss)))
    # md5 buckets are uniform: no shard is pathologically hot/cold
    sizes = [len(v) for v in per.values()]
    assert len(per) == 8 and min(sizes) > 150 and max(sizes) < 350


def test_shard_corpus_single_shard_and_bad_n(spark):
    from json_schema_rs_spark.operators.sampling import shard_corpus
    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id bigint")
    out = shard_corpus(df, "doc_id", 1).collect()
    assert sorted(r["pos"] for r in out) == list(range(10))
    assert {r["shard"] for r in out} == {0}
    with pytest.raises(ValueError, match="n_shards"):
        shard_corpus(df, "doc_id", 0)


def test_shard_corpus_one_exchange(spark):
    from json_schema_rs_spark.operators.sampling import shard_corpus
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    plan = shard_corpus(df, "doc_id", 4)._jdf.queryExecution() \
        .executedPlan().toString()
    # the shard hash-partitioning IS the global shuffle - exactly one
    assert plan.count("Exchange") == 1


# -- dup_weighted_sample (soft dedup) ---------------------------------------

def _soft_keep(doc_id, n, salt="softdedup"):
    if n == 1:
        return True
    return _bucket(doc_id, salt) < format((16 ** 8) // n, "08x")


@pytest.fixture(scope="module")
def soft_input(spark):
    # 1 group of 4 (ids 0-3), 1 group of 2 (ids 10-11), singletons 20-29
    from json_schema_rs_spark.functions.exprs import arrow_local_df
    rows = ([(i,) for i in range(4)] + [(10,), (11,)]
            + [(i,) for i in range(20, 30)])
    df = arrow_local_df(spark, rows, "doc_id bigint")
    groups = arrow_local_df(
        spark,
        [(i, 0) for i in range(4)] + [(10, 10), (11, 10)],
        "doc_id bigint, group_id bigint")
    return df, groups


def test_soft_dedup_matches_hashlib(soft_input):
    from json_schema_rs_spark.operators.sampling import dup_weighted_sample
    df, groups = soft_input
    got = {r["doc_id"]: (r["group_id"], r["n_copies"], r["keep_prob"])
           for r in dup_weighted_sample(df, groups).collect()}
    sizes = {**{i: (0, 4) for i in range(4)},
             **{i: (10, 2) for i in (10, 11)}}
    want = {i: sizes.get(i, (i, 1)) for (i,) in
            [(i,) for i in list(range(4)) + [10, 11] + list(range(20, 30))]
            if _soft_keep(i, sizes.get(i, (i, 1))[1])}
    assert set(got) == set(want)
    for i, (gid, n) in want.items():
        assert got[i][0] == gid and got[i][1] == n
        assert got[i][2] == pytest.approx(round(1.0 / n, 6))
    # every singleton survives with prob 1
    assert all(i in got for i in range(20, 30))


def test_soft_dedup_expected_survival_is_one(spark):
    # a 500-member duplicate group keeps ~1/n of its members: with
    # n=500 the binomial mean is 1; assert the draw lands in [0, 8]
    # (P(X>8) < 1e-6) and is deterministic across reruns
    from json_schema_rs_spark.functions.exprs import arrow_local_df
    from json_schema_rs_spark.operators.sampling import dup_weighted_sample
    df = arrow_local_df(spark, [(i,) for i in range(500)], "doc_id bigint")
    groups = arrow_local_df(spark, [(i, 0) for i in range(500)],
                            "doc_id bigint, group_id bigint")
    a = sorted(r["doc_id"] for r in dup_weighted_sample(df, groups).collect())
    b = sorted(r["doc_id"] for r in dup_weighted_sample(df, groups).collect())
    assert a == b
    assert len(a) <= 8
    for i in a:
        assert _soft_keep(i, 500)


def test_soft_dedup_shuffles_ids_only(spark):
    # the corpus text column must not appear in any Exchange input —
    # the join/filter runs over (id, group) skinny rows
    from json_schema_rs_spark.functions.exprs import arrow_local_df
    from json_schema_rs_spark.operators.sampling import dup_weighted_sample
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body-"), F.col("id")).alias("text"))
    groups = arrow_local_df(spark, [(i, i % 7) for i in range(50)],
                            "doc_id bigint, group_id bigint")
    out = dup_weighted_sample(df, groups)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan.split("Scan")[0]  # pruned before any op


# -- temperature_weights ------------------------------------------------------

def test_temperature_weights_sqrt_exact(spark):
    import math
    from json_schema_rs_spark.operators.sampling import temperature_weights
    rows = [("a",)] * 100 + [("b",)] * 25 + [("c",)] * 4
    df = spark.createDataFrame(rows, "source string")
    w = temperature_weights(df, "source", alpha=0.5)
    assert w == {"a": math.floor(math.sqrt(100) * 10**6),
                 "b": math.floor(math.sqrt(25) * 10**6),
                 "c": math.floor(math.sqrt(4) * 10**6)}
    # sqrt shares: 10:5:2
    assert w["a"] * 2 == w["c"] * 10 and w["b"] * 2 == w["c"] * 5


def test_temperature_mix_keeps_smallest_source_whole(spark):
    from json_schema_rs_spark.operators.sampling import (
        mix_sources, temperature_weights)
    rows = [(i, "big" if i < 400 else "small") for i in range(420)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    w = temperature_weights(df, "source", alpha=0.5)
    out = mix_sources(df, "source", w, "doc_id", salt="twt")
    by_src = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
    # the smallest source is the bottleneck: kept whole
    assert by_src["small"] == 20
    # the big source thins toward sqrt proportion (400 * (20/400)**0.5
    # * ... exact expectation = n_b * w_big/w_small * ... ~ 89); allow
    # the hash-draw's binomial spread
    assert 60 <= by_src["big"] <= 120


def test_temperature_alpha_one_is_proportional(spark):
    from json_schema_rs_spark.operators.sampling import temperature_weights
    rows = [("a",)] * 30 + [("b",)] * 10
    df = spark.createDataFrame(rows, "source string")
    w = temperature_weights(df, "source", alpha=1.0)
    assert w["a"] == 3 * w["b"]


class TestQuotaSample:
    def _df(self, spark):
        rows = [(i, f"s{i % 3}") for i in range(60)]  # 20 docs/source
        return spark.createDataFrame(
            rows, "doc_id bigint, source string").repartition(8)

    def test_exact_count_per_group(self, spark):
        from json_schema_rs_spark.operators.sampling import quota_sample
        out = quota_sample(self._df(spark), "source", 5).collect()
        from collections import Counter
        c = Counter(r["source"] for r in out)
        assert c == {"s0": 5, "s1": 5, "s2": 5}
        for r in out:
            assert 1 <= r["sample_rank"] <= 5

    def test_matches_bruteforce_md5_order(self, spark):
        from json_schema_rs_spark.operators.sampling import quota_sample
        import hashlib
        df = self._df(spark)
        got = sorted((r["source"], r["doc_id"], r["sample_rank"])
                     for r in quota_sample(df, "source", 4,
                                           salt="q").collect())
        rows = sorted(
            ((i, f"s{i % 3}") for i in range(60)),
            key=lambda t: hashlib.md5(f"{t[0]}#q".encode()).hexdigest())
        want = []
        seen = {}
        for i, src in rows:
            k = seen.setdefault(src, [])
            if len(k) < 4:
                k.append(i)
                want.append((src, i, len(k)))
        assert got == sorted(want)

    def test_small_groups_kept_whole(self, spark):
        from json_schema_rs_spark.operators.sampling import quota_sample
        df = spark.createDataFrame([(1, "tiny"), (2, "tiny")],
                                   "doc_id bigint, source string")
        assert quota_sample(df, "source", 100).count() == 2

    def test_layout_independent(self, spark):
        from json_schema_rs_spark.operators.sampling import quota_sample
        df = self._df(spark)
        a = sorted(r["doc_id"] for r in quota_sample(df, "source", 7)
                   .collect())
        b = sorted(r["doc_id"] for r in
                   quota_sample(df.repartition(3), "source", 7).collect())
        assert a == b


class TestDsir:
    @staticmethod
    def _bucket(gram: str, buckets: int) -> int:
        import hashlib
        return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % buckets

    def _expected(self, raw_texts, target_texts, ns, buckets):
        # independent NumPy/stdlib twin of the whole pipeline
        import math

        def grams(t):
            ws = [w for w in (t or "").split(" ") if w != ""]
            out = []
            for n in sorted(set(ns)):
                out += [" ".join(ws[i:i + n])
                        for i in range(len(ws) - n + 1)]
            return out

        def counts(texts):
            c = {}
            for t in texts:
                for g in grams(t):
                    b = self._bucket(g, buckets)
                    c[b] = c.get(b, 0) + 1
            return c

        tc, rc = counts(target_texts), counts(raw_texts)
        dt = float(sum(tc.values()) + buckets)
        dr = float(sum(rc.values()) + buckets)
        w = {b: math.floor(math.log((tc.get(b, 0) + 1) / dt) * 1e6)
             - math.floor(math.log((rc.get(b, 0) + 1) / dr) * 1e6)
             for b in range(buckets)}
        exp = {}
        for i, t in enumerate(raw_texts):
            gs = grams(t)
            logw = sum(w[self._bucket(g, buckets)] for g in gs)
            exp[i] = (len(gs), logw if gs else 0,
                      math.floor(logw / len(gs)) / 1e6 if gs else 0.0)
        return exp

    def test_values_match_stdlib_twin(self, spark):
        from json_schema_rs_spark.operators.sampling import dsir_weights
        raw = ["alpha beta beta gamma", "delta epsilon", "alpha alpha",
               "", None]
        tgt = ["alpha beta alpha", "beta beta"]
        raw_df = spark.createDataFrame(
            list(enumerate(raw)), "doc_id bigint, text string")
        tgt_df = spark.createDataFrame(
            list(enumerate(tgt)), "doc_id bigint, text string")
        out = {r["doc_id"]: (r["n_grams"], r["logw_micro"], r["avg_logw"])
               for r in dsir_weights(raw_df, tgt_df, ns=(1, 2),
                                     buckets=64).collect()}
        assert out == self._expected(raw, tgt, (1, 2), 64)

    def test_target_like_docs_score_higher(self, spark):
        from json_schema_rs_spark.operators.sampling import dsir_weights
        raw = [(0, "wiki style encyclopedic article text"),
               (1, "buy cheap pills now click here"),
               (2, "wiki style article about science")]
        tgt = [(0, "wiki style encyclopedic science article"),
               (1, "wiki article style text")]
        out = {r["doc_id"]: r["avg_logw"] for r in dsir_weights(
            spark.createDataFrame(raw, "doc_id bigint, text string"),
            spark.createDataFrame(tgt, "doc_id bigint, text string"),
            ns=(1,), buckets=256).collect()}
        assert out[0] > out[1] and out[2] > out[1]

    def test_ngram_counts(self, spark):
        from json_schema_rs_spark.operators.sampling import dsir_weights
        df = spark.createDataFrame([(0, "x y z")],
                                   "doc_id bigint, text string")
        row = dsir_weights(df, df, ns=(1, 2), buckets=16).collect()[0]
        assert row["n_grams"] == 5  # 3 unigrams + 2 bigrams

    def test_sample_is_exact_topn(self, spark):
        from json_schema_rs_spark.operators.sampling import (
            dsir_sample, dsir_weights)
        raw = [(i, ("wiki text " if i % 2 == 0 else "spam junk ") * 3)
               for i in range(10)]
        raw_df = spark.createDataFrame(raw, "doc_id bigint, text string")
        tgt_df = spark.createDataFrame([(0, "wiki text wiki text")],
                                       "doc_id bigint, text string")
        table_free = dsir_weights(raw_df, tgt_df, ns=(1,), buckets=64)
        want = [r["doc_id"] for r in table_free.orderBy(
            F.desc("logw_micro"), F.asc("doc_id")).limit(4).collect()]
        got = dsir_sample(raw_df, tgt_df, 4, ns=(1,), buckets=64)
        assert sorted(r["doc_id"] for r in got.collect()) == sorted(want)
        assert set(got.columns) == {"doc_id", "text", "logw_micro"}
        assert all(i % 2 == 0 for i in want)  # the wiki-like half wins

    def test_trained_table_reuse_and_validation(self, spark):
        from json_schema_rs_spark.operators.sampling import (
            dsir_weight_table, dsir_weights)
        df = spark.createDataFrame([(0, "a b"), (1, "c")],
                                   "doc_id bigint, text string")
        tab = dsir_weight_table(df, df, ns=(1,), buckets=32)
        assert len(tab) == 32
        out1 = dsir_weights(df, df, ns=(1,), buckets=32).collect()
        out2 = dsir_weights(df, df, ns=(1,), buckets=32,
                            table=tab).collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
        import pytest as _pt
        with _pt.raises(ValueError):
            dsir_weights(df, df, ns=(1,), buckets=64, table=tab)
        with _pt.raises(ValueError):
            dsir_weights(df, df, ns=(0,), buckets=8)

    def test_scoring_plan_shape(self, spark):
        from json_schema_rs_spark.operators.sampling import (
            dsir_weight_table, dsir_weights)
        df = spark.createDataFrame([(0, "a b c")],
                                   "doc_id bigint, text string")
        tab = dsir_weight_table(df, df, ns=(1,), buckets=16)
        plan = (dsir_weights(df, df, ns=(1,), buckets=16, table=tab)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan      # weight-table probe
        assert "CartesianProduct" not in plan
        assert "Python" not in plan             # all JVM codegen


# ---------------------------------------------------------------------------
# coverage_sample: per-IVF-bucket exact quota over embeddings
# ---------------------------------------------------------------------------


class TestCoverageSample:
    @pytest.fixture(scope="class")
    def emb(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def test_quota_and_membership_match_assignment(self, emb):
        from json_schema_rs_spark.operators.similarity import (
            assign_buckets, coverage_sample)
        out = coverage_sample(emb, per_bucket=5, n_centroids=8).collect()
        by_bucket = {}
        for r in out:
            by_bucket.setdefault(r.bucket_id, []).append(r)
        # quota respected, ranks are 1..k within each bucket
        for rows in by_bucket.values():
            assert len(rows) <= 5
            assert sorted(r.sample_rank for r in rows) == \
                list(range(1, len(rows) + 1))
        # sampled ids carry their TRUE bucket (membership = assignment)
        cents = (emb.orderBy("vec_id").limit(8)
                 .select(F.col("vec_id").alias("centroid_id"),
                         F.col("embedding").alias("centroid")))
        truth = {r.vec_id: r.bucket_id
                 for r in assign_buckets(emb, cents).collect()}
        for r in out:
            assert truth[r.vec_id] == r.bucket_id
        # the md5-smallest keys win: recompute the winners per bucket
        want = {}
        for vid, b in truth.items():
            want.setdefault(b, []).append((_bucket(vid)[:32], vid))
        for b, pairs in want.items():
            expect = {v for _, v in sorted(
                (hashlib.md5(f"{v}#0".encode()).hexdigest(), v)
                for _, v in pairs)[:5]}
            assert {r.vec_id for r in by_bucket[b]} == expect

    def test_small_buckets_kept_whole_and_deterministic(self, spark):
        from json_schema_rs_spark.operators.similarity import coverage_sample
        rows = [(i, [float(i % 3 == 0), float(i % 3 == 1),
                     float(i % 3 == 2)]) for i in range(9)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        a = {(r.vec_id, r.bucket_id, r.sample_rank)
             for r in coverage_sample(df, per_bucket=10,
                                      n_centroids=3).collect()}
        b = {(r.vec_id, r.bucket_id, r.sample_rank)
             for r in coverage_sample(df, per_bucket=10,
                                      n_centroids=3).collect()}
        assert a == b and len(a) == 9  # all rows survive under-quota


class TestQualityBucketSample:
    def test_bucket_membership_and_rates(self, spark):
        from json_schema_rs_spark.operators.sampling import (
            quality_bucket_sample)
        rows = [(i, float(i)) for i in range(100)] + [(100, None)]
        df = spark.createDataFrame(rows, "doc_id long, s double")
        out = quality_bucket_sample(df, "s", [0.0, 1.0],
                                    key_col="doc_id").collect()
        got = {r.doc_id: r.score_bucket for r in out}
        # bottom half (s < median) kept at 0.0 -> none survive;
        # top half kept at 1.0 -> all survive; NULL dropped
        assert set(got.values()) == {1}
        # quantile_disc median of 0..99 is 49; ties go UP, so s >= 49
        assert min(got) == 49 and len(got) == 51
        assert 100 not in got

    def test_deterministic_and_hashlib_exact(self, spark):
        from json_schema_rs_spark.operators.sampling import (
            quality_bucket_sample)
        rows = [(i, float(i % 10)) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, s double")
        out1 = {(r.doc_id, r.score_bucket) for r in quality_bucket_sample(
            df, "s", [0.25, 0.75], key_col="doc_id").collect()}
        out2 = {(r.doc_id, r.score_bucket) for r in quality_bucket_sample(
            df, "s", [0.25, 0.75], key_col="doc_id").collect()}
        assert out1 == out2
        # recompute the expected survivors with hashlib
        svals = sorted(v for _, v in rows)
        import math
        edge = svals[max(math.ceil(0.5 * len(svals)) - 1, 0)]
        want = set()
        for i, v in rows:
            b = 1 if v >= edge else 0
            frac = [0.25, 0.75][b]
            hx = hashlib.md5(f"{i}#qb0".encode()).hexdigest()[:8]
            thr = format(min(int(frac * 2**32), 2**32 - 1), "08x") \
                if frac < 1.0 else "g"
            if hx < thr:
                want.add((i, b))
        assert out1 == want

    def test_bad_args(self, spark):
        from json_schema_rs_spark.operators.sampling import (
            quality_bucket_sample)
        df = spark.createDataFrame([(1, 1.0)], "doc_id long, s double")
        with pytest.raises(ValueError):
            quality_bucket_sample(df, "s", [0.5])
        with pytest.raises(ValueError):
            quality_bucket_sample(df, "s", [0.5, 1.5])
