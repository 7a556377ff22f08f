"""Lloyd k-means centroid training for the IVF operators: deterministic,
convergent on separated clusters, and a drop-in improvement for
bucket balance / recall."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from json_schema_rs_spark.operators.similarity import (
    assign_buckets,
    cosine_topk,
    ivf_topk,
    kmeans_centroids,
)


def _clustered_rows():
    """3 well-separated direction clusters in 4-d (cosine metric), 30
    vectors each, ids interleaved so lowest-id init starts badly."""
    bases = [(10.0, 1.0, 0.0, 0.0), (0.0, 10.0, 1.0, 0.0),
             (0.0, 0.0, 1.0, 10.0)]
    rows = []
    for i in range(90):
        b = bases[i % 3]
        jit = 0.05 * ((i * 7) % 11 - 5)          # deterministic jitter
        rows.append((i, [b[0] + jit, b[1] - jit, b[2] + 0.5 * jit, b[3]]))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        _clustered_rows(), "vec_id bigint, embedding array<double>")


def test_kmeans_separates_clusters(spark, corpus):
    cents = kmeans_centroids(corpus, 3, iters=4)
    assert cents.count() == 3
    assigned = assign_buckets(corpus, cents).select("vec_id", "bucket_id")
    buckets = {r.vec_id: r.bucket_id for r in assigned.collect()}
    # every true cluster (vec_id mod 3) lands in exactly one bucket
    for m in range(3):
        got = {buckets[i] for i in range(90) if i % 3 == m}
        assert len(got) == 1, f"cluster {m} split across buckets {got}"
    # and the three buckets are distinct
    assert len({buckets[i] for i in range(90)}) == 3


def test_kmeans_deterministic(spark, corpus):
    a = kmeans_centroids(corpus, 3, iters=3).collect()
    b = kmeans_centroids(corpus, 3, iters=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmeans_zero_iters_is_init(spark, corpus):
    cents = kmeans_centroids(corpus, 4, iters=0).collect()
    init = {r.vec_id: list(r.embedding)
            for r in corpus.orderBy("vec_id").limit(4).collect()}
    assert {r.centroid_id: list(r.centroid) for r in cents} == init


def test_trained_centroids_plug_into_ivf(spark, corpus):
    """ivf_topk with trained centroids reaches exact-recall on the
    clustered corpus at nprobe=1 (each query's true neighbors share its
    bucket), and the assignment plan stays shuffle-free."""
    cents = kmeans_centroids(corpus, 3, iters=4)
    queries = corpus.filter(F.col("vec_id") < 3)
    exact = cosine_topk(corpus, queries, k=5)
    approx = ivf_topk(corpus, queries, k=5, nprobe=1, centroids=cents)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(a & e) / len(e) == 1.0
    plan = assign_buckets(corpus, cents)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# mean_embedding_by: per-group centroids under the integer micro contract
# ---------------------------------------------------------------------------


class TestMeanEmbeddingBy:
    def test_exact_micro_mean_and_exclusions(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            mean_embedding_by)
        rows = [
            (1, [1.0, 2.0], "a"),
            (2, [3.0, 4.0], "a"),
            (3, [5.0, 6.0], "b"),
            (4, None, "b"),            # NULL vector excluded
            (5, [], "b"),              # empty excluded
            (6, [1.0, 2.0, 3.0], "b"),  # wrong dims excluded
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, grp string")
        out = {r.grp: r for r in mean_embedding_by(df, "grp").collect()}
        assert out["a"].n_vectors == 2
        assert out["a"].embedding == [2.0, 3.0]
        assert out["b"].n_vectors == 1
        assert out["b"].embedding == [5.0, 6.0]

    def test_order_free_bit_identical(self, spark):
        # same rows, reversed order + different partitioning -> the SAME
        # bytes (this is the point of the integer micro-unit contract)
        from json_schema_rs_spark.operators.similarity import (
            mean_embedding_by)
        import random
        rng = random.Random(3)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)], f"g{i % 2}")
                for i in range(40)]
        mk = lambda rs, parts: spark.createDataFrame(  # noqa: E731
            rs, "vec_id long, embedding array<float>, grp string"
        ).repartition(parts)
        a = {r.grp: r.embedding
             for r in mean_embedding_by(mk(rows, 1), "grp").collect()}
        b = {r.grp: r.embedding
             for r in mean_embedding_by(mk(rows[::-1], 7), "grp").collect()}
        assert a == b

    def test_null_element_skips_dimension_keeps_row(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            mean_embedding_by)
        df = spark.createDataFrame(
            [(1, [1.0, None], "g"), (2, [3.0, 5.0], "g")],
            "vec_id long, embedding array<double>, grp string")
        r = mean_embedding_by(df, "grp").collect()[0]
        assert r.n_vectors == 2
        # dim 0 averages both rows; dim 1's NULL contributes nothing but
        # the row still counts in the denominator
        assert r.embedding == [2.0, 2.5]

    def test_empty_input_keeps_group_dtype(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            mean_embedding_by)
        df = spark.createDataFrame(
            [], "vec_id long, embedding array<float>, label int")
        out = mean_embedding_by(df, "label")
        assert out.count() == 0
        assert dict(out.dtypes)["label"] == "int"


class TestGroupCentroidSimilarity:
    def test_identical_groups_score_one_orthogonal_zero(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            group_centroid_similarity)
        rows = (
            [(i, [1.0, 0.0], "a") for i in range(3)]
            + [(10 + i, [1.0, 0.0], "b") for i in range(2)]  # same dir
            + [(20 + i, [0.0, 1.0], "c") for i in range(2)]  # orthogonal
        )
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, grp string")
        out = {(r.group_a, r.group_b): r
               for r in group_centroid_similarity(df, "grp").collect()}
        assert out[("a", "b")].cos_sim == 1.0
        assert out[("a", "c")].cos_sim == 0.0
        assert (out[("a", "b")].n_a, out[("a", "b")].n_b) == (3, 2)
        assert len(out) == 3  # C(3,2) pairs

    def test_zero_norm_centroid_emits_null(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            group_centroid_similarity)
        df = spark.createDataFrame(
            [(1, [0.0, 0.0], "z"), (2, [1.0, 1.0], "a")],
            "vec_id long, embedding array<float>, grp string")
        out = {(r.group_a, r.group_b): r.cos_sim
               for r in group_centroid_similarity(df, "grp").collect()}
        assert out[("a", "z")] is None


class TestCentroidClassify:
    def test_separated_clusters_classify_cleanly(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            centroid_classify)
        rows = (
            [(i, [1.0, 0.0, 0.05 * i], 0) for i in range(4)]
            + [(10 + i, [0.0, 1.0, 0.05 * i], 1) for i in range(4)]
            # one vector labeled 0 but sitting in cluster 1
            + [(20, [0.0, 1.0, 0.0], 0)]
            # unlabeled: gets a prediction, NULL agreement
            + [(21, [1.0, 0.0, 0.0], None)]
            # invalid vector: NULL prediction
            + [(22, None, 0)]
        )
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")
        out = {r.vec_id: r for r in centroid_classify(df).collect()}
        for i in range(4):
            assert out[i].predicted_label == 0 and out[i].agrees
            assert out[10 + i].predicted_label == 1 and out[10 + i].agrees
        assert out[20].predicted_label == 1 and out[20].agrees is False
        assert out[21].predicted_label == 0 and out[21].agrees is None
        assert out[22].predicted_label is None and out[22].agrees is None

    def test_assignment_is_shuffle_free(self, spark, sf_dir):
        from json_schema_rs_spark.operators.similarity import (
            centroid_classify)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        plan = centroid_classify(emb)._jdf.queryExecution() \
            .executedPlan().toString()
        # the classify scan itself never exchanges the corpus (the
        # centroid TRAINING aggregate runs as its own earlier job)
        assert "Exchange" not in plan
        assert "CartesianProduct" not in plan


class TestDimensionProfile:
    def test_stats_dead_and_null_handling(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            dimension_profile)
        rows = [
            (1, [1.0, 0.0, 2.0, 0.5]),
            (2, [3.0, 0.0, 2.0, None]),
            (3, None),                      # NULL vector skipped
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        out = {r.dim: r for r in dimension_profile(df).collect()}
        # dim 0: mean 2.0, std 1.0
        assert (out[0].n, out[0].mean, out[0].std) == (2, 2.0, 1.0)
        # dim 1: all zero -> dead
        assert out[1].dead and out[1].n_zero == 2 and out[1].std == 0.0
        # dim 2: constant nonzero -> std 0, not dead
        assert out[2].std == 0.0 and not out[2].dead
        # dim 3: NULL element drops from n
        assert out[3].n == 1 and out[3].mean == 0.5

    def test_matches_numpy_at_6dp(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            dimension_profile)
        import numpy as np
        rng = np.random.RandomState(9)
        mat = rng.uniform(-1, 1, size=(200, 8))
        df = spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
            "vec_id long, embedding array<double>")
        out = {r.dim: r for r in dimension_profile(df).collect()}
        q = np.round(mat * 1e6) / 1e6     # the micro quantization
        for d in range(8):
            assert abs(out[d].mean - q[:, d].mean()) < 2e-6
            assert abs(out[d].std - q[:, d].std()) < 2e-6
