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
