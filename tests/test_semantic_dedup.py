"""SemDeDup composition (`similarity.semantic_dedup`): IVF-bucketed
pairs -> transitive groups -> canonical survivor, end to end.

The synthetic corpus has known near-duplicate chains, so the expected
groups/survivors are derivable by hand; the operator must recover them
exactly, and the score-aware variant must pick the highest-scored copy.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_schema_rs_spark.operators.similarity import (
    kmeans_centroids,
    semantic_dedup,
)


def _rows():
    """Two tight duplicate clusters + singletons, in 4-d. The 4
    lowest ids span four DISTINCT directions so the seed-vector
    centroids are well-spread (the realistic case; the pathological
    all-seeds-are-dups case is covered by the trained-centroid test).

    Cluster A (ids 2, 30, 31): jitter around (10,1,0,0) — pairwise
    cosine > 0.999. Cluster B (ids 3, 40): around (0,10,1,0).
    Singletons: ids 0, 1 point in other directions.
    """
    return [
        (0, [1.0, 0.0, 0.0, 10.0]),
        (1, [0.0, 1.0, 10.0, 0.0]),
        (2, [10.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 10.0, 1.0, 0.0]),
        (30, [10.0, 1.01, 0.0, 0.0]),
        (31, [10.02, 1.0, 0.01, 0.0]),
        (40, [0.0, 10.0, 1.02, 0.01]),
    ]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        _rows(), "vec_id bigint, embedding array<double>")


def test_groups_and_min_id_survivors(spark, corpus):
    out = semantic_dedup(corpus, threshold=0.999, n_centroids=4)
    rows = {r["vec_id"]: r for r in out.collect()}
    # survivors: min id per dup group + every singleton
    assert set(rows) == {0, 1, 2, 3}
    assert rows[2]["group_id"] == 2 and rows[2]["group_size"] == 3
    assert rows[3]["group_id"] == 3 and rows[3]["group_size"] == 2
    for s in (0, 1):
        assert rows[s]["group_id"] == s and rows[s]["group_size"] == 1


def test_score_aware_survivor(spark, corpus):
    # score prefers the HIGHEST-scored member, not the smallest id
    scored = corpus.withColumn(
        "quality", F.col("vec_id").cast("double"))  # bigger id = better
    out = semantic_dedup(scored, threshold=0.999, n_centroids=4,
                         score_col="quality")
    rows = {r["vec_id"]: r for r in out.collect()}
    assert set(rows) == {0, 1, 31, 40}           # argmax per group
    assert rows[31]["group_size"] == 3 and rows[31]["quality"] == 31.0
    assert rows[40]["group_size"] == 2


def test_trained_centroids_reduce_seed_dup_split(spark):
    # the documented seed-centroid failure mode: when the lowest ids are
    # themselves near-dups, each becomes its own centroid and the group
    # splits across buckets (missed pairs). Lloyd training drifts the
    # redundant centroids apart as other clusters pull members, merging
    # at least part of the duplicate cluster back into one bucket —
    # assert the structural invariants plus strict improvement, not an
    # exact grouping (Lloyd dynamics on ties are not worth pinning).
    rows = [
        (0, [10.0, 1.0, 0.0, 0.0]),              # dup cluster = seeds
        (1, [10.0, 1.01, 0.0, 0.0]),
        (2, [10.02, 1.0, 0.01, 0.0]),
        (10, [0.0, 10.0, 1.0, 0.0]),
        (11, [0.0, 10.0, 1.02, 0.01]),
        (20, [1.0, 0.0, 0.0, 10.0]),
        (21, [0.0, 1.0, 10.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    # untrained, k=4: vecs 0,1,2 are their own centroids -> the A-group
    # pairs are missed entirely; only (10,11) share a bucket
    naive = semantic_dedup(df, threshold=0.999, n_centroids=4)
    n_naive = naive.count()
    assert n_naive == 6                          # 0,1,2 split + 10 + 20,21
    # trained: strictly fewer survivors, and the output still partitions
    # the corpus (group sizes sum to n; one survivor per group)
    cents = kmeans_centroids(df, 4, iters=3)
    out = semantic_dedup(df, threshold=0.999, centroids=cents)
    got = out.collect()
    assert sum(r["group_size"] for r in got) == 7
    assert len({r["group_id"] for r in got}) == len(got)
    assert len(got) < n_naive


def test_no_pairs_everything_survives(spark, corpus):
    # impossible threshold -> zero pairs -> every vector is a singleton
    out = semantic_dedup(corpus, threshold=1.5, n_centroids=4)
    got = sorted((r["vec_id"], r["group_id"], r["group_size"])
                 for r in out.collect())
    assert got == [(i, i, 1) for i in sorted(r[0] for r in _rows())]
