"""knn_join: bucketed per-vector top-k neighbor graph."""

import pytest
from pyspark.sql import functions as F

from json_schema_rs_spark.operators.similarity import knn_join


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_ranks_and_tiebreak(spark):
    # one bucket (single centroid): exact in-bucket kNN
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.9, 0.1]),
            (3, [0.0, 1.0])]
    out = knn_join(_df(spark, rows), k=2, n_centroids=1)
    got = {(r.vec_id, r.rank): (r.nbr_id, r.cos_sim) for r in out.collect()}
    # 0's best is its exact duplicate 1 (sim 1.0); tie at sim 1.0 for
    # vec 2's neighbors 0 and 1 resolves by id ASC
    assert got[(0, 1)][0] == 1 and got[(0, 1)][1] == pytest.approx(1.0)
    assert got[(2, 1)][0] == 0
    assert got[(2, 2)][0] == 1
    # k bounds the per-vector emission
    assert max(r for (_, r) in got) == 2


def test_near_identicals_are_mutual_rank1(spark):
    base = [float(i % 7) + 1.0 for i in range(8)]
    near = [v + (1e-9 if i == 0 else 0.0) for i, v in enumerate(base)]
    far = [[float((i * 13 + d * 7) % 11) - 5.0 for d in range(8)]
           for i in range(40)]
    rows = ([(100, base), (101, near)]
            + [(i, v) for i, v in enumerate(far)])
    out = knn_join(_df(spark, rows), k=3, n_centroids=4)
    r1 = {r.vec_id: r.nbr_id for r in out.collect() if r.rank == 1}
    assert r1[100] == 101 and r1[101] == 100


def test_zero_vector_emits_and_receives_nothing(spark):
    # id 9 is the zero vector (ids chosen so the lowest-id default
    # centroid is nonzero — a zero centroid yields NaN assignment for
    # the whole bucket, same as the sibling bucketed operators)
    rows = [(9, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.5, 0.5])]
    out = knn_join(_df(spark, rows), k=2, n_centroids=1).collect()
    ids = {r.vec_id for r in out} | {r.nbr_id for r in out}
    assert 9 not in ids
    assert len(out) == 2  # 1<->2 only


def test_plan_no_cartesian_one_bucket_exchange(spark):
    rows = [(i, [float(i), 1.0]) for i in range(50)]
    out = knn_join(_df(spark, rows), k=3, n_centroids=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    # the bucket groupBy is the only exchange over corpus rows
    assert plan.count("Exchange") <= 2  # bucket agg + (optional) AQE read
