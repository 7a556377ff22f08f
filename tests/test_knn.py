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


class TestQualityPropagate:
    def _scores(self, spark):
        return spark.createDataFrame(
            [(1, 0.9), (2, 0.1), (3, 0.5), (4, 0.7)],
            "vec_id bigint, quality double")

    def _edges(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id bigint, nbr_id bigint, cos_sim double")

    def test_weighted_average_exact(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            quality_propagate)
        # node 1: nbrs 2 (w=.5) and 3 (w=.25) ->
        # nbr_avg = (.5*.1 + .25*.5)/.75 = .175/.75 = 0.2333333...
        # smoothed = .5*.9 + .5*0.233333 = 0.566667 (6dp)
        edges = self._edges(spark, [(1, 2, 0.5), (1, 3, 0.25)])
        out = {r["vec_id"]: r for r in
               quality_propagate(self._scores(spark), edges).collect()}
        assert out[1]["smoothed_quality"] == round(
            0.5 * 0.9 + 0.5 * (175000000000 / 750000 / 1e6), 6)
        assert out[1]["n_nbrs"] == 2
        # nodes without edges keep their score
        assert out[4]["smoothed_quality"] == 0.7 and out[4]["n_nbrs"] == 0
        assert len(out) == 4

    def test_negative_sims_carry_no_vote(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            quality_propagate)
        edges = self._edges(spark, [(1, 2, -0.9), (1, 3, -0.1)])
        out = {r["vec_id"]: r for r in
               quality_propagate(self._scores(spark), edges).collect()}
        # all weights clamp to 0 -> den 0 -> own score
        assert out[1]["smoothed_quality"] == 0.9
        assert out[1]["n_nbrs"] == 2

    def test_alpha_zero_is_identity(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            quality_propagate)
        edges = self._edges(spark, [(1, 2, 0.8), (3, 2, 0.8)])
        out = {r["vec_id"]: r["smoothed_quality"] for r in
               quality_propagate(self._scores(spark), edges,
                                 alpha=0.0).collect()}
        assert out == {1: 0.9, 2: 0.1, 3: 0.5, 4: 0.7}

    def test_composes_with_knn_join(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            knn_join, quality_propagate)
        rows = [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(30)]
        df = spark.createDataFrame(rows, "vec_id bigint, "
                                         "embedding array<float>")
        edges = knn_join(df, k=3, n_centroids=4)
        scores = df.select(
            "vec_id",
            F.round((F.col("vec_id") % 11).cast("double") / 11, 6)
             .alias("quality"))
        out = quality_propagate(scores, edges).collect()
        assert len(out) == 30
        assert all(0.0 <= r["smoothed_quality"] <= 1.0 for r in out)

    def test_no_wide_shuffle(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            quality_propagate)
        edges = self._edges(spark, [(1, 2, 0.5), (2, 1, 0.5)])
        plan = (quality_propagate(self._scores(spark), edges)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Cartesian" not in plan
        assert "BroadcastNestedLoop" not in plan


class TestLabelOutliers:
    def _labels(self, spark):
        return spark.createDataFrame(
            [(1, 0), (2, 0), (3, 0), (4, 1), (5, None), (9, 7)],
            "vec_id bigint, label int")

    def _edges(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id bigint, nbr_id bigint, cos_sim double")

    def test_disagreeing_majority_flags(self, spark):
        from json_schema_rs_spark.operators.similarity import label_outliers
        # node 4 (label 1) has three label-0 neighbors -> outlier
        # node 1 (label 0) agrees with its neighbors -> clean
        edges = self._edges(spark, [
            (4, 1, .9), (4, 2, .9), (4, 3, .9),
            (1, 2, .9), (1, 3, .9), (1, 4, .9),
        ])
        out = {r["vec_id"]: r for r in
               label_outliers(self._labels(spark), edges).collect()}
        assert out[4]["is_outlier"] and out[4]["majority_label"] == 0
        assert out[4]["n_agree"] == 0 and out[4]["n_nbrs"] == 3
        # node 1: nbrs labels {0, 0, 1} -> majority 0 agrees (2 of 3)
        assert not out[1]["is_outlier"] and out[1]["n_agree"] == 2

    def test_min_nbrs_gate_and_isolated(self, spark):
        from json_schema_rs_spark.operators.similarity import label_outliers
        edges = self._edges(spark, [(4, 1, .9), (4, 2, .9)])  # only 2 nbrs
        out = {r["vec_id"]: r for r in
               label_outliers(self._labels(spark), edges).collect()}
        assert not out[4]["is_outlier"]           # below min_nbrs=3
        assert out[9]["n_nbrs"] == 0 and not out[9]["is_outlier"]
        assert out[9]["majority_label"] is None
        assert len(out) == 6                      # every input doc present

    def test_majority_tie_breaks_to_smallest_label(self, spark):
        from json_schema_rs_spark.operators.similarity import label_outliers
        # node 9 (label 7): nbrs {0,0,1,1} tie -> majority 0 -> outlier
        edges = self._edges(spark, [
            (9, 1, .9), (9, 2, .9), (9, 4, .9), (9, 6, .9)])
        labels = self._labels(spark).union(
            spark.createDataFrame([(6, 1)], "vec_id bigint, label int"))
        out = {r["vec_id"]: r for r in
               label_outliers(labels, edges).collect()}
        assert out[9]["majority_label"] == 0 and out[9]["is_outlier"]

    def test_null_own_label_disagrees_with_any_majority(self, spark):
        from json_schema_rs_spark.operators.similarity import label_outliers
        edges = self._edges(spark, [(5, 1, .9), (5, 2, .9), (5, 3, .9)])
        out = {r["vec_id"]: r for r in
               label_outliers(self._labels(spark), edges).collect()}
        assert out[5]["is_outlier"] and out[5]["majority_label"] == 0


class TestIvfRecall:
    def test_perfect_recall_when_one_bucket(self, spark):
        from json_schema_rs_spark.operators.similarity import ivf_recall
        # nprobe == n_centroids => every bucket probed => recall 1.0
        rows = [(i, [float(i % 5), 1.0, float(i % 3)]) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id bigint, "
                                         "embedding array<float>")
        q = df.filter(F.col("vec_id") < 4)
        r = ivf_recall(df, q, k=5, n_centroids=4, nprobe=4).collect()[0]
        assert r["recall"] == 1.0
        assert r["n_queries"] == 4 and r["n_exact"] == 20
        assert r["n_hits"] == r["n_exact"]

    def test_recall_drops_with_fewer_probes(self, spark):
        from json_schema_rs_spark.operators.similarity import ivf_recall
        rows = [(i, [float(i % 7), 1.0, float((i * 3) % 5)])
                for i in range(60)]
        df = spark.createDataFrame(rows, "vec_id bigint, "
                                         "embedding array<float>")
        q = df.filter(F.col("vec_id") < 6)
        full = ivf_recall(df, q, k=5, n_centroids=8,
                          nprobe=8).collect()[0]["recall"]
        one = ivf_recall(df, q, k=5, n_centroids=8,
                         nprobe=1).collect()[0]["recall"]
        assert full == 1.0 and 0.0 < one <= full
