"""int8 embedding quantization + quantized top-k: exactness of the
quantizer, recall vs the float exact scan, degenerate inputs, and the
zero-shuffle plan shape."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from json_schema_rs_spark.operators import similarity  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_quantizer_range_and_reconstruction(spark, emb):
    rows = similarity.quantize_embeddings(emb).collect()
    assert rows
    for r in rows[:200]:
        q = np.array(r["qvec"])
        assert np.abs(q).max() <= 127
        # the max-|x| component quantizes to exactly +/-127
        assert np.abs(q).max() == 127 or r["scale"] == 0.0
    # reconstruction error bounded by half a quantization step
    src = {r["vec_id"]: np.array(r["embedding"], dtype="float64")
           for r in emb.limit(50).collect()}
    got = {r["vec_id"]: (np.array(r["qvec"], dtype="float64"), r["scale"])
           for r in similarity.quantize_embeddings(emb.limit(50)).collect()}
    for vid, x in src.items():
        q, s = got[vid]
        assert np.abs(q * s - x).max() <= s / 2 + 1e-12


def test_quantizer_degenerate_vectors(spark):
    rows = [(1, [0.0, 0.0]), (2, None), (3, []), (4, [3.0, -4.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: (r["qvec"], r["scale"])
           for r in similarity.quantize_embeddings(df).collect()}
    assert got[1] == ([0, 0], 0.0)
    assert got[2] == (None, None)
    assert got[3] == (None, None)
    assert got[4][0] == [95, -127]          # floor(3/4*127+.5)=95
    assert got[4][1] == 4.0 / 127.0


def test_quantizer_zero_exchange(spark, emb):
    plan = _plan(similarity.quantize_embeddings(emb))
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan


def test_quantized_topk_recall_vs_exact(spark, emb):
    """int8 on 64-dim vectors perturbs each cosine by ~1e-2; top-10
    overlap with the float scan stays high. Measured on this corpus:
    0.95+ at both sf0.001 and sf0.01; floor 0.8 leaves refresh margin."""
    q = emb.filter(F.col("vec_id") < 8)
    exact = {(r.query_id, r.neighbor_id)
             for r in similarity.cosine_topk(emb, q, k=10).collect()}
    quant = {(r.query_id, r.neighbor_id)
             for r in similarity.quantized_topk(emb, q, k=10).collect()}
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, f"quantized recall {recall:.2f} below floor"


def test_quantized_topk_no_corpus_exchange_no_hof(spark, emb):
    """One corpus scan + batch-local top-k prune: the only exchange is
    the skinny per-query window shuffle; no interpreted fold anywhere."""
    df = similarity.quantized_topk(emb, emb.filter(F.col("vec_id") < 3), k=5)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "aggregate(zip_with" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the window only


def test_quantized_topk_excludes_zero_vectors(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]), (3, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.quantized_topk(df, df.filter("vec_id = 0"), k=10)
    assert {r.neighbor_id for r in out.collect()} == {1}


def test_quantized_topk_empty_query_set(spark, emb):
    out = similarity.quantized_topk(emb, emb.filter("vec_id < 0"), k=5)
    assert out.count() == 0


class TestVectorViolations:
    def test_every_check_fires_once(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            vector_violations)
        rows = [
            (1, [1.0, 2.0, 3.0]),            # clean
            (2, None),                        # NullVector
            (3, [1.0, 2.0]),                  # WrongDimension
            (4, [None, 2.0, 3.0]),            # NullElement
            (5, [float("nan"), 2.0, 3.0]),    # ContainsNaN
            (6, [float("inf"), 2.0, 3.0]),    # ContainsInfinity
            (7, [float("-inf"), 2.0, 3.0]),   # ContainsInfinity (min side)
            (8, [0.0, 0.0, 0.0]),             # ZeroVector
        ]
        df = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>")
        out = sorted((r.vec_id, r.code) for r in
                     vector_violations(df, 3).collect())
        assert out == [
            (2, "NullVector"), (3, "WrongDimension"), (4, "NullElement"),
            (5, "ContainsNaN"), (6, "ContainsInfinity"),
            (7, "ContainsInfinity"), (8, "ZeroVector"),
        ]
        msgs = {r.vec_id: r.message for r in
                vector_violations(df, 3).collect()}
        assert msgs[3] == "/embedding: expected 3 dimensions, got 2"

    def test_collect_all_multiple_codes_per_row(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            vector_violations)
        # wrong dim AND NaN: both rows emitted (collect-all contract)
        df = spark.createDataFrame(
            [(1, [float("nan"), 1.0])], "vec_id bigint, embedding array<float>")
        codes = sorted(r.code for r in vector_violations(df, 3).collect())
        assert codes == ["ContainsNaN", "WrongDimension"]

    def test_zero_shuffle_no_python(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            vector_violations)
        df = spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id bigint, embedding array<float>")
        plan = vector_violations(df, 2)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
        for bad in ("ArrowEvalPython", "BatchEvalPython", "cartesian"):
            assert bad not in plan


class TestNormalizeEmbeddings:
    def test_unit_norms_and_edges(self, spark):
        import math
        from json_schema_rs_spark.operators.similarity import (
            normalize_embeddings)
        rows = [
            (1, [3.0, 4.0]),        # norm 5, unit (0.6, 0.8)
            (2, [0.0, 0.0]),        # zero: unit NULL, norm 0.0
            (3, None),              # NULL passthrough
        ]
        df = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>")
        out = {r.vec_id: (r.unit, r.norm)
               for r in normalize_embeddings(df).collect()}
        assert out[1] == ([0.6, 0.8], 5.0)
        assert out[2] == (None, 0.0)
        assert out[3] == (None, None)
        # unit vector has norm 1 (within rounding)
        u = out[1][0]
        assert abs(math.sqrt(sum(x * x for x in u)) - 1.0) < 1e-5

    def test_zero_shuffle(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            normalize_embeddings)
        df = spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id bigint, embedding array<float>")
        plan = normalize_embeddings(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan


class TestProductQuantization:
    def _clustered(self, spark, *, per=6, dims=8, noise=0.01):
        # 3 well-separated clusters; PQ must keep members together
        import numpy as np
        rng = np.random.RandomState(7)
        centers = np.array([
            [1.0] * dims,
            [-1.0] * dims,
            [1.0, -1.0] * (dims // 2),
        ])
        rows = []
        for ci, c in enumerate(centers):
            for j in range(per):
                v = c + noise * rng.standard_normal(dims)
                v = v / np.sqrt((v * v).sum())
                rows.append((ci * 100 + j, [float(x) for x in v]))
        return spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"), per

    def test_codebook_shape_and_validation(self, spark):
        from json_schema_rs_spark.operators.similarity import pq_codebook
        df, _ = self._clustered(spark)
        book = pq_codebook(df, m=4, n_centroids=3)
        assert len(book) == 4 and len(book[0]) == 3
        assert len(book[0][0]) == 2                 # 8 dims / 4 subs
        import pytest as _pt
        with _pt.raises(ValueError):
            pq_codebook(df, m=3, n_centroids=3)     # 8 % 3 != 0
        with _pt.raises(ValueError):
            pq_codebook(df.limit(2), m=4, n_centroids=5)

    def test_encode_codes_and_nulls(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            pq_codebook, pq_encode)
        df, _ = self._clustered(spark)
        book = pq_codebook(df, m=4, n_centroids=3)
        twin = df.filter(F.col("vec_id") == 0).select(
            (F.col("vec_id") + 905).alias("vec_id"), "embedding")
        extra = df.union(spark.createDataFrame(
            [(900, None), (901, [1.0, 2.0])],
            "vec_id bigint, embedding array<double>")).union(twin)
        out = {r["vec_id"]: r["codes"] for r in
               pq_encode(extra, book).collect()}
        assert out[900] is None and out[901] is None
        assert all(len(c) == 4 for i, c in out.items()
                   if i < 900 or i == 905)
        # an exact twin must share its original's codes
        assert out[905] == out[0]

    def test_topk_groups_clusters(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            pq_codebook, pq_topk)
        df, per = self._clustered(spark)
        book = pq_codebook(df, m=4, n_centroids=3, iters=3)
        got = pq_topk(df, df.filter(F.col("vec_id").isin(0, 100, 200)),
                      k=per - 1, m=4, n_centroids=3,
                      codebook=book).collect()
        for r in got:
            assert r["neighbor_id"] // 100 == r["query_id"] // 100, r

    def test_matches_brute_force_adc(self, spark):
        # the distributed scan must equal a local NumPy ADC re-derivation
        import numpy as np
        from json_schema_rs_spark.operators.similarity import (
            pq_codebook, pq_topk)
        df, _ = self._clustered(spark)
        book = pq_codebook(df, m=4, n_centroids=3)
        bk = np.array(book)
        rows = sorted((r["vec_id"], np.array(r["embedding"]))
                      for r in df.collect())
        ids = np.array([i for i, _ in rows])
        mat = np.stack([v for _, v in rows])
        m, kc, dsub = bk.shape
        codes = np.zeros((len(ids), m), dtype=int)
        for s in range(m):
            d2 = np.zeros((len(ids), kc))
            for d in range(dsub):
                diff = mat[:, s * dsub + d, None] - bk[s][None, :, d]
                d2 += diff * diff
            codes[:, s] = np.argmin(d2, axis=1)
        q = mat[ids == 0][0]
        sim = np.zeros(len(ids))
        for s in range(m):
            lut = np.zeros(kc)
            for d in range(dsub):
                lut += q[s * dsub + d] * bk[s][:, d]
            sim += lut[codes[:, s]]
        mask = ids != 0
        order = np.lexsort((ids[mask], -np.round(sim[mask], 6)))
        want = [(int(ids[mask][i]), round(float(sim[mask][i]), 6))
                for i in order[:5]]
        got = [(r["neighbor_id"], r["adc_sim"]) for r in
               pq_topk(df, df.filter(F.col("vec_id") == 0), k=5, m=4,
                       n_centroids=3, codebook=book)
               .orderBy("rank").collect()]
        assert got == want

    def test_plan_shapes(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            pq_codebook, pq_encode, pq_topk)
        df, _ = self._clustered(spark)
        book = pq_codebook(df, m=4, n_centroids=3)
        enc_plan = (pq_encode(df, book)
                    ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in enc_plan
        top_plan = (pq_topk(df, df.limit(2), k=3, m=4, n_centroids=3,
                            codebook=book)
                    ._jdf.queryExecution().executedPlan().toString())
        assert top_plan.count("Exchange") == 1      # the top-k window
        assert "CartesianProduct" not in top_plan


class TestIvfPq:
    def _clustered(self, spark, *, per=6, dims=8, noise=0.01):
        # interleaved ids (cluster = id % 10) so the lowest-3-id
        # untrained centroids span the three clusters and IVF buckets
        # align with them
        import numpy as np
        rng = np.random.RandomState(7)
        centers = np.array([
            [1.0] * dims,
            [-1.0] * dims,
            [1.0, -1.0] * (dims // 2),
        ])
        rows = []
        for ci, c in enumerate(centers):
            for j in range(per):
                v = c + noise * rng.standard_normal(dims)
                v = v / np.sqrt((v * v).sum())
                rows.append((j * 10 + ci, [float(x) for x in v]))
        return spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>")

    def test_subset_of_pq_and_probe_semantics(self, spark):
        # with nprobe = n_centroids (probe everything) IVF+PQ must equal
        # plain PQ exactly — routing only ever REMOVES candidates
        from json_schema_rs_spark.operators.similarity import (
            ivfpq_topk, pq_codebook, pq_topk)
        df = self._clustered(spark)
        book = pq_codebook(df, m=4, n_centroids=3)
        q = df.filter(F.col("vec_id").isin(0, 11))
        full = {(r["query_id"], r["neighbor_id"], r["adc_sim"]) for r in
                ivfpq_topk(df, q, k=5, m=4, n_centroids=3, nprobe=3,
                           codebook=book).collect()}
        plain = {(r["query_id"], r["neighbor_id"], r["adc_sim"]) for r in
                 pq_topk(df, q, k=5, m=4, n_centroids=3,
                         codebook=book).collect()}
        assert full == plain
        # nprobe=1 returns only same-bucket rows (clusters separate)
        one = ivfpq_topk(df, q, k=5, m=4, n_centroids=3, nprobe=1,
                         codebook=book).collect()
        assert len(one) > 0
        for r in one:
            assert r["neighbor_id"] % 10 == r["query_id"] % 10

    def test_plan_single_exchange(self, spark):
        from json_schema_rs_spark.operators.similarity import (
            ivfpq_topk, pq_codebook)
        df = self._clustered(spark)
        book = pq_codebook(df, m=4, n_centroids=3)
        plan = (ivfpq_topk(df, df.limit(2), k=3, m=4, n_centroids=3,
                           nprobe=2, codebook=book)
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") == 1
        assert "CartesianProduct" not in plan

    def test_empty_queries(self, spark):
        from json_schema_rs_spark.operators.similarity import ivfpq_topk
        df = self._clustered(spark)
        out = ivfpq_topk(df, df.filter(F.col("vec_id") < 0), k=3,
                         m=4, n_centroids=3).collect()
        assert out == []


class TestIvfPqResidual:
    def test_residual_recall_and_cluster_coherence(self, spark):
        # IVFADC ranking quality: recall vs the exact scan stays above
        # a floor, and nprobe=1 keeps neighbors in the query's own
        # cluster. (Strict superiority over the raw-vector variant
        # needs TRAINED residual codebooks — the untrained lowest-id
        # seeds measured here trade a few points either way on tiny
        # synthetic corpora; pass `codebook=` with trained residual
        # centroids for the production regime.)
        from json_schema_rs_spark.operators.similarity import (
            cosine_topk, ivfpq_topk)
        df = TestIvfPq()._clustered(spark, per=8)
        q = df.filter(F.col("vec_id").isin(0, 11, 22))
        exact = {(r["query_id"], r["neighbor_id"]) for r in
                 cosine_topk(df, q, k=5).collect()}
        got = {(r["query_id"], r["neighbor_id"]) for r in
               ivfpq_topk(df, q, k=5, m=4, n_centroids=3, nprobe=3,
                          by_residual=True).collect()}
        assert len(got & exact) / len(exact) >= 0.5
        one = ivfpq_topk(df, q, k=5, m=4, n_centroids=3, nprobe=1,
                         by_residual=True).collect()
        assert len(one) > 0
        for r in one:
            assert r["neighbor_id"] % 10 == r["query_id"] % 10

    def test_residual_codebook_not_degenerate(self, spark):
        import numpy as np
        from json_schema_rs_spark.operators.similarity import ivfpq_topk
        df = TestIvfPq()._clustered(spark)
        # too few rows for a residual codebook -> loud error
        import pytest as _pt
        with _pt.raises(ValueError):
            ivfpq_topk(df.limit(4), df.limit(1), k=2, m=4,
                       n_centroids=3, by_residual=True)

    def test_plan_still_single_exchange(self, spark):
        from json_schema_rs_spark.operators.similarity import ivfpq_topk
        df = TestIvfPq()._clustered(spark)
        plan = (ivfpq_topk(df, df.limit(2), k=3, m=4, n_centroids=3,
                           nprobe=2, by_residual=True)
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") == 1
        assert "CartesianProduct" not in plan
