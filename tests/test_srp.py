"""SRP-LSH (signed-random-projection cosine LSH) — correctness, recall,
degenerate inputs, and the scale-shape plan assertions."""

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


def test_hyperplanes_deterministic():
    a = similarity.srp_hyperplanes(16, 8, seed=7)
    assert a == similarity.srp_hyperplanes(16, 8, seed=7)
    assert a != similarity.srp_hyperplanes(16, 8, seed=8)
    assert all(x in (1.0, -1.0) for row in a for x in row)
    assert len(a) == 8 and len(a[0]) == 16


def test_srp_full_recall_on_near_identicals(spark):
    """Near-identical vectors (theta ~ 0) get identical sign bits, so
    they collide in EVERY band — recall 1.0 on the population that
    matters at a high threshold; verified sims are bit-equal to the exact
    operator (same ordered fold + round)."""
    rng = np.random.default_rng(23)
    base = rng.normal(size=(40, 16)).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((1000 + i, [float(x) for x in
                                v + rng.normal(scale=1e-3, size=16)
                                .astype("float32")]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r.doc_a, r.doc_b): r.cos_sim
             for r in similarity.cosine_dup_pairs(df, threshold=0.999)
             .collect()}
    srp = {(r.doc_a, r.doc_b): r.cos_sim
           for r in similarity.srp_dup_pairs(df, threshold=0.999).collect()}
    assert len(exact) >= 40
    assert srp == exact


def test_srp_precision_exact_sims_bit_equal(spark, emb):
    """Every emitted pair must appear in the exact operator's output with
    the identical rounded similarity — SRP trades recall only, never
    precision (candidates are verified with the exact cosine)."""
    exact = {(r.doc_a, r.doc_b): r.cos_sim
             for r in similarity.cosine_dup_pairs(emb, threshold=0.42)
             .collect()}
    srp = {(r.doc_a, r.doc_b): r.cos_sim
           for r in similarity.srp_dup_pairs(emb, threshold=0.42).collect()}
    assert srp, "banding should surface at least one pair on this corpus"
    for pair, sim in srp.items():
        assert exact.get(pair) == sim


def test_srp_degenerate_vectors_excluded(spark):
    """NULL, empty, zero-norm, and wrong-dims vectors have no direction
    to hash: they emit no band rows and no pairs (and must not crash)."""
    rows = [
        (1, [1.0, 2.0, 3.0, 4.0]),
        (2, [1.0, 2.0, 3.0, 4.0]),
        (3, None),
        (4, []),
        (5, [0.0, 0.0, 0.0, 0.0]),
        (6, [1.0, 2.0]),  # wrong dims vs the corpus
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    keys = similarity.srp_band_keys(df, n_bits=8, bands=2)
    assert {r["_id"] for r in keys.collect()} == {1, 2}
    pairs = similarity.srp_dup_pairs(df, threshold=0.9, n_bits=8, bands=2)
    got = [(r.doc_a, r.doc_b, r.cos_sim) for r in pairs.collect()]
    assert got == [(1, 2, 1.0)]


def test_srp_all_degenerate_corpus(spark):
    df = spark.createDataFrame([(1, None), (2, [])],
                               "vec_id long, embedding array<float>")
    assert similarity.srp_dup_pairs(df, threshold=0.9).count() == 0


def test_srp_max_bucket_caps_hot_clusters(spark):
    """k identical vectors collide in every band -> C(k,2) pairs; the cap
    suppresses the quadratic emission (route to grouping), default exact."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assert similarity.srp_dup_pairs(df, threshold=0.9).count() == 15
    assert similarity.srp_dup_pairs(df, threshold=0.9,
                                    max_bucket=5).count() == 0


def test_srp_band_keys_zero_exchange(spark, emb):
    """The sign/banding kernel is one corpus scan: planes ride in the
    closure, bits are computed per Arrow batch, only skinny (id, band,
    bkey) rows leave — no Exchange, no Window, no cartesian."""
    plan = _plan(similarity.srp_band_keys(emb))
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_srp_pairs_no_cartesian_no_hof_fold(spark, emb):
    """The full operator: no cartesian anywhere, no corpus shuffle on
    vec_id, and candidate verification is the Arrow/NumPy kernel — no
    interpreted aggregate(zip_with(...)) fold on the hot path."""
    plan = _plan(similarity.srp_dup_pairs(emb, threshold=0.42))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "aggregate(zip_with" not in plan
    assert "Exchange hashpartitioning(vec_id" not in plan


def test_srp_oracle_sql_reproduces_operator(spark, sf_dir):
    """The generated DuckDB twin must reproduce the operator exactly —
    banding included, not just the verified values (the entry-level gate
    runs this at sf0.01; here it runs at the test sf too)."""
    import duckdb

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = sorted((r.doc_a, r.doc_b, r.cos_sim)
                 for r in similarity.srp_dup_pairs(emb, threshold=0.42)
                 .collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{sf_dir}/embeddings.parquet'")
    want = sorted(map(tuple, con.execute(
        similarity.srp_dup_pairs_sql(dims=64, threshold=0.42)).fetchall()))
    con.close()
    assert got == want and len(got) > 0
