"""Physical-plan assertions: the scale properties claimed in docstrings
must be visible in the executed plan (broadcast where promised, partial
aggregation, no stray shuffles/cartesians on hot paths)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from json_schema_rs_spark import ValidationEngine  # noqa: E402
from json_schema_rs_spark.operators import dedup, similarity  # noqa: E402
from json_schema_rs_spark.operators.table_checks import referential_violations  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_row_validation_no_exchange_and_codegen(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rep = ValidationEngine(
        {"type": "object",
         "properties": {"o_orderstatus": {"enum": ["O", "F", "P"]}}},
        key_cols=("o_orderkey",)).validate(df)
    plan = _plan(rep.flagged)
    assert "Exchange" not in plan
    # "*(n)" prefixes mark whole-stage-codegen stages in toString() plans
    assert "*(1) Project" in plan


def test_python_stage_plan_gets_parallelism_guard(spark, sf_dir):
    # content keywords compile to an Arrow pandas-UDF slow path whose
    # cost is the Python map side; a single-row-group table must NOT
    # serialize it on one core. The runner inserts dedup._spread's
    # repartition for exactly (and only) such plans.
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    spec = {"type": "object", "properties": {
        "props": {"type": "string",
                  "contentMediaType": "application/json"}}}
    eng = ValidationEngine(spec, key_cols=("event_id",), extensions=True)
    assert eng.plan_for(df).has_python_stage
    rep = eng.validate(df)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        assert "Exchange" in _plan(rep.flagged)
        assert rep.flagged.rdd.getNumPartitions() >= target
    # the pure-codegen twin stays flagged off (its exchange-free plan is
    # asserted by test_row_validation_no_exchange_and_codegen)
    plain = ValidationEngine(
        {"type": "object",
         "properties": {"props": {"type": "string", "minLength": 1}}},
        key_cols=("event_id",))
    assert not plain.plan_for(df).has_python_stage


def test_referential_vocab_df_broadcasts(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    vocab = spark.createDataFrame(
        [("click",), ("view",)], "event_type string")
    plan = _plan(referential_violations(ev, "event_type", vocab,
                                        keys=("event_id",)))
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan  # fact table must not shuffle


def test_referential_shuffle_strategy_avoids_broadcast(spark, sf_dir):
    # the huge-vocabulary path: both sides hash-partition on the key
    # (AQE skew-join eligible); no BroadcastExchange anywhere, and the
    # result is value-identical to the broadcast path
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    vocab = spark.createDataFrame(
        [("click",), ("view",)], "event_type string")
    sh = referential_violations(ev, "event_type", vocab,
                                keys=("event_id",), strategy="shuffle")
    plan = _plan(sh)
    assert "BroadcastExchange" not in plan
    assert "SortMergeJoin" in plan
    br = referential_violations(ev, "event_type", vocab,
                                keys=("event_id",))
    assert sorted(map(tuple, sh.collect())) == \
        sorted(map(tuple, br.collect()))


def test_cosine_topk_broadcasts_queries(spark, emb):
    plan = _plan(similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id") < 3), k=3))
    assert "Broadcast" in plan


def test_exact_dedup_partial_aggregation(spark, docs):
    plan = _plan(dedup.exact_duplicate_groups(docs))
    # two HashAggregates around one exchange = map-side partial combine
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 1


def test_minhash_signature_single_aggregate_no_cartesian(spark, docs):
    plan = _plan(dedup.minhash_signature(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_pairs_no_cartesian(spark, docs):
    plan = _plan(dedup.ngram_jaccard_pairs(docs))
    assert "CartesianProduct" not in plan


def test_bucketed_cosine_dup_full_recall_on_near_identicals(spark):
    """Near-identical vectors (the actual near-dup population at a high
    threshold) must land in the same IVF bucket, so the bucketed operator
    finds every pair the exact operator finds."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 16)).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # one near-duplicate per base vector: tiny perturbation
        rows.append((1000 + i, [float(x) for x in
                                v + rng.normal(scale=1e-3, size=16)
                                .astype("float32")]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r.doc_a, r.doc_b) for r in similarity.cosine_dup_pairs(
        df, threshold=0.999).collect()}
    bucketed = {(r.doc_a, r.doc_b) for r in
                similarity.cosine_dup_pairs_bucketed(
                    df, threshold=0.999, n_centroids=8).collect()}
    assert len(exact) >= 40
    assert bucketed == exact


def test_assign_buckets_zero_exchange(spark, emb):
    """The IVF assignment is the designated ANN scale path: centroids are
    literal (collected once), the argmax is a per-row fold — the corpus
    must never be exchanged or row-multiplied (the old crossJoin+Window
    shape shuffled |corpus| x n_centroids rows on vec_id)."""
    cen = (emb.orderBy("vec_id").limit(16)
           .select(F.col("vec_id").alias("centroid_id"),
                   F.col("embedding").alias("centroid")))
    plan = _plan(similarity.assign_buckets(emb, cen))
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_ivf_and_bucketed_dup_no_corpus_shuffle(spark, emb):
    """Neither IVF consumer may shuffle the corpus on vec_id; the only
    acceptable exchanges are the skinny per-query top-k partitioning and
    broadcast sides of the bucket joins."""
    q = emb.filter(F.col("vec_id") < 3)
    ivf = _plan(similarity.ivf_topk(emb, q, k=3, n_centroids=8, nprobe=2))
    assert "Exchange hashpartitioning(vec_id" not in ivf
    # candidate scoring must be the Arrow/NumPy kernel, not the
    # interpreted (CodegenFallback) HOF fold — at scale the candidate set
    # is |corpus| x nprobe/n_centroids rows and an interpreted dot
    # product would dominate the designated ANN path
    assert "aggregate(zip_with" not in ivf
    dup = _plan(similarity.cosine_dup_pairs_bucketed(emb, threshold=0.4,
                                                     n_centroids=8))
    assert "Exchange hashpartitioning(vec_id" not in dup


def test_cosine_np_verifier_caps_corpus(spark, emb):
    """The driver-collect verifier's moderate-corpus role is enforced in
    code: above max_corpus_rows it must raise (pointing at the bucketed
    scale path) instead of collecting — a 10^9-row misuse fails loudly,
    not with a driver OOM."""
    with pytest.raises(ValueError, match="bucketed"):
        similarity.cosine_dup_pairs_np(emb, threshold=0.9, max_corpus_rows=5)


def test_cosine_np_bit_identical_to_fold(spark, emb):
    """The NumPy exact verifier must reproduce the HOF-fold operator's
    pairs AND rounded similarities exactly (ordered per-dimension
    accumulation = same double fold)."""
    fold = {(r.doc_a, r.doc_b): r.cos_sim
            for r in similarity.cosine_dup_pairs(emb, threshold=0.42).collect()}
    npv = {(r.doc_a, r.doc_b): r.cos_sim
           for r in similarity.cosine_dup_pairs_np(emb, threshold=0.42).collect()}
    assert fold == npv and len(fold) > 0


def test_message_render_plan_stays_linear(spark, sf_dir):
    """Guard against expression-tree blow-up in the message render path.

    Chained F.when Columns re-inline their whole upstream subtree at every
    reference; before exprs.bind_once the plan for a two-sided bounds spec
    exceeded ~500k characters (tens of thousands of nodes — past JIT
    limits, ~8x slower render). The bound here is ~10x today's size but
    ~10x below the broken regime."""
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rep = ValidationEngine(
        {"type": "object", "properties": {
            "l_quantity": {"type": "number", "minimum": 5, "maximum": 45},
            "l_extendedprice": {"type": "number", "minimum": 0},
            "l_returnflag": {"type": "string", "enum": ["A", "N", "R"]},
        }},
        key_cols=("l_orderkey", "l_linenumber")).validate(df)
    plan = _plan(rep.violations)
    assert len(plan) < 60_000, f"render plan blew up: {len(plan)} chars"


def test_incremental_fuzzy_shingles_only_candidate_corpus_docs(spark, docs):
    """incremental_fuzzy_dedup's reason to exist at 10^11 kept docs: the
    corpus-side shingle projection (xxhash64 over n-grams) must sit ABOVE
    the broadcast candidate semi-join — i.e. only LSH-candidate docs are
    fetched and shingled per batch, never the whole kept corpus. The
    operator now makes this structural (semi-join before shingle_hashes);
    this pins it against refactors by walking the executed plan: between
    the LeftSemi join and the corpus scan below it there must be no
    xxhash64 projection, while the candidate-only shingle projection
    appears above the join."""
    import re

    from json_schema_rs_spark.operators import dedup

    corpus = docs.select("doc_id", "text")
    led = dedup.minhash_signature(corpus).select("doc_id", "minhash")
    batch = corpus.limit(5).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000).cast("long"))
    out = dedup.incremental_fuzzy_dedup(batch, led, corpus)
    plan = _plan(out)
    m = re.search(r"LeftSemi", plan)
    assert m, f"expected a candidate semi-join in the plan:\n{plan[:4000]}"
    # the shingle projection feeding the exact-Jaccard verify is the
    # join's PARENT (printed before it in pre-order)
    assert "xxhash64" in plan[:m.start()], plan[:m.start()][-2000:]
    # and the corpus branch BELOW the semi-join is shingle-free: nothing
    # between the join node and the first scan under it computes hashes
    after = plan[m.start():]
    scan = re.search(r"Scan parquet|FileScan|Scan ExistingRDD", after)
    assert scan, after[:2000]
    assert "xxhash64" not in after[:scan.start()], after[:scan.start()]
