"""Fused corpus-preparation pipeline (`operators/prep.py`).

First-principles expectations on a hand-built corpus where every stage
has a doc that exercises it, plus plan-shape asserts (broadcast probe,
no cartesian, map-side-combined dedup aggregate).
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from json_schema_rs_spark.operators.prep import prep_corpus

# A long, wordy, stopword-rich sentence scores high on the quality
# formula; repeated to clear the 500-char length band.
_GOOD = ("it is a truth that the state of the art in the field of data "
         "engineering is that the quality of a corpus is the product of "
         "the care that goes into it and the tools that it is built with "
         ) * 4


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([
        # survivor: high quality, unique, clean
        Row(doc_id=0, text=_GOOD + "alpha section"),
        # exact duplicate of doc 0 AFTER normalization (control char +
        # ragged spacing) -> dedup keeps doc 0
        Row(doc_id=1, text=_GOOD + "alpha \x07 section"),
        # low quality: short, no stopwords -> gated out
        Row(doc_id=2, text="zz qq xx"),
        # contaminated: shares a word 3-gram with the benchmark
        Row(doc_id=3, text=_GOOD + "leaked benchmark answer string here"),
        # independent survivor
        Row(doc_id=4, text=_GOOD + "beta section"),
    ])


@pytest.fixture(scope="module")
def bench_set(spark):
    return spark.createDataFrame([
        Row(doc_id=100, text="the leaked benchmark answer string is this"),
    ])


class TestPrepCorpus:
    def test_survivors_and_stages(self, corpus, bench_set):
        out = prep_corpus(corpus, bench_set, min_quality=0.5)
        rows = {r["doc_id"]: r for r in out.collect()}
        # doc 1 deduped (min-id survivor is 0), doc 2 gated, doc 3
        # decontaminated, docs 0 and 4 survive
        assert set(rows) == {0, 4}
        assert set(out.columns) == {"doc_id", "n_chars", "ws_tokens",
                                    "quality"}
        for r in rows.values():
            assert r["quality"] >= 0.5
            assert r["ws_tokens"] >= 1 and r["n_chars"] > 0

    def test_normalization_feeds_dedup(self, spark, bench_set):
        # the SAME text with different byte-level noise must dedup to one
        df = spark.createDataFrame([
            Row(doc_id=10, text=_GOOD),
            Row(doc_id=11, text=_GOOD.replace(" is ", "  is ")),   # ws run
            Row(doc_id=12, text="\x01" + _GOOD),                   # C0
        ])
        out = prep_corpus(df, bench_set, min_quality=0.0)
        assert [r["doc_id"] for r in out.collect()] == [10]

    def test_quality_gate_threshold(self, corpus, bench_set):
        # min_quality=0 keeps the low-quality doc; everything else as is
        out = prep_corpus(corpus, bench_set, min_quality=0.0)
        assert 2 in {r["doc_id"] for r in out.collect()}

    def test_null_text_is_dropped(self, spark, bench_set):
        df = spark.createDataFrame(
            [Row(doc_id=20, text=_GOOD), Row(doc_id=21, text=None)])
        out = prep_corpus(df, bench_set, min_quality=0.0)
        assert {r["doc_id"] for r in out.collect()} == {20}

    def test_plan_shape(self, corpus, bench_set):
        out = prep_corpus(corpus, bench_set, min_quality=0.5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # benchmark shingles + hit ids arrive broadcast
        assert "BroadcastExchange" in plan
        # the dedup digest aggregate is map-side combined
        assert plan.count("HashAggregate") >= 2


class TestMediaSizeStats:
    def test_aggregates_and_nulls(self, spark):
        from pyspark.sql import functions as F
        from json_schema_rs_spark.operators.multimodal import (
            media_size_stats)
        df = spark.createDataFrame(
            [("image", b"abcd"), ("image", b"ab"), ("image", None),
             ("audio", b"123456")],
            "media_type string, content binary")
        out = {r.media_type: r for r in media_size_stats(df).collect()}
        img = out["image"]
        assert (img.n_items, img.n_null, img.total_bytes,
                img.avg_bytes, img.max_bytes) == (3, 1, 6, 3.0, 4)
        assert out["audio"].total_bytes == 6

    def test_no_python_and_payload_not_shuffled(self, spark):
        from json_schema_rs_spark.operators.multimodal import (
            attach_media, media_size_stats)
        docs = spark.createDataFrame([(i, "x" * 100) for i in range(20)],
                                     "doc_id long, text string")
        plan = media_size_stats(attach_media(docs))._jdf \
            .queryExecution().executedPlan().toString()
        assert "Python" not in plan
        # only (type, partial-aggregate) rows cross the exchange
        assert "content" not in plan.split("Exchange")[1][:300]
