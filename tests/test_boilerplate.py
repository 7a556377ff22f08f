"""Line-level boilerplate removal: first-principles expectations +
plan-shape asserts (corpus text never shuffles; empty blocklist is a
zero-Python identity projection)."""

import pytest
from pyspark.sql import Row

from json_schema_rs_spark.operators.textstats import drop_boilerplate_lines

FOOTER = "(c) example corp - all rights reserved"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [Row(doc_id=i, text=f"unique body line {i}\n{FOOTER}")
            for i in range(8)]
    rows += [
        Row(doc_id=8, text="plain doc with no footer"),
        Row(doc_id=9, text=f"{FOOTER}\nbody after footer\n{FOOTER}"),
        Row(doc_id=10, text=""),
        Row(doc_id=11, text=None),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


class TestDropBoilerplateLines:
    def test_hot_line_dropped_order_preserved(self, corpus):
        out = {r["doc_id"]: r for r in
               drop_boilerplate_lines(corpus, max_docs=5).collect()}
        assert out[0]["text_clean"] == "unique body line 0"
        assert out[0]["n_dropped"] == 1
        # doc 9 repeats the footer: BOTH copies drop (per-doc distinct
        # counting means it contributed one vote, but the rewrite drops
        # every occurrence), middle line survives in place
        assert out[9]["text_clean"] == "body after footer"
        assert out[9]["n_dropped"] == 2
        assert out[8]["text_clean"] == "plain doc with no footer"
        assert out[8]["n_dropped"] == 0
        assert out[10]["text_clean"] == ""
        assert out[11]["text_clean"] is None and out[11]["n_dropped"] is None

    def test_threshold_is_strictly_greater(self, corpus):
        # footer appears in 9 distinct docs; at max_docs=9 it stays
        out = drop_boilerplate_lines(corpus, max_docs=9).collect()
        assert all(r["n_dropped"] in (0, None) for r in out)

    def test_empty_blocklist_identity_no_python(self, corpus):
        clean = drop_boilerplate_lines(corpus, max_docs=100)
        plan = clean._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "Exchange" not in plan
        got = {r["doc_id"]: r["text_clean"] for r in clean.collect()}
        want = {r["doc_id"]: r["text"] for r in corpus.collect()}
        assert got == want

    def test_rewrite_plan_is_row_local(self, corpus):
        clean = drop_boilerplate_lines(corpus, max_docs=5)
        plan = clean._jdf.queryExecution().executedPlan().toString()
        # phase 2 (the returned DataFrame): one Arrow-batched UDF over
        # the scan, no Exchange — document text never shuffles
        assert "Exchange" not in plan
        assert "ArrowEvalPython" in plan

    def test_blocklist_cap_fails_fast(self, corpus):
        with pytest.raises(ValueError, match="max_blocklist"):
            drop_boilerplate_lines(corpus, max_docs=5, max_blocklist=0)

    def test_custom_separator_literal(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=i, text=f"u{i}|SPAM|x{i}") for i in range(4)],
            "doc_id int, text string")
        out = {r["doc_id"]: r for r in
               drop_boilerplate_lines(df, sep="|", max_docs=3).collect()}
        # '|' must split literally (not as regex-alternation-of-nothing)
        assert out[0]["text_clean"] == "u0|x0"
        assert out[0]["n_dropped"] == 1
