"""URL-domain extraction + blocklist verdict: first-principles
expectations and the zero-shuffle codegen plan shape."""

import pytest
from pyspark.sql import Row

from json_schema_rs_spark.operators.textstats import url_domain_stats


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([
        Row(doc_id=0, text="see https://A.Example.COM/x and "
                           "http://b.example.net/y?q=1 twice "
                           "https://a.example.com/z"),
        Row(doc_id=1, text="no urls at all"),
        Row(doc_id=2, text="ftp://not.matched.org and https://ok.io"),
        Row(doc_id=3, text=""),
        Row(doc_id=4, text=None),
        Row(doc_id=5, text="see https://bad.example.com. end of sentence"),
        Row(doc_id=6, text="auth http://user.name@evil.com/x form"),
    ], "doc_id int, text string")


class TestUrlDomainStats:
    def test_extract_lower_dedupe_sort(self, docs):
        out = {r["doc_id"]: r for r in url_domain_stats(docs).collect()}
        assert out[0]["n_urls"] == 3
        assert out[0]["domains"] == ["a.example.com", "b.example.net"]
        assert out[1]["n_urls"] == 0 and out[1]["domains"] == []
        assert out[2]["domains"] == ["ok.io"]  # ftp scheme ignored
        assert out[3]["domains"] == []
        assert out[4]["domains"] is None and out[4]["is_blocked"] is None
        # trailing sentence punctuation stays out of the domain
        assert out[5]["domains"] == ["bad.example.com"]
        # userinfo URLs resolve to the host, not the user
        assert out[6]["domains"] == ["evil.com"]

    def test_blocklist_not_evaded_by_punctuation_or_userinfo(self, docs):
        out = {r["doc_id"]: r["is_blocked"] for r in url_domain_stats(
            docs, blocklist=("bad.example.com", "evil.com")).collect()}
        assert out[5] is True and out[6] is True

    def test_blocklist_verdict_case_insensitive(self, docs):
        out = {r["doc_id"]: r for r in url_domain_stats(
            docs, blocklist=("A.EXAMPLE.COM",)).collect()}
        assert out[0]["is_blocked"] is True
        assert out[1]["is_blocked"] is False
        assert out[2]["is_blocked"] is False
        assert out[4]["is_blocked"] is None

    def test_zero_shuffle_codegen(self, docs):
        plan = url_domain_stats(docs, blocklist=("x.org",)) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "ArrowEvalPython" not in plan
