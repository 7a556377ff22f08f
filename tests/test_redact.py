"""PII redaction: first-principles expectations + DuckDB byte-parity.

The redaction contract is "counts on the original text, replacements in
PII_PATTERNS order, NULL propagates"; the cross-engine test proves the
patterns live in the common Java-regex / RE2 subset (same greedy
backtracking result, same ASCII \\b) on the adversarial strings.
"""

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F  # noqa: F401

from json_schema_rs_spark.operators.textstats import PII_PATTERNS, redact_pii

TRICKY = [
    "mail a.b-c_d%e+f@sub.domain-x.co.uk now",     # full local/host charset
    "end of sentence bob@example.com.",             # trailing dot stays
    "ip 10.0.255.7 vs phone 555-012-4567 mixed",
    "999.999.999.999 is matched (no value check)",
    "digits 1234.5678.9012 phone-with-dots",
    "not1an2email @ nor.this @com",
    "a@b.co touching(paren@host.org)end",
    "v4-ish 1.2.3.4.5 overlong run",
    "",                                             # empty text
    "no pii here at all",
]


@pytest.fixture(scope="module")
def tricky_df(spark):
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(TRICKY)]
    rows.append(Row(doc_id=len(TRICKY), text=None))
    return spark.createDataFrame(rows, "doc_id int, text string")


class TestRedactPii:
    def test_basic_replacement_and_counts(self, spark):
        df = spark.createDataFrame([Row(
            doc_id=0,
            text="write bob@x.org or alice@y.io, call 555-123-4567, "
                 "host 192.168.0.1")])
        r = redact_pii(df).collect()[0]
        assert r["n_email"] == 2
        assert r["n_phone"] == 1
        assert r["n_ipv4"] == 1
        assert r["text_redacted"] == (
            "write <EMAIL> or <EMAIL>, call <PHONE>, host <IP>")

    def test_null_text_propagates(self, tricky_df):
        r = {x["doc_id"]: x for x in redact_pii(tricky_df).collect()}
        nid = len(TRICKY)
        assert r[nid]["text_redacted"] is None
        assert r[nid]["n_email"] is None

    def test_counts_use_original_text(self, spark):
        # an email whose host looks like an IP: the email replacement
        # consumes it first, but n_ipv4 still counts it (counts are on
        # the ORIGINAL text — the documented contract)
        df = spark.createDataFrame(
            [Row(doc_id=0, text="u-10.0.0.1@host.org x")])
        r = redact_pii(df).collect()[0]
        assert r["text_redacted"] == "<EMAIL> x"
        assert r["n_email"] == 1 and r["n_ipv4"] == 1

    def test_duckdb_byte_parity(self, tricky_df):
        got = {r["doc_id"]: r for r in redact_pii(tricky_df).collect()}
        con = duckdb.connect()
        for i, t in enumerate(TRICKY):
            n = {}
            red = t
            for name, pat, repl in PII_PATTERNS:
                n[name] = con.execute(
                    "SELECT len(regexp_extract_all(?, ?))", [t, pat]
                ).fetchone()[0]
                red = con.execute(
                    "SELECT regexp_replace(?, ?, ?, 'g')", [red, pat, repl]
                ).fetchone()[0]
            assert got[i]["text_redacted"] == red, (i, t)
            for name in n:
                assert got[i][f"n_{name}"] == n[name], (i, t, name)

    def test_zero_shuffle_codegen_plan(self, tricky_df):
        plan = redact_pii(tricky_df)._jdf.queryExecution() \
                                         .executedPlan().toString()
        assert "Exchange" not in plan
        assert "*(1)" in plan  # whole-stage-codegen stage marker


class TestRedactCardNumbers:
    def _run(self, spark, rows):
        from json_schema_rs_spark.operators.textstats import (
            redact_card_numbers)
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        return {r["doc_id"]: r for r in redact_card_numbers(df).collect()}

    def test_luhn_valid_redacted_invalid_kept(self, spark):
        out = self._run(spark, [
            (0, "pay 4111111111111111 now"),           # Luhn-valid
            (1, "ref 4111111111111112 now"),           # checksum fails
            (2, "card 5500-0000-0000-0004 ok"),        # dashed, valid
            (3, "card 5500 0000 0000 0004 ok"),        # spaced, valid
        ])
        assert out[0]["n_card"] == 1
        assert out[0]["text_redacted"] == "pay [CARD] now"
        assert out[1]["n_card"] == 0
        assert out[1]["text_redacted"] == "ref 4111111111111112 now"
        assert out[2]["text_redacted"] == "card [CARD] ok"
        assert out[3]["text_redacted"] == "card [CARD] ok"

    def test_lengths_and_runs(self, spark):
        out = self._run(spark, [
            (0, "short 411111111111 no"),              # 12 digits: no hit
            (1, "id 12345678901234567890123 x"),       # 23-digit run: no hit
            (2, "a 4111111111111111 b 4012888888881881 c"),  # two valid
            (3, ""),
            (4, None),
        ])
        assert out[0]["n_card"] == 0 and "[CARD]" not in out[0]["text_redacted"]
        assert out[1]["n_card"] == 0
        assert out[2]["n_card"] == 2
        assert out[2]["text_redacted"] == "a [CARD] b [CARD] c"
        assert out[3]["n_card"] == 0
        assert out[4]["n_card"] is None and out[4]["text_redacted"] is None

    def test_java_re2_parity_on_adversarial_strings(self, spark):
        # the SAME candidate set + bytes from both regex dialects
        import duckdb
        from json_schema_rs_spark.operators.textstats import (
            CARD_CANDIDATE_REGEX)
        probes = [
            "4111111111111111", "4111-1111 1111-1111x",
            "x4111111111111111", "41 11 11 11 11 11 11 11",
            "1234567890123456789012345", "4111111111111111-",
            " 4111111111111111 5500000000000004 ",
            "a-4111111111111111-b", "….4111111111111111.…",
        ]
        df = spark.createDataFrame(list(enumerate(probes)),
                                   "doc_id bigint, text string")
        from pyspark.sql import functions as F
        got = {r["doc_id"]: r["c"] for r in df.select(
            "doc_id", F.regexp_extract_all(
                "text", F.lit(CARD_CANDIDATE_REGEX), F.lit(0)).alias("c")
        ).collect()}
        con = duckdb.connect()
        for i, p in enumerate(probes):
            want = con.execute(
                "SELECT regexp_extract_all(?, ?)",
                [p, CARD_CANDIDATE_REGEX]).fetchone()[0]
            assert got[i] == want, (p, got[i], want)

    def test_zero_shuffle(self, spark):
        from json_schema_rs_spark.operators.textstats import (
            redact_card_numbers)
        df = spark.createDataFrame([(0, "x 4111111111111111")],
                                   "doc_id bigint, text string")
        plan = (redact_card_numbers(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan and "Join" not in plan
        assert "Python" not in plan
