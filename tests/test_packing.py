"""Greedy contiguous sequence packing (operators/packing.py).

Expected pack assignments are recomputed by a plain-Python streaming
concatenator; the DuckDB window-function twin runs through the
x_pack_chunks oracle entry.
"""

import pytest
from pyspark.sql import functions as F

from json_schema_rs_spark.operators.packing import pack_sequences


def _reference_packing(rows, budget):
    """Streaming concatenator: walk docs in id order per group, cut at
    each budget boundary of the running token offset."""
    out = {}
    by_group = {}
    for gid, did, toks in rows:
        by_group.setdefault(gid, []).append((did, toks))
    for gid, docs in by_group.items():
        offset = 0
        for did, toks in sorted(docs):
            out[(gid, did)] = (offset, offset // budget)
            offset += toks
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "lang string, doc_id bigint, toks bigint")


def _got(df, budget):
    packed = pack_sequences(df, "toks", budget, group_col="lang")
    return {(r["lang"], r["doc_id"]): (r["_pack_offset"], r["pack_id"])
            for r in packed.collect()}


def test_matches_streaming_concatenator(spark):
    rows = [("en", i, (i * 37) % 900 + 50) for i in range(40)]
    rows += [("de", i, (i * 53) % 1200 + 10) for i in range(25)]
    assert _got(_df(spark, rows), 2000) == _reference_packing(rows, 2000)


def test_groups_pack_independently(spark):
    rows = [("en", 1, 1500), ("en", 2, 1500), ("de", 3, 1500)]
    got = _got(_df(spark, rows), 2000)
    assert got[("en", 1)] == (0, 0)
    assert got[("en", 2)] == (1500, 0)   # starts inside window 0
    assert got[("de", 3)] == (0, 0)      # fresh offset per group


def test_oversize_doc_gets_own_window(spark):
    rows = [("en", 1, 5000), ("en", 2, 100)]
    got = _got(_df(spark, rows), 2000)
    assert got[("en", 1)] == (0, 0)
    assert got[("en", 2)] == (5000, 2)   # next doc starts at offset 5000


def test_packs_are_contiguous_runs(spark):
    rows = [("en", i, 700) for i in range(30)]
    got = _got(_df(spark, rows), 2000)
    ids_by_pack = {}
    for (_, did), (_, pid) in got.items():
        ids_by_pack.setdefault(pid, []).append(did)
    for ids in ids_by_pack.values():
        ids.sort()
        assert ids == list(range(ids[0], ids[0] + len(ids)))


def test_single_exchange_on_group_key(spark):
    df = _df(spark, [("en", 1, 10), ("de", 2, 20)])
    plan = (pack_sequences(df, "toks", 100, group_col="lang")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1


def test_rejects_nonpositive_budget(spark):
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(_df(spark, [("en", 1, 10)]), "toks", 0,
                       group_col="lang")
