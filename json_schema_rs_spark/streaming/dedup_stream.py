"""Streaming exact deduplication: drop repeat documents as they arrive.

The streaming counterpart of ``operators/dedup.exact_dedup`` — the same
16-byte md5 content digest, deduplicated continuously with
``dropDuplicatesWithinWatermark`` so state is BOUNDED: a digest is
remembered only until the watermark passes its event time, after which
the row is evicted. Within the watermark horizon the semantics match the
batch operator exactly (first arrival survives); duplicates that recur
farther apart than the horizon are a batch-compaction concern (run the
batch ``exact_dedup`` over the sink table, same digest, same verdicts).

Reference anchor: `uniqueItems`' pairwise-equality duplicate detection
(`/root/reference/json_schema_rs/src/validator/mod.rs:378-397`), lifted
to an unbounded stream with an explicit retention bound.

Scale shape (10^12-turn ingest):
- the digest is computed map-side in whole-stage codegen (one md5 per
  row — no Python);
- ``dropDuplicatesWithinWatermark`` shuffles only (digest, event-time)
  keys to the state store partitions; state per partition is
  (arrival rate x horizon) digests, independent of history length;
- eviction is watermark-driven — no unbounded state growth, the failure
  mode of a naive ``dropDuplicates`` on a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dedup_stream"]


def dedup_stream(
    stream_df: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    digest_col: str = "text_digest",
    keep_digest: bool = False,
) -> DataFrame:
    """Deduplicate a streaming DataFrame on the md5 digest of
    ``text_col`` within a ``watermark`` event-time horizon.

    Returns the first-arrival rows (all input columns; plus the digest
    when ``keep_digest``). Attach any stateless transforms (validation,
    token stats) before or after — the digest dedup is the only stateful
    operator this adds.
    """
    out = (stream_df
           .withColumn(digest_col, F.md5(F.col(text_col)))
           .withWatermark(ts_col, watermark)
           .dropDuplicatesWithinWatermark([digest_col]))
    return out if keep_digest else out.drop(digest_col)
