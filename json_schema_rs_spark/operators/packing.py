"""Greedy contiguous sequence packing — concatenate-and-chunk.

Pretraining pipelines turn variable-length documents into fixed-budget
training sequences by concatenating docs in a deterministic order and
cutting at the token budget ("concatenate-and-chunk"). The distributed
form packs WITHIN a grouping key (language, source shard, domain):

- deterministic: order inside a group is the id column, so the packing
  is byte-stable across reruns and engines (no RNG, no partition-order
  dependence);
- one exchange: a window partitioned by the group key — the only
  shuffle, on the natural curation key. Groups are independent, so at
  10^12 tokens the key just needs enough cardinality (shard ids) for
  the cluster; a single global packing order would serialize the
  window into one task and is deliberately not offered;
- assignment rule: doc d joins pack ``floor(cumsum_before(tokens) /
  budget)`` — every pack holds a contiguous run of docs whose *starting*
  offsets share a budget window, exactly the cut points a streaming
  concatenator would produce. A doc longer than the budget occupies its
  window alone (it still gets one pack id; downstream chunkers split
  oversize docs — that is a row-local map, not a packing concern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences", "chunk_windows"]


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    *,
    group_col: str,
    id_col: str = "doc_id",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign each row a ``pack_col`` = its group's pack index under
    greedy contiguous packing at ``budget`` tokens, plus the row's
    ``_pack_offset`` (token start inside the running concatenation —
    what a chunker needs to materialize the sequence). Output keeps all
    input columns."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (Window.partitionBy(group_col).orderBy(id_col)
               .rowsBetween(Window.unboundedPreceding, -1))
    offset = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (df.withColumn("_pack_offset", offset.cast("bigint"))
              .withColumn(pack_col,
                          F.floor(F.col("_pack_offset") / budget)))


def chunk_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    window: int = 512,
    stride: int = 256,
) -> DataFrame:
    """Split each document into overlapping fixed-size token windows —
    the context-window chunking step between curation and tokenization
    (the row-local "downstream chunker" :func:`pack_sequences` defers to).

    Output: ``(id, chunk_idx, start_tok, n_toks, chunk_text)`` with
    1-indexed ``start_tok``. Chunk ``i`` starts at ``1 + i*stride``; a
    doc of ``n`` whitespace tokens yields ``ceil((n - window)/stride) + 1``
    chunks (one if ``n <= window``), the last chunk running to the end
    (length ``<= window``). Deterministic, engine-reproducible.

    Scale shape: pure row-local expressions — one ``posexplode`` over a
    ``sequence`` of chunk indices and an array-slice/concat per chunk,
    all inside whole-stage codegen. Zero shuffle at any corpus size; the
    fan-out factor is ``~n/stride`` rows per doc, which the scan
    parallelism already absorbs (same shape as the multimodal
    frame-sampling fan-out)."""
    if window <= 0 or stride <= 0:
        raise ValueError(f"window and stride must be positive, "
                         f"got window={window} stride={stride}")
    if stride > window:
        raise ValueError(f"stride {stride} > window {window} would drop "
                         f"tokens between consecutive chunks")
    tmp = "__cw_toks"
    nt = F.size(F.col(tmp))
    n_chunks = F.when(nt <= window, F.lit(1)).otherwise(
        F.ceil((nt - F.lit(window)) / F.lit(stride)).cast("int") + 1)
    out = (df.withColumn(tmp, F.split(F.col(text_col), " "))
             .select(F.col(id_col), F.col(tmp),
                     F.posexplode(F.sequence(F.lit(0), n_chunks - 1))
                      .alias("chunk_idx", "__drop"))
             .drop("__drop"))
    start = (F.col("chunk_idx") * stride + 1).cast("int")
    n_toks = F.least(F.lit(window), F.size(F.col(tmp)) - start + 1).cast("int")
    return out.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.alias("start_tok"),
        n_toks.alias("n_toks"),
        F.concat_ws(" ", F.slice(F.col(tmp), start, n_toks))
         .alias("chunk_text"),
    )
