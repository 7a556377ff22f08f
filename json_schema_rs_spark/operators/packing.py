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

__all__ = ["pack_sequences"]


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
