"""Table-level checks: the reference's per-value semantics lifted to
cross-row grain (SURVEY.md §2.4).

Each check returns a violation DataFrame with the same contract as the
row-local runner: ``(key cols..., instance_path, code, message)`` so the
caller can union row-local and table-level violations into one sink.

Scale notes (north_rule: partitioning/shuffle/skew handled explicitly):

- **uniqueness** shuffles once on the key; Spark's hash aggregate already
  does map-side partial aggregation, which absorbs key skew for counts.
  For hot single keys beyond that, ``salt`` enables an explicit two-phase
  aggregation: pre-aggregate on (key, salt) then re-aggregate on key —
  the classic salted-agg pattern.
- **referential** broadcasts the (small) vocabulary and anti-joins —
  no shuffle of the fact table at all.
- **gap-free ordering** windows by conversation; one shuffle on conv_id.
  AQE handles moderate skew; a conversation's turns must fit one task,
  which holds by construction for transcripts (conversations are bounded).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_VCOLS = ["instance_path", "code", "message"]


def uniqueness_violations(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    *,
    salt: Optional[int] = None,
) -> DataFrame:
    """Keys that appear more than once — ``uniqueItems`` ("no two elements
    equal", validator/mod.rs:378-397) lifted from array to table. Emits one
    violation row per duplicated key."""
    keys = list(keys)
    if salt:
        # two-phase salted aggregation: (key, salt) partial counts -> key
        salted = df.groupBy(*keys, F.pmod(F.xxhash64(*keys, F.monotonically_increasing_id()),
                                          F.lit(salt)).alias("_salt"))\
                   .agg(F.count(F.lit(1)).alias("_c"))
        counts = salted.groupBy(*keys).agg(F.sum("_c").alias("occurrences"))
    else:
        counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("occurrences"))
    dup = counts.filter(F.col("occurrences") > 1)
    key_desc = ", ".join(keys)
    return dup.select(
        *keys,
        F.lit("").alias("instance_path"),
        F.lit("DuplicateKey").alias("code"),
        F.concat(
            F.lit(f"root: duplicate key ({key_desc}) has "),
            F.col("occurrences").cast("string"),
            F.lit(" occurrences, expected 1"),
        ).alias("message"),
    )


def referential_violations(
    df: DataFrame,
    column: str,
    vocab: Union[DataFrame, Sequence[str]],
    *,
    vocab_name: Optional[str] = None,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    vocab_column: Optional[str] = None,
) -> DataFrame:
    """Values of ``column`` not present in a vocabulary — ``enum``
    membership (validator/mod.rs:96-108) with the allowed set as a table.

    Small vocab list -> compiled to a literal ``isin`` (no join at all);
    vocab DataFrame -> broadcast left-anti join (no shuffle of ``df``).
    NULLs are "absent" and never violate (match the row-local convention).
    """
    keys = list(keys)
    name = vocab_name or column
    base = df.filter(F.col(column).isNotNull())
    if isinstance(vocab, DataFrame):
        vcol = vocab_column or vocab.columns[0]
        right = vocab.select(F.col(vcol).alias(column)).distinct()
        bad = base.join(F.broadcast(right), on=column, how="left_anti")
    else:
        bad = base.filter(~F.col(column).isin(list(vocab)))
    path = "/" + column
    return bad.select(
        *keys,
        F.lit(path).alias("instance_path"),
        F.lit("RefIntegrity").alias("code"),
        F.concat(
            F.lit(f"{path}: value "),
            F.concat(F.lit('"'), F.col(column), F.lit('"')),
            F.lit(f' not in vocabulary "{name}"'),
        ).alias("message"),
    )


def turn_gap_violations(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
) -> DataFrame:
    """Gap-free 0..n-1 ordering per conversation — the reference validates
    array items at positions 0..n (validator/mod.rs:398-407): a
    conversation IS the array of its turns. A turn violates when its index
    differs from its dense position (catches holes, duplicates, and
    offset starts)."""
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    pos = F.row_number().over(w) - 1
    flagged = df.select(conv_col, idx_col).withColumn("_pos", pos) \
                .filter(F.col(idx_col) != F.col("_pos"))
    path = "/" + idx_col
    return flagged.select(
        F.col(conv_col),
        F.col(idx_col),
        F.lit(path).alias("instance_path"),
        F.lit("TurnGap").alias("code"),
        F.concat(
            F.lit(f"{path}: turn index "),
            F.col(idx_col).cast("string"),
            F.lit(" at position "),
            F.col("_pos").cast("string"),
            F.lit(" breaks gap-free ordering"),
        ).alias("message"),
    )


def monotonic_ts_violations(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Timestamps must be non-decreasing in turn order within each
    conversation (engine extension for the transcript shape)."""
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    prev = F.lag(ts_col).over(w)
    flagged = df.select(conv_col, idx_col, ts_col).withColumn("_prev", prev) \
                .filter(F.col("_prev").isNotNull() & (F.col(ts_col) < F.col("_prev")))
    path = "/" + ts_col
    return flagged.select(
        F.col(conv_col),
        F.col(idx_col),
        F.lit(path).alias("instance_path"),
        F.lit("NonMonotonicTs").alias("code"),
        F.concat(
            F.lit(f"{path}: timestamp "),
            F.col(ts_col).cast("string"),
            F.lit(" is before previous turn's "),
            F.col("_prev").cast("string"),
        ).alias("message"),
    )
