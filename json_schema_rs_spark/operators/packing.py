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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences", "chunk_windows", "render_conversations",
           "sft_spans"]


def _render_template(template: str, role: Column, text: Column) -> Column:
    """Build the rendered-turn expression for ``template``, which may
    reference ``{role}`` / ``{text}`` (each at most once). Callers pass
    already-NULL-substituted role/text columns."""
    import re
    cols: list[Column] = []
    for p in re.split(r"(\{role\}|\{text\})", template):
        if p == "{role}":
            cols.append(role)
        elif p == "{text}":
            cols.append(text)
        elif p:
            cols.append(F.lit(p))
    return F.concat(*cols) if cols else F.lit("")


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


def pack_report(
    df: DataFrame,
    token_col: str,
    budget: int,
    *,
    group_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Packing-efficiency dashboard for :func:`pack_sequences`'
    concatenate-and-chunk scheme: per group key,
    ``(group, n_docs, total_tokens, n_packs, capacity, fill_frac)``.

    Under contiguous concatenation a group's sequence occupies exactly
    ``ceil(total_tokens / budget)`` packs, so utilization is a pure
    integer computation — no window, no join with the packed output:
    ONE hash aggregate on the group key (map-side partials absorb the
    corpus; output is group-cardinality-sized at any scale).
    ``fill_frac = total / (n_packs * budget)`` answers the budget-tuning
    question directly ("at 4k tokens this shard key wastes 31% of every
    batch — merge shards or shrink the budget"); only the LAST pack of a
    group can be partial, so ``1 - fill_frac`` is exactly the padding
    waste. Token-less groups report 0 packs and NULL fill."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    total = F.sum(F.coalesce(F.col(token_col), F.lit(0))).cast("bigint")
    rolled = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"), total.alias("total_tokens"))
    # exact integer ceil-division — no double arithmetic, safe past 2^53
    n_packs = F.expr(f"(total_tokens + {budget - 1}) div {budget}")
    return (rolled
            .withColumn("n_packs", n_packs.cast("bigint"))
            .withColumn("capacity",
                        (F.col("n_packs") * budget).cast("bigint"))
            .withColumn("fill_frac",
                        F.round(F.col("total_tokens")
                                / F.nullif(F.col("capacity"), F.lit(0)),
                                round_digits))
            .orderBy(group_col))


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


def render_conversations(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    turn_template: str = "<|{role}|>\n{text}",
    sep: str = "\n",
    max_turns: int | None = None,
) -> DataFrame:
    """Assemble each conversation's turns, in stable turn order, into one
    training-ready text — the transcripts -> SFT-sequences step between
    validation/curation and tokenization. This is the north rule's
    "per-turn text equality under stable (conv_id, turn_idx) ordering"
    invariant lifted into an operator: the rendered string is a canonical,
    engine-reproducible serialization of the conversation.

    Output: ``(conv_id, n_turns, text, n_tokens)`` — one row per
    conversation; ``n_tokens`` is the whitespace-token count of the
    rendered text (the budget input for :func:`pack_sequences`).

    ``turn_template`` may reference ``{role}`` and ``{text}`` (each at
    most once); NULL role renders as ``unknown``, NULL text as ``''`` —
    the convention the stateful streaming checks use for missing fields.
    ``max_turns`` keeps only each conversation's FIRST ``max_turns``
    turns by index (truncation-from-the-end, the standard SFT cut).

    Determinism / cross-engine parity: turns sort by the full
    ``(turn_idx, role, text)`` struct with role/text already SUBSTITUTED
    (NULL→``unknown``/``''``), so even a corpus with duplicate turn
    indices (an upstream violation this engine detects but must not be
    corrupted by) renders identically everywhere; with unique indices
    the tiebreak never fires. Sorting the substituted values — never a
    NULL — also sidesteps the engines' opposite NULL-ordering defaults
    (Spark ``sort_array`` is NULLS FIRST, SQL ``ORDER BY ASC`` is
    typically NULLS LAST); a NULL ``turn_idx`` pins to INT_MIN (front of
    the conversation in every engine). An oracle reproduces the text
    with ``string_agg(... ORDER BY coalesce(turn_idx, -2147483648),
    coalesce(role, 'unknown'), coalesce(text, ''))``.

    Scale shape: ONE hash exchange on ``conv_col`` (the same skinny
    shuffle every cross-row check rides); ``sort_array`` + the render are
    row-local over the collected turn array, whose size is bounded by
    turns-per-conversation, not corpus size. No window, no per-row
    Python, no second shuffle."""
    def render_turn(t: Column) -> Column:
        return _render_template(turn_template, t["r"], t["t"])

    # substitute NULLs BEFORE the struct so the sort key is never NULL
    # (see docstring: engines disagree on NULL ordering defaults)
    turn = F.struct(F.coalesce(F.col(idx_col),
                               F.lit(-2147483648)).alias("i"),
                    F.coalesce(F.col(role_col),
                               F.lit("unknown")).alias("r"),
                    F.coalesce(F.col(text_col), F.lit("")).alias("t"))
    agg = (df.groupBy(F.col(conv_col).alias("conv_id"))
             .agg(F.sort_array(F.collect_list(turn)).alias("_turns")))
    if max_turns is not None:
        if max_turns <= 0:
            raise ValueError(f"max_turns must be positive, got {max_turns}")
        agg = agg.withColumn("_turns", F.slice("_turns", 1, max_turns))
    rendered = F.array_join(
        F.transform(F.col("_turns"), render_turn), sep)
    return agg.select(
        "conv_id",
        F.size("_turns").cast("int").alias("n_turns"),
        rendered.alias("text"),
        F.size(F.split(rendered, r"\s+")).cast("bigint").alias("n_tokens"),
    )


def sft_spans(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    turn_template: str = "<|{role}|>\n{text}",
    sep: str = "\n",
    train_roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """Per-turn loss-mask spans over the canonical conversation rendering —
    the SFT-export step after :func:`render_conversations`: a tokenizer
    supervising only completion turns needs, for every turn, WHERE its
    rendered bytes sit inside the full sequence and WHETHER they train.

    Output: one row per input turn —
    ``(conv_id, turn_idx, role, char_start, char_end, train)`` with
    0-based ``[char_start, char_end)`` character offsets into the text
    produced by :func:`render_conversations` with the SAME
    ``turn_template``/``sep``, and ``train`` = role ∈ ``train_roles``
    (NULL role never trains). Invariant (tested): ``full_text[char_start:
    char_end]`` equals the turn's rendered piece, byte-for-byte.

    Ordering / NULL handling mirrors :func:`render_conversations` exactly:
    turns order by the fully NULL-substituted ``(turn_idx→INT_MIN,
    role→'unknown', text→'')`` key, so offsets match the render even on
    corpora with NULL or duplicate indices (ties have identical pieces,
    hence identical offsets either way).

    Scale shape: ONE hash exchange on ``conv_col`` (a window cumulative
    sum of piece lengths — the same skinny conversation shuffle every
    cross-row check rides); the render and length arithmetic are
    row-local codegen. No join, no second shuffle, no Python. At 10^12
    turns this costs exactly what gap-free ordering costs."""
    sub_i = F.coalesce(F.col(idx_col), F.lit(-2147483648))
    sub_r = F.coalesce(F.col(role_col), F.lit("unknown"))
    sub_t = F.coalesce(F.col(text_col), F.lit(""))
    piece_len = F.length(_render_template(turn_template, sub_r, sub_t))
    w = (Window.partitionBy(conv_col).orderBy(sub_i, sub_r, sub_t)
               .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum(piece_len + len(sep)).over(w),
                       F.lit(0)).cast("bigint")
    return df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
        start.alias("char_start"),
        (start + piece_len).cast("bigint").alias("char_end"),
        sub_r.isin(*train_roles).alias("train"),
    )


def truncate_to_budget(
    df: DataFrame,
    budget: int,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    per_turn_overhead: int = 0,
    pin_roles: tuple[str, ...] = ("system",),
) -> DataFrame:
    """Context-window truncation — the ACTING complement of
    :func:`.table_checks.context_budget_violations` (the same
    relationship reindex_turns has to the gap-free check): instead of
    flagging turns past the budget, keep the conversation SUFFIX that
    fits. Chat history is truncated from the front (the newest turns are
    the context that matters) while ``pin_roles`` turns (the system
    prompt) always survive and their cost is charged against the budget
    first.

    Rules, per conversation:

    - token cost per turn = whitespace-token count of ``text_col``
      (NULL = 0; the exact formula of the budget CHECK, so check+repair
      agree) + ``per_turn_overhead``;
    - every ``pin_roles`` turn is kept; their summed cost reduces the
      budget available to the rest;
    - a non-pinned turn is kept iff the total cost of itself and every
      LATER non-pinned turn fits the remaining budget — turns kept whole
      or dropped, never split;
    - ``idx_col`` ties share one cumulative value (RANGE frame, ANSI
      default in both Spark and DuckDB) so the result is deterministic
      even on tables that also fail uniqueness;
    - if the pinned turns alone exceed the budget, only they survive
      (remaining budget clamps at 0 and no non-pinned suffix fits).

    Scale shape: token cost in the scan projection; ONE exchange on
    ``conv_col`` carries the input once and both windows (the pinned-sum
    and the reverse RANGE cumsum) ride the same hash partitioning — no
    join, no second shuffle, no Python."""
    tokens = (F.when(F.col(text_col).isNull(), F.lit(0))
              .otherwise(F.size(F.split(F.col(text_col), " ")))
              + F.lit(per_turn_overhead)).cast("bigint")
    pinned = F.coalesce(F.col(role_col), F.lit("")).isin(list(pin_roles)) \
        if pin_roles else F.lit(False)
    wall = Window.partitionBy(conv_col)
    wrev = (Window.partitionBy(conv_col)
                  .orderBy(F.col(idx_col).desc())
                  .rangeBetween(Window.unboundedPreceding,
                                Window.currentRow))
    staged = (df.withColumn("_tk", tokens)
                .withColumn("_pin", pinned)
                .withColumn("_pincost",
                            F.coalesce(
                                F.sum(F.when(F.col("_pin"), F.col("_tk"))
                                      ).over(wall), F.lit(0)))
                .withColumn("_revcum",
                            F.sum(F.when(~F.col("_pin"), F.col("_tk"))
                                  ).over(wrev)))
    keep = (F.col("_pin")
            | (F.col("_revcum") <= F.greatest(
                F.lit(budget).cast("bigint") - F.col("_pincost"),
                F.lit(0).cast("bigint"))))
    return (staged.filter(keep)
                  .withColumn("turn_tokens", F.col("_tk"))
                  .drop("_tk", "_pin", "_pincost", "_revcum"))


def turn_windows(
    df: DataFrame,
    k: int,
    *,
    stride: int = 1,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    per_turn_overhead: int = 0,
) -> DataFrame:
    """Sliding windows of ``k`` consecutive turns per conversation — the
    conversation-grain sibling of :func:`chunk_windows` (which slides
    over one document's tokens): every full window of ``k`` turns
    becomes a training-example candidate, with its summed token cost so
    a downstream budget filter (or :func:`pack_sequences`) can consume
    it directly. ``stride`` keeps every ``stride``-th window (1 = fully
    overlapping, k = disjoint). Output: one row per kept window —
    ``(conv_col, window_pos, start_idx, end_idx, n_turns, n_tokens)``
    with ``window_pos`` = 0-based position of the window's first turn.

    Requires unique ``idx_col`` per conversation (run
    :func:`.table_checks.reindex_turns` first on dirty tables — same
    composition contract as the other consumers of turn order); windows
    shorter than ``k`` (conversation tail) are dropped, so every output
    row is a complete example.

    Scale shape: ONE hash exchange on ``conv_col``; position, the
    k-row look-ahead frame sums and the stride filter are all computed
    inside that single window sort (token cost in the scan projection —
    text never shuffles). Window state is k rows — bounded by the
    frame, not the conversation."""
    tokens = (F.when(F.col(text_col).isNull(), F.lit(0))
              .otherwise(F.size(F.split(F.col(text_col), " ")))
              + F.lit(per_turn_overhead)).cast("bigint")
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    wf = w.rowsBetween(0, k - 1)
    staged = (df.select(F.col(conv_col), F.col(idx_col),
                        tokens.alias("_tk"))
                .withColumn("_pos", F.row_number().over(w) - 1)
                .withColumn("_n", F.count("_tk").over(wf))
                .withColumn("_end", F.max(idx_col).over(wf))
                .withColumn("_sum", F.sum("_tk").over(wf)))
    return (staged.filter((F.col("_n") == k)
                          & (F.col("_pos") % stride == 0))
            .select(F.col(conv_col),
                    F.col("_pos").alias("window_pos"),
                    F.col(idx_col).alias("start_idx"),
                    F.col("_end").alias("end_idx"),
                    F.col("_n").alias("n_turns"),
                    F.col("_sum").alias("n_tokens")))
