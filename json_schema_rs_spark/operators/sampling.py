"""Deterministic, key-coherent sampling and train/eval splitting.

Training-data curation at 10^12-turn scale needs sampling that is

- **reproducible**: the same (key, salt) always lands on the same side,
  across reruns, engines, and cluster sizes;
- **retry-safe**: Spark's ``df.sample`` draws per-partition randomness,
  so a recomputed (retried / speculatively executed) task can emit a
  DIFFERENT sample of the same input split — silent nondeterminism at
  exactly the scale where retries are routine. A pure hash of the key
  column cannot;
- **group-coherent**: sampling transcripts at the *conversation* grain
  must keep or drop every turn of a conversation together (row-grain
  sampling truncates conversations mid-dialogue), and a train/eval
  split must never leak turns of one conversation across the boundary;
- **shuffle-free**: a filter / projection over a hash expression — no
  join against a sampled key list, no exchange, fully pushdown- and
  codegen-friendly.

Mechanism: ``md5(cast(key as string) || '#' || salt)`` — the first 8 hex
chars of a cryptographic hash are uniform on [0, 2^32); comparing them
LEXICOGRAPHICALLY against ``format(int(fraction * 16**8), '08x')``
equals the numeric comparison (fixed-width lowercase hex), and every
engine agrees on md5 bytes, so the exact same rows are selected by
Spark, DuckDB, or a Rust job — the property the reference's
deterministic test fixtures rely on throughout
(/root/reference/json_schema_rs/tests/ uses fixed inputs, never RNG).

NULL keys hash as the literal string ``''`` (coalesce) so they land in
one deterministic bucket instead of vanishing (md5(NULL) is NULL and a
NULL comparison would silently drop them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bucket_hex", "deterministic_sample", "dsir_sample",
           "dsir_weight_table", "dsir_weights", "dup_weighted_sample",
           "mix_sources", "quota_sample", "shard_corpus",
           "stratified_sample", "temperature_weights",
           "train_eval_split"]

_HEX_SPACE = 16 ** 8  # 8 hex chars = 32 bits of the md5


def _threshold(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * _HEX_SPACE), _HEX_SPACE - 1), "08x") \
        if fraction < 1.0 else "g"  # 'g' > 'f...f': keeps everything


def bucket_hex(key_col: str, salt: str = "0") -> Column:
    """First 8 hex chars of ``md5(key || '#' || salt)`` — the uniform
    [0, 2^32) bucket id both :func:`deterministic_sample` and
    :func:`train_eval_split` compare against. Exposed so callers can
    persist the bucket alongside rows (e.g. for stratified audits)."""
    return F.substring(
        F.md5(F.concat(F.coalesce(F.col(key_col).cast("string"),
                                  F.lit("")),
                       F.lit(f"#{salt}"))), 1, 8)


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    *,
    salt: str = "0",
) -> DataFrame:
    """Keep every row whose ``key_col`` hash-bucket falls below
    ``fraction`` — key-coherent (all rows sharing a key are kept or
    dropped together, e.g. whole conversations when keyed on conv_id),
    reproducible, and shuffle-free (a codegen'd filter; at scale this
    pushes below column reads of everything except the key)."""
    return df.where(bucket_hex(key_col, salt) < F.lit(_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    *,
    default_fraction: float = 0.0,
    salt: str = "0",
) -> DataFrame:
    """Per-stratum :func:`deterministic_sample` — re-balancing a
    training mix ("keep 100% of lang=de, 5% of lang=en") in one
    codegen'd filter: the stratum value selects its threshold through a
    CASE chain of literals (no join against a fractions table, no
    shuffle), the key hash decides membership, so the same key is
    consistently in/out wherever its stratum sets an equal fraction,
    and samples still nest as any stratum's fraction grows. Strata
    absent from ``fractions`` (including NULL) fall back to
    ``default_fraction``."""
    thr = F.lit(_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == F.lit(value),
                     F.lit(_threshold(frac))).otherwise(thr)
    return df.where(bucket_hex(key_col, salt) < thr)


def mix_sources(
    df: DataFrame,
    source_col: str,
    weights: "dict[str, int]",
    key_col: str,
    *,
    salt: str = "mix",
    budget_col: "str | None" = None,
) -> DataFrame:
    """Weighted corpus mixing: downsample each source so the OUTPUT
    follows the integer target ``weights`` (the training-mixture
    recipe: "5 parts web, 3 parts books, 2 parts code"), keeping as
    much data as possible — the bottleneck source (smallest
    ``n_i / w_i``) is kept WHOLE by construction and every other
    source is deterministically thinned to match its proportion.
    Sources not in ``weights`` are dropped (weight 0).

    ``budget_col`` switches the mixture unit from row count to the SUM
    of an integer column (token counts): proportions then hold in
    tokens — what a training mix actually budgets — while documents
    are still kept or dropped whole by their key hash, so the realized
    token split is the expectation under uniform hashing, with the
    thresholds themselves still exact. A NULL budget value is a config
    error and raises (silently counting it as 0 would skew the mix).

    All mixture arithmetic is EXACT integer math (arbitrary-precision
    on the driver, HUGEINT in a SQL oracle): the bottleneck source
    ``b`` minimizes ``n_i / w_i`` (compared as scaled integers, ties
    broken by source name), and every other source keeps hash fraction
    ``w_i * n_b / (w_b * n_i)`` via threshold
    ``floor(w_i * n_b * 16^8 / (w_b * n_i))`` — the bottleneck's own
    ratio is exactly 1, so it is never thinned by rounding, and the
    selected row set is bit-identical across engines and reruns with
    no float arithmetic anywhere. Cost: one tiny count aggregate (one
    row per source to the driver) + one codegen'd filter over a
    literal source->threshold map — no join, no shuffle of the corpus.

    Raises if a weighted source has no rows (a mixture naming a missing
    source is a config error, not an empty result)."""
    if (not weights or any(w < 0 for w in weights.values())
            or all(w == 0 for w in weights.values())):
        raise ValueError(
            f"weights must be non-negative with at least one positive, "
            f"got {weights}")
    if budget_col is None:
        aggs = [F.count(F.lit(1)).alias("n"), F.lit(0).alias("nulls")]
    else:
        aggs = [F.sum(F.col(budget_col).cast("long")).alias("n"),
                F.count(F.when(F.col(budget_col).isNull(), 1))
                 .alias("nulls")]
    stats = {r[source_col]: r for r in
             df.groupBy(source_col).agg(*aggs).collect()}
    active = {src: w for src, w in weights.items() if w > 0}
    bad = [src for src in active
           if src in stats and stats[src]["nulls"]]
    if bad:
        raise ValueError(
            f"budget_col {budget_col!r} has NULL values in sources "
            f"{bad}; fill or filter them first")
    counts = {src: stats[src]["n"] if src in stats else 0
              for src in active}
    missing = [src for src in active if not counts[src]]
    if missing:
        raise ValueError(
            f"weighted sources have no rows"
            f"{' or zero total budget' if budget_col else ''}: {missing}")
    # bottleneck = argmin n_i / w_i, compared exactly: scale each n_i by
    # P // w_i where P = prod(weights) (every w_i divides P); ties break
    # on source name so both engines pick the same b
    P = 1
    for w in active.values():
        P *= w
    b = min(active, key=lambda src: (counts[src] * (P // active[src]),
                                     src))
    wb, nb = active[b], counts[b]
    pairs = []
    for src, w in active.items():
        thr = w * nb * _HEX_SPACE // (wb * counts[src])
        # ratio >= 1 (the bottleneck and any exact tie) keeps
        # everything: 'g' sorts above every hex digit
        pairs += [F.lit(src),
                  F.lit("g" if thr >= _HEX_SPACE else format(thr, "08x"))]
    thr_map = F.create_map(*pairs)
    # absent sources look up NULL -> NULL comparison -> dropped
    return df.where(bucket_hex(key_col, salt)
                    < F.element_at(thr_map, F.col(source_col)))


def dup_weighted_sample(
    df: DataFrame,
    groups: DataFrame,
    *,
    id_col: str = "doc_id",
    salt: str = "softdedup",
) -> DataFrame:
    """Duplication-aware ("soft") dedup sampling: keep each member of a
    duplicate group with probability ``1/group_size``, so duplicated
    content's EXPECTED surviving copy count is exactly one — without
    hard-committing to a single survivor. Hard dedup
    (:func:`~.dedup.canonical_docs`) deterministically erases all
    variation inside a group; soft dedup preserves variant diversity in
    expectation (near-dup groups contain non-identical texts) while
    still flattening the frequency skew that makes models memorize
    boilerplate. Docs absent from ``groups`` are singletons, kept with
    probability 1.

    ``groups`` is a ``(id_col, group_id)`` table from
    :func:`~.dedup.near_dup_groups` or exact-digest grouping. The keep
    decision is the package's standard deterministic draw —
    ``bucket_hex(id, salt) < floor(2^32 / group_size)`` in 8-char hex —
    so it is reproducible across reruns/retries/engines (a DuckDB twin
    reproduces the exact surviving set), and independent draws per doc
    make the expected group survival exactly ``n * 1/n = 1``.

    Output: surviving rows only — ``(id_col, group_id, n_copies,
    keep_prob)`` with ``group_id = id_col``, ``n_copies = 1``,
    ``keep_prob = 1.0`` for singletons.

    Scale shape: ``groups`` is skinny (only docs in some candidate
    pair); its size aggregate and the membership join shuffle id-grain
    rows only, and AQE broadcasts the group side whenever it fits. The
    corpus text never shuffles; the filter is a codegen'd projection
    over the joined rows."""
    sizes = groups.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("n_copies"))
    mem = groups.join(sizes, "group_id").select(
        F.col(id_col), F.col("group_id"), F.col("n_copies"))
    joined = (df.select(F.col(id_col))
                .join(mem, id_col, "left")
                .select(F.col(id_col),
                        F.coalesce(F.col("group_id"),
                                   F.col(id_col)).alias("group_id"),
                        F.coalesce(F.col("n_copies"),
                                   F.lit(1).cast("bigint"))
                         .alias("n_copies")))
    # per-row threshold floor(2^32 / n) as fixed-width lowercase hex —
    # n >= 2 keeps it within 8 chars; n == 1 is the keep-always branch
    # (2^32 itself would be 9 chars and lpad would truncate it)
    thr = F.lpad(F.lower(F.hex(F.floor(F.lit(float(_HEX_SPACE))
                                       / F.col("n_copies"))
                               .cast("bigint"))), 8, "0")
    kept = joined.where((F.col("n_copies") == 1)
                        | (bucket_hex(id_col, salt) < thr))
    return kept.select(
        F.col(id_col), F.col("group_id"), F.col("n_copies"),
        F.round(F.lit(1.0) / F.col("n_copies"), 6).alias("keep_prob"))


def train_eval_split(
    df: DataFrame,
    key_col: str,
    eval_fraction: float,
    *,
    salt: str = "0",
    split_col: str = "split",
) -> DataFrame:
    """Label every row ``'eval'`` or ``'train'`` by its key's hash
    bucket — the split is disjoint, exhaustive, key-coherent (no
    conversation straddles the boundary), and stable under appends: new
    rows of an already-seen key join the side the key was always on,
    and changing ``salt`` re-draws the whole assignment."""
    return df.withColumn(
        split_col,
        F.when(bucket_hex(key_col, salt) < F.lit(_threshold(eval_fraction)),
               F.lit("eval")).otherwise(F.lit("train")))


def shard_corpus(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    *,
    salt: str = "shard",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle + output sharding — the terminal
    step of a training-corpus pipeline: assign every row a shard in
    ``[0, n_shards)`` and a 0-based position within its shard, such
    that the (shard, pos) order is a uniform pseudo-random permutation
    of the corpus that any engine reproduces bit-for-bit. Training
    jobs need this order to be (a) decorrelated from ingest order (no
    curriculum accidents from crawl locality), (b) identical across
    reruns (resumable epochs, reproducible loss curves) — which rules
    out ``df.orderBy(rand())`` twice over: per-partition RNG draws
    differ across retries, and a global sort on a random column is not
    reproducible at all.

    Mechanism: a 60-bit md5-derived order key (15 hex chars — the same
    cross-engine construction as :func:`~.dedup.simhash`'s token hash);
    ``shard = order_key mod n_shards``, ``pos`` = rank of the order key
    within the shard (ties — md5 collisions on distinct keys are
    physically implausible, duplicate keys are not — break on the key
    itself, keeping the permutation total). DuckDB twin:
    ``('0x' || substr(md5(key || '#' || salt), 1, 15))::BIGINT``.

    Scale shape: ONE exchange, hash-partitioned on ``shard`` (that
    exchange IS the global shuffle — the data lands exactly where the
    shard writer needs it), then a per-shard sort feeding
    ``row_number`` — each window partition holds ~corpus/n_shards rows,
    so sizing ``n_shards`` to the cluster (e.g. 10k shards at 100 TB →
    ~10 GB sorted per task, spill-safe) keeps every sort in-memory. A
    writer that only needs shard files in order (not materialized
    positions) can drop the window and write
    ``repartition(n_shards, shard).sortWithinPartitions(order_key)``
    directly — identical movement, zero window cost."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key_s = F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    hx = F.substring(F.md5(F.concat(key_s, F.lit(f"#{salt}"))), 1, 15)
    okey = F.conv(hx, 16, 10).cast("bigint")
    with_shard = df.withColumn("_okey", okey).withColumn(
        shard_col, (F.col("_okey") % n_shards).cast("int"))
    w = (Window.partitionBy(shard_col)
               .orderBy(F.col("_okey"), F.col(key_col)))
    return (with_shard
            .withColumn(pos_col, F.row_number().over(w) - F.lit(1))
            .drop("_okey"))


def temperature_weights(
    df: DataFrame,
    source_col: str,
    *,
    alpha: float = 0.5,
    scale: int = 10 ** 6,
) -> "dict[str, int]":
    """Temperature-based mixture weights for :func:`mix_sources`: target
    share of source ``i`` proportional to ``n_i ** alpha`` — the
    multilingual/corpus rebalancing recipe (alpha < 1 upweights
    low-resource sources relative to raw proportion; alpha=1 is the
    identity mix, alpha=0 equal shares). Returns the integer weight
    dict ``mix_sources`` consumes: ``floor(n_i**alpha * scale)``
    (min 1).

    Under these weights the bottleneck source (min ``n_i / w_i`` =
    ``n_i**(1-alpha)``/scale) is the SMALLEST source — it is kept whole
    and every larger source thins toward its temperature share, which
    is exactly what low-resource upweighting means under a
    keep-the-most-data constraint.

    Cross-engine exactness: at ``alpha=0.5`` the weight is
    ``floor(sqrt(n)*scale)`` — IEEE-754 ``sqrt`` is correctly rounded
    everywhere, so a SQL oracle reproduces the integers bit-exactly.
    Other alphas go through ``pow``, whose rounding may differ between
    libms by 1 ulp at the floor boundary; supported, but pin
    ``alpha=0.5`` where an exact cross-engine replay matters.

    Cost: one tiny count aggregate (one row per source to the driver) —
    the same scan :func:`mix_sources` performs; at scale pass the same
    cached input to both."""
    import math

    counts = {r[0]: r[1] for r in
              df.groupBy(source_col).agg(
                  F.count(F.lit(1)).alias("n")).collect()}
    if alpha == 0.5:
        raised = {s: math.sqrt(n) for s, n in counts.items()}
    else:
        raised = {s: math.pow(n, alpha) for s, n in counts.items()}
    return {s: max(1, math.floor(v * scale)) for s, v in raised.items()}


def quota_sample(
    df: DataFrame,
    group_col: str,
    n: int,
    *,
    key_col: str = "doc_id",
    salt: str = "0",
) -> DataFrame:
    """EXACT-count quota sampling: the ``n`` md5-smallest keys per group
    — the count-quota complement of :func:`stratified_sample` (which
    takes a FRACTION per stratum and so can't promise "exactly 1000
    docs per language" on skewed strata). Deterministic (same corpus +
    salt → same sample, reruns diffable), unbiased w.r.t. any real
    ordering, groups smaller than ``n`` are kept whole. Output = the
    input columns + ``sample_rank`` (1-based within group).

    Scale shape — the same two-phase exact top-N-per-group as
    :func:`.table_checks.review_queue`: a zero-shuffle per-partition
    local top-``n`` per group (a superset of the global winners), then
    one per-group window over the ≤ n x groups x partitions survivors —
    group skew never funnels the corpus through few window partitions,
    and wide columns shuffle only for rows that might win."""
    rk = F.md5(F.concat(F.col(key_col).cast("string"),
                        F.lit("#" + salt)))
    staged = df.withColumn("_rk", rk)
    schema = staged.schema
    gname = group_col

    def local_topn(batches):
        import pandas as pd
        acc = None
        for pdf in batches:
            acc = pdf if acc is None else pd.concat([acc, pdf],
                                                    ignore_index=True)
            acc = (acc.sort_values("_rk", kind="mergesort")
                      .groupby(gname, sort=False, dropna=False).head(n))
        if acc is not None:
            yield acc

    local = staged.mapInPandas(local_topn, schema=schema)
    w = Window.partitionBy(group_col).orderBy("_rk")
    return (local.withColumn("sample_rank", F.row_number().over(w))
                 .filter(F.col("sample_rank") <= n)
                 .drop("_rk"))


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
# feature distribution looks like a TARGET corpus (the "give me more
# data shaped like Wikipedia" knob). Per doc the importance log-weight
# log p_target(doc) - log p_raw(doc) under bag-of-hashed-n-grams
# unigram models over B feature buckets.
#
# Exactness contract (mirrors textstats.lm_quality): every per-bucket
# weight is an INTEGER in micro-nats —
#   w[b] = floor(ln((c_t[b]+1)/(N_t+B)) * 1e6)
#        - floor(ln((c_r[b]+1)/(N_r+B)) * 1e6)
# with both ln's evaluated ONCE per bucket on the driver (C libm), so a
# doc's weight is an order-free integer sum any engine reproduces
# bit-identically. Buckets are md5-derived (first 8 hex chars mod B),
# the same cross-engine device as bucket_hex above — never a
# JVM-private hash.
#
# Scale shape: training = one gram explode + ONE ≤B-key hash aggregate
# per corpus (map-side combine absorbs the corpus; 2B longs to the
# driver). Scoring = gram explode + BROADCAST join against the B-row
# weight table + per-doc integer sum (skinny (id, long) shuffle) + one
# id-grain join-back so gram-less docs score 0. Corpus text never
# shuffles at any stage.
# ---------------------------------------------------------------------------

def quality_bucket_sample(
    df: DataFrame,
    score_col: str,
    fractions: "Sequence[float]",
    *,
    key_col: str = "doc_id",
    salt: str = "qb0",
    bins: int = 2048,
) -> DataFrame:
    """Quality-aware downsampling: partition the corpus into
    ``len(fractions)`` equal-MASS score buckets (exact quantile edges)
    and keep each bucket at its own deterministic rate — the curation
    recipe "keep all of the top quality decile, 20% of the bottom"
    without a hard gate's cliff (hard gates discard the gradient;
    graded retention keeps some low-end diversity while spending most
    of the token budget on the top). Output = surviving rows +
    ``score_bucket`` (0 = lowest scores).

    Determinism/exactness: bucket edges are ACTUAL data values from
    :func:`..operators.stats.exact_quantiles` (the ``quantile_disc``
    convention — an oracle re-derives them with zero float arithmetic);
    bucket membership is ``sum(score >= edge_i)`` (ties land in the
    higher bucket, both engines identically); the keep decision is the
    same md5-cut used by every sampler here — rerun/engine reproducible
    and key-coherent. Edge caveat (documented, inherent to value
    edges): heavy duplication at an edge value makes bucket MASSES
    unequal — membership stays exact.

    Scale shape: one shared-histogram quantile call (scans only), then
    a single zero-shuffle codegen projection+filter (CASE chain over
    ≤ len(fractions) literal edges + the md5 cut). NULL scores are
    dropped (unscored rows have no bucket — score first)."""
    from .stats import exact_quantiles

    nb = len(fractions)
    if nb < 2:
        raise ValueError("need at least 2 buckets")
    for f in fractions:
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction must be in [0, 1], got {f}")
    qs = [i / nb for i in range(1, nb)]
    edges = [r["value"] for r in
             exact_quantiles(df, score_col, qs, bins=bins).collect()]
    col = F.col(score_col).cast("double")
    if edges[0] is None:                 # empty / all-NULL input
        return (df.filter(F.lit(False))
                  .withColumn("score_bucket", F.lit(0)))
    bucket = sum((col >= F.lit(e)).cast("int") for e in edges)
    hexes = [_threshold(f) for f in fractions]
    thr = F.array(*[F.lit(h) for h in hexes])
    keep = bucket_hex(key_col, salt) < F.element_at(
        thr, F.col("score_bucket") + 1)
    return (df.filter(col.isNotNull())
              .withColumn("score_bucket", bucket)
              .filter(keep))


def _dsir_words(text_col: str) -> Column:
    return F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
                    lambda x: x != "")


def _dsir_grams(text_col: str, ns: tuple[int, ...]) -> Column:
    """Whitespace word n-grams for every n in ``ns``, space-joined.
    Docs shorter than n contribute no n-grams (guarded: Spark's
    ``sequence(0, -1)`` would count DOWN, not produce empty)."""
    words = _dsir_words(text_col)
    parts = []
    for n in sorted(set(ns)):
        if n < 1:
            raise ValueError(f"n-gram sizes must be >= 1, got {n}")
        if n == 1:
            parts.append(words)
        else:
            idx = F.sequence(F.lit(0), F.size(words) - n)
            parts.append(
                F.when(F.size(words) >= n,
                       F.transform(idx, lambda i: F.array_join(
                           F.slice(words, i + 1, n), " ")))
                .otherwise(F.array().cast("array<string>")))
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def _dsir_bucket(gram: Column, buckets: int) -> Column:
    return (F.conv(F.substring(F.md5(gram), 1, 8), 16, 10)
            .cast("long") % buckets).cast("int")


def _dsir_bucket_counts(df: DataFrame, text_col: str, id_col: str,
                        ns: tuple[int, ...], buckets: int) -> dict[int, int]:
    from ..functions.exprs import explode_rows
    from .dedup import _spread
    grams = explode_rows(
        _spread(df.select(id_col, text_col), id_col)
        .withColumn("__dsir_g", _dsir_grams(text_col, ns)),
        [], F.col("__dsir_g"), "__gram")
    rows = (grams.select(_dsir_bucket(F.col("__gram"), buckets)
                         .alias("__b"))
            .groupBy("__b").agg(F.count("*").alias("__c")).collect())
    return {r["__b"]: r["__c"] for r in rows}


def dsir_weight_table(raw_df: DataFrame, target_df: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id", *,
                      ns: tuple[int, ...] = (1, 2),
                      buckets: int = 4096) -> list[tuple[int, int]]:
    """Train the DSIR importance model: ``[(bucket, micro_nat_weight)]``
    over all ``buckets`` feature buckets (positive = target-like,
    negative = raw-typical). Reusable across :func:`dsir_weights` calls
    so one training pass scores many corpora."""
    import math
    tc = _dsir_bucket_counts(target_df, text_col, id_col, ns, buckets)
    rc = _dsir_bucket_counts(raw_df, text_col, id_col, ns, buckets)
    dt = float(sum(tc.values()) + buckets)
    dr = float(sum(rc.values()) + buckets)
    return [(b,
             math.floor(math.log((tc.get(b, 0) + 1) / dt) * 1_000_000)
             - math.floor(math.log((rc.get(b, 0) + 1) / dr) * 1_000_000))
            for b in range(buckets)]


def dsir_weights(raw_df: DataFrame, target_df: DataFrame,
                 text_col: str = "text", id_col: str = "doc_id", *,
                 ns: tuple[int, ...] = (1, 2), buckets: int = 4096,
                 table: list[tuple[int, int]] | None = None) -> DataFrame:
    """Per-doc DSIR importance log-weights against a target corpus:
    ``(id, n_grams, logw_micro, avg_logw)`` where ``logw_micro`` is the
    exact integer micro-nat sum of the doc's per-gram bucket weights
    and ``avg_logw`` its length-normalized float rendering —
    ``floor(logw_micro / n_grams) / 1e6``, derived from an exact
    integer floor division rather than ``round()`` because rounding a
    quotient of small integers regularly lands on exact decimal ties
    (x.5 micro-nats whenever ``2·logw ≡ n (mod 2n)``) where engines'
    tie-breaking disagrees; the floor-div double is the same IEEE op
    sequence everywhere. Docs with no grams (empty/NULL text) report
    ``(0, 0, 0.0)``. Pass ``table=dsir_weight_table(...)`` to reuse a
    trained model."""
    from ..functions.exprs import arrow_local_df, explode_rows
    from .dedup import _spread
    wt = table if table is not None else dsir_weight_table(
        raw_df, target_df, text_col, id_col, ns=ns, buckets=buckets)
    if len(wt) != buckets:
        raise ValueError(
            f"weight table has {len(wt)} rows, expected buckets={buckets}")
    wdf = arrow_local_df(raw_df.sparkSession, wt, "__b int, __w bigint")
    grams = explode_rows(
        _spread(raw_df.select(id_col, text_col), id_col)
        .withColumn("__dsir_g", _dsir_grams(text_col, ns)),
        [id_col], F.col("__dsir_g"), "__gram")
    scored = (grams.select(id_col,
                           _dsir_bucket(F.col("__gram"), buckets)
                           .alias("__b"))
              .join(F.broadcast(wdf), "__b")
              .groupBy(id_col)
              .agg(F.count("*").alias("n_grams"),
                   F.sum("__w").alias("logw_micro")))
    return (raw_df.select(id_col).join(scored, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
                F.coalesce(F.col("logw_micro"), F.lit(0))
                 .alias("logw_micro"),
                F.coalesce(
                    F.floor(F.col("logw_micro") /
                            F.col("n_grams")).cast("double")
                    / F.lit(1_000_000.0),
                    F.lit(0.0)).alias("avg_logw")))


def dsir_sample(raw_df: DataFrame, target_df: DataFrame, n_docs: int,
                text_col: str = "text", id_col: str = "doc_id", *,
                ns: tuple[int, ...] = (1, 2), buckets: int = 4096,
                table: list[tuple[int, int]] | None = None) -> DataFrame:
    """The resampling step: keep the ``n_docs`` most target-like raw
    docs — exact top-N by ``(logw_micro DESC, id ASC)`` (a total order,
    so the set is unique and cross-engine reproducible; the paper's
    Gumbel-noise draw trades that determinism for unbiasedness — this
    engine pins reproducibility, the convention of every sampler here).
    Output = the input columns + ``logw_micro``. Top-N is a TakeOrdered
    (per-partition heads, no global sort materialization); the full
    rows join back by id."""
    w = dsir_weights(raw_df, target_df, text_col, id_col,
                     ns=ns, buckets=buckets, table=table)
    top = (w.orderBy(F.desc("logw_micro"), F.asc(id_col))
           .limit(n_docs).select(id_col, "logw_micro"))
    return raw_df.join(top, id_col)
