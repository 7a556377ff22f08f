"""Deduplication operators for large-scale training-data pipelines.

Four dedup families over a ``(id, text)`` document table, all pure
DataFrame ops (no per-row Python), all deterministic:

- **exact**        — hash-groupBy on a content digest (md5);
- **n-gram Jaccard** — exact near-dup pairs via an inverted shingle index
  (the small/medium-scale truth oracle);
- **MinHash + LSH** — the 100 TB path: constant-size signatures, banded
  bucket join, candidates verified with exact Jaccard;
- **SimHash**      — 60-bit per-doc fingerprint from md5 token hashes
  (cross-engine reproducible: DuckDB computes the identical value).

Reference anchor: the reference's ``uniqueItems`` is pairwise JSON
equality over an array (`/root/reference/json_schema_rs/src/validator/
mod.rs:378-397`); exact dedup is that semantic lifted to a table, and the
near-dup operators relax equality to similarity.

Scale notes (100 TB):
- ``exact_duplicate_groups`` is one hash aggregation with map-side partial
  combine; the digest (16 bytes) shuffles instead of the document text.
- ``ngram_jaccard_pairs`` explodes the shingle inverted index; posting
  lists longer than ``max_df`` are dropped (stop-shingles) — without that
  cap a single hot shingle creates a quadratic join blow-up.
- ``minhash_lsh_pairs`` replaces the quadratic candidate join with
  ``bands`` constant-size bucket joins; signature arithmetic stays inside
  whole-stage codegen (one xxhash64 per shingle, then affine permutations
  mod a 31-bit prime — no overflow under ANSI mode).
- near-dup internals run on 64-bit shingle HASHES (:func:`shingle_hashes`),
  never shingle strings: the inverted index explodes/shuffles 8-byte longs
  and candidate verification intersects long arrays.
"""

from __future__ import annotations

import random
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import explode_rows

_MERSENNE31 = 2_147_483_647  # 2^31 - 1, prime; keeps a*h+b within int64


def _spread(df: DataFrame, id_col: str, *more_cols: str) -> DataFrame:
    """Local-parallelism guard for the map-heavy operators (the ONE
    shared implementation — json_mode / similarity import it rather than
    re-inlining the idiom).

    Their expensive stage is the MAP side (split/shingle/hash/partial-agg
    per document), which runs with the parallelism of the input scan. A
    production corpus is thousands of files/partitions, so this returns
    ``df`` untouched (partitions >= defaultParallelism — the common case
    costs one plan inspection, no job). But a small table in one parquet
    row group scans as ONE partition, serializing the whole map side on a
    single core; only then is a hash repartition on the doc id inserted —
    it moves the skinny (id, text) projection once and unlocks every
    downstream stage. Per-doc results are partitioning-independent, so
    output is identical either way."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(id_col),
                              *[F.col(c) for c in more_cols])
    return df


def shingles(df: DataFrame, text_col: str = "text", *, n: int = 3,
             out_col: str = "shingles") -> DataFrame:
    """Distinct word n-gram shingles per document (space tokenization,
    matching ``string_split(text, ' ')`` so oracles can reproduce it)."""
    if n == 1:
        return df.withColumn(
            out_col, F.array_distinct(F.split(F.col(text_col), " ")))
    # Bind the tokenization to its own column FIRST: referencing
    # split(text) inside the transform lambda re-splits the text once per
    # shingle — O(words^2) per document (measured 6s for 5k docs; this
    # shape is <1s). The bound attribute is evaluated once per row.
    #
    # Short-doc guard: size - (n-1) <= 0 would make sequence(1, 0)
    # DESCEND to [1, 0] and slice(words, 0, n) abort the whole job
    # (INVALID_PARAMETER_VALUE.START on Spark 4) — docs with fewer than
    # n words must yield an EMPTY shingle set instead.
    tmp = f"__{out_col}_words"
    sh = F.expr(
        f"if(size({tmp}) >= {n},"
        f" transform(sequence(1, size({tmp}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({tmp}, i, {n}))),"
        f" array())"
    )
    return (df.withColumn(tmp, F.split(F.col(text_col), " "))
              .withColumn(out_col, F.array_distinct(sh))
              .drop(tmp))


def shingle_hashes(df: DataFrame, text_col: str = "text", *, n: int = 3,
                   seed: int = 7,
                   out_col: str = "shingle_hashes") -> DataFrame:
    """Distinct 64-bit shingle hashes per document:
    ``xxhash64(n-gram string, seed)``, the shingle string built and
    discarded inside the lambda (never materialized as an array).

    The near-dup operators run on these instead of shingle strings —
    8-byte longs explode/shuffle/``array_intersect`` several times
    cheaper than n-gram strings, and Jaccard over the hash sets equals
    Jaccard over the string sets up to 64-bit collisions
    (P ≈ |S|²/2⁶⁴ per document pair — negligible). Short docs (< n
    words) yield the empty set, mirroring :func:`shingles`."""
    tmp = f"__{out_col}_words"
    hashes = F.expr(
        f"if(size({tmp}) >= {n},"
        f" transform(sequence(1, size({tmp}) - {n - 1}),"
        f" i -> xxhash64(concat_ws(' ', slice({tmp}, i, {n})), {seed})),"
        f" array())"
    )
    return (df.withColumn(tmp, F.split(F.col(text_col), " "))
              .withColumn(out_col, F.array_distinct(hashes))
              .drop(tmp))


def exact_duplicate_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per distinct content digest:
    ``(text_hash, n_docs, keep_id)`` with ``keep_id`` = min id (the
    deterministic survivor). ``n_docs > 1`` rows are the duplicate groups.
    One shuffle, map-side combined, 16-byte keys."""
    return (
        df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("text_hash"))
          .agg(F.count(F.lit(1)).alias("n_docs"),
               F.min(id_col).alias("keep_id"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """The deduplicated table: keeps the min-id doc per digest. Implemented
    as a self-join-free window-less aggregation + semi join back."""
    keep = exact_duplicate_groups(df, text_col, id_col) \
        .select(F.col("keep_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")


def incremental_dedup(
    df: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup for APPEND-ONLY ingestion: dedupe a new batch against
    everything already ingested WITHOUT rescanning the corpus. ``seen``
    is the digest ledger — a table whose first column (conventionally
    ``text_hash``) holds the md5 digests of all previously kept
    documents (persist :func:`exact_duplicate_groups`'s ``text_hash``
    column after each batch and this operator consumes it next batch).

    Semantics: a new row survives iff (a) its digest is NOT in ``seen``
    and (b) it is the min-``id_col`` holder of its digest WITHIN the
    batch (the same survivor rule as :func:`exact_dedup`). When ids are
    batch-monotone (every later batch's ids exceed earlier batches' —
    what an ingestion sequence number gives you), batch-then-merge is
    EXACTLY one-shot dedup of the concatenation (tested); without
    monotone ids the kept content set is still identical, only which
    copy represents it can differ. Output: the surviving rows of ``df``
    plus their ``text_hash``, ready to both ship AND append to the
    ledger.

    Scale shape: the batch aggregates once on its 16-byte digest
    (map-side combined), then ONE anti-join of batch-distinct digests
    against the ledger — both sides are skinny digest tables, and when
    the batch-distinct side fits the broadcast threshold the ledger is
    scanned without shuffling at all. The join-back moves BATCH rows
    only (batch grain, never corpus/ledger grain); with a
    broadcast-eligible survivor set even that is shuffle-free
    (plan-asserted in tests). The ledger itself never carries text —
    only digests."""
    digest = F.md5(F.col(text_col).cast("binary"))
    batch_keep = (df.select(F.col(id_col), digest.alias("text_hash"))
                    .groupBy("text_hash")
                    .agg(F.min(id_col).alias(id_col)))
    seen_d = seen.select(F.col(seen.columns[0]).alias("text_hash"))
    fresh = batch_keep.join(seen_d, "text_hash", "left_anti")
    return (df.join(fresh, id_col, "inner")
              .select(*df.columns, "text_hash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    threshold: float = 0.8,
    max_df: Optional[int] = None,
) -> DataFrame:
    """Exact near-duplicate pairs ``(doc_a, doc_b, jaccard)`` with
    ``jaccard = |A∩B| / |A∪B|`` over distinct word ``n``-gram sets and
    ``doc_a < doc_b``. Intersections come from an inverted shingle index
    (explode → self-join on shingle → pair count), so cost is
    sum-of-squared-posting-lengths, not |docs|²; ``max_df`` drops shingles
    whose posting list exceeds it (a shingle shared by thousands of docs
    carries no near-dup signal but dominates the join)."""
    inter = _pair_intersections(df, text_col, id_col, n=n, max_df=max_df)
    jac = (F.col("_inter").cast("double")
           / (F.col("_sza") + F.col("_szb") - F.col("_inter")))
    return (inter.select("doc_a", "doc_b", jac.alias("jaccard"))
                 .filter(F.col("jaccard") >= threshold))


def _pair_intersections(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int,
    max_df: Optional[int],
) -> DataFrame:
    """Shared inverted-shingle-index pair core for the exact-set
    similarity operators: ``(doc_a, doc_b, _inter, _sza, _szb)`` with
    ``doc_a < doc_b`` — distinct-n-gram intersection counts plus both
    set sizes. Cost is sum-of-squared-posting-lengths (never |docs|²);
    ``max_df`` caps posting lists (stop-shingles carry no signal but
    dominate the join)."""
    df = _spread(df, id_col)
    sh = shingle_hashes(df, text_col, n=n).select(
        F.col(id_col).alias("_id"), "shingle_hashes",
        F.size("shingle_hashes").alias("_sz"))
    posts = explode_rows(sh, ["_id"], F.col("shingle_hashes"), "_sg")
    if max_df is not None:
        ok = posts.groupBy("_sg").agg(F.count(F.lit(1)).alias("_df")) \
                  .filter(F.col("_df") <= max_df).select("_sg")
        posts = posts.join(ok, "_sg", "left_semi")
    a = posts.select(F.col("_id").alias("doc_a"), "_sg")
    b = posts.select(F.col("_id").alias("doc_b"), "_sg")
    inter = (a.join(b, "_sg")
              .filter(F.col("doc_a") < F.col("doc_b"))
              .groupBy("doc_a", "doc_b")
              .agg(F.count(F.lit(1)).alias("_inter")))
    sza = sh.select(F.col("_id").alias("doc_a"), F.col("_sz").alias("_sza"))
    szb = sh.select(F.col("_id").alias("doc_b"), F.col("_sz").alias("_szb"))
    return inter.join(sza, "doc_a").join(szb, "doc_b")


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    threshold: float = 0.9,
    max_df: Optional[int] = None,
) -> DataFrame:
    """Asymmetric near-duplicate pairs the Jaccard operator structurally
    misses: ``containment = |A∩B| / min(|A|, |B|)`` over distinct word
    ``n``-gram sets — a short document quoted whole inside a long one
    scores containment ≈ 1 while its Jaccard ≈ |short|/|long| ≈ 0 and no
    symmetric threshold ever fires. This is the quote/embedding-dup
    detector (boilerplate wrappers around syndicated articles, prompts
    pasted into transcripts, README files inside code dumps).

    Returns ``(doc_a, doc_b, n_inter, size_a, size_b, containment,
    jaccard)`` with ``doc_a < doc_b`` and ``containment >= threshold``;
    the smaller set size names the contained side, and ``jaccard`` rides
    along free for contrast (containment high + jaccard low = true
    subset relation, both high = ordinary near-dup).

    Scale shape: identical to :func:`ngram_jaccard_pairs` (the shared
    inverted-index core — posting-list joins, ``max_df`` stop-shingle
    cap); both similarity columns are single exact-integer IEEE
    divisions, value-exact cross-engine."""
    inter = _pair_intersections(df, text_col, id_col, n=n, max_df=max_df)
    cont = (F.col("_inter").cast("double")
            / F.least(F.col("_sza"), F.col("_szb")))
    jac = (F.col("_inter").cast("double")
           / (F.col("_sza") + F.col("_szb") - F.col("_inter")))
    return (inter.select(
                "doc_a", "doc_b",
                F.col("_inter").alias("n_inter"),
                F.col("_sza").alias("size_a"),
                F.col("_szb").alias("size_b"),
                cont.alias("containment"), jac.alias("jaccard"))
            .filter(F.col("containment") >= threshold))


def _minhash_params(num_perm: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31))
            for _ in range(num_perm)]


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    *,
    n: int = 3,
    num_perm: int = 64,
    seed: int = 7,
    out_col: str = "minhash",
    id_col: str = "doc_id",
    method: str = "numpy",
) -> DataFrame:
    """Per-doc MinHash signature (``array<bigint>`` of length
    ``num_perm``): ``min((a·h + b) mod (2^31-1))`` over the doc's
    distinct shingle hashes ``h = pmod(xxhash64(s), 2^31-1)``.
    Shingle-less docs get the sentinel signature (all ``2^31-1``).

    The signature is ROW-LOCAL (each doc's minima depend only on its own
    shingles), so the default ``method="numpy"`` computes it with ZERO
    shuffle: shingle hashing stays JVM-side/codegen
    (:func:`shingle_hashes` — only longs reach Python), then one
    Arrow-batched ``mapInPandas`` folds all ``num_perm`` minima
    vectorized. ``method="agg"`` keeps the previous pure-DataFrame shape
    (explode + one 64-min hash aggregate + join-back) as the
    cross-check twin — bit-identical output (asserted in tests), but it
    pays a per-doc aggregate exchange AND a corpus-scale join-back,
    both of which the kernel eliminates; at 10^11 docs those are two
    full shuffles on the designated dedup path. The HOF alternative
    (transform-per-permutation) is CodegenFallback, ~50x slower than
    either."""
    df = _spread(df, id_col)
    params = _minhash_params(num_perm, seed)
    if method == "numpy":
        return _minhash_signature_np(df, text_col, n=n, seed=seed,
                                     params=params, out_col=out_col)
    if method != "agg":
        raise ValueError(f"method must be 'numpy' or 'agg', got {method!r}")
    posts = explode_rows(
        shingle_hashes(df, text_col, n=n, seed=seed),
        [id_col], F.col("shingle_hashes"), "_h64",
    ).select(
        id_col,
        F.pmod(F.col("_h64"), F.lit(_MERSENNE31)).alias("_h"),
    )
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("_h") + F.lit(b), F.lit(_MERSENNE31)))
        .alias(f"_m{i}")
        for i, (a, b) in enumerate(params)
    ]
    sigs = posts.groupBy(id_col).agg(*aggs).select(
        id_col, F.array(*[f"_m{i}" for i in range(num_perm)]).alias(out_col))
    sentinel = F.array_repeat(F.lit(_MERSENNE31).cast("bigint"), num_perm)
    return (df.join(sigs, id_col, "left")
              .withColumn(out_col, F.coalesce(F.col(out_col), sentinel)))


def _minhash_signature_np(df: DataFrame, text_col: str, *, n: int,
                          seed: int, params: list[tuple[int, int]],
                          out_col: str) -> DataFrame:
    """Zero-shuffle signature kernel: per Arrow batch, flatten every
    doc's shingle hashes, compute each permutation vectorized over the
    flat array, and segment-reduce the minima back per doc.

    Arithmetic is int64-exact end to end (a, b, h < 2^31 so a·h + b
    < 2^62; Python/NumPy floored ``%`` matches Spark ``pmod`` for the
    possibly-negative xxhash64 input), making the output bit-identical
    to the ``method="agg"`` Column fold."""
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    num_perm = len(params)
    a_vec, b_vec = (list(p) for p in zip(*params))
    # build a FRESH StructType: StructType.add mutates in place, and
    # DataFrame.schema is cached — mutating it would make a second
    # signature call on the same DataFrame object see a phantom
    # duplicate out_col field (AMBIGUOUS_REFERENCE)
    schema = StructType(list(df.schema.fields)
                        + [StructField(out_col, ArrayType(LongType()))])
    sh_col = "__mh_sh"
    with_sh = shingle_hashes(df, text_col, n=n, seed=seed, out_col=sh_col)

    def kernel(batches):
        import numpy as np

        A = np.asarray(a_vec, dtype=np.int64)
        B = np.asarray(b_vec, dtype=np.int64)
        M = np.int64(_MERSENNE31)
        for pdf in batches:
            arrs = [np.asarray(x, dtype=np.int64)
                    if x is not None else np.empty(0, dtype=np.int64)
                    for x in pdf[sh_col]]
            counts = np.array([len(x) for x in arrs], dtype=np.int64)
            sig = np.full((len(arrs), num_perm), int(M), dtype=np.int64)
            nonempty = counts > 0
            if nonempty.any():
                flat = (np.concatenate([x for x in arrs if len(x)])
                        % M)                        # h = pmod(xxhash64, M)
                ends = np.cumsum(counts[nonempty])
                starts = np.concatenate(([0], ends[:-1]))
                mins = np.empty((int(nonempty.sum()), num_perm),
                                dtype=np.int64)
                for i in range(num_perm):           # 64 vectorized passes
                    perm = (A[i] * flat + B[i]) % M
                    mins[:, i] = np.minimum.reduceat(perm, starts)
                sig[nonempty] = mins
            out = pdf.drop(columns=[sh_col])
            out[out_col] = list(sig)
            yield out

    return with_sh.mapInPandas(kernel, schema=schema)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 7,
    threshold: float = 0.8,
    verify_exact: bool = True,
    max_bucket: Optional[int] = None,
) -> DataFrame:
    """MinHash + LSH near-dup pairs, same output contract as
    :func:`ngram_jaccard_pairs` — ``(doc_a, doc_b, jaccard)``.

    ``max_bucket`` (default None = exact) drops band buckets larger than
    the cap before pair emission — the stop-shingle analog for LSH. A
    bucket of k docs emits C(k,2) candidates whichever shape generates
    them (grouped emit or self-join); a giant bucket means a giant
    NEAR-IDENTICAL cluster whose pairwise listing is inherently
    quadratic — at that point the per-pair contract is the wrong output
    and :func:`near_dup_groups` (cluster ids) is the right one, so
    production runs set a cap and route hot clusters to grouping.

    Candidate generation: split the ``num_perm`` signature into ``bands``
    bands of ``r = num_perm/bands`` rows; docs colliding in any band become
    candidates (P[candidate] = 1-(1-J^r)^bands; 64/16 → ~0.9998 at J=0.8).
    Candidates are verified with exact Jaccard over the shingle sets, so
    precision is exact and recall is the LSH curve — the standard
    trade-off that makes near-dup feasible at 10^11 docs where the
    inverted-index join is not."""
    assert num_perm % bands == 0
    df = _spread(df, id_col)
    r = num_perm // bands
    # shingle-less docs (< n words) all share the sentinel signature and
    # would collide in EVERY band — a C(k,2) blowup over a set whose
    # pairs are jaccard-NULL and filtered at verify anyway. Real minima
    # are pmod values < 2^31-1, so minhash[0] == sentinel identifies
    # exactly those docs; dropping them before banding is
    # semantics-preserving and removes the one bucket that grows with
    # corpus size instead of with near-dup density.
    sig = minhash_signature(df, text_col, n=n, num_perm=num_perm, seed=seed,
                            id_col=id_col) \
        .select(F.col(id_col).alias("_id"), "minhash") \
        .filter(F.element_at("minhash", 1) != F.lit(_MERSENNE31))
    band_rows = explode_rows(
        sig, ["_id"],
        F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.hash(F.slice("minhash", i * r + 1, r)).alias("bkey"))
            for i in range(bands)
        ]), "b",
    ).select("_id", "b.band", "b.bkey")
    # bucket-grouped pair generation instead of a band self-join: the
    # self-join shape recomputes the ENTIRE signature lineage once per
    # side (Spark does not share scan subtrees across join inputs);
    # grouping by (band, bkey) computes it once, shuffles each doc id
    # `bands` times (skinny), and emits each bucket's C(k,2) pairs
    # row-locally. sort_array makes collect_list's order deterministic
    # and gives doc_a < doc_b by construction. Bucket sizes are the LSH
    # collision sets — small at any sane (bands, r) now that sentinel
    # docs are excluded above; note a bucket's C(k,2) pairs materialize
    # as ONE array value, so a corpus with a giant genuinely
    # near-identical cluster needs ``max_bucket`` (and near_dup_groups
    # for the cluster itself) — the per-pair contract is the wrong
    # output for such clusters regardless of emission shape.
    buckets = (band_rows.groupBy("band", "bkey")
               .agg(F.sort_array(F.collect_list("_id")).alias("_ids"))
               .filter(F.size("_ids") > 1))
    if max_bucket is not None:
        buckets = buckets.filter(F.size("_ids") <= max_bucket)
    pair_arr = F.expr(
        "flatten(transform(_ids, (a, i) ->"
        " transform(slice(_ids, i + 2, size(_ids) - i - 1),"
        " b -> struct(a AS doc_a, b AS doc_b))))")
    cand = (explode_rows(buckets, [], pair_arr, "_p")
            .select("_p.doc_a", "_p.doc_b").distinct())
    if not verify_exact:
        return cand.withColumn("jaccard", F.lit(None).cast("double"))
    # verify against the shingle-HASH sets directly (not through the
    # signature lineage, which would recompute the minhash aggregation
    # twice more); long-array intersection is several times cheaper than
    # intersecting n-gram string arrays, with identical Jaccard values up
    # to 64-bit collisions
    sh = shingle_hashes(df, text_col, n=n).select(
        F.col(id_col).alias("_id"), "shingle_hashes")
    sa = sh.select(F.col("_id").alias("doc_a"),
                   F.col("shingle_hashes").alias("_sha"))
    sb = sh.select(F.col("_id").alias("doc_b"),
                   F.col("shingle_hashes").alias("_shb"))
    # LENGTH FILTER (standard set-similarity-join prefilter): J(A,B) >= t
    # requires t*max(|A|,|B|) <= min(|A|,|B|) — an integer comparison that
    # discards most false candidates before the expensive array_intersect.
    # At low-r band configs (high recall), false candidates dominate the
    # verify cost; this keeps the verification linear in TRUE pairs.
    size_ok = (F.greatest(F.size("_sha"), F.size("_shb")) * F.lit(threshold)
               <= F.least(F.size("_sha"), F.size("_shb")))
    # try_divide: two shingle-less docs share the sentinel signature, so
    # they collide in every band and reach verification with union = 0 —
    # ANSI mode would abort the job on the plain division; NULL jaccard is
    # filtered by the threshold instead (empty sets have no similarity)
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
                .filter(size_ok)
                .withColumn("_inter", F.size(F.array_intersect("_sha", "_shb")))
                .select("doc_a", "doc_b",
                        F.try_divide(
                            F.col("_inter").cast("double"),
                            F.size("_sha") + F.size("_shb") - F.col("_inter"),
                        ).alias("jaccard"))
                .filter(F.col("jaccard") >= threshold))


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    bits: int = 60,
    out_col: str = "simhash",
) -> DataFrame:
    """Per-doc SimHash fingerprint over whitespace tokens (with
    multiplicity). Token hash = first 15 hex chars of md5 (60 bits) so any
    engine reproduces the exact value (DuckDB:
    ``('0x' || substr(md5(w),1,15))::bigint``). Bit ``i`` of the output is
    1 iff ``sum over tokens of (2·bit_i(h) - 1) > 0``.

    Shape: explode tokens, then ONE hash aggregate computing all ``bits``
    per-bit sums (the same codegen'd multi-aggregate shape as
    :func:`minhash_signature`). The earlier higher-order-function fold was
    zero-shuffle but interpreted — O(tokens x bits) boxed array updates,
    ~10x slower than the codegen'd sums; the aggregate's shuffle is skinny
    (one row per doc after map-side combine, ~bits x 8 bytes) and is
    REUSED by :func:`simhash_pairs`' self-join instead of recomputing the
    fingerprint per side. NULL text coalesces to '' before the split, and
    ``split`` of an empty text yields the [""] token — so every doc has
    >= 1 token and EXACTLY ONE output row (without the coalesce,
    ``split(NULL)`` is a NULL array whose outer-explode sentinel row is
    dropped and the doc would vanish from the output)."""
    assert bits <= 60
    df = _spread(df, id_col)
    toks = explode_rows(
        df.select(F.col(id_col),
                  F.split(F.coalesce(F.col(text_col), F.lit("")),
                          " ").alias("_w")),
        [id_col], F.col("_w"), "_tok")
    h = F.expr("cast(conv(substr(md5(_tok), 1, 15), 16, 10) as bigint)")
    one = F.lit(1).cast("bigint")
    aggs = [
        F.sum(F.shiftright(F.col("_h"), i).bitwiseAND(one) * 2 - 1)
        .alias(f"_b{i}")
        for i in range(bits)
    ]
    fingerprint = None
    for i in range(bits):
        term = F.when(F.col(f"_b{i}") > 0,
                      F.lit(1 << i).cast("bigint")).otherwise(one * 0)
        fingerprint = term if fingerprint is None else fingerprint + term
    return (toks.select(F.col(id_col), h.alias("_h"))
                .groupBy(id_col)
                .agg(*aggs)
                .select(F.col(id_col), fingerprint.alias(out_col)))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    bits: int = 60,
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming`` using
    the pigeonhole block trick: split the fingerprint into ``blocks``
    bit-blocks — any pair within distance ``blocks - 1`` must agree on at
    least one block, so candidates are generated by ``blocks`` equi-joins
    on block values instead of a cross join. Requires
    ``max_hamming < blocks``."""
    assert max_hamming < blocks
    width = bits // blocks
    fp = simhash(df, text_col, id_col, bits=bits)
    blocked = explode_rows(
        fp, [F.col(id_col).alias("_id"), F.col("simhash")],
        F.array(*[
            F.struct(
                F.lit(i).alias("blk"),
                (F.shiftright("simhash", i * width)
                 .bitwiseAND(F.lit((1 << width) - 1))).alias("bval"))
            for i in range(blocks)
        ]), "b",
    ).select("_id", "simhash", "b.blk", "b.bval")
    a = blocked.select(F.col("_id").alias("doc_a"),
                       F.col("simhash").alias("_ha"), "blk", "bval")
    b = blocked.select(F.col("_id").alias("doc_b"),
                       F.col("simhash").alias("_hb"), "blk", "bval")
    ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return (a.join(b, ["blk", "bval"])
             .filter(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b", ham.alias("hamming")).distinct()
             .filter(F.col("hamming") <= max_hamming))


def near_dup_groups(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    *,
    max_iter: int = 25,
    method: str = "auto",
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """Connected components over a near-dup pair table — the survivor-
    selection step that turns PAIRS into dedup GROUPS: one row
    ``(doc_id, group_id)`` per doc appearing in any pair, with
    ``group_id`` = the smallest doc id in its component (the
    deterministic survivor, matching :func:`exact_duplicate_groups`'
    ``keep_id`` convention). Transitivity matters: near-dup is not an
    equivalence relation, so A~B and B~C must land A, B, C in ONE group
    even when A~C itself is below threshold.

    Three interchangeable algorithms (identical output; the distributed
    ones shuffle only skinny id-pair rows — bigint for numeric ids,
    the id's own type for string ids (UUIDs), where "smallest" means
    binary/lexicographic order — at 10^11 docs the edge table is a
    skinny fraction of the corpus, only docs occurring in a candidate
    pair):

    - ``method="auto"`` (default): materialize the edge set once
      (``localCheckpoint`` — both iterative methods do this anyway) and
      count it; at or below ``driver_max_edges`` run exact union-find on
      the driver (path compression + union by size, then a min-per-
      component pass) — the graph after candidate filtering is usually
      ORDERS smaller than the corpus, and a driver pass replaces
      O(rounds) Spark jobs with one collect of two bigint columns
      (≤ ~16 MB at the default cap). Above the cap, fall through to
      ``"star"``. This is the memory-bounded collect pattern: the cap is
      on the PAIR count, never the corpus.
    - ``method="star"`` (the scale path): alternating
      large-star/small-star edge rewrites (Kiveris et al., "Connected
      Components in MapReduce and Beyond") that contract every component
      to a star centered on its minimum node in **O(log n) rounds even
      on adversarially long chains** — each round is two join+min-agg
      passes over the edge set, which only ever references component-
      internal nodes.
    - ``method="label"`` (small-graph path): min-label propagation —
      every node repeatedly takes the min of its own and its neighbors'
      labels, converging in <= component-diameter rounds. One join +
      one aggregate per round, the cheapest loop for the shallow, clumpy
      components real near-dup corpora produce.

    Both truncate lineage per round with an eager ``localCheckpoint``
    (iterative joins otherwise nest plans exponentially; on a real
    cluster prefer reliable ``checkpoint()`` so executor loss cannot
    drop partitions) and detect convergence distributively (O(1)-result
    count jobs per round, no edge/label data on the driver). With
    ``max_iter`` exhausted before convergence the partial result is
    still a valid over-segmentation (every label names a doc in the
    component); raise ``max_iter`` for pathological graphs."""
    # numeric ids normalize to bigint (8-byte shuffle keys); string ids
    # (UUIDs, composite keys) pass through unchanged — every step below
    # (joins, min/least label folds, union-find) is order-based, not
    # arithmetic, so both id families share one implementation
    from pyspark.sql.types import NumericType
    a, b = F.col(a_col), F.col(b_col)
    if isinstance(pairs.schema[a_col].dataType, NumericType):
        a, b = a.cast("bigint"), b.cast("bigint")
    e = (pairs.select(a.alias("src"), b.alias("dst"))
              .filter(F.col("src") != F.col("dst")))
    if method == "auto":
        e = e.localCheckpoint(eager=True)
        method = "driver" if e.count() <= driver_max_edges else "star"
    elif method == "driver":
        # an EXPLICIT driver request still honours the cap — collecting
        # an unbounded edge table would OOM the driver, the exact
        # failure the cap exists to prevent (auto falls back instead of
        # failing; a forced driver run fails fast with the remedy)
        if e.count() > driver_max_edges:
            raise ValueError(
                f"edge set exceeds driver_max_edges={driver_max_edges}; "
                f"use method='star' (or 'auto') for graphs this size")
    if method == "driver":
        return _cc_driver(e)
    if method == "star":
        labels, _ = _cc_two_phase(e, max_iter)
    elif method == "label":
        labels, _ = _cc_min_label(e, max_iter)
    else:
        raise ValueError(
            f"method must be 'auto', 'star', 'label' or 'driver', "
            f"got {method!r}")
    return labels


def canonical_docs(
    df: DataFrame,
    groups: DataFrame,
    *,
    id_col: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """Canonical-survivor selection — the step that turns dedup GROUPS
    into a deduplicated CORPUS: for every group in ``groups`` (a
    ``(id_col, group_id)`` table from :func:`near_dup_groups` or
    :func:`exact_duplicate_groups`) keep the member with the highest
    ``score_col`` (ties broken by smallest id, so the winner is total
    and engine-reproducible); docs absent from ``groups`` are
    singletons and survive as their own group. Output: one row per
    surviving content unit — ``(id_col, group_id, group_size,
    score_col)`` with ``group_id = id_col`` for singletons.

    This replaces the min-id "survivor" convention with quality-aware
    selection: at training scale you keep the BEST copy of duplicated
    content (cleanest boilerplate-stripped crawl of a page), not the
    one with the smallest ingest id. Reference anchor: `uniqueItems`
    keeps the FIRST of equal items (`/root/reference/json_schema_rs/
    src/validator/mod.rs:378-397`); this lifts "which duplicate
    survives" to an explicit, scored policy.

    Scale shape: ``groups`` is skinny (two ids — bigint or string, only
    docs in some candidate pair — orders smaller than the corpus after
    LSH). The member-score join shuffles only ``(id, score)`` + group
    rows; the per-group argmax is ONE hash aggregate with map-side
    partial combine (min of a (-score, id) struct — no window, no
    per-group sort); the singleton side is a left-anti join on the
    skinny group table, which AQE turns into a broadcast anti join
    whenever groups fit. The corpus text never shuffles."""
    scored = df.select(F.col(id_col), F.col(score_col))
    members = groups.select(F.col(id_col), "group_id").join(
        scored, id_col)
    # argmax as min-of-struct: (-score, id) orders by score DESC then id
    # ASC — one codegen'd aggregate instead of a window sort per group.
    # Negating the SCORE (always numeric) instead of the id keeps the
    # trick id-type-agnostic (string/UUID ids order lexicographically);
    # NULL scores coalesce to -inf so a scored copy always beats an
    # unscored one (all-NULL group -> min id survives, score NULL)
    neg = -F.coalesce(F.col(score_col).cast("double"),
                      F.lit(float("-inf")))
    best = (members
            .groupBy("group_id")
            .agg(F.min(F.struct(neg.alias("_ns"),
                                F.col(id_col).alias("_id"),
                                F.col(score_col).alias("_s"))).alias("_m"),
                 F.count(F.lit(1)).alias("group_size"))
            .select(F.col("_m._id").alias(id_col),
                    F.col("group_id"),
                    F.col("group_size"),
                    F.col("_m._s").alias(score_col)))
    singles = (scored.join(groups.select(id_col), id_col, "left_anti")
                     .select(F.col(id_col),
                             F.col(id_col).alias("group_id"),
                             F.lit(1).cast("bigint").alias("group_size"),
                             F.col(score_col)))
    return best.unionByName(singles)


def _cc_driver(e: DataFrame) -> DataFrame:
    """Exact connected components on the driver — union-find with path
    compression + union by size, then one min-per-component pass so
    ``group_id`` is the smallest doc id in the component (identical to
    the distributed methods). Only valid for edge sets that fit on the
    driver; :func:`near_dup_groups` gates it behind ``driver_max_edges``
    on an already-materialized edge count."""
    spark = e.sparkSession
    pdf = e.toPandas()
    parent: dict[int, int] = {}
    size: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for s, d in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
        for n in (s, d):
            if n not in parent:
                parent[n] = n
                size[n] = 1
        rs, rd = find(s), find(d)
        if rs != rd:
            if size[rs] < size[rd]:
                rs, rd = rd, rs
            parent[rd] = rs
            size[rs] += size[rd]

    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    rows = [(n, comp_min[find(n)]) for n in parent]
    from ..functions.exprs import arrow_local_df
    t = e.schema["src"].dataType.simpleString()
    return arrow_local_df(spark, rows, f"doc_id {t}, group_id {t}")


def _cc_min_label(e: DataFrame, max_iter: int) -> tuple[DataFrame, int]:
    """Min-label propagation CC. Returns ``(labels, rounds_run)``."""
    edges = e.union(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    labels = (edges.select(F.col("src").alias("node")).distinct()
                   .withColumn("lbl", F.col("node"))
                   .localCheckpoint(eager=True))
    edges = edges.localCheckpoint(eager=True)   # reused every round
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        nbr = (edges.join(labels, edges["dst"] == labels["node"])
                    .groupBy("src").agg(F.min("lbl").alias("_nlbl")))
        new = (labels.join(nbr, labels["node"] == nbr["src"], "left")
                     .select(labels["node"],
                             labels["lbl"].alias("_old"),
                             F.least(labels["lbl"],
                                     F.coalesce(F.col("_nlbl"),
                                                labels["lbl"])).alias("lbl"))
                     .localCheckpoint(eager=True))
        changed = new.filter(F.col("_old") != F.col("lbl")).count()
        labels = new.drop("_old")
        if changed == 0:
            break
    return (labels.select(F.col("node").alias("doc_id"),
                          F.col("lbl").alias("group_id")), rounds)


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star: every node connects its strictly-LARGER neighbors to
    the minimum of its closed neighborhood. Output edges are oriented
    big -> small and self-loop-free by construction (v > u >= m)."""
    sym = e.union(e.select(F.col("dst").alias("src"),
                           F.col("src").alias("dst")))
    mins = sym.groupBy("src").agg(
        F.min(F.least(F.col("src"), F.col("dst"))).alias("_m"))
    return (sym.join(mins, "src")
               .where(F.col("dst") > F.col("src"))
               .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
               .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: every node connects its smaller-or-equal neighbors
    (and itself) to the minimum among them. Input/output oriented
    big -> small; self-loops dropped."""
    o = (e.select(F.greatest("src", "dst").alias("src"),
                  F.least("src", "dst").alias("dst"))
          .where(F.col("src") != F.col("dst")).distinct())
    mins = o.groupBy("src").agg(F.min("dst").alias("_m"))
    return (o.join(mins, "src")
             .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
             .union(mins.select(F.col("src"), F.col("_m").alias("dst")))
             .where(F.col("src") != F.col("dst"))
             .distinct())


def _cc_two_phase(e: DataFrame, max_iter: int) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star CC (Kiveris et al.). Returns
    ``(labels, rounds_run)``; converges when a round leaves the edge set
    unchanged — at that fixed point the edges form a star forest, each
    edge ``(node, component_min)``. Component minima never appear on the
    left, so they label themselves via the anti-join."""
    nodes = (e.select("src").union(e.select(F.col("dst").alias("src")))
              .distinct().localCheckpoint(eager=True))
    cur = (e.select(F.greatest("src", "dst").alias("src"),
                    F.least("src", "dst").alias("dst"))
            .distinct().localCheckpoint(eager=True))
    n_cur = cur.count()
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        new = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        n_new = new.count()
        same = (n_new == n_cur and new.subtract(cur).count() == 0)
        cur, n_cur = new, n_new
        if same:
            break
    # groupBy-min tolerates a non-converged (multi-edge) state: the label
    # is then still some component member, a valid over-segmentation
    star = cur.groupBy("src").agg(F.min("dst").alias("group_id"))
    roots = (nodes.join(star, nodes["src"] == star["src"], "left_anti")
                  .select(F.col("src"), F.col("src").alias("group_id")))
    return (star.select(F.col("src").alias("doc_id"), "group_id")
                .union(roots.select(F.col("src").alias("doc_id"),
                                    "group_id")), rounds)


def incremental_fuzzy_dedup(
    batch: DataFrame,
    sig_ledger: DataFrame,
    corpus: DataFrame,
    *,
    threshold: float = 0.8,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 32,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """NEAR-duplicate dedup for APPEND-ONLY ingestion — the fuzzy
    sibling of :func:`incremental_dedup`: drop batch docs that
    near-duplicate (n-gram Jaccard ``>= threshold``) anything already
    kept, WITHOUT re-signing or re-shingling the corpus.

    ``sig_ledger`` is the persisted ``(id_col, minhash)`` signature
    table of previously KEPT docs (this operator's own output carries
    ``minhash`` so each batch appends its survivors' signatures).
    ``corpus`` is the kept-docs table itself, touched ONLY to fetch the
    text of LSH candidate ids — so the expensive full-corpus pass
    (shingle + 64-permutation signature) is paid once per doc ever, at
    ingest, while verification stays EXACT (the same
    verify-after-LSH contract as :func:`minhash_lsh_pairs`: at 64/32
    bands the per-pair miss at J>=threshold is ~6.5e-15, and exact
    Jaccard on candidates removes every false positive).

    Within-batch near-dups are deliberately NOT resolved here — compose
    with :func:`minhash_lsh_pairs` + :func:`near_dup_groups` on the
    batch (both signature computations share the same kernel) — this
    operator owns only the batch-vs-history decision, mirroring
    incremental_dedup's contract.

    Output: surviving batch rows + their ``minhash`` (ship AND append).

    Scale shape: batch signatures are the zero-shuffle NumPy kernel;
    batch band rows BROADCAST into the ledger band scan (batch ≪
    corpus — the mirror image of fuzzy_contamination_pairs' broadcast
    direction), so the ledger never shuffles; candidate ids (skew- and
    contamination-bounded) broadcast-SEMI-join onto the raw corpus
    BEFORE the shingle projection, so only candidate docs are fetched
    and shingled — structural, not optimizer-dependent (plan-asserted);
    the final anti-join is batch-grain."""
    from .decontam import _band_rows
    assert num_perm % bands == 0
    batch = _spread(batch, id_col)
    bsig = minhash_signature(batch, text_col, n=n, num_perm=num_perm,
                             seed=seed, id_col=id_col)
    bband = _band_rows(bsig.select(id_col, "minhash"), id_col,
                       num_perm=num_perm, bands=bands, out_id="_bid")
    lband = _band_rows(sig_ledger.select(id_col, "minhash"), id_col,
                       num_perm=num_perm, bands=bands, out_id="_lid")
    # the candidate pair table is consumed TWICE below (the corpus
    # semi-join's id set and the _bid attach); an eager localCheckpoint
    # materializes the skinny (skew- and contamination-bounded) table
    # once so the batch signature kernel + ledger band scan behind it
    # don't execute twice — the one-job build cost lands in compile
    # time, paid once per batch (the stats.py tiny-aggregate pattern)
    cand = (lband.join(F.broadcast(bband), ["band", "bkey"])
            .select("_bid", "_lid").distinct().localCheckpoint(eager=True))
    bsh = shingle_hashes(batch, text_col, n=n, seed=seed).select(
        F.col(id_col).alias("_bid"), F.col("shingle_hashes").alias("_shb"))
    # candidate-only corpus shingling, STRUCTURALLY: semi-join the
    # candidate id set onto the raw corpus FIRST, then shingle — the
    # n-gram/xxhash projection sits above the broadcast semi-join by
    # construction (plan-asserted in tests/test_physical_plans.py)
    # instead of trusting Catalyst to defer a full-corpus shingle
    # projection past the join. Re-shingling the whole kept corpus every
    # batch is exactly the cost this operator exists to avoid.
    cand_ids = cand.select(F.col("_lid").alias(id_col)).distinct()
    cand_docs = corpus.join(F.broadcast(cand_ids), id_col, "left_semi")
    csh = shingle_hashes(cand_docs, text_col, n=n, seed=seed).select(
        F.col(id_col).alias("_lid"), F.col("shingle_hashes").alias("_shl"))
    size_ok = (F.greatest(F.size("_shb"), F.size("_shl")) * F.lit(threshold)
               <= F.least(F.size("_shb"), F.size("_shl")))
    inter = F.size(F.array_intersect("_shb", "_shl"))
    dup_ids = (csh.join(F.broadcast(cand), "_lid")
                  .join(F.broadcast(bsh), "_bid")
                  .filter(size_ok)
                  .filter(F.try_divide(
                      inter.cast("double"),
                      F.size("_shb") + F.size("_shl") - inter)
                      >= threshold)
                  .select(F.col("_bid").alias(id_col))
                  .distinct())
    return (bsig.join(dup_ids, id_col, "left_anti")
                .select(*batch.columns, "minhash"))


def source_dup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    *,
    round_digits: int = 6,
) -> DataFrame:
    """Per-source exact-duplicate report — WHICH ingest source is
    producing the duplicates (the triage view that decides whether to
    fix a crawler rather than keep paying dedup for it). One row per
    source: ``(source_col, n_docs, n_dup_docs, n_cross_source,
    dup_rate)`` where a doc is a duplicate when its content digest is
    shared by ≥2 docs ANYWHERE in the corpus, ``n_cross_source`` counts
    those whose digest also appears under ANOTHER source (re-crawl
    signal — pairs with :func:`~.decontam.source_overlap`'s fuzzy
    matrix), and ``dup_rate`` = n_dup_docs / n_docs.

    Scale shape: one digest-grain hash aggregate over
    ``(digest, source)`` pairs (map-side combine; 16-byte keys), one
    digest-grain join of group facts back onto the pairs, one
    |S|-key final aggregate. Text never shuffles — digests do."""
    digest = F.md5(F.col(text_col).cast("binary"))
    pairs = df.select(F.col(source_col).alias("_src"),
                      digest.alias("_h"))
    per = (pairs.groupBy("_h", "_src")
                .agg(F.count(F.lit(1)).alias("_c")))
    facts = (per.groupBy("_h")
                .agg(F.sum("_c").alias("_tot"),
                     F.count(F.lit(1)).alias("_nsrc")))
    joined = per.join(facts, "_h")
    return (joined.groupBy(F.col("_src").alias(source_col))
            .agg(F.sum("_c").alias("n_docs"),
                 F.sum(F.when(F.col("_tot") > 1, F.col("_c"))
                        .otherwise(0)).alias("n_dup_docs"),
                 F.sum(F.when(F.col("_nsrc") > 1, F.col("_c"))
                        .otherwise(0)).alias("n_cross_source"))
            .withColumn("dup_rate",
                        F.round(F.col("n_dup_docs")
                                / F.col("n_docs").cast("double"),
                                round_digits)))


def dedup_summary(groups: DataFrame, docs: DataFrame | None = None,
                  text_col: str = "text", id_col: str = "doc_id",
                  group_col: str = "group_id") -> DataFrame:
    """Dedup impact report over a :func:`near_dup_groups` /
    :func:`exact_duplicate_groups` result: one row per duplicate-group
    SIZE — ``(group_size, n_groups, n_docs, n_excess_docs[,
    excess_tokens])`` — the "what does deduplication actually buy us"
    dashboard (is the corpus 2x-dominated by one mega-cluster or a long
    tail of pairs?). ``n_excess_docs`` counts non-survivors
    (``size - 1`` per group, min-id survivor — the groups operators'
    convention); with ``docs`` given, ``excess_tokens`` is the
    whitespace-token mass those non-survivors carry (the
    :func:`~.textstats.token_stats` ``ws_tokens`` convention), i.e. the
    training tokens dedup reclaims.

    Scale shape: the groups table is pairs-bounded (orders below the
    corpus); the optional token join moves only ``(id, long)`` rows —
    text never shuffles; two hash aggregates end dashboard-sized
    (distinct group sizes)."""
    gs = groups.select(F.col(id_col).alias("__i"),
                       F.col(group_col).alias("__g"))
    if docs is not None:
        tok = docs.select(
            F.col(id_col).alias("__i"),
            F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
             .cast("long").alias("__t"))
        per = (gs.join(tok, "__i", "left")
               .withColumn("__t", F.coalesce(F.col("__t"), F.lit(0)))
               .groupBy("__g")
               .agg(F.count("*").alias("__sz"),
                    F.sum("__t").alias("__tt"),
                    # min on (id, tokens) struct = the min-id survivor's
                    # token count (ids are unique within a group)
                    F.min(F.struct(F.col("__i"), F.col("__t")))["__t"]
                     .alias("__st")))
        return (per.groupBy(F.col("__sz").cast("int").alias("group_size"))
                .agg(F.count("*").alias("n_groups"),
                     F.sum("__sz").alias("n_docs"),
                     F.sum(F.col("__sz") - 1).alias("n_excess_docs"),
                     F.sum(F.col("__tt") - F.col("__st"))
                      .alias("excess_tokens"))
                .orderBy("group_size"))
    per = gs.groupBy("__g").agg(F.count("*").alias("__sz"))
    return (per.groupBy(F.col("__sz").cast("int").alias("group_size"))
            .agg(F.count("*").alias("n_groups"),
                 F.sum("__sz").alias("n_docs"),
                 F.sum(F.col("__sz") - 1).alias("n_excess_docs"))
            .orderBy("group_size"))
