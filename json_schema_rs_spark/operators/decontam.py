"""Benchmark decontamination: remove (or mark) training documents that
share word n-grams with an evaluation/benchmark set.

The standard training-data hygiene step (GPT-3 App. C / Gopher App. A
style): a training doc is *contaminated* if any of its word n-gram
shingles also occurs in the benchmark corpus. Semantics here are the
exact set-overlap form — no fuzzy windows — so a SQL oracle can
reproduce the verdict exactly.

Reference anchor: the reference's ``enum`` keyword is membership of a
value in a fixed small set (`/root/reference/json_schema_rs/src/
validator/mod.rs:156-170`); decontamination is that membership test
lifted to shingle sets — "does any shingle of this doc belong to the
benchmark vocabulary" — with the same Allow/Forbid outcome shape as
``additionalProperties``.

Scale shape (100 TB corpus, bounded benchmark):
- Both sides are shingled with :func:`~.dedup.shingle_hashes` — 8-byte
  xxhash64 longs, never n-gram strings, computed map-side inside
  whole-stage codegen.
- The benchmark shingle set is distinct-aggregated (benchmark corpora
  are eval suites: thousands of docs, at most a few 10^7 shingles) and
  **broadcast**; the corpus-side probe is a broadcast hash join on the
  exploded shingles — the corpus never shuffles.
- Per-doc hit counts aggregate only the *matching* (id, shingle) rows —
  a skinny shuffle proportional to the contamination, not the corpus.
- ``mode="drop"`` / ``mode="mark"`` both join the (small) contaminated-id
  table back broadcast, so the full pipeline moves zero corpus bytes
  across the wire. If contamination is adversarially large (most of the
  corpus), flip ``broadcast_hits=False`` to fall back to a shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import explode_rows
from .dedup import _MERSENNE31, _spread, minhash_signature, shingle_hashes


def benchmark_shingles(benchmark: DataFrame, text_col: str = "text", *,
                       n: int = 3, seed: int = 7,
                       id_col: str = "doc_id") -> DataFrame:
    """Distinct 64-bit shingle hashes of the benchmark corpus — one
    column ``sh``. Small by construction (eval sets); cache/broadcast it
    when probing many training shards against the same benchmark."""
    sh = shingle_hashes(_spread(benchmark, id_col), text_col, n=n,
                        seed=seed, out_col="__sh")
    # explode_rows, not explode: InferFiltersFromGenerate would duplicate
    # the whole shingle-transform expression into an interpreted Filter
    # (measured 10x on this path); shingle arrays have no NULL elements
    return explode_rows(sh, [], F.col("__sh"), "sh").distinct()


def contamination_hits(df: DataFrame, benchmark: DataFrame, *,
                       n: int = 3, seed: int = 7,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """``(id, n_hit_shingles)`` for every CONTAMINATED doc: the number of
    the doc's distinct n-gram shingles that occur anywhere in the
    benchmark. Clean docs are absent (coalesce to 0 downstream).

    Both sides go through dedup's ``_spread`` local-parallelism guard:
    the expensive stage is map-side shingling, which runs at scan
    parallelism — a no-op on many-file production inputs, but a
    single-row-group local table would otherwise shingle on one core."""
    bench = benchmark_shingles(benchmark, text_col, n=n, seed=seed,
                               id_col=id_col)
    probes = explode_rows(
        shingle_hashes(_spread(df, id_col), text_col, n=n, seed=seed,
                       out_col="__sh"),
        [id_col], F.col("__sh"), "sh")
    return (probes.join(F.broadcast(bench), "sh")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_hit_shingles")))


def _band_rows(sig: DataFrame, id_alias: str, *, num_perm: int,
               bands: int, out_id: str) -> DataFrame:
    """(id, band, bkey) rows from a minhash-signature table — the SAME
    band hashing as :func:`~.dedup.minhash_lsh_pairs` (``F.hash`` over
    the signature slice), so band keys computed independently on two
    tables collide exactly when the slices are equal. Sentinel
    (shingle-less) signatures are excluded: they would collide in every
    band across the two tables and emit candidate pairs whose Jaccard is
    NULL anyway."""
    r = num_perm // bands
    sig = sig.filter(F.element_at("minhash", 1) != F.lit(_MERSENNE31))
    return explode_rows(
        sig, [F.col(id_alias).alias(out_id)],
        F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.hash(F.slice("minhash", i * r + 1, r)).alias("bkey"))
            for i in range(bands)
        ]), "b",
    ).select(out_id, "b.band", "b.bkey")


def fuzzy_contamination_pairs(
    df: DataFrame,
    benchmark: DataFrame,
    *,
    threshold: float = 0.8,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 32,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id: str = "bench_id",
) -> DataFrame:
    """NEAR-duplicate contamination: ``(id_col, bench_id, jaccard)`` for
    every (training doc, benchmark doc) pair whose n-gram Jaccard
    similarity is ``>= threshold``.

    :func:`contamination_hits` catches verbatim leakage (exact shingle
    membership); this is the fuzzy complement for *paraphrased* or
    lightly-edited eval contamination (the Lee et al. "Deduplicating
    Training Data" / GPT-3 App. C concern that exact matching misses
    reformatted copies). Same verify-after-LSH contract as
    :func:`~.dedup.minhash_lsh_pairs`: candidates from MinHash band
    collisions (recall = the LSH curve, at 64/32 bands the per-pair miss
    at J>=0.8 is ~6.5e-15), precision exact via hash-set Jaccard.

    Scale shape (100 TB corpus, bounded benchmark):
    - Corpus signature is the ZERO-shuffle NumPy kernel; band rows are
      row-local. The corpus never shuffles.
    - Benchmark band rows (eval suites: small) are **broadcast**; the
      candidate join is a broadcast hash join on (band, bkey).
    - Verification joins only candidate ids back to the corpus shingle
      sets (broadcast semi-join on the contamination-bounded candidate
      id set) and the benchmark shingle sets (broadcast) — skinny
      everywhere, with the standard length prefilter before the exact
      intersection.
    """
    assert num_perm % bands == 0
    df = _spread(df, id_col)
    csig = minhash_signature(df, text_col, n=n, num_perm=num_perm,
                             seed=seed, id_col=id_col)
    bsig = minhash_signature(benchmark, text_col, n=n, num_perm=num_perm,
                             seed=seed, id_col=id_col)
    cband = _band_rows(csig.select(id_col, "minhash"), id_col,
                       num_perm=num_perm, bands=bands, out_id="_cid")
    bband = _band_rows(bsig.select(id_col, "minhash"), id_col,
                       num_perm=num_perm, bands=bands, out_id="_bid")
    cand = (cband.join(F.broadcast(bband), ["band", "bkey"])
            .select("_cid", "_bid").distinct())
    # verify on shingle-HASH sets (longs, not n-gram strings) — identical
    # Jaccard up to 64-bit collisions, several times cheaper to intersect
    csh = shingle_hashes(df, text_col, n=n, seed=seed).select(
        F.col(id_col).alias("_cid"), F.col("shingle_hashes").alias("_sha"))
    bsh = shingle_hashes(benchmark, text_col, n=n, seed=seed).select(
        F.col(id_col).alias("_bid"), F.col("shingle_hashes").alias("_shb"))
    size_ok = (F.greatest(F.size("_sha"), F.size("_shb")) * F.lit(threshold)
               <= F.least(F.size("_sha"), F.size("_shb")))
    # candidates (contamination-bounded, skinny) broadcast INTO the
    # corpus-shingle scan — the corpus side stays shuffle-free; the
    # benchmark shingle sets broadcast likewise
    return (csh.join(F.broadcast(cand), "_cid").join(F.broadcast(bsh), "_bid")
            .filter(size_ok)
            .withColumn("_inter", F.size(F.array_intersect("_sha", "_shb")))
            .select(F.col("_cid").alias(id_col),
                    F.col("_bid").alias(bench_id),
                    F.try_divide(
                        F.col("_inter").cast("double"),
                        F.size("_sha") + F.size("_shb") - F.col("_inter"),
                    ).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def fuzzy_decontaminate(df: DataFrame, benchmark: DataFrame, *,
                        threshold: float = 0.8, n: int = 3,
                        num_perm: int = 64, bands: int = 32, seed: int = 7,
                        id_col: str = "doc_id", text_col: str = "text",
                        mode: str = "mark") -> DataFrame:
    """Mark or drop training docs that are near-duplicates (n-gram
    Jaccard ``>= threshold``) of any benchmark doc.

    ``mode="mark"`` returns ``df`` plus ``n_bench_matches`` (0 for clean
    docs), ``max_jaccard`` (NULL for clean docs) and ``contaminated``;
    ``mode="drop"`` returns only the clean rows of ``df`` unchanged.
    The per-doc rollup aggregates only contaminated pairs (skinny), and
    the join-back is broadcast — zero corpus shuffle, same shape as
    :func:`decontaminate`."""
    pairs = fuzzy_contamination_pairs(
        df, benchmark, threshold=threshold, n=n, num_perm=num_perm,
        bands=bands, seed=seed, id_col=id_col, text_col=text_col)
    hits = (pairs.groupBy(id_col)
            .agg(F.count("*").alias("n_bench_matches"),
                 F.max("jaccard").alias("max_jaccard")))
    if mode == "drop":
        return df.join(F.broadcast(hits.select(id_col)), id_col, "left_anti")
    if mode != "mark":
        raise ValueError(f"mode must be 'mark' or 'drop', got {mode!r}")
    return (df.join(F.broadcast(hits), id_col, "left")
            .withColumn("n_bench_matches",
                        F.coalesce(F.col("n_bench_matches"),
                                   F.lit(0).cast("bigint")))
            .withColumn("contaminated", F.col("n_bench_matches") > 0))


def decontaminate(df: DataFrame, benchmark: DataFrame, *, n: int = 3,
                  seed: int = 7, id_col: str = "doc_id",
                  text_col: str = "text", mode: str = "mark",
                  broadcast_hits: bool = True) -> DataFrame:
    """Mark or drop training docs sharing any word ``n``-gram with
    ``benchmark``.

    ``mode="mark"`` returns ``df`` plus ``n_hit_shingles`` (0 for clean
    docs) and ``contaminated``; ``mode="drop"`` returns only the clean
    rows of ``df`` unchanged (anti-join on the contaminated ids).
    """
    hits = contamination_hits(df, benchmark, n=n, seed=seed,
                              id_col=id_col, text_col=text_col)
    if broadcast_hits:
        hits = F.broadcast(hits)
    if mode == "drop":
        return df.join(hits.select(id_col), id_col, "left_anti")
    if mode != "mark":
        raise ValueError(f"mode must be 'mark' or 'drop', got {mode!r}")
    return (df.join(hits, id_col, "left")
            .withColumn("n_hit_shingles",
                        F.coalesce(F.col("n_hit_shingles"),
                                   F.lit(0).cast("bigint")))
            .withColumn("contaminated", F.col("n_hit_shingles") > 0))


def source_overlap(df: DataFrame, *, n: int = 3, seed: int = 7,
                   source_col: str = "source", id_col: str = "doc_id",
                   text_col: str = "text",
                   round_digits: int = 6) -> DataFrame:
    """Cross-source contamination matrix — which corpus sources share
    content. The triage step BEFORE dedup/decontamination at ingest
    scale: "is src_A a re-crawl of src_B?" decides whether to drop a
    whole source, not just documents. One row per unordered source pair
    that shares at least one distinct word n-gram:
    ``(src_a, src_b, shared_ngrams, n_a, n_b, containment, jaccard)``
    with ``src_a < src_b``, containment = shared/min(n_a, n_b) (1.0 when
    one source's shingle set is a subset of the other — the re-crawl
    signal), both ratios rounded.

    Scale shape: shingles are 8-byte xxhash64 longs (same contract as
    the dedup family — collision probability |grams|²/2⁶⁴); the
    per-source DISTINCT (source, hash) projection is the only
    corpus-sized aggregate and it map-side combines; the pair join is an
    inverted-index equi-join on the hash whose output is bounded by
    sources-per-shingle², then ONE |S|²-key hash aggregate — dashboard-
    sized for any real source count. The corpus text never shuffles."""
    sh = shingle_hashes(_spread(df, id_col, source_col), text_col, n=n,
                        seed=seed, out_col="__sh")
    ex = (explode_rows(sh, [source_col], F.col("__sh"), "sh")
          .dropDuplicates([source_col, "sh"]))
    sizes = ex.groupBy(source_col).agg(F.count("*").alias("_n"))
    a = ex.select(F.col(source_col).alias("src_a"), "sh")
    b = ex.select(F.col(source_col).alias("src_b"), "sh")
    pairs = (a.join(b, "sh")
              .filter(F.col("src_a") < F.col("src_b"))
              .groupBy("src_a", "src_b")
              .agg(F.count("*").alias("shared_ngrams")))
    na = sizes.select(F.col(source_col).alias("src_a"),
                      F.col("_n").alias("n_a"))
    nb = sizes.select(F.col(source_col).alias("src_b"),
                      F.col("_n").alias("n_b"))
    out = (pairs.join(F.broadcast(na), "src_a")
                .join(F.broadcast(nb), "src_b"))
    shared = F.col("shared_ngrams").cast("double")
    return out.select(
        "src_a", "src_b", "shared_ngrams", "n_a", "n_b",
        F.round(shared / F.least("n_a", "n_b").cast("double"),
                round_digits).alias("containment"),
        F.round(shared / (F.col("n_a") + F.col("n_b")
                          - F.col("shared_ngrams")).cast("double"),
                round_digits).alias("jaccard"),
    )


def novelty_score(df: DataFrame, reference: DataFrame, *, n: int = 3,
                  seed: int = 7, id_col: str = "doc_id",
                  text_col: str = "text",
                  round_digits: int = 6) -> DataFrame:
    """Per-doc n-gram novelty against a reference corpus — the
    data-mixing INVERSE of decontamination: instead of dropping overlap
    with an eval set, score how much of each doc is NOT already covered
    by what you have (novel docs are worth more in the next mixture).
    One row per input doc:
    ``(id_col, n_shingles, n_known, novelty)`` with ``novelty`` =
    novel distinct n-grams / total distinct n-grams (1.0 for docs too
    short to shingle — nothing about them is known).

    Scale shape: identical to :func:`contamination_hits` — the
    reference's distinct shingle-hash set is broadcast and probed by a
    map-side explode (the corpus never shuffles); the per-doc aggregate
    shuffles only ``(id, counts)``. For a reference too large to
    broadcast, persist its distinct hashes and flip the probe join to a
    shuffle join — same semantics, AQE-planned."""
    ref = benchmark_shingles(reference, text_col, n=n, seed=seed,
                             id_col=id_col).withColumn("_k", F.lit(True))
    probes = explode_rows(
        shingle_hashes(_spread(df, id_col), text_col, n=n, seed=seed,
                       out_col="__sh"),
        [id_col], F.col("__sh"), "sh")
    per_doc = (probes.join(F.broadcast(ref), "sh", "left")
               .groupBy(id_col)
               .agg(F.count("*").alias("n_shingles"),
                    F.sum(F.coalesce(F.col("_k").cast("bigint"),
                                     F.lit(0))).alias("n_known")))
    base = df.select(id_col)
    out = base.join(per_doc, id_col, "left")
    return out.select(
        id_col,
        F.coalesce(F.col("n_shingles"), F.lit(0)).alias("n_shingles"),
        F.coalesce(F.col("n_known"), F.lit(0)).alias("n_known"),
        F.round(F.coalesce(
            F.try_divide(F.col("n_shingles") - F.col("n_known"),
                         F.col("n_shingles").cast("double")),
            F.lit(1.0)), round_digits).alias("novelty"),
    )
