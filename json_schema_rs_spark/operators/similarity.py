"""Similarity search over an embedding column (``array<float>``).

Two paths, same output contract ``(query_id, neighbor_id, rank, cos_sim)``:

- :func:`cosine_topk` — brute-force exact top-k: the correctness baseline.
  The (small) query set is broadcast; the corpus is scanned once; the only
  shuffle is the per-query top-k aggregation.
- :func:`ivf_topk` — IVF-style bucketed ANN: corpus vectors are assigned
  to their nearest centroid (one broadcast of the centroid table), queries
  probe only ``nprobe`` nearest buckets. At 10^11 vectors this turns a
  full scan per query into a ~``nprobe/n_centroids`` partial scan, at the
  cost of recall.

Dot products run either JVM-side via ``zip_with`` + ``aggregate`` (small
pair counts) or in Arrow-batched NumPy kernels that accumulate DIMENSION
BY DIMENSION — the same deterministic left-to-right double fold, so both
paths (and an oracle engine folding the same arrays sequentially)
reproduce identical bits. No per-row Python anywhere.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.exprs import arrow_local_df, explode_rows


def _stack_f64(values) -> "np.ndarray":
    """(n, dims) float64 matrix from an Arrow-born Series/array of
    equal-length vectors. ``np.stack`` on the object array is C-speed;
    the per-element ``list(v)`` alternative converts every component
    through a Python float (O(n*dims) interpreter work — measured 2-3x
    of an entire pair-verify stage at 10^5 candidates). float32 ->
    float64 casting is exact, so downstream ordered folds see the same
    bits either way."""
    import numpy as np
    vals = values.to_numpy() if hasattr(values, "to_numpy") else values
    if len(vals) == 0:
        return np.empty((0, 0), dtype="float64")
    return np.stack(vals).astype("float64", copy=False)


def _dot_d(a, b):
    """Dot of two already-double arrays (no per-element cast)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cos(dot, norm_product):
    """Cosine from a dot product and the norms' product. ``try_divide``:
    an all-zero vector (failed encoder output — realistic at corpus scale)
    has norm 0 and would abort the whole job under ANSI; NULL similarity
    drops it from thresholds/top-k instead. Bit-identical to plain division
    for every non-zero vector."""
    return F.try_divide(dot, norm_product)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def _prep(df: DataFrame, id_col: str, vec_col: str, id_out: str,
          vec_out: str, norm_out: str) -> DataFrame:
    """Per-row precompute for pairwise similarity: double-cast vector +
    L2 norm, so the per-PAIR work is one dot product. Higher-order array
    functions are interpreted (CodegenFallback), so hoisting the casts and
    norms out of the O(pairs) loop is a ~3x win; the arithmetic order is
    unchanged, so results are bitwise identical."""
    return df.select(
        F.col(id_col).alias(id_out),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_out),
        _norm(F.col(vec_col)).alias(norm_out),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact brute-force cosine top-k.

    ``queries`` must be small (it is broadcast against the corpus — the
    standard shape: a probe set against a 100 TB corpus). Self-matches are
    excluded. Rank ties break on ``neighbor_id`` ascending; when
    ``round_digits`` is set the ordering key is the *rounded* similarity,
    which makes ranks reproducible across engines whose last-ulp sums may
    differ."""
    q = _prep(queries, id_col, vec_col, "query_id", "_qv", "_qn")
    c = _prep(corpus, id_col, vec_col, "neighbor_id", "_cv", "_cn")
    sim = _cos(_dot_d(F.col("_qv"), F.col("_cv")), F.col("_qn") * F.col("_cn"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = c.crossJoin(F.broadcast(q))
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select("query_id", "neighbor_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank", "cos_sim"))


def cosine_dup_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ``(doc_a, doc_b, cos_sim)``
    with ``doc_a < doc_b`` and similarity ≥ ``threshold`` — the
    embedding-space analog of MinHash near-dup.

    This is the exact O(n²) baseline (self-join); it is the truth oracle
    for small corpora and for verifying the bucketed variant. At 10^11
    vectors use :func:`cosine_dup_pairs_bucketed`."""
    a = _prep(df, id_col, vec_col, "doc_a", "_va", "_na")
    b = _prep(df, id_col, vec_col, "doc_b", "_vb", "_nb")
    sim = _cos(_dot_d(F.col("_va"), F.col("_vb")), F.col("_na") * F.col("_nb"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (a.crossJoin(b)
             .filter(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b", sim.alias("cos_sim"))
             .filter(F.col("cos_sim") >= threshold))


def cosine_dup_pairs_np(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
    max_corpus_rows: int = 2_000_000,
) -> DataFrame:
    """NumPy-vectorized exact near-dup pairs — same output contract and
    SAME BITS as :func:`cosine_dup_pairs`, ~10x faster.

    The interpreted higher-order-function fold is the bench bottleneck of
    the exact O(n²) verifier (HOFs are CodegenFallback). This path
    broadcasts the corpus matrix (the verifier runs at moderate n — a
    5k x 64 corpus is ~1.3 MB) and lets each partition compute its block
    against the whole matrix in Arrow-batched ``mapInPandas``.

    Bit-exactness: dot products and norms accumulate DIMENSION BY
    DIMENSION (``acc += x_k * y_k``), the same left-to-right double fold
    the Column expression evaluates, so raw similarities are identical to
    the fold path; rounding happens Spark-side with the same F.round.

    This operator is the truth oracle, not the scale path: it collects
    the corpus to the driver. ``max_corpus_rows`` enforces that role in
    code — a corpus larger than the cap raises ``ValueError`` BEFORE any
    collect (counted via ``limit(cap+1)``, so the guard itself never
    scans more than cap+1 rows) instead of OOMing the driver; use
    :func:`cosine_dup_pairs_bucketed` past the cap."""
    import numpy as np

    src = df.select(F.col(id_col).cast("bigint").alias("_id"),
                    F.col(vec_col).alias("_v"))
    if max_corpus_rows is not None:
        probed = src.limit(max_corpus_rows + 1).count()
        if probed > max_corpus_rows:
            raise ValueError(
                f"cosine_dup_pairs_np is the driver-collect verifier for "
                f"moderate corpora (cap {max_corpus_rows} rows; got more). "
                f"Use cosine_dup_pairs_bucketed for at-scale near-dup.")
    # parallelism guard: a small corpus in one parquet row group scans as
    # ONE partition, serializing the whole O(n^2/P) kernel on a single
    # core. Shared implementation — see dedup._spread.
    from .dedup import _spread
    src = _spread(src, "_id")
    rows = src.collect()
    ids = np.array([r["_id"] for r in rows], dtype="int64")
    mat = np.array([r["_v"] for r in rows], dtype="float64")
    dims = mat.shape[1] if len(rows) else 0
    norms = np.zeros(len(rows))
    for k in range(dims):                      # same fold order as _norm()
        norms += mat[:, k] * mat[:, k]
    norms = np.sqrt(norms)
    sc = df.sparkSession.sparkContext
    b_ids, b_mat, b_norms = sc.broadcast(ids), sc.broadcast(mat), sc.broadcast(norms)
    cut = threshold - (0.5 * 10.0 ** -round_digits if round_digits else 0.0)

    def run(batches):
        import pandas as pd
        all_ids, all_mat, all_norms = b_ids.value, b_mat.value, b_norms.value
        for pdf in batches:
            blk_ids = pdf["_id"].to_numpy(dtype="int64")
            blk = _stack_f64(pdf["_v"])
            if blk.size == 0:
                yield pd.DataFrame({"doc_a": [], "doc_b": [], "_sim": []})
                continue
            acc = np.zeros((len(blk_ids), len(all_ids)))
            for k in range(blk.shape[1]):      # ordered fold, bit-exact
                acc += np.outer(blk[:, k], all_mat[:, k])
            bn = np.zeros(len(blk_ids))
            for k in range(blk.shape[1]):
                bn += blk[:, k] * blk[:, k]
            bn = np.sqrt(bn)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = acc / np.outer(bn, all_norms)
            ii, jj = np.nonzero(
                (blk_ids[:, None] < all_ids[None, :])
                & np.greater_equal(sims, cut, where=~np.isnan(sims),
                                   out=np.zeros_like(sims, dtype=bool)))
            yield pd.DataFrame({"doc_a": blk_ids[ii], "doc_b": all_ids[jj],
                                "_sim": sims[ii, jj]})

    out = src.mapInPandas(run, schema="doc_a bigint, doc_b bigint, _sim double")
    sim = F.round(F.col("_sim"), round_digits) if round_digits is not None \
        else F.col("_sim")
    return (out.select("doc_a", "doc_b", sim.alias("cos_sim"))
               .filter(F.col("cos_sim") >= threshold))


def kmeans_centroids(
    df: DataFrame,
    k: int,
    *,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd k-means over the embedding column, producing a
    ``(centroid_id, centroid)`` table for the IVF operators — the
    "swap in k-means outputs at production scale" path.

    Shape at scale (per iteration):
    - **assign**: the existing zero-shuffle argmax over broadcast-literal
      centroids (:func:`assign_buckets`) — one corpus scan, no exchange.
    - **update**: per-dimension means via ``groupBy(bucket).agg(avg(v[i])
      for i in dims)`` — plain codegen aggregates with map-side partial
      aggregation; the only shuffle is k x dims partial-state rows.
    - k x dims doubles come to the driver between iterations (tiny).

    Determinism: init = the ``k`` lowest-id vectors (same seed as the
    untrained operators); per-dimension ``avg`` is order-insensitive up to
    float addition order — Spark's partial-agg sums give run-stable
    results on a fixed partitioning, and the driver round-trips exact
    doubles. Empty clusters keep their previous centroid (standard Lloyd
    fallback, keeps exactly k buckets).
    """
    # NULL/empty embeddings can't seed dims or centroids (size(NULL) is
    # NULL -> range(None) TypeError); they also get NULL buckets anyway,
    # so drop them from the training view entirely.
    df = df.filter(F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0))
    dims_row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if dims_row is None:
        return arrow_local_df(
            df.sparkSession, [],
            "centroid_id bigint, centroid array<double>")
    dims = dims_row["d"]
    current = (df.orderBy(id_col).limit(k)
               .select(F.col(id_col).cast("bigint").alias("cid"),
                       F.col(vec_col).cast("array<double>").alias("cvec"))
               .collect())
    centroids = {r["cid"]: list(r["cvec"]) for r in current}
    src_df = df.select(F.col(id_col).alias(id_col),
                       F.transform(F.col(vec_col),
                                   lambda x: x.cast("double")).alias("_kv"))
    for _ in range(max(iters, 0)):
        cen_df = arrow_local_df(
            df.sparkSession,
            [(cid, vec) for cid, vec in sorted(centroids.items())],
            "centroid_id bigint, centroid array<double>")
        assigned, bcasts = _assign_buckets_bcast(src_df, cen_df,
                                                 id_col=id_col, vec_col="_kv")
        means = (assigned.filter(F.col("bucket_id").isNotNull())
                 .groupBy("bucket_id")
                 .agg(*[F.avg(F.col("_kv")[i]).alias(f"m{i}")
                        for i in range(dims)])
                 .collect())
        # the collect above is the only action touching this iteration's
        # broadcast; release it so a long-lived session doesn't
        # accumulate one broadcast per training iteration
        for b in bcasts:
            b.unpersist()
        for r in means:
            centroids[r["bucket_id"]] = [r[f"m{i}"] for i in range(dims)]
    return arrow_local_df(
        df.sparkSession,
        [(cid, vec) for cid, vec in sorted(centroids.items())],
        "centroid_id bigint, centroid array<double>")


def cosine_dup_pairs_bucketed(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Scale path for embedding near-dup: IVF-assign every vector to its
    nearest centroid, then search pairs only WITHIN buckets — candidate
    cost drops from |corpus|² to Σ bucket². Near-identical vectors share
    a bucket with overwhelming probability at high thresholds, so recall
    loss concentrates on pairs near the threshold (trade documented; the
    exact operator above is the verifier)."""
    import numpy as np
    import pandas as pd

    if centroids is None:
        centroids = (df.orderBy(id_col).limit(n_centroids)
                     .select(F.col(id_col).alias("centroid_id"),
                             F.col(vec_col).alias("centroid")))
    bucketed = assign_buckets(df, centroids, id_col=id_col, vec_col=vec_col) \
        .select(F.col(id_col).cast("bigint").alias("_id"),
                F.col(vec_col).alias("_v"), "bucket_id") \
        .filter(F.col("bucket_id").isNotNull())
    cut = threshold - (0.5 * 10.0 ** -round_digits if round_digits else 0.0)

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # NumPy kernel per bucket: dimension-ordered accumulation = the
        # same left-to-right double fold as the Column expressions, so
        # similarities are bit-identical to the HOF/self-join variant
        # (which was ~10x slower — interpreted CodegenFallback per pair)
        ids = pdf["_id"].to_numpy(dtype="int64")
        mat = _stack_f64(pdf["_v"])
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "_sim": []})
        acc = np.zeros((n, n))
        nrm = np.zeros(n)
        for k in range(mat.shape[1]):
            acc += np.outer(mat[:, k], mat[:, k])
            nrm += mat[:, k] * mat[:, k]
        nrm = np.sqrt(nrm)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = acc / np.outer(nrm, nrm)
        mask = (ids[:, None] < ids[None, :]) & np.greater_equal(
            sims, cut, where=~np.isnan(sims),
            out=np.zeros_like(sims, dtype=bool))
        ii, jj = np.nonzero(mask)
        return pd.DataFrame({"doc_a": ids[ii], "doc_b": ids[jj],
                             "_sim": sims[ii, jj]})

    out = bucketed.groupBy("bucket_id").applyInPandas(
        per_bucket, schema="doc_a bigint, doc_b bigint, _sim double")
    sim = F.round(F.col("_sim"), round_digits) if round_digits is not None \
        else F.col("_sim")
    return (out.select("doc_a", "doc_b", sim.alias("cos_sim"))
               .filter(F.col("cos_sim") >= threshold))


def assign_buckets(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
) -> DataFrame:
    """IVF assignment — see :func:`_assign_buckets_bcast` for semantics.

    The single centroid broadcast created here lives until the returned
    DataFrame is garbage-collected (one broadcast per call); loops that
    call this repeatedly (k-means training) use the underscore variant
    and unpersist after each action."""
    out, _ = _assign_buckets_bcast(
        corpus, centroids, id_col=id_col, vec_col=vec_col,
        centroid_id_col=centroid_id_col, centroid_vec_col=centroid_vec_col)
    return out


def _assign_buckets_bcast(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
) -> tuple[DataFrame, list]:
    """IVF assignment: each corpus vector gets its nearest centroid
    (max cosine; ties → lowest centroid id) as ``bucket_id``.

    ZERO shuffle: the centroid table is tiny by definition, so it is
    collected once, broadcast, and each Arrow batch computes its
    batch x centroids similarity block in NumPy (``mapInPandas``) — the
    corpus is scanned once, never exchanged, never row-multiplied.
    (History: the round-1 crossJoin + Window shape shuffled
    |corpus| x n_centroids rows; the round-2 ``aggregate``-fold shape was
    shuffle-free but interpreted (CodegenFallback) AND re-inlined the dot
    product ~3x per fold step — 2.8 s for 2000x16x64 at sf0.1, ~100x
    slower than BLAS. tests/test_physical_plans.py asserts no Exchange.)

    Numerical parity: dots and norms accumulate DIMENSION BY DIMENSION —
    the same left-to-right double fold the Column expressions use — so
    bucket assignments are bit-identical to the fold variant (and to the
    DuckDB oracle that reproduces the assignment). Tie-break: centroids
    sorted by id, first-max argmax => lowest centroid id wins, matching
    the fold's ``(sim == best) & (cid < best_cid)`` rule. Zero-norm /
    NULL vectors get a NULL bucket_id and drop out of bucket joins.

    Returns ``(assigned_df, broadcasts)``: one broadcast holding the
    ``(cids, cmat, cn)`` tuple. The caller owns it and may
    ``unpersist()`` once its actions on the returned DataFrame are done
    (k-means training does, once per iteration)."""
    import numpy as np

    rows = sorted(
        centroids.select(
            F.col(centroid_id_col).cast("bigint").alias("cid"),
            F.col(centroid_vec_col).cast("array<double>").alias("cvec"),
        ).collect(),
        key=lambda r: r["cid"])
    if not rows:
        return (corpus.withColumn("bucket_id",
                                  F.lit(None).cast("bigint")), [])
    cids = np.array([r["cid"] for r in rows], dtype="int64")
    cmat = np.array([list(r["cvec"]) for r in rows], dtype="float64")
    dims = cmat.shape[1]
    cn = np.zeros(len(cids))
    for d in range(dims):                   # same fold order as _norm()
        cn += cmat[:, d] * cmat[:, d]
    cn = np.sqrt(cn)
    sc = corpus.sparkSession.sparkContext
    b_cen = sc.broadcast((cids, cmat, cn))
    out_schema = T.StructType(
        list(corpus.schema.fields) + [T.StructField("bucket_id",
                                                    T.LongType())])

    def run(batches):
        import pandas as pd
        all_cids, all_cmat, all_cn = b_cen.value
        k = len(all_cids)
        for pdf in batches:
            out = pdf.copy()
            vecs = pdf[vec_col]
            valid = np.array([v is not None and len(v) == dims
                              for v in vecs])
            bucket = np.full(len(pdf), None, dtype=object)
            if valid.any():
                mat = _stack_f64(vecs[valid])
                acc = np.zeros((mat.shape[0], k))
                vn = np.zeros(mat.shape[0])
                for d in range(dims):       # ordered fold, bit-exact
                    acc += np.outer(mat[:, d], all_cmat[:, d])
                    vn += mat[:, d] * mat[:, d]
                vn = np.sqrt(vn)
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = acc / np.outer(vn, all_cn)
                finite = ~np.isnan(sims)
                any_ok = finite.any(axis=1)
                best = np.argmax(np.where(finite, sims, -np.inf), axis=1)
                chosen = np.where(any_ok, all_cids[best], -1)
                bucket[valid] = [int(c) if c >= 0 else None
                                 for c in chosen]
            out["bucket_id"] = pd.array(
                [b for b in bucket], dtype="Int64")
            yield out

    return corpus.mapInPandas(run, schema=out_schema), [b_cen]


def coverage_sample(
    corpus: DataFrame,
    per_bucket: int,
    *,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    salt: str = "0",
) -> DataFrame:
    """Embedding-space coverage sampling: exactly ``per_bucket`` vectors
    from every IVF bucket — "stratify by embedding space" for the
    curation moves a flat hash sample gets wrong (a uniform draw
    over-represents dense regions and can miss small clusters entirely;
    a coverage draw keeps every region of the space in the subset —
    eval-set construction, labeling batches, distillation seeds).

    Pure composition of two proven shapes: the zero-shuffle broadcast
    argmax assignment (:func:`assign_buckets`) and the two-phase exact
    per-group quota (:func:`.sampling.quota_sample` — deterministic
    md5-smallest keys, reruns diffable, buckets smaller than the quota
    kept whole). Output = corpus columns + ``bucket_id`` +
    ``sample_rank`` (1-based within bucket).

    Centroids default to the ``n_centroids`` lowest-id corpus vectors
    (training-free, value-exact oracles); pass
    ``centroids=kmeans_centroids(...)`` for balanced production buckets.
    NULL / zero-norm vectors have no bucket and are excluded — run
    :func:`vector_violations` first if they must be surfaced."""
    if centroids is None:
        centroids = (corpus.orderBy(id_col).limit(n_centroids)
                     .select(F.col(id_col).alias("centroid_id"),
                             F.col(vec_col).alias("centroid")))
    assigned = assign_buckets(corpus, centroids,
                              id_col=id_col, vec_col=vec_col) \
        .filter(F.col("bucket_id").isNotNull())
    from .sampling import quota_sample
    return quota_sample(assigned, "bucket_id", per_bucket,
                        key_col=id_col, salt=salt)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-bucketed approximate top-k. Centroids are chosen
    deterministically (the ``n_centroids`` lowest-id corpus vectors —
    training-free; swap in k-means outputs at production scale). Queries
    probe their ``nprobe`` most-similar buckets; exact cosine runs only
    inside probed buckets. Pass ``centroids=kmeans_centroids(...)`` (any
    ``(centroid_id, centroid)`` table) to swap trained centroids in —
    same plan shape, better-balanced buckets and recall."""
    if centroids is None:
        centroids = (corpus.orderBy(id_col).limit(n_centroids)
                     .select(F.col(id_col).alias("centroid_id"),
                             F.col(vec_col).alias("centroid")))
    import numpy as np

    # ONE centroid collect + broadcast for the whole IVF plan: the
    # assignment kernel's (cids, cmat, cn) tuple is exactly what the
    # probe needs, so the probe shares the assignment's broadcast
    # instead of collecting/broadcasting the same table a second time
    # (two redundant driver round-trips per call, and the second
    # broadcast was never released — it accumulated across e.g.
    # nprobe parameter sweeps).
    bucketed, bcasts = _assign_buckets_bcast(corpus, centroids,
                                             id_col=id_col, vec_col=vec_col)
    b_probe = bcasts[0]
    # probes: each query's nprobe most-similar centroids, computed with
    # the same dimension-ordered NumPy fold as assignment (ties -> lowest
    # centroid id, matching cosine_topk's neighbor_id-asc tie-break).
    # Zero-norm queries produce no probes (no finite sims); NULL or
    # wrong-dims query vectors are skipped (no projection under these
    # centroids), matching the assignment kernel's validity rule.

    qp = _prep(queries, id_col, vec_col, "query_id", "_qv", "_qn")
    probe_schema = T.StructType([
        T.StructField("query_id", qp.schema["query_id"].dataType),
        T.StructField("bucket_id", T.LongType()),
    ])

    def probe(batches):
        import pandas as pd
        cids_, cmat_, cn_ = b_probe.value
        nc = len(cids_)
        dims_ = cmat_.shape[1] if nc else 0
        for pdf in batches:
            out_q, out_b = [], []
            valid = np.array([v is not None and len(v) == dims_
                              for v in pdf["_qv"]], dtype=bool) \
                if len(pdf) else np.zeros(0, dtype=bool)
            if valid.any() and nc:
                pdf = pdf.iloc[np.nonzero(valid)[0]]
                qm = _stack_f64(pdf["_qv"])
                acc = np.zeros((len(pdf), nc))
                for d in range(dims_):            # ordered fold, bit-exact
                    acc += np.outer(qm[:, d], cmat_[:, d])
                qn = pdf["_qn"].to_numpy(dtype="float64")
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = acc / np.outer(qn, cn_)
                for i, qid in enumerate(pdf["query_id"]):
                    row = sims[i]
                    finite = np.isfinite(row)
                    # sort by (-sim, cid): lexsort's last key is primary
                    order = np.lexsort((cids_[finite], -row[finite]))
                    for j in order[:nprobe]:
                        out_q.append(qid)
                        out_b.append(int(cids_[finite][j]))
            yield pd.DataFrame({"query_id": out_q,
                                "bucket_id": pd.array(out_b, dtype="Int64")})

    probes = qp.mapInPandas(probe, schema=probe_schema)
    cand = (bucketed.join(F.broadcast(probes), "bucket_id")
                    .join(F.broadcast(qp), "query_id")
                    .filter(F.col("query_id") != F.col(id_col)))
    # Candidate scoring: NumPy per Arrow batch (mapInPandas), NOT the
    # interpreted zip_with/aggregate fold — at scale the candidate set is
    # |corpus| x nprobe/n_centroids rows, so an interpreted
    # CodegenFallback dot product would dominate the designated ANN path
    # (the round-2 weak item). Dimension-ordered accumulation keeps the
    # similarity bit-identical to the Column-expression fold; zero-norm
    # corpus vectors get NaN -> NULL, dropped by the top-k order as
    # before. No new exchange: mapInPandas is a narrow transform over the
    # already-broadcast-joined candidates.
    sel = cand.select("query_id", F.col(id_col).alias("neighbor_id"),
                      "_qv", "_qn", F.col(vec_col).alias("_cv"))
    out_schema = T.StructType([
        T.StructField("query_id", sel.schema["query_id"].dataType),
        T.StructField("neighbor_id", sel.schema["neighbor_id"].dataType),
        T.StructField("_sim", T.DoubleType()),
    ])

    def score(batches):
        import pandas as pd
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame({"query_id": pdf["query_id"],
                                    "neighbor_id": pdf["neighbor_id"],
                                    "_sim": pd.Series([], dtype="float64")})
                continue
            qm = _stack_f64(pdf["_qv"])
            cm = _stack_f64(pdf["_cv"])
            acc = np.zeros(n)
            vn = np.zeros(n)
            for d in range(cm.shape[1]):        # ordered fold, bit-exact
                acc += qm[:, d] * cm[:, d]
                vn += cm[:, d] * cm[:, d]
            denom = pdf["_qn"].to_numpy(dtype="float64") * np.sqrt(vn)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np.where(denom != 0.0, acc / denom, np.nan)
            yield pd.DataFrame({"query_id": pdf["query_id"],
                                "neighbor_id": pdf["neighbor_id"],
                                "_sim": sims})

    scored = sel.mapInPandas(score, schema=out_schema)
    sim = (F.round(F.col("_sim"), round_digits)
           if round_digits is not None else F.col("_sim"))
    scored = scored.select("query_id", "neighbor_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank", "cos_sim"))


# ---------------------------------------------------------------------------
# SRP-LSH: signed-random-projection near-dup (Charikar's cosine LSH)
# ---------------------------------------------------------------------------
#
# The third bucketing scheme for embedding near-dup, completing the family:
# IVF buckets (data-dependent centroids; recall concentrated near centroid
# boundaries) vs SRP buckets (data-INDEPENDENT hyperplanes; recall is the
# closed-form banding curve 1-(1-p^r)^b with p = 1 - theta/pi). SRP needs
# no training pass and no centroid broadcast refresh on appends — the
# hyperplanes are a pure function of (dims, n_bits, seed) — which is what
# an incrementally-growing 100 TB corpus wants.


def srp_hyperplanes(dims: int, n_bits: int, seed: int) -> list[list[float]]:
    """Deterministic Rademacher (+/-1) hyperplanes, one row per bit.

    +/-1 components instead of Gaussians: each product is an exact sign
    flip of a float32-representable embedding value, so the projection is
    a sum of EXACT doubles — cross-engine divergence is confined to the
    last-ulp of the summation order, which the sign rule absorbs by
    rounding (see :func:`srp_band_keys`). For LSH the Rademacher
    distribution is a standard hyperplane choice (Achlioptas-style sparse
    projections); the collision probability keeps the 1 - theta/pi form.
    ``random.Random`` (Mersenne Twister) is version-stable, so the same
    (dims, n_bits, seed) always yields the same planes — in the Spark
    kernel AND in the generated oracle SQL."""
    rng = random.Random(seed)
    return [[1.0 if rng.getrandbits(1) else -1.0 for _ in range(dims)]
            for _ in range(n_bits)]


def _srp_params(df: DataFrame, vec_col: str, n_bits: int, bands: int,
                seed: int, dims: int | None = None):
    """(dims, hyperplanes, r) for this corpus. Pass ``dims`` explicitly
    on corpora that may mix dimensionalities (e.g. mid-encoder-
    migration): the default infers it from an ARBITRARY first non-null
    vector, which on a mixed corpus is partition-order-dependent — and
    every vector of any other length silently emits no band rows
    (wrong-dims vectors have no projection under these planes)."""
    assert n_bits % bands == 0, "n_bits must divide evenly into bands"
    assert n_bits // bands <= 62, "band key must fit in a bigint"
    if dims is None:
        row = (df.filter(F.col(vec_col).isNotNull()
                         & (F.size(F.col(vec_col)) > 0))
                 .select(F.size(F.col(vec_col)).alias("d")).first())
        dims = row["d"] if row is not None else 0
    return dims, srp_hyperplanes(dims, n_bits, seed), n_bits // bands


def srp_band_keys(
    df: DataFrame,
    *,
    n_bits: int = 64,
    bands: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Skinny ``(_id, band, bkey)`` rows: each vector's ``n_bits`` sign
    bits, split into ``bands`` band keys of ``r = n_bits/bands`` bits.
    ``dims`` defaults to the first non-null vector's length — pass it
    explicitly on mixed-dims corpora (see :func:`_srp_params`).

    Bit ``j`` is ``round(dot(v, plane_j), 6) >= 0`` — rounding BEFORE the
    sign makes the bit reproducible across engines whose last-ulp
    summation order differs (the same convention the cosine operators use
    for similarity values). Zero-shuffle: the planes ride inside the
    closure (k x dims doubles), each Arrow batch computes its sign block
    in NumPy with the dimension-ordered fold, and only ``bands`` skinny
    rows per vector leave the kernel. NULL / empty / zero-norm /
    wrong-dims vectors emit no rows (they have no direction to hash)."""
    import numpy as np

    dims, planes, r = _srp_params(df, vec_col, n_bits, bands, seed, dims)
    src = df.select(F.col(id_col).cast("bigint").alias("_id"),
                    F.col(vec_col).alias("_v"))
    if dims == 0:
        return arrow_local_df(
            src.sparkSession, [], "_id bigint, band int, bkey bigint")
    hmat = np.array(planes, dtype="float64").T        # dims x n_bits

    def keys(batches):
        import pandas as pd
        for pdf in batches:
            vecs = pdf["_v"]
            valid = np.array([v is not None and len(v) == dims
                              for v in vecs])
            if not valid.any():
                yield pd.DataFrame({"_id": pd.Series([], dtype="int64"),
                                    "band": pd.Series([], dtype="int32"),
                                    "bkey": pd.Series([], dtype="int64")})
                continue
            ids = pdf["_id"].to_numpy(dtype="int64")[valid]
            mat = _stack_f64(vecs[valid])
            acc = np.zeros((mat.shape[0], hmat.shape[1]))
            nrm = np.zeros(mat.shape[0])
            for d in range(dims):               # ordered fold, bit-exact
                acc += np.outer(mat[:, d], hmat[d, :])
                nrm += mat[:, d] * mat[:, d]
            bits = (np.round(acc, 6) >= 0.0).astype("int64")
            weights = (1 << np.arange(r, dtype="int64"))
            # (n, bands) keys: pack each band's r bits little-endian
            bkeys = bits.reshape(len(ids), bands, r) @ weights
            live = nrm > 0.0                    # zero-norm: no direction
            n_live = int(live.sum())
            yield pd.DataFrame({
                "_id": np.repeat(ids[live], bands),
                "band": np.tile(np.arange(bands, dtype="int32"), n_live),
                "bkey": bkeys[live].reshape(-1),
            })

    return src.mapInPandas(keys, schema="_id bigint, band int, bkey bigint")


def srp_dup_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    n_bits: int = 64,
    bands: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
    max_bucket: int | None = None,
    dims: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via signed-random-projection LSH — the
    training-free scale path. Output contract matches
    :func:`cosine_dup_pairs`: ``(doc_a, doc_b, cos_sim)``, ``doc_a <
    doc_b``, rounded similarity >= ``threshold``; verified pairs carry the
    bit-identical exact cosine, so precision is exact and recall is the
    banding curve (defaults 64 bits / 8 bands, r=8: ~0.99 at cos 0.95;
    near-identical vectors collide in every band, recall -> 1).

    Sizing rule (the LSH keyspace constraint): each band's keyspace is
    ``2^r`` — expected bucket size on non-duplicate data is
    ``n / 2^r``, and candidate cost per band is quadratic in it, so
    ``2^r`` must be large relative to the corpus' bucket budget. The
    defaults (r=8 -> 256 keys/band) suit 10^3-10^5-row test corpora; a
    10^11-vector run wants ``r = 16-24`` with more bands to hold recall
    (e.g. 512 bits as 32 bands of 16: recall 0.998 at cos 0.95) — bits
    are cheap (one BLAS matmul per Arrow batch), buckets are not.

    Shape at 10^11 vectors: one corpus scan emits ``bands`` skinny
    ``(id, band, bkey)`` rows per vector (:func:`srp_band_keys` — zero
    exchange); candidates come from bucket-GROUPED C(k,2) emission (the
    same shape as MinHash LSH — no band self-join, no signature
    recompute); candidate verification joins the pair ids back to the
    vectors and scores each pair in an Arrow-batched NumPy kernel (no
    interpreted HOF fold on the hot path). ``max_bucket`` bounds the
    quadratic emission on adversarial near-identical mega-clusters,
    exactly like the MinHash cap (route those to grouping instead)."""
    import numpy as np

    band_rows = srp_band_keys(df, n_bits=n_bits, bands=bands, seed=seed,
                              id_col=id_col, vec_col=vec_col, dims=dims)
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
    src = df.select(F.col(id_col).cast("bigint").alias("_id"),
                    F.col(vec_col).alias("_v"))
    cand = (cand.join(src.select(F.col("_id").alias("doc_a"),
                                 F.col("_v").alias("_va")), "doc_a")
                .join(src.select(F.col("_id").alias("doc_b"),
                                 F.col("_v").alias("_vb")), "doc_b"))

    def score(batches):
        import pandas as pd
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                    "doc_b": pd.Series([], dtype="int64"),
                                    "_sim": pd.Series([], dtype="float64")})
                continue
            a = _stack_f64(pdf["_va"])
            b = _stack_f64(pdf["_vb"])
            acc = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            for d in range(a.shape[1]):         # ordered fold, bit-exact
                acc += a[:, d] * b[:, d]
                na += a[:, d] * a[:, d]
                nb += b[:, d] * b[:, d]
            denom = np.sqrt(na) * np.sqrt(nb)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np.where(denom != 0.0, acc / denom, np.nan)
            yield pd.DataFrame({"doc_a": pdf["doc_a"], "doc_b": pdf["doc_b"],
                                "_sim": sims})

    out = cand.mapInPandas(score,
                           schema="doc_a bigint, doc_b bigint, _sim double")
    sim = (F.round(F.col("_sim"), round_digits)
           if round_digits is not None else F.col("_sim"))
    return (out.select("doc_a", "doc_b", sim.alias("cos_sim"))
               .filter(F.col("cos_sim") >= threshold))


def srp_dup_pairs_sql(
    *,
    dims: int,
    threshold: float = 0.95,
    n_bits: int = 64,
    bands: int = 8,
    seed: int = 7,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """The DuckDB twin of :func:`srp_dup_pairs`, generated from the SAME
    hyperplane helper so the banding is reproduced exactly: sign bits via
    ``round(list_dot_product(v, <literal plane>), 6) >= 0``, band keys as
    the same little-endian bit packing, candidates from a band self-join,
    verification with the engine's own dot products under the shared
    round-to-6 convention. Used by ``__spark_entry__.oracle_sql()`` and
    the oracle tests — one source of truth for the planes."""
    planes = srp_hyperplanes(dims, n_bits, seed)
    r = n_bits // bands
    bit_exprs = []
    for j, plane in enumerate(planes):
        lit = "[" + ", ".join(f"{x:.1f}" for x in plane) + "]"
        bit_exprs.append(
            f"(CASE WHEN round(list_dot_product(v, {lit}), 6) >= 0 "
            f"THEN 1 ELSE 0 END)")
    key_rows = []
    for i in range(bands):
        terms = " + ".join(f"{bit_exprs[i * r + j]} * {1 << j}"
                           for j in range(r))
        key_rows.append(f"SELECT _id, {i} AS band, ({terms}) AS bkey FROM e")
    keys_sql = " UNION ALL ".join(key_rows)
    return f"""
WITH e AS (SELECT {id_col} AS _id,
                  list_transform({vec_col}, x -> x::DOUBLE) AS v
           FROM {table}
           WHERE {vec_col} IS NOT NULL
             AND len({vec_col}) = {dims}
             AND list_dot_product(list_transform({vec_col},
                                                 x -> x::DOUBLE),
                                  list_transform({vec_col},
                                                 x -> x::DOUBLE)) > 0),
k AS ({keys_sql}),
cand AS (SELECT DISTINCT a._id AS doc_a, b._id AS doc_b
         FROM k a JOIN k b ON a.band = b.band AND a.bkey = b.bkey
                          AND a._id < b._id)
SELECT cand.doc_a, cand.doc_b,
       round(list_dot_product(ea.v, eb.v) /
             (sqrt(list_dot_product(ea.v, ea.v)) *
              sqrt(list_dot_product(eb.v, eb.v))), 6) AS cos_sim
FROM cand
JOIN e ea ON ea._id = cand.doc_a
JOIN e eb ON eb._id = cand.doc_b
WHERE round(list_dot_product(ea.v, eb.v) /
            (sqrt(list_dot_product(ea.v, ea.v)) *
             sqrt(list_dot_product(eb.v, eb.v))), 6) >= {threshold}
"""


# ---------------------------------------------------------------------------
# int8 quantization: the memory/IO lever for the at-scale ANN path
# ---------------------------------------------------------------------------
#
# A 100 TB float32 embedding column becomes ~25 TB as int8 with per-vector
# scales — 4x less scan IO, 4x more vectors per executor, and integer dot
# products whose accumulation is EXACT (order-free), so quantized
# similarities are bit-reproducible across engines without any rounding
# convention. Cosine is scale-invariant, so per-vector symmetric
# quantization cancels out of the similarity entirely — the quality cost
# is only the per-component rounding (recall-gated in tests).


def vector_violations(
    df: DataFrame,
    dims: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Vector-hygiene validation — the engine's violation-row contract
    extended to the embeddings modality, run BEFORE any ANN/dedup
    consumer (a single NaN poisons every cosine it touches; a
    wrong-dimension vector crashes the NumPy kernels). Collect-all rows
    ``(id, instance_path, code, message)``: ``NullVector``,
    ``WrongDimension`` (observed size in the message), ``NullElement``,
    ``ContainsNaN``, ``ContainsInfinity``, ``ZeroVector`` (undefined
    cosine).

    Scale shape: every check is whole-stage codegen over the scan —
    ``size`` / ``array_compact`` / ``array_min`` / ``array_max`` only,
    no HOF lambdas, no Python, zero shuffle. NaN detection leans on
    NaN-sorts-greatest (``array_max`` is NaN iff any element is —
    matched by DuckDB's list max, oracle-checked); null elements are
    skipped by min/max on BOTH engines, so a check never masks another.
    """
    from ..plans.compiler import VIOLATION_ARRAY_DDL

    v, path = F.col(vec_col), "/" + vec_col
    mx, mn, sz = F.array_max(v), F.array_min(v), F.size(v)

    def viol(cond, code: str, message) -> F.Column:
        return F.when(cond, F.array(F.struct(
            F.lit(path).alias("instance_path"),
            F.lit(code).alias("code"),
            message.alias("message"),
        ))).otherwise(F.array().cast(VIOLATION_ARRAY_DDL))

    arr = F.concat(
        viol(v.isNull(), "NullVector",
             F.lit(f"{path}: vector is null")),
        viol(v.isNotNull() & (sz != dims), "WrongDimension",
             F.concat(F.lit(f"{path}: expected {dims} dimensions, got "),
                      sz.cast("string"))),
        viol(v.isNotNull() & (F.size(F.array_compact(v)) != sz),
             "NullElement", F.lit(f"{path}: vector contains null "
                                  f"elements")),
        viol(v.isNotNull() & F.isnan(mx), "ContainsNaN",
             F.lit(f"{path}: vector contains NaN")),
        viol(v.isNotNull() & ((mx == F.lit(float("inf")))
                              | (mn == F.lit(float("-inf")))),
             "ContainsInfinity", F.lit(f"{path}: vector contains "
                                       f"infinity")),
        viol(v.isNotNull() & (sz > 0) & (mn == 0) & (mx == 0),
             "ZeroVector", F.lit(f"{path}: zero vector has undefined "
                                 f"cosine")),
    )
    base = df.select(F.col(id_col), arr.alias("_viol"))
    return (explode_rows(base, [id_col], F.col("_viol"), "_v")
            .select(F.col(id_col), "_v.instance_path", "_v.code",
                    "_v.message"))


def normalize_embeddings(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """L2-normalize every vector — the prep step that turns cosine into
    a plain dot product downstream (and the companion of
    :func:`vector_violations`, which catches the zero/NaN vectors this
    cannot normalize). Output ``(id, unit array<double>, norm double)``;
    zero-norm vectors get ``unit = NULL, norm = 0.0`` (undefined
    direction stays undefined, never fabricated); NULL/empty vectors
    pass through as ``(NULL, NULL)``.

    Cross-engine: the squared norm accumulates in float64 (NumPy) and
    the oracle re-derives it with DuckDB's double ``list_dot_product`` —
    summation order may differ at the last ulp, so outputs are rounded
    Spark-side to ``round_digits`` with the same ``F.round`` the cosine
    family uses (the established convention: kernels emit unrounded,
    rounding is a Spark expression).

    Scale shape: embarrassingly parallel — one corpus scan, a NumPy
    kernel per Arrow batch, zero shuffle (plan-asserted); the rounding
    projection is row-local."""
    import numpy as np

    src = df.select(F.col(id_col).cast("bigint").alias(id_col),
                    F.col(vec_col).alias("_v"))

    def run(batches):
        import pandas as pd
        for pdf in batches:
            vecs = pdf["_v"]
            n = len(pdf)
            ucol: list = [None] * n
            ncol: list = [None] * n
            lens = np.array([len(v) if v is not None else 0 for v in vecs],
                            dtype="int64") if n else np.zeros(0, "int64")
            for L in np.unique(lens[lens > 0]):
                idx = np.nonzero(lens == L)[0]
                mat = _stack_f64(vecs.iloc[idx])
                nrm = np.sqrt(np.einsum("ij,ij->i", mat, mat))
                with np.errstate(divide="ignore", invalid="ignore"):
                    u = mat / nrm[:, None]
                for vi, i in enumerate(idx):
                    ncol[i] = float(nrm[vi])
                    if nrm[vi] > 0.0:
                        ucol[i] = u[vi].tolist()
            yield pd.DataFrame({id_col: pdf[id_col], "unit": ucol,
                                "norm": ncol})

    out = src.mapInPandas(
        run, schema=f"{id_col} bigint, unit array<double>, norm double")
    if round_digits is not None:
        out = out.select(
            F.col(id_col),
            F.transform("unit",
                        lambda x: F.round(x, round_digits)).alias("unit"),
            F.round("norm", round_digits).alias("norm"))
    return out


def quantize_embeddings(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``q[d] = floor(x[d] / s *
    127 + 0.5)`` with ``s = max(|x|)`` (so ``q`` is in [-127, 127] with no
    clamp), plus ``scale = s / 127`` for dequantization (``x ~ q *
    scale``). Output: ``(id, qvec array<int>, scale double)``.

    Cross-engine exactness: ``s`` is a max (no accumulation); the
    quantizer applies single IEEE ops in a fixed order (``(x / s) * 127 +
    0.5`` then floor), so any engine reproduces the identical integers.
    All-zero vectors quantize to all-zero ``qvec`` with scale 0; NULL /
    empty vectors pass through as NULL.

    Scale shape: embarrassingly parallel — one corpus scan, a NumPy
    kernel per Arrow batch, zero shuffle (plan-asserted)."""
    import numpy as np

    src = df.select(F.col(id_col).cast("bigint").alias(id_col),
                    F.col(vec_col).alias("_v"))

    def run(batches):
        import pandas as pd
        for pdf in batches:
            vecs = pdf["_v"]
            n = len(pdf)
            qcol: list = [None] * n
            scol: list = [None] * n
            lens = np.array([len(v) if v is not None else 0 for v in vecs],
                            dtype="int64") if n else np.zeros(0, "int64")
            # quantization is per-vector, so mixed-dims corpora (e.g.
            # mid-encoder-migration) are fine — stack per length group
            # instead of crashing np.stack on a ragged batch
            for L in np.unique(lens[lens > 0]):
                idx = np.nonzero(lens == L)[0]
                mat = _stack_f64(vecs.iloc[idx])
                s = np.max(np.abs(mat), axis=1)
                with np.errstate(divide="ignore", invalid="ignore"):
                    q = np.floor((mat / s[:, None]) * 127.0 + 0.5)
                q = np.where(s[:, None] > 0.0, q, 0.0).astype("int32")
                scale = np.where(s > 0.0, s / 127.0, 0.0)
                for vi, i in enumerate(idx):
                    qcol[i] = q[vi].tolist()
                    scol[i] = float(scale[vi])
            yield pd.DataFrame({id_col: pdf[id_col], "qvec": qcol,
                                "scale": scol})

    return src.mapInPandas(
        run, schema=f"{id_col} bigint, qvec array<int>, scale double")


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Brute-force cosine top-k over int8-quantized vectors — the scan
    that runs 4x cheaper at 100 TB. Same output contract as
    :func:`cosine_topk`; similarities are the quantized-space cosines
    (per-vector scales cancel), which track the float cosines to ~1e-2 —
    recall vs exact top-k is gated in tests.

    Shape: quantized queries are collected + broadcast (small by
    contract); each Arrow batch of the quantized corpus computes its
    int64 dot block (np.matmul on integers — exact, order-free) and
    emits only its BATCH-LOCAL top-k per query, so the final per-query
    window sees k x n_batches rows, not |corpus| rows — the brute-force
    scan stays one pass with a skinny top-k shuffle. Zero-norm vectors
    (all-zero qvec) have no direction and are excluded on both sides."""
    import numpy as np

    qc = quantize_embeddings(corpus, id_col=id_col, vec_col=vec_col)
    qq = quantize_embeddings(queries, id_col=id_col, vec_col=vec_col)
    q_rows = [r for r in qq.collect()
              if r["qvec"] is not None and any(r["qvec"])]
    if not q_rows:
        return arrow_local_df(
            corpus.sparkSession, [],
            "query_id bigint, neighbor_id bigint, rank int, cos_sim double")
    q_ids = np.array([r[id_col] for r in q_rows], dtype="int64")
    q_mat = np.array([r["qvec"] for r in q_rows], dtype="int64")
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1).astype("float64"))
    b_q = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat, q_norm))
    # prune margin scales with the rounding grain: two raw sims up to
    # 10^-round_digits apart can round into a tie the global window
    # breaks on neighbor_id, so the batch cut must keep that band (with
    # no rounding, ties require raw equality and margin 0 keeps them —
    # the >= cut is inclusive)
    margin = (1.01 * 10.0 ** -round_digits) if round_digits is not None \
        else 0.0
    q_dims = q_mat.shape[1]

    def score(batches):
        import pandas as pd
        ids_, mat_, norm_ = b_q.value
        for pdf in batches:
            outs = {"query_id": [], "neighbor_id": [], "_sim": []}
            live = [i for i, qv in enumerate(pdf["qvec"])
                    if qv is not None and len(qv) == q_dims and any(qv)]
            if live:
                nids = pdf[id_col].to_numpy(dtype="int64")[live]
                cmat = np.array([pdf["qvec"].iloc[i] for i in live],
                                dtype="int64")
                dots = cmat @ mat_.T                     # exact int64
                cnorm = np.sqrt((cmat * cmat).sum(axis=1)
                                .astype("float64"))
                sims = dots / np.outer(cnorm, norm_)
                for qi in range(len(ids_)):
                    col = sims[:, qi]
                    mask = nids != ids_[qi]              # exclude self
                    cand_ids, cand = nids[mask], col[mask]
                    order = np.lexsort((cand_ids, -cand))
                    if len(order) > k:
                        # rounding-margin SUPERSET prune: the global
                        # window ranks on round(sim, round_digits), so a
                        # raw-sim cut exactly at the k-th row could drop
                        # a row that rounds into a tie and wins on
                        # neighbor_id. Keeping everything within one
                        # rounding grain of the k-th raw sim guarantees
                        # every possible global top-k row survives.
                        cut = cand[order[k - 1]] - margin
                        order = order[cand[order] >= cut]
                    top = order
                    outs["query_id"].extend([ids_[qi]] * len(top))
                    outs["neighbor_id"].extend(cand_ids[top].tolist())
                    outs["_sim"].extend(cand[top].tolist())
            yield pd.DataFrame(outs)

    scored = qc.mapInPandas(
        score, schema="query_id bigint, neighbor_id bigint, _sim double")
    sim = (F.round(F.col("_sim"), round_digits)
           if round_digits is not None else F.col("_sim"))
    scored = scored.select("query_id", "neighbor_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank", "cos_sim"))


def semantic_dedup(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str | None = None,
    centroids: DataFrame | None = None,
    round_digits: int | None = 6,
    cc_method: str = "auto",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, find near-duplicate
    pairs only WITHIN clusters, close them transitively, and keep one
    canonical survivor per semantic group. Output: one row per
    SURVIVING vector — ``(id_col, group_id, group_size[, score_col])``
    with ``group_id = id_col`` and ``group_size = 1`` for vectors in no
    near-dup pair.

    This is the end-to-end composition of three already-verified
    operators, in their scale shapes:

    1. :func:`cosine_dup_pairs_bucketed` — IVF-bucketed candidate
       generation (zero-shuffle centroid assignment, per-bucket NumPy
       kernel; candidate cost Σ bucket², never |corpus|²). Pass
       ``centroids=kmeans_centroids(...)`` for the trained production
       path; the default (lowest-id seed vectors) keeps the whole
       pipeline deterministic and SQL-oracle-able. Caveat of the
       default: if near-duplicates sit AMONG the lowest-id seeds, each
       is its own centroid and the group splits across buckets (missed
       pairs) — trained centroids drift the redundant seeds apart and
       shrink the split (tested in ``tests/test_semantic_dedup.py``).
    2. :func:`~..operators.dedup.near_dup_groups` — connected
       components over the skinny pair table (driver union-find below
       the edge cap, large-star/small-star O(log n) rounds above it).
    3. :func:`~..operators.dedup.canonical_docs` — survivor per group:
       highest ``score_col`` (ties → smallest id), or smallest id when
       ``score_col`` is None (the SemDeDup paper keeps one arbitrary
       member; smallest-id makes that choice total and reproducible).

    Reference anchor: `uniqueItems` dedupes EXACT values
    (`/root/reference/json_schema_rs/src/validator/mod.rs:378-397`);
    this is the embedding-space analog a training pipeline runs before
    epoch sampling.

    Scale shape: the corpus embedding column is scanned once (bucket
    assignment) and shuffled once (groupBy bucket for the per-bucket
    kernel); everything after operates on pair/group tables that are
    orders smaller than the corpus. No all-pairs path exists."""
    from .dedup import canonical_docs, near_dup_groups

    pairs = cosine_dup_pairs_bucketed(
        df, threshold=threshold, n_centroids=n_centroids,
        id_col=id_col, vec_col=vec_col, round_digits=round_digits,
        centroids=centroids)
    groups = near_dup_groups(pairs, "doc_a", "doc_b", method=cc_method) \
        .withColumnRenamed("doc_id", id_col)
    if score_col is None:
        scored = df.select(F.col(id_col),
                           F.lit(None).cast("double").alias("_score"))
        return (canonical_docs(scored, groups,
                               id_col=id_col, score_col="_score")
                .drop("_score"))
    return canonical_docs(df.select(F.col(id_col), F.col(score_col)),
                          groups, id_col=id_col, score_col=score_col)


def mean_embedding_by(
    df: DataFrame,
    group_col: str,
    *,
    vec_col: str = "embedding",
    micro: int = 1_000_000,
) -> DataFrame:
    """Per-group mean embedding (group centroid) —
    ``(group, n_vectors, embedding: array<double>)`` ordered by group.

    The aggregation step every group-grain semantic operation needs:
    source centroids for inter-source similarity, label centroids for
    nearest-centroid classification, conversation embeddings from turn
    embeddings (feed the result to the cosine / dedup family — its
    ``vec_col`` contract is unchanged).

    Exactness contract (the ``lm_quality`` / ``exact_corr`` micro-unit
    rule): each element is fixed-pointed ONCE to ``micro`` units
    (``round(x * 1e6)`` — float32 inputs widen exactly, the product is
    the identical double on any engine, HALF_UP == half-away-from-zero
    for every sign), so the per-dimension accumulations are ORDER-FREE
    integer sums and the mean is one exact-integer IEEE division
    ``sum / (n * 1e6)`` — bit-identical regardless of row order,
    partitioning, or engine. A plain ``avg(double)`` would be
    summation-order dependent and only rounding-level comparable.

    Scale shape: ONE hash aggregate on the group key with ``dims``
    integer-sum expressions (map-side partial combine absorbs the
    corpus; only (group, dims x int64) partial rows shuffle — vectors
    never do), then row-local array assembly. NULL / empty / wrong-dims
    vectors are excluded (dims = the first valid row's length); NULL
    ELEMENTS contribute nothing to their dimension's sum while the row
    still counts (sum skips NULLs — both engines) — run
    :func:`vector_violations` first when that must be surfaced."""
    valid = df.filter(F.col(vec_col).isNotNull()
                      & (F.size(F.col(vec_col)) > 0))
    dims_row = valid.select(F.size(F.col(vec_col)).alias("d")).first()
    if dims_row is None:
        gtype = df.schema[group_col].dataType.simpleString()
        return arrow_local_df(
            df.sparkSession, [],
            f"{group_col} {gtype}, n_vectors bigint, "
            "embedding array<double>")
    dims = dims_row["d"]
    valid = valid.filter(F.size(F.col(vec_col)) == dims)
    sums = [
        F.sum(F.round(F.element_at(F.col(vec_col), i + 1).cast("double")
                      * micro).cast("bigint")).alias(f"__s{i}")
        for i in range(dims)
    ]
    agg = valid.groupBy(group_col).agg(
        *sums, F.count("*").alias("n_vectors"))
    mean_arr = F.array(*[
        F.col(f"__s{i}") / (F.col("n_vectors") * float(micro))
        for i in range(dims)])
    return (agg.select(group_col, "n_vectors",
                       mean_arr.alias("embedding"))
            .orderBy(group_col))


def dimension_profile(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    micro: int = 1_000_000,
    round_digits: int = 6,
) -> DataFrame:
    """Per-DIMENSION statistics of an embedding column —
    ``(dim, n, mean, std, n_zero, dead)`` ordered by dim — the encoder
    sanity check nothing else here runs: a dimension whose std is 0 (or
    whose values are all zero) is dead weight in every dot product, a
    constant-shifted dimension skews every centroid, and a dimension
    with 100× the others' variance dominates cosine — all three are
    encoder/export bugs that per-VECTOR hygiene
    (:func:`vector_violations`) cannot see.

    Exactness: the micro-unit contract — elements fixed-pointed once to
    ``micro`` units; per-dim ``sum`` is an order-free int64 sum and
    ``sum of squares`` an order-free DECIMAL(38,0) sum (squares reach
    1e12 per element — 128-bit headroom holds past 10^12 rows); mean is
    the exact-int division ``s/(n·1e6)``, std one fixed operation order
    over the same exact integers, rounded. ``n_zero`` counts elements
    that are zero AT the micro resolution (|x| < 0.5/micro), ``dead``
    flags all-zero dimensions.

    Scale shape: one ``posexplode`` (row-local fan-out ×dims) into ONE
    hash aggregate keyed on dim — map-side partials absorb the corpus,
    exactly ``dims`` groups survive the shuffle. NULL vectors skipped;
    NULL elements don't contribute to their dimension's n."""
    vals = (df.filter(F.col(vec_col).isNotNull())
              .select(F.posexplode(F.col(vec_col)).alias("dim", "_x"))
              .filter(F.col("_x").isNotNull()))
    m = F.round(F.col("_x").cast("double") * micro).cast("bigint")
    md = m.cast("decimal(19,0)")
    agg = (vals.select("dim", m.alias("_m"), (md * md).alias("_m2"))
               .groupBy("dim")
               .agg(F.count("_m").alias("n"),
                    F.sum("_m").alias("_s"),
                    F.sum("_m2").alias("_ss"),
                    F.sum((F.col("_m") == 0).cast("long"))
                     .alias("n_zero")))
    mean = F.col("_s") / (F.col("n") * float(micro))
    var = (F.col("_ss").cast("double") / F.col("n") / float(micro) ** 2
           - mean * mean)
    return (agg.select(
                "dim", "n",
                F.round(mean, round_digits).alias("mean"),
                F.round(F.sqrt(F.greatest(var, F.lit(0.0))),
                        round_digits).alias("std"),
                "n_zero",
                (F.col("n_zero") == F.col("n")).alias("dead"))
            .orderBy("dim"))


def centroid_classify(
    df: DataFrame,
    *,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    micro: int = 1_000_000,
) -> DataFrame:
    """Nearest-centroid classification (Rocchio) over the labeled slice's
    OWN centroids: every vector gets ``predicted_label`` = the label
    whose mean embedding it is most cosine-similar to, plus ``agrees``
    (predicted == own label; NULL-labeled vectors get a prediction and a
    NULL ``agrees`` — that's the label-propagation use). Output =
    ``(id, label, predicted_label, agrees)``.

    The cheap embedding-space label audit: aggregate disagreement rates
    per label expose systematically mislabeled slices (the per-vector
    sibling of :func:`label_outliers`, which needs the kNN graph; this
    needs only |labels| centroids and one corpus scan).

    Composition of proven shapes: :func:`mean_embedding_by` (order-free
    micro-sum centroids, NULL-labeled rows excluded from training) +
    :func:`assign_buckets` (broadcast argmax, ZERO shuffle, ties →
    lowest label). Zero-norm / NULL / wrong-dims vectors get NULL
    prediction."""
    cents = (mean_embedding_by(df.filter(F.col(label_col).isNotNull()),
                               label_col, vec_col=vec_col, micro=micro)
             .select(F.col(label_col).alias("centroid_id"),
                     F.col("embedding").alias("centroid")))
    assigned = assign_buckets(df, cents, id_col=id_col, vec_col=vec_col)
    return assigned.select(
        id_col, label_col,
        F.col("bucket_id").alias("predicted_label"),
        F.when(F.col("bucket_id").isNotNull(),
               F.col("bucket_id") == F.col(label_col))
         .alias("agrees"))


def group_centroid_similarity(
    df: DataFrame,
    group_col: str,
    *,
    vec_col: str = "embedding",
    micro: int = 1_000_000,
    round_digits: int = 6,
) -> DataFrame:
    """Pairwise cosine between per-group MEAN embeddings —
    ``(group_a, group_b, cos_sim, n_a, n_b)`` for ``group_a < group_b``
    — the semantic complement of :func:`..operators.decontam.
    source_overlap` (lexical shingles): two sources can share few exact
    n-grams yet be near-identical in embedding space (translations,
    paraphrase mirrors, re-renders), and the ingest-triage question
    "is src_A semantically a re-crawl of src_B" is answered here before
    any pair-level dedup spend.

    Exactness: centroids come from :func:`mean_embedding_by` (order-free
    integer micro sums, bit-identical cross-engine); the pairwise cosine
    is a DIMENSION-ORDERED driver fold over those exact doubles (the
    engine's standard fold contract), rounded at ``round_digits``.
    Scale shape: one corpus-absorbing mean aggregate (vectors never
    shuffle), then group-count² driver arithmetic — group cardinality is
    dashboard-sized by definition (sources, languages, labels). Groups
    with a zero-norm centroid emit NULL cosine; a NULL centroid element
    (the mean_embedding_by output for a dimension NULL in every row of
    the group) counts as 0.0 — that dimension contributes nothing."""
    import math

    rows = mean_embedding_by(df, group_col, vec_col=vec_col,
                             micro=micro).collect()
    spark = df.sparkSession
    gtype = df.schema[group_col].dataType.simpleString()
    schema = (f"group_a {gtype}, group_b {gtype}, cos_sim double, "
              "n_a bigint, n_b bigint")
    out = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            dot = la = lb = 0.0
            for x, y in zip(a["embedding"], b["embedding"]):  # ordered
                # mean_embedding_by emits a NULL element when a dimension
                # is NULL in every row of a group; treat it as 0.0 (the
                # dimension contributes nothing) instead of crashing
                x = 0.0 if x is None else x
                y = 0.0 if y is None else y
                dot += x * y
                la += x * x
                lb += y * y
            # sqrt(la)*sqrt(lb), NOT sqrt(la*lb) — the cosine-family
            # oracle convention (list_dot_product / (sqrt*sqrt))
            cos = (round(dot / (math.sqrt(la) * math.sqrt(lb)),
                         round_digits)
                   if la > 0 and lb > 0 else None)
            out.append((a[group_col], b[group_col], cos,
                        a["n_vectors"], b["n_vectors"]))
    return arrow_local_df(spark, out, schema)


def embedding_drift(df_a: DataFrame, df_b: DataFrame,
                    vec_col: str = "embedding", *,
                    round_digits: int = 6) -> DataFrame:
    """Embedding-space drift between two snapshots: cosine similarity of
    the two MEAN vectors plus the mean-L2-norm ratio — the cheap
    first-moment monitor for an embedding column (a cos_means dropping
    below ~0.99 or a norm_ratio drifting off 1.0 flags an encoder change
    or a population shift long before any ANN-quality regression).
    Returns one row ``(cos_means, norm_ratio, n_a, n_b)``.

    Scale shape: ONE codegen'd aggregate per side (``dims`` `avg`s of
    `element_at` plus a row-local ordered-fold norm — map-side combined,
    k×dims partial rows, no shuffle of vectors); 2×dims doubles reach
    the driver, where the cosine is an ordered fold (bit-stable).
    NULL/empty vectors are excluded on both sides."""
    import math

    def moments(df: DataFrame):
        df = df.filter(F.col(vec_col).isNotNull()
                       & (F.size(F.col(vec_col)) > 0))
        dims_row = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if dims_row is None:
            return None, 0.0, 0
        dims = dims_row["d"]
        norm = F.sqrt(F.aggregate(
            F.col(vec_col), F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double")))
        row = df.agg(
            *[F.avg(F.element_at(F.col(vec_col), i + 1).cast("double"))
              .alias(f"m{i}") for i in range(dims)],
            F.avg(norm).alias("mnorm"),
            F.count(F.lit(1)).alias("n")).collect()[0]
        return ([row[f"m{i}"] for i in range(dims)],
                float(row["mnorm"]), int(row["n"]))

    ma, na_norm, n_a = moments(df_a)
    mb, nb_norm, n_b = moments(df_b)
    spark = df_a.sparkSession
    if ma is None or mb is None or len(ma) != len(mb):
        return arrow_local_df(
            spark, [(None, None, n_a, n_b)],
            "cos_means double, norm_ratio double, n_a bigint, n_b bigint")
    dot = la = lb = 0.0
    for x, y in zip(ma, mb):        # ordered fold — bit-stable
        dot += x * y
        la += x * x
        lb += y * y
    cos = (dot / math.sqrt(la * lb)) if la > 0 and lb > 0 else None
    ratio = (nb_norm / na_norm) if na_norm > 0 else None
    r = round_digits
    return arrow_local_df(
        spark,
        [(None if cos is None else round(cos, r),
          None if ratio is None else round(ratio, r), n_a, n_b)],
        "cos_means double, norm_ratio double, n_a bigint, n_b bigint")


def knn_join(
    df: DataFrame,
    *,
    k: int = 5,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Bucketed kNN self-join: for EVERY vector, its ``k`` most-similar
    neighbors searched WITHIN its IVF bucket — the corpus-scale kNN
    graph that SemDeDup-style clustering, graph dedup, and
    quality-propagation consume. The approximation is the standard IVF
    one (neighbors outside the bucket are unseen; near-identical vectors
    co-bucket with overwhelming probability — same trade as
    :func:`cosine_dup_pairs_bucketed`, which is the thresholded sibling
    of this ranked operator).

    Output: ``(id_col, nbr_id, cos_sim, rank)`` with ``rank`` 1..k in
    ``(similarity DESC, nbr_id ASC)`` order — the id tie-break makes the
    graph unique cross-engine; non-finite similarities (zero vectors)
    are excluded, so a zero vector emits no edges and never appears as a
    neighbor.

    Scale shape: zero-shuffle centroid assignment (broadcast NumPy
    argmax), ONE bucket-keyed exchange, then a per-bucket NumPy kernel
    (same dimension-ordered accumulation as every other kernel in this
    module — similarities are bit-identical to the Column fold and to
    DuckDB's ordered ``list_dot_product``); candidate cost is
    sum(bucket^2), never |corpus|^2, and the emitted graph is at most
    k*|corpus| edges."""
    import numpy as np
    import pandas as pd

    if centroids is None:
        centroids = (df.orderBy(id_col).limit(n_centroids)
                     .select(F.col(id_col).alias("centroid_id"),
                             F.col(vec_col).alias("centroid")))
    bucketed = assign_buckets(df, centroids, id_col=id_col, vec_col=vec_col) \
        .select(F.col(id_col).cast("bigint").alias("_id"),
                F.col(vec_col).alias("_v"), "bucket_id") \
        .filter(F.col("bucket_id").isNotNull())

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["_id"].to_numpy(dtype="int64")
        mat = _stack_f64(pdf["_v"])
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"src": pd.Series([], dtype="int64"),
                                 "nbr": pd.Series([], dtype="int64"),
                                 "_sim": pd.Series([], dtype="float64"),
                                 "rank": pd.Series([], dtype="int32")})
        acc = np.zeros((n, n))
        nrm = np.zeros(n)
        for d in range(mat.shape[1]):      # dimension-ordered fold
            acc += np.outer(mat[:, d], mat[:, d])
            nrm += mat[:, d] * mat[:, d]
        nrm = np.sqrt(nrm)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = acc / np.outer(nrm, nrm)
        srcs, nbrs, vals, ranks = [], [], [], []
        for i in range(n):
            row = sims[i]
            finite = np.isfinite(row)
            finite[i] = False              # never self
            cand = np.nonzero(finite)[0]
            if len(cand) == 0:
                continue
            # (sim DESC, id ASC): lexsort keys are last-is-primary
            order = cand[np.lexsort((ids[cand], -row[cand]))][:k]
            srcs.extend([ids[i]] * len(order))
            nbrs.extend(ids[order])
            vals.extend(row[order])
            ranks.extend(range(1, len(order) + 1))
        return pd.DataFrame({"src": np.asarray(srcs, dtype="int64"),
                             "nbr": np.asarray(nbrs, dtype="int64"),
                             "_sim": np.asarray(vals, dtype="float64"),
                             "rank": np.asarray(ranks, dtype="int32")})

    out = bucketed.groupBy("bucket_id").applyInPandas(
        per_bucket, schema="src bigint, nbr bigint, _sim double, rank int")
    sim = F.round(F.col("_sim"), round_digits) if round_digits is not None \
        else F.col("_sim")
    return out.select(F.col("src").alias(id_col),
                      F.col("nbr").alias("nbr_id"),
                      sim.alias("cos_sim"), "rank")


def quality_propagate(
    scores: DataFrame,
    edges: DataFrame,
    *,
    alpha: float = 0.5,
    id_col: str = "vec_id",
    nbr_col: str = "nbr_id",
    sim_col: str = "cos_sim",
    score_col: str = "quality",
    round_digits: int = 6,
) -> DataFrame:
    """One smoothing step of quality propagation over the kNN graph —
    what :func:`knn_join`'s output is FOR in a curation pipeline: a
    document surrounded by high-quality near-neighbors is probably
    better than its own noisy heuristic score says (and vice versa), so
    ``smoothed = (1-alpha)*q_i + alpha * sum(w_ij*q_j)/sum(w_ij)`` with
    ``w = max(sim, 0)`` (negative similarities carry no vote). Nodes
    with no edges — or only non-positive-weight ones — keep their own
    score; every input doc appears exactly once:
    ``(id_col, score_col, smoothed_quality, n_nbrs)``.

    Cross-engine determinism: floating sums are order-dependent, so the
    weighted sum is computed in EXACT integer micro-units — scores and
    similarities are 6-dp-rounded doubles, so ``round(x*1e6)`` is an
    exact int64 in any engine, the aggregate is an integer sum (k
    neighbors x 1e12 max per term — no overflow), and the only float
    ops are one division and the final affine+round. The same recipe as
    lm_quality's logp_micro.

    Scale shape: edges are ≤ k·|corpus| skinny rows; ONE equi-join
    attaches neighbor scores (id-keyed, AQE-planned), ONE src-keyed hash
    aggregate with map-side combine, then an id-grain left join back to
    the scores table — embeddings/text never move."""
    qmic = F.round(F.col(score_col) * 1e6).cast("bigint")
    wmic = F.greatest(F.round(F.col(sim_col) * 1e6).cast("bigint"),
                      F.lit(0).cast("bigint"))
    nbr_q = scores.select(F.col(id_col).alias(nbr_col),
                          qmic.alias("_nq"))
    agg = (edges.select(id_col, nbr_col, wmic.alias("_w"))
                .join(nbr_q, nbr_col)
                .groupBy(id_col)
                .agg(F.sum(F.col("_w") * F.col("_nq")).alias("_num"),
                     F.sum("_w").alias("_den"),
                     F.count("*").alias("n_nbrs")))
    base = scores.select(id_col, score_col, qmic.alias("_q"))
    joined = base.join(agg, id_col, "left")
    own = F.col("_q").cast("double") / 1e6
    nbr_avg = (F.col("_num").cast("double")
               / (F.col("_den").cast("double") * 1e6))
    smoothed = F.when(
        F.col("_den").isNull() | (F.col("_den") == 0), own
    ).otherwise(F.lit(1.0 - alpha) * own + F.lit(float(alpha)) * nbr_avg)
    return joined.select(
        id_col, score_col,
        F.round(smoothed, round_digits).alias("smoothed_quality"),
        F.coalesce(F.col("n_nbrs"), F.lit(0)).alias("n_nbrs"))


def label_outliers(
    labels: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "vec_id",
    nbr_col: str = "nbr_id",
    label_col: str = "label",
    min_nbrs: int = 3,
) -> DataFrame:
    """Label-noise detection by kNN neighborhood disagreement — the
    classic embedding-space data-cleaning pass (Confident-Learning-style
    without the model): a point whose neighbors overwhelmingly carry a
    DIFFERENT label is probably mislabeled, duplicated into the wrong
    class, or sits on a corrupt embedding. One row per input doc:
    ``(id_col, label_col, majority_label, n_nbrs, n_agree, is_outlier)``
    where ``majority_label`` is the most common neighbor label (ties →
    smallest label, so the verdict is total-order deterministic) and
    ``is_outlier`` fires when the majority disagrees with the doc's own
    label AND the doc has at least ``min_nbrs`` neighbors (no verdict
    off a 1-neighbor sample; under-connected docs report false).

    Scale shape: two id-keyed equi-joins attach own/neighbor labels to
    the ≤ k·n edge list (skinny, AQE-planned), one (id, label) count
    aggregate, then the one-aggregate min-struct argmax (same shape as
    canonical_docs — no window over the corpus), and an id-grain left
    join back so unconnected docs appear. Labels/ids only — embeddings
    never move."""
    own = labels.select(F.col(id_col), F.col(label_col))
    nbr_lab = labels.select(F.col(id_col).alias(nbr_col),
                            F.col(label_col).alias("_nl"))
    e = (edges.select(id_col, nbr_col)
              .join(nbr_lab, nbr_col)
              .join(own.withColumnRenamed(label_col, "_ol"), id_col))
    cnt = (e.groupBy(id_col, "_nl")
            .agg(F.count("*").alias("_c"),
                 F.sum((F.col("_nl").eqNullSafe(F.col("_ol")))
                       .cast("bigint")).alias("_a")))
    agg = (cnt.groupBy(id_col)
              .agg(F.min(F.struct((-F.col("_c")).alias("nc"),
                                  F.col("_nl").alias("l"))).alias("_m"),
                   F.sum("_c").alias("n_nbrs"),
                   F.sum("_a").alias("n_agree")))
    out = own.join(agg, id_col, "left")
    maj = F.col("_m").getField("l")
    return out.select(
        id_col, label_col,
        maj.alias("majority_label"),
        F.coalesce(F.col("n_nbrs"), F.lit(0)).alias("n_nbrs"),
        F.coalesce(F.col("n_agree"), F.lit(0)).alias("n_agree"),
        F.when((F.col("n_nbrs") >= min_nbrs)
               & ~maj.eqNullSafe(F.col(label_col)), F.lit(True))
         .otherwise(F.lit(False)).alias("is_outlier"),
    )


def ivf_recall(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Recall@k of the IVF ANN path against exact brute force — the
    evaluation OPERATOR the tuning loop needs (tests gate a fixed floor;
    an index owner retunes ``n_centroids``/``nprobe`` per corpus and
    wants the measurement as a query): one row,
    ``(n_queries, k, n_exact, n_hits, recall)`` with recall =
    |approx ∩ exact| / |exact| over the whole query set.

    With deterministic centroids both sides are totally ordered, so the
    measurement itself is exactly reproducible cross-engine — the
    "approximate" path's QUALITY becomes an oracle-checkable number.

    Scale shape: the two operators keep their own shapes (broadcast
    queries; bucketed probe); the intersection is an equi-join of two
    ≤ k·|queries| edge lists and one scalar aggregate."""
    approx = ivf_topk(corpus, queries, k=k, n_centroids=n_centroids,
                      nprobe=nprobe, id_col=id_col, vec_col=vec_col,
                      centroids=centroids).select("query_id",
                                                  "neighbor_id")
    exact = cosine_topk(corpus, queries, k=k, id_col=id_col,
                        vec_col=vec_col).select("query_id", "neighbor_id")
    hits = approx.join(exact, ["query_id", "neighbor_id"], "left_semi")
    stats = exact.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count("*").alias("n_exact"))
    nh = hits.agg(F.count("*").alias("n_hits"))
    return (stats.join(F.broadcast(nh))
            .select("n_queries", F.lit(k).alias("k"), "n_exact", "n_hits",
                    F.round(F.col("n_hits")
                            / F.col("n_exact").cast("double"),
                            round_digits).alias("recall")))


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search") — the memory lever past int8: split each
# d-dim vector into m subspaces, quantize each sub-vector to one of k
# per-subspace centroids, store m small codes (d=64, m=4, k=16 → 4
# bytes/vector, 64x under float32). Search uses asymmetric distance
# computation (ADC): the query stays float, each subspace contributes a
# looked-up partial dot, so ranking quality degrades gracefully while
# the corpus scan reads only codes.
# ---------------------------------------------------------------------------

def _pq_valid(df: DataFrame, id_col: str, vec_col: str):
    return df.filter(F.col(vec_col).isNotNull()
                     & (F.size(F.col(vec_col)) > 0))


def pq_codebook(corpus: DataFrame, *, m: int = 4, n_centroids: int = 16,
                id_col: str = "vec_id", vec_col: str = "embedding",
                iters: int = 0, sample_n: int = 2048) -> list:
    """Train/derive the PQ codebook: ``m x n_centroids x (d/m)`` nested
    lists. Default (``iters=0``) is the engine's deterministic
    convention — per-subspace centroids are the sub-slices of the
    ``n_centroids`` LOWEST-ID valid vectors (exactly the untrained-IVF
    rule, so a SQL oracle re-derives the codebook from the data).
    ``iters>0`` runs per-subspace Lloyd in NumPy over the ``sample_n``
    lowest-id vectors (PQ codebooks train on bounded samples even for
    billion-vector indexes — the standard practice); the trained path
    is recall-gated in tests rather than value-oracled.

    Distance folds accumulate DIMENSION BY DIMENSION (the engine's
    cross-engine parity convention), so assignments are reproducible."""
    import numpy as np

    if m < 1 or n_centroids < 1:
        raise ValueError("m and n_centroids must be >= 1")
    head = (_pq_valid(corpus, id_col, vec_col)
            .orderBy(id_col)
            .limit(max(n_centroids, sample_n if iters > 0 else 0))
            .select(F.col(vec_col).cast("array<double>").alias("_v"))
            .collect())
    if len(head) < n_centroids:
        raise ValueError(
            f"corpus has {len(head)} valid vectors, need {n_centroids}")
    dims = len(head[0]["_v"])
    if dims % m != 0:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    dsub = dims // m
    mats = np.array([r["_v"] for r in head if len(r["_v"]) == dims],
                    dtype="float64")
    book = np.array([mats[:n_centroids, s * dsub:(s + 1) * dsub]
                     for s in range(m)])          # (m, k, dsub)
    if iters > 0:
        sample = mats[:sample_n]
        for _ in range(iters):
            for s in range(m):
                xs = sample[:, s * dsub:(s + 1) * dsub]
                dist = np.zeros((len(xs), n_centroids))
                for d in range(dsub):             # pinned fold order
                    diff = xs[:, d, None] - book[s][None, :, d]
                    dist += diff * diff
                code = np.argmin(dist, axis=1)    # first-min tie
                for c in range(n_centroids):
                    members = xs[code == c]
                    if len(members):
                        book[s][c] = members.mean(axis=0)
    return [[list(map(float, c)) for c in sub] for sub in book]


def pq_encode(corpus: DataFrame, codebook: list, *,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Encode each vector to its ``m`` per-subspace nearest-centroid
    codes — ``(id, codes array<int>)``. NULL / wrong-dimension vectors
    get NULL codes. ZERO shuffle: the codebook broadcasts, each Arrow
    batch computes its distances in NumPy with the dimension-by-
    dimension fold (ties -> lowest centroid index, the argmin
    first-occurrence rule the SQL oracle mirrors with a (dist, cid)
    lexicographic min)."""
    import numpy as np

    book = np.array(codebook, dtype="float64")    # (m, k, dsub)
    m, k, dsub = book.shape
    dims = m * dsub
    sc = corpus.sparkSession.sparkContext
    b_book = sc.broadcast(book)
    src = corpus.select(F.col(id_col).cast("bigint").alias(id_col),
                        F.col(vec_col).alias("_v"))

    def run(batches):
        import pandas as pd
        bk = b_book.value
        for pdf in batches:
            out: list = [None] * len(pdf)
            live = [i for i, v in enumerate(pdf["_v"])
                    if v is not None and len(v) == dims]
            if live:
                mat = np.array([pdf["_v"].iloc[i] for i in live],
                               dtype="float64")
                codes = np.zeros((len(live), m), dtype="int64")
                for s in range(m):
                    xs = mat[:, s * dsub:(s + 1) * dsub]
                    dist = np.zeros((len(xs), k))
                    for d in range(dsub):         # pinned fold order
                        diff = xs[:, d, None] - bk[s][None, :, d]
                        dist += diff * diff
                    codes[:, s] = np.argmin(dist, axis=1)
                for vi, i in enumerate(live):
                    out[i] = codes[vi].tolist()
            yield pd.DataFrame({id_col: pdf[id_col], "codes": out})

    return src.mapInPandas(run, schema=f"{id_col} bigint, codes array<int>")


def pq_topk(corpus: DataFrame, queries: DataFrame, *, k: int = 10,
            m: int = 4, n_centroids: int = 16, codebook: list | None = None,
            id_col: str = "vec_id", vec_col: str = "embedding",
            round_digits: int | None = 6) -> DataFrame:
    """PQ/ADC top-k: rank the encoded corpus for each float query by
    the asymmetric dot score ``sum_s dot(q_sub, centroid[s][code_s])``
    (use L2-normalized inputs for cosine semantics). Same output
    contract as :func:`cosine_topk`: ``(query_id, neighbor_id, rank,
    adc_sim)``; ranking recall vs the exact scan is gated in tests.

    Scale shape: ONE corpus encode pass (zero shuffle) + ONE code scan
    where each Arrow batch scores against the broadcast per-query
    lookup tables (m x k partial dots, computed once per query) and
    emits only its batch-local top-k superset — the final per-query
    window sees k x n_batches rows, never |corpus| (the quantized_topk
    pruning argument, margin sized to the rounding grain). Scores
    accumulate SUBSPACE BY SUBSPACE after dimension-by-dimension LUT
    folds, so the SQL oracle reproduces every value bit-for-bit."""
    import numpy as np

    book_l = codebook if codebook is not None else pq_codebook(
        corpus, m=m, n_centroids=n_centroids, id_col=id_col,
        vec_col=vec_col)
    book = np.array(book_l, dtype="float64")
    m_, kc, dsub = book.shape
    dims = m_ * dsub
    q_rows = [r for r in _pq_valid(queries, id_col, vec_col)
              .select(F.col(id_col).cast("bigint").alias(id_col),
                      F.col(vec_col).cast("array<double>").alias("_v"))
              .collect() if len(r["_v"]) == dims]
    if not q_rows:
        return arrow_local_df(
            corpus.sparkSession, [],
            "query_id bigint, neighbor_id bigint, rank int, adc_sim double")
    q_ids = np.array([r[id_col] for r in q_rows], dtype="int64")
    q_mat = np.array([r["_v"] for r in q_rows], dtype="float64")
    # per-query LUT: lut[q, s, c] = dot(q_sub, centroid) in dim order
    lut = np.zeros((len(q_ids), m_, kc))
    for s in range(m_):
        for d in range(dsub):                     # pinned fold order
            lut[:, s, :] += np.outer(q_mat[:, s * dsub + d],
                                     book[s][:, d])
    sc = corpus.sparkSession.sparkContext
    b_lut = sc.broadcast((q_ids, lut))
    margin = (1.01 * 10.0 ** -round_digits) if round_digits is not None \
        else 0.0
    enc = pq_encode(corpus, book_l, id_col=id_col, vec_col=vec_col)

    def score(batches):
        import pandas as pd
        ids_, lut_ = b_lut.value
        for pdf in batches:
            outs = {"query_id": [], "neighbor_id": [], "_sim": []}
            live = [i for i, cd in enumerate(pdf["codes"])
                    if cd is not None]
            if live:
                nids = pdf[id_col].to_numpy(dtype="int64")[live]
                codes = np.array([pdf["codes"].iloc[i] for i in live],
                                 dtype="int64")
                sims = np.zeros((len(live), len(ids_)))
                for s in range(m_):               # subspace order
                    sims += lut_[:, s, :][:, codes[:, s]].T
                for qi in range(len(ids_)):
                    col = sims[:, qi]
                    mask = nids != ids_[qi]
                    cand_ids, cand = nids[mask], col[mask]
                    order = np.lexsort((cand_ids, -cand))
                    if len(order) > k:
                        cut = cand[order[k - 1]] - margin
                        order = order[cand[order] >= cut]
                    outs["query_id"].extend([ids_[qi]] * len(order))
                    outs["neighbor_id"].extend(cand_ids[order].tolist())
                    outs["_sim"].extend(cand[order].tolist())
            yield pd.DataFrame(outs)

    scored = enc.mapInPandas(
        score, schema="query_id bigint, neighbor_id bigint, _sim double")
    sim = (F.round(F.col("_sim"), round_digits)
           if round_digits is not None else F.col("_sim"))
    scored = scored.select("query_id", "neighbor_id", sim.alias("adc_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank", "adc_sim"))


def pq_recall(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    m: int = 4,
    n_centroids: int = 16,
    codebook: list | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Recall@k of the PQ/ADC path against exact brute force — the
    :func:`ivf_recall` measurement for the compressed index (an index
    owner tunes ``m``/``n_centroids`` against THIS number: more
    subspaces = better recall, more bytes). Same one-row output
    contract ``(n_queries, k, n_exact, n_hits, recall)``; with the
    deterministic codebook the measurement is value-oracle-checkable.
    Shapes: each operator keeps its own (one code scan + window; one
    exact scan + window); the intersection is an equi-join of two
    ≤ k·|queries| edge lists."""
    approx = pq_topk(corpus, queries, k=k, m=m, n_centroids=n_centroids,
                     codebook=codebook, id_col=id_col,
                     vec_col=vec_col).select("query_id", "neighbor_id")
    exact = cosine_topk(corpus, queries, k=k, id_col=id_col,
                        vec_col=vec_col).select("query_id", "neighbor_id")
    hits = approx.join(exact, ["query_id", "neighbor_id"], "left_semi")
    stats = exact.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count("*").alias("n_exact"))
    nh = hits.agg(F.count("*").alias("n_hits"))
    return (stats.join(F.broadcast(nh))
            .select("n_queries", F.lit(k).alias("k"), "n_exact", "n_hits",
                    F.round(F.col("n_hits")
                            / F.col("n_exact").cast("double"),
                            round_digits).alias("recall")))


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, *, k: int = 10,
               m: int = 4, n_centroids: int = 16, nprobe: int = 4,
               codebook: list | None = None, by_residual: bool = False,
               id_col: str = "vec_id", vec_col: str = "embedding",
               round_digits: int | None = 6) -> DataFrame:
    """IVF+PQ — the FAISS-style production ANN index composed from the
    engine's two verified halves: coarse IVF routing (probe ``nprobe``
    of ``n_centroids`` cosine buckets) over a corpus stored as 4-byte
    PQ codes, scored by ADC lookup tables. The scan that serves top-k
    from ~64x less memory while touching ~nprobe/n_centroids of the
    corpus. ``by_residual=True`` is full FAISS IVFADC: the RESIDUAL
    ``v - centroid[bucket]`` is quantized instead of ``v`` (residuals
    are smaller and centered, so the same code budget buys more
    precision), and the score becomes ``dot(q, centroid) +
    sum_s lut_res[s][code_s]`` — the per-(query, bucket) dot is a
    driver-side constant. The deterministic residual codebook seeds
    from the residuals of the NEXT ``n_centroids`` lowest-id vectors
    (the centroid rows' own residuals are identically zero). Output
    contract = :func:`pq_topk`.

    Scale shape: ONE fused corpus pass (zero shuffle) computes bucket
    assignment AND PQ codes in the same Arrow/NumPy kernel (broadcast
    centroids + codebook; dimension-ordered folds, lowest-id
    tie-breaks — the cross-engine parity convention, so the full
    pipeline is value-oracled with deterministic inputs). Queries:
    probes + m x k LUTs computed once on the driver and broadcast.
    The code scan emits only batch-local top-k supersets per query; the
    final per-query window is the single exchange (plan-asserted)."""
    import numpy as np

    head = (_pq_valid(corpus, id_col, vec_col)
            .orderBy(id_col).limit(2 * n_centroids)
            .select(F.col(id_col).cast("bigint").alias("cid"),
                    F.col(vec_col).cast("array<double>").alias("cv"))
            .collect())
    cent_rows = head[:n_centroids]
    cids = np.array([r["cid"] for r in cent_rows], dtype="int64")
    cmat = np.array([r["cv"] for r in cent_rows], dtype="float64")
    dims = cmat.shape[1]
    cn = np.zeros(len(cids))
    for d in range(dims):                         # pinned fold order
        cn += cmat[:, d] * cmat[:, d]
    cn = np.sqrt(cn)
    if codebook is not None:
        book_l = codebook
    elif not by_residual:
        book_l = pq_codebook(corpus, m=m, n_centroids=n_centroids,
                             id_col=id_col, vec_col=vec_col)
    else:
        seed_rows = head[n_centroids:]
        if len(seed_rows) < n_centroids:
            raise ValueError(
                f"need {2 * n_centroids} valid vectors for a residual "
                f"codebook, corpus has {len(head)}")
        smat = np.array([r["cv"] for r in seed_rows], dtype="float64")
        sn = np.zeros(len(smat))
        sdots = np.zeros((len(smat), len(cids)))
        for d in range(dims):                     # pinned fold order
            sn += smat[:, d] * smat[:, d]
            sdots += np.outer(smat[:, d], cmat[:, d])
        with np.errstate(divide="ignore", invalid="ignore"):
            ssim = sdots / np.outer(np.sqrt(sn), cn)
        res = smat - cmat[np.argmax(ssim, axis=1)]
        dsub0 = dims // m
        book_l = [[list(map(float, res[c, s * dsub0:(s + 1) * dsub0]))
                   for c in range(n_centroids)] for s in range(m)]
    book = np.array(book_l, dtype="float64")
    m_, kc, dsub = book.shape
    if m_ * dsub != dims:
        raise ValueError(f"codebook dims {m_ * dsub} != corpus {dims}")

    q_rows = [r for r in _pq_valid(queries, id_col, vec_col)
              .select(F.col(id_col).cast("bigint").alias(id_col),
                      F.col(vec_col).cast("array<double>").alias("_v"))
              .collect() if len(r["_v"]) == dims]
    if not q_rows:
        return arrow_local_df(
            corpus.sparkSession, [],
            "query_id bigint, neighbor_id bigint, rank int, adc_sim double")
    q_ids = np.array([r[id_col] for r in q_rows], dtype="int64")
    q_mat = np.array([r["_v"] for r in q_rows], dtype="float64")
    qn = np.zeros(len(q_ids))
    for d in range(dims):
        qn += q_mat[:, d] * q_mat[:, d]
    qn = np.sqrt(qn)
    # probes: top-nprobe centroids by cosine, ties -> lowest cid;
    # the UNNORMALIZED qdot doubles as the residual-scoring constant
    qdot = np.zeros((len(q_ids), len(cids)))
    for d in range(dims):
        qdot += np.outer(q_mat[:, d], cmat[:, d])
    with np.errstate(divide="ignore", invalid="ignore"):
        qsim = qdot / np.outer(qn, cn)
    probes = {}
    for qi in range(len(q_ids)):
        order = np.lexsort((cids, -qsim[qi]))
        probes[int(q_ids[qi])] = set(
            int(c) for c in cids[order[:nprobe]])
    lut = np.zeros((len(q_ids), m_, kc))
    for s in range(m_):
        for d in range(dsub):
            lut[:, s, :] += np.outer(q_mat[:, s * dsub + d],
                                     book[s][:, d])
    sc = corpus.sparkSession.sparkContext
    b_all = sc.broadcast((cids, cmat, cn, book, q_ids, lut, probes,
                          qdot if by_residual else None))
    margin = (1.01 * 10.0 ** -round_digits) if round_digits is not None \
        else 0.0
    src = corpus.select(F.col(id_col).cast("bigint").alias(id_col),
                        F.col(vec_col).alias("_v"))

    def encode_score(batches):
        import pandas as pd
        cids_, cmat_, cn_, bk, qids_, lut_, probes_, qdot_ = b_all.value
        for pdf in batches:
            outs = {"query_id": [], "neighbor_id": [], "_sim": []}
            live = [i for i, v in enumerate(pdf["_v"])
                    if v is not None and len(v) == dims]
            if live:
                nids = pdf[id_col].to_numpy(dtype="int64")[live]
                mat = np.array([pdf["_v"].iloc[i] for i in live],
                               dtype="float64")
                vn = np.zeros(len(live))
                dots = np.zeros((len(live), len(cids_)))
                for d in range(dims):             # pinned fold order
                    vn += mat[:, d] * mat[:, d]
                    dots += np.outer(mat[:, d], cmat_[:, d])
                vn = np.sqrt(vn)
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims_c = dots / np.outer(vn, cn_)
                brow = np.argmax(sims_c, axis=1)
                bucket = cids_[brow]
                enc_mat = mat - cmat_[brow] if qdot_ is not None else mat
                codes = np.zeros((len(live), m_), dtype="int64")
                for s in range(m_):
                    xs = enc_mat[:, s * dsub:(s + 1) * dsub]
                    dist = np.zeros((len(xs), kc))
                    for d in range(dsub):
                        diff = xs[:, d, None] - bk[s][None, :, d]
                        dist += diff * diff
                    codes[:, s] = np.argmin(dist, axis=1)
                # residual ADC starts from the per-(query, bucket)
                # dot(q, centroid) constant, then adds the LUT partials
                # in subspace order (non-residual starts at zero)
                adc = (qdot_[:, brow].T.copy() if qdot_ is not None
                       else np.zeros((len(live), len(qids_))))
                for s in range(m_):               # subspace order
                    adc += lut_[:, s, :][:, codes[:, s]].T
                for qi in range(len(qids_)):
                    pset = probes_[int(qids_[qi])]
                    mask = np.array(
                        [b in pset and n != qids_[qi]
                         for b, n in zip(bucket, nids)])
                    if not mask.any():
                        continue
                    cand_ids, cand = nids[mask], adc[mask, qi]
                    order = np.lexsort((cand_ids, -cand))
                    if len(order) > k:
                        cut = cand[order[k - 1]] - margin
                        order = order[cand[order] >= cut]
                    outs["query_id"].extend([qids_[qi]] * len(order))
                    outs["neighbor_id"].extend(cand_ids[order].tolist())
                    outs["_sim"].extend(cand[order].tolist())
            yield pd.DataFrame(outs)

    scored = src.mapInPandas(
        encode_score,
        schema="query_id bigint, neighbor_id bigint, _sim double")
    sim = (F.round(F.col("_sim"), round_digits)
           if round_digits is not None else F.col("_sim"))
    scored = scored.select("query_id", "neighbor_id", sim.alias("adc_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank", "adc_sim"))
