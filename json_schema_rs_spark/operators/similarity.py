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

All dot products run JVM-side via ``zip_with`` + ``aggregate`` in double
precision (deterministic left-to-right fold — an oracle engine folding the
same arrays sequentially reproduces the bits). No per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


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


def cosine_dup_pairs_bucketed(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Scale path for embedding near-dup: IVF-assign every vector to its
    nearest centroid, then search pairs only WITHIN buckets — candidate
    cost drops from |corpus|² to Σ bucket². Near-identical vectors share
    a bucket with overwhelming probability at high thresholds, so recall
    loss concentrates on pairs near the threshold (trade documented; the
    exact operator above is the verifier)."""
    centroids = (df.orderBy(id_col).limit(n_centroids)
                 .select(F.col(id_col).alias("centroid_id"),
                         F.col(vec_col).alias("centroid")))
    bucketed = assign_buckets(df, centroids, id_col=id_col, vec_col=vec_col)
    a = bucketed.select("bucket_id", F.col(id_col).alias("doc_a"),
                        F.transform(F.col(vec_col),
                                    lambda x: x.cast("double")).alias("_va"),
                        _norm(F.col(vec_col)).alias("_na"))
    b = bucketed.select("bucket_id", F.col(id_col).alias("doc_b"),
                        F.transform(F.col(vec_col),
                                    lambda x: x.cast("double")).alias("_vb"),
                        _norm(F.col(vec_col)).alias("_nb"))
    sim = _cos(_dot_d(F.col("_va"), F.col("_vb")), F.col("_na") * F.col("_nb"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (a.join(b, "bucket_id")
             .filter(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b", sim.alias("cos_sim"))
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
    """IVF assignment: each corpus vector joins its nearest centroid
    (max cosine; ties → lowest centroid id). One broadcast join + one
    per-vector argmax — no shuffle of the corpus."""
    cen = centroids.select(F.col(centroid_id_col).alias("_cid"),
                           F.col(centroid_vec_col).alias("_cvec"))
    sim = _cos(_dot(F.col(vec_col), F.col("_cvec")),
                _norm(F.col(vec_col)) * _norm(F.col("_cvec")))
    scored = corpus.crossJoin(F.broadcast(cen)).select(
        "*", F.struct(sim.alias("_s"), (-F.col("_cid")).alias("_negid"),
                      F.col("_cid").alias("cid")).alias("_cand"))
    w = Window.partitionBy(id_col)
    best = scored.withColumn("_best", F.max("_cand").over(w)) \
                 .filter(F.col("_cand") == F.col("_best"))
    return best.select(corpus["*"], F.col("_cand.cid").alias("bucket_id"))


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
) -> DataFrame:
    """IVF-bucketed approximate top-k. Centroids are chosen
    deterministically (the ``n_centroids`` lowest-id corpus vectors —
    training-free; swap in k-means outputs at production scale). Queries
    probe their ``nprobe`` most-similar buckets; exact cosine runs only
    inside probed buckets."""
    centroids = (corpus.orderBy(id_col).limit(n_centroids)
                 .select(F.col(id_col).alias("centroid_id"),
                         F.col(vec_col).alias("centroid")))
    bucketed = assign_buckets(corpus, centroids, id_col=id_col, vec_col=vec_col)
    probes = (
        cosine_topk(
            centroids.select(F.col("centroid_id").alias(id_col),
                             F.col("centroid").alias(vec_col)),
            queries, k=nprobe, id_col=id_col, vec_col=vec_col,
            round_digits=None, exclude_self=False)
        .select("query_id", F.col("neighbor_id").alias("bucket_id"))
    )
    # union in each query's own bucket (its nearest centroid may be itself)
    q = _prep(queries, id_col, vec_col, "query_id", "_qv", "_qn")
    cand = (bucketed.join(F.broadcast(probes), "bucket_id")
                    .join(F.broadcast(q), "query_id")
                    .filter(F.col("query_id") != F.col(id_col)))
    sim = _cos(_dot(F.col("_qv"), F.col(vec_col)),
               F.col("_qn") * _norm(F.col(vec_col)))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = cand.select("query_id", F.col(id_col).alias("neighbor_id"),
                         sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank", "cos_sim"))
