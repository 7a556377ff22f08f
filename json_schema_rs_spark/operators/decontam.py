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
from .dedup import _spread, shingle_hashes


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
