"""Fused corpus-preparation pipeline: normalize -> quality gate ->
exact dedup -> benchmark decontamination, composed from the §2.8
operators into ONE job with the minimum shuffle set.

The reference validates one instance at a time (`validator/mod.rs:63`);
corpus preparation is an engine extension (SURVEY §2.8) — but it follows
the same compile-once / run-vectorized design: every row-local stage is
a whole-stage-codegen expression, and cross-row work (dedup, the
benchmark probe) moves only skinny keys.

Scale shape (the thing to audit at 100 TB):

* Stage A — row-local, zero shuffle: C0-strip + whitespace-collapse
  normalization, char/token counts, and the quality formula all fuse
  into one codegen projection over the scan; the quality gate filters
  BEFORE any exchange, so low-quality text never crosses the wire.
* Stage B — exact dedup: ``groupBy(md5(text_norm))`` with map-side
  partial aggregation (16-byte keys + min-id payload), then a left-semi
  join of the survivor ids back onto the gated rows. This is the single
  place the pipeline shuffles anything proportional to the corpus, and
  it is inherent to exact dedup.
* Stage C — decontamination: benchmark shingle hashes are distinct-
  aggregated and BROADCAST (eval sets are small by construction); the
  corpus side explodes its shingles map-side, only matching
  ``(id, count)`` rows shuffle, and the final drop is a broadcast
  anti join. The corpus never shuffles for this stage.

Ordering is deliberate: gate (cheapest, biggest reduction) -> dedup
(shrinks the decontamination probe) -> decontaminate. Both sides of the
decontamination shingle the NORMALIZED text, so byte-level noise can't
hide eval overlap — the same reason dedup runs post-normalization.

Scan-count trade-off (audited, kept as-is): with duplicate rate ``d``,
this order reads gated text twice (dedup hash + semi-join payload) and
the deduped ``(1-d)`` fraction once more for shingling — ~``2 + (1-d)``
text passes. Swapping decontamination before dedup would drop one pass
of the *deduped* set but shingle-explode the FULL gated set instead,
probing duplicate content ``1/(1-d)`` times over; shingle explode is
the most expensive per-row stage, so dedup-first wins whenever ``d`` is
non-trivial (always true of web-scale corpora). At 100 TB the extra
pass is a linear scan of already-columnar text; the avoided cost is a
multiplicative blow-up of the widest exchange input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .decontam import decontaminate
from .dedup import exact_dedup
from .textstats import normalize_text, quality_exprs

_TXT = "__pc_text"


def prep_corpus(
    df: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    n: int = 3,
    seed: int = 7,
    nfc: bool = False,
    lowercase: bool = False,
    round_digits: int = 6,
) -> DataFrame:
    """Surviving documents of the full preparation pipeline:
    ``(id_col, n_chars, ws_tokens, quality)`` — normalized, quality-gated
    at ``min_quality``, exact-deduplicated (min-id survivor per content
    digest), and cleared of any word-``n``-gram overlap with
    ``benchmark``.

    ``nfc=False`` (the default) keeps the whole row-local stage in pure
    JVM codegen; pass ``nfc=True`` for Unicode-normalizing corpora (adds
    the one Arrow pandas-UDF step of :func:`~.textstats.normalize_text`).
    """
    base = normalize_text(df, text_col, out_col=_TXT, nfc=nfc,
                          lowercase=lowercase)
    q = quality_exprs(_TXT)
    staged = base.select(
        F.col(id_col),
        F.col(_TXT),
        F.length(_TXT).alias("n_chars"),
        F.size(F.split(F.col(_TXT), " ")).alias("ws_tokens"),
        F.round(q["quality"], round_digits).alias("quality"),
    )
    # NULL text is unpreparable and must not ride through the gate:
    # `least` ignores NULL operands, so the quality formula scores a
    # NULL doc 1.0 (every band collapses to its cap) — filter explicitly
    gated = staged.filter(F.col(_TXT).isNotNull()
                          & (F.col("quality") >= F.lit(min_quality)))
    deduped = exact_dedup(gated, text_col=_TXT, id_col=id_col)
    bench = normalize_text(benchmark, text_col, out_col=_TXT, nfc=nfc,
                           lowercase=lowercase).select(id_col, _TXT)
    clean = decontaminate(deduped, bench, n=n, seed=seed, id_col=id_col,
                          text_col=_TXT, mode="drop")
    return clean.drop(_TXT)
