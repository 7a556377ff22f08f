"""Streaming distribution-drift monitor: per-event-time-window categorical
drift (Jensen-Shannon + chi-square) against a fixed baseline distribution.

Batch drift (``operators/stats.py``) compares two table samples; on a live
transcript stream the question becomes "is the last window's role/tool/
event-type mix still the training mix?". This module answers it with ONE
stateful windowed aggregation:

- The baseline is a driver-side ``{category: probability}`` dict, so the
  per-window category counts compile to conditional sums over the KNOWN
  category set — one ``groupBy(window(ts))`` aggregate, no pivot, no
  second stateful operator, no extra shuffle. Categories outside the
  baseline land in an ``other_count`` bucket (they contribute to drift as
  mass missing from the baseline categories, and are reported).
- JS / chi-square are closed-form expressions over those count columns,
  evaluated in the same select — whole-stage codegen after the window
  aggregate.
- Watermark + append mode: each window emits once, when the watermark
  passes its end. Late rows within the watermark are exact.

Statistic conventions match the batch operators: JS in natural log
(bounded by ln 2), chi-square vs expected counts ``n * q_i`` over the
baseline categories with ``q_i > 0``.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def categorical_drift_stream(
    stream_df: DataFrame,
    column: str,
    baseline: Mapping[str, float],
    *,
    ts_col: str = "ts",
    window: str = "5 minutes",
    slide: Optional[str] = None,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Per-window categorical drift of ``column`` vs ``baseline``.

    ``baseline`` maps category -> weight (normalized internally). Returns
    a streaming DataFrame ``(window_start, window_end, n bigint,
    other_count bigint, js double, chi2 double)``; attach any alert
    threshold with a plain ``filter`` downstream.
    """
    if not baseline:
        raise ValueError("categorical_drift_stream: empty baseline")
    total_w = float(sum(baseline.values()))
    if total_w <= 0:
        raise ValueError("categorical_drift_stream: baseline weights must "
                         "sum to a positive value")
    q = {c: w / total_w for c, w in baseline.items()}
    cats = sorted(q)

    # Spark watermarks require TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_
    # TYPE); parquet/Iceberg tables routinely carry TIMESTAMP_NTZ. The
    # cast interprets NTZ values in the session timezone — pin
    # spark.sql.session.timeZone (UTC in this engine's tests/bench) for
    # stable window boundaries.
    if dict(stream_df.dtypes).get(ts_col) == "timestamp_ntz":
        stream_df = stream_df.withColumn(
            ts_col, F.col(ts_col).cast("timestamp"))

    win = (F.window(ts_col, window, slide) if slide
           else F.window(ts_col, window))
    count_cols = [
        F.sum(F.when(F.col(column) == c, F.lit(1)).otherwise(F.lit(0)))
         .alias(f"_c{i}")
        for i, c in enumerate(cats)
    ]
    agg = (stream_df
           .withWatermark(ts_col, watermark_delay)
           .groupBy(win.alias("_w"))
           .agg(F.count(F.lit(1)).alias("n"), *count_cols))

    n = F.col("n").cast("double")
    in_baseline = sum((F.col(f"_c{i}") for i in range(len(cats))),
                      F.lit(0).cast("bigint"))
    # JS(p, q) with p = window proportions (incl. an implicit "other"
    # slice at q=0), q = baseline. Zero-count terms contribute 0.
    js_terms = []
    for i, c in enumerate(cats):
        p_i = F.col(f"_c{i}").cast("double") / n
        q_i = F.lit(q[c])
        m_i = (p_i + q_i) / F.lit(2.0)
        js_terms.append(
            F.when(F.col(f"_c{i}") > 0, p_i * F.log(p_i / m_i))
             .otherwise(F.lit(0.0))
            # q_i > 0 always (baseline categories), m_i > 0 likewise
            + q_i * F.log(q_i / m_i))
    # the "other" mass appears only on the p side: q=0 -> m = p/2 ->
    # the p-side KL term is p * ln(p / (p/2)) = p * ln 2, q-side is 0
    p_other = (n - in_baseline.cast("double")) / n
    js_terms.append(
        F.when(p_other > 0, p_other * F.log(F.lit(2.0)))
         .otherwise(F.lit(0.0)))
    js = sum(js_terms[1:], js_terms[0]) / F.lit(2.0)

    chi2_terms = []
    for i, c in enumerate(cats):
        e_i = n * F.lit(q[c])
        d = F.col(f"_c{i}").cast("double") - e_i
        chi2_terms.append(d * d / e_i)
    chi2 = sum(chi2_terms[1:], chi2_terms[0])

    return agg.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        F.col("n").cast("bigint").alias("n"),
        (F.col("n") - in_baseline).cast("bigint").alias("other_count"),
        js.alias("js"),
        chi2.alias("chi2"),
    )


def numeric_drift_stream(
    stream_df: DataFrame,
    column: str,
    baseline_props: Mapping[int, float],
    *,
    lo: float,
    hi: float,
    nbins: int = 10,
    eps: float = 1e-6,
    ts_col: str = "ts",
    window: str = "5 minutes",
    slide: Optional[str] = None,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Per-window PSI of a numeric column vs a baseline binned on the
    same fixed equal-width grid — the streaming form of
    :func:`..operators.stats.psi` (same bin arithmetic: caller-fixed
    ``[lo, hi)`` range, out-of-range clamps to edge bins, zero-proportion
    bins substitute ``eps``).

    ``baseline_props`` maps bin id (0..nbins-1) -> baseline proportion
    (missing bins are 0, i.e. ``eps`` after substitution); compute it
    once from the training snapshot with the batch ``psi`` machinery or
    a plain binned groupBy. Same execution shape as
    :func:`categorical_drift_stream`: ONE watermarked window aggregate
    whose per-bin counts are conditional sums, PSI a closed-form
    expression over them. NULL values are excluded from every bin but
    ride along as ``null_count``. Returns ``(window_start, window_end,
    n bigint, null_count bigint, psi double)``.
    """
    if nbins <= 0 or not (hi > lo):
        raise ValueError("numeric_drift_stream: need nbins > 0, hi > lo")
    step = (float(hi) - float(lo)) / nbins
    q = [max(float(baseline_props.get(i, 0.0)), eps) for i in range(nbins)]

    if dict(stream_df.dtypes).get(ts_col) == "timestamp_ntz":
        stream_df = stream_df.withColumn(
            ts_col, F.col(ts_col).cast("timestamp"))

    v = F.col(column).cast("double")
    raw = F.floor((v - F.lit(float(lo))) / F.lit(step)).cast("int")
    b = F.when(v.isNotNull(),
               F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1)))
    win = (F.window(ts_col, window, slide) if slide
           else F.window(ts_col, window))
    agg = (stream_df
           .withWatermark(ts_col, watermark_delay)
           .groupBy(win.alias("_w"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.count(column).alias("_nn"),
                *[F.sum(F.when(b == i, F.lit(1)).otherwise(F.lit(0)))
                   .alias(f"_b{i}") for i in range(nbins)]))
    nn = F.col("_nn").cast("double")
    terms = []
    for i in range(nbins):
        p_i = F.greatest(F.col(f"_b{i}").cast("double") / nn, F.lit(eps))
        q_i = F.lit(q[i])
        terms.append((p_i - q_i) * F.log(p_i / q_i))
    psi_expr = sum(terms[1:], terms[0])
    return agg.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        F.col("n").cast("bigint").alias("n"),
        (F.col("n") - F.col("_nn")).cast("bigint").alias("null_count"),
        F.when(F.col("_nn") > 0, psi_expr).alias("psi"),
    )
