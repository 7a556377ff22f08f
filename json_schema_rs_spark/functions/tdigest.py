"""A small merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
Quantiles Using t-Digests", arXiv:1902.04023) for distribution sketching.

Used by the drift checks (:mod:`..operators.stats`): each partition builds
one digest over its values (vectorized NumPy), the tiny per-partition
digests are merged on the driver (sketch merge is associative), and the
two-sample KS statistic is evaluated on the merged digests. This is the
scale path — exact ECDF needs a global sort; digests need one narrow pass.
"""

from __future__ import annotations

import math
from typing import Iterable, Optional

import numpy as np


class TDigest:
    """Merging t-digest with the k1 scale function."""

    __slots__ = ("compression", "means", "weights", "_buf_m", "_buf_w",
                 "min", "max")

    def __init__(self, compression: float = 200.0) -> None:
        self.compression = compression
        self.means = np.empty(0)
        self.weights = np.empty(0)
        self._buf_m: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []
        self.min = math.inf
        self.max = -math.inf

    # -- construction -----------------------------------------------------

    def add(self, values: np.ndarray, weights: Optional[np.ndarray] = None) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        self.min = min(self.min, float(values.min()))
        self.max = max(self.max, float(values.max()))
        self._buf_m.append(values)
        self._buf_w.append(np.ones_like(values) if weights is None
                           else np.asarray(weights, dtype=np.float64))
        if sum(m.size for m in self._buf_m) > 8 * self.compression:
            self._compress()

    def _compress(self) -> None:
        if not self._buf_m and self.means.size <= self.compression:
            return
        m = np.concatenate([self.means] + self._buf_m) if self._buf_m else self.means
        w = np.concatenate([self.weights] + self._buf_w) if self._buf_w else self.weights
        self._buf_m, self._buf_w = [], []
        if m.size == 0:
            return
        order = np.argsort(m, kind="mergesort")
        m, w = m[order], w[order]
        total = w.sum()
        d = self.compression
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = m[0], w[0]
        q0 = 0.0
        for i in range(1, m.size):
            q = (q0 + cur_w + w[i]) / total
            # k1 scale: cluster may absorb while k(q) - k(q0) <= 1
            if _k1(q, d) - _k1(q0 / total, d) <= 1.0:
                cur_m = (cur_m * cur_w + m[i] * w[i]) / (cur_w + w[i])
                cur_w += w[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q0 += cur_w
                cur_m, cur_w = m[i], w[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    # -- merge ------------------------------------------------------------

    def merge(self, other: "TDigest") -> "TDigest":
        self._compress()
        other._compress()
        out = TDigest(max(self.compression, other.compression))
        out.min = min(self.min, other.min)
        out.max = max(self.max, other.max)
        if self.means.size or other.means.size:
            out._buf_m = [self.means, other.means]
            out._buf_w = [self.weights, other.weights]
            out._compress()
        return out

    @classmethod
    def merge_all(cls, digests: Iterable["TDigest"],
                  compression: float = 200.0) -> "TDigest":
        out = cls(compression)
        ms, ws = [], []
        for d in digests:
            d._compress()
            if d.means.size:
                ms.append(d.means)
                ws.append(d.weights)
            out.min = min(out.min, d.min)
            out.max = max(out.max, d.max)
        if ms:
            out._buf_m, out._buf_w = ms, ws
            out._compress()
        return out

    # -- queries ----------------------------------------------------------

    @property
    def total_weight(self) -> float:
        self._compress()
        return float(self.weights.sum()) if self.weights.size else 0.0

    def cdf(self, x: float) -> float:
        """P(X <= x) with linear interpolation between centroids."""
        self._compress()
        m, w = self.means, self.weights
        if m.size == 0:
            return math.nan
        total = w.sum()
        if x < self.min:
            return 0.0
        if x >= self.max:
            return 1.0
        cum = np.cumsum(w) - w / 2.0  # centroid midpoints in cumulative mass
        idx = np.searchsorted(m, x)
        if idx == 0:
            # between min and first centroid
            frac = (x - self.min) / (m[0] - self.min) if m[0] > self.min else 1.0
            return float(frac * cum[0] / total)
        if idx == m.size:
            frac = (x - m[-1]) / (self.max - m[-1]) if self.max > m[-1] else 1.0
            return float((cum[-1] + frac * (total - cum[-1])) / total)
        lo_m, hi_m = m[idx - 1], m[idx]
        lo_c, hi_c = cum[idx - 1], cum[idx]
        frac = (x - lo_m) / (hi_m - lo_m) if hi_m > lo_m else 0.0
        return float((lo_c + frac * (hi_c - lo_c)) / total)

    def quantile(self, q: float) -> float:
        self._compress()
        m, w = self.means, self.weights
        if m.size == 0:
            return math.nan
        total = w.sum()
        target = q * total
        cum = np.cumsum(w) - w / 2.0
        if target <= cum[0]:
            return float(self.min + (target / cum[0]) * (m[0] - self.min)
                         if cum[0] > 0 else self.min)
        if target >= cum[-1]:
            rem = total - cum[-1]
            return float(m[-1] + ((target - cum[-1]) / rem) * (self.max - m[-1])
                         if rem > 0 else self.max)
        idx = int(np.searchsorted(cum, target))
        lo_c, hi_c = cum[idx - 1], cum[idx]
        frac = (target - lo_c) / (hi_c - lo_c) if hi_c > lo_c else 0.0
        return float(m[idx - 1] + frac * (m[idx] - m[idx - 1]))

    # -- serialization (for shipping per-partition digests) ---------------

    def to_arrays(self) -> tuple[list[float], list[float], float, float]:
        self._compress()
        return (self.means.tolist(), self.weights.tolist(),
                self.min, self.max)

    @classmethod
    def from_arrays(cls, means: list[float], weights: list[float],
                    mn: float, mx: float,
                    compression: float = 200.0) -> "TDigest":
        d = cls(compression)
        d.means = np.asarray(means, dtype=np.float64)
        d.weights = np.asarray(weights, dtype=np.float64)
        d.min, d.max = mn, mx
        return d


def _k1(q: float, d: float) -> float:
    q = min(max(q, 0.0), 1.0)
    return (d / (2.0 * math.pi)) * math.asin(2.0 * q - 1.0)


def ks_from_digests(a: TDigest, b: TDigest) -> float:
    """Two-sample Kolmogorov-Smirnov statistic D = sup |F_a - F_b|,
    evaluated at both digests' centroid locations (where the ECDFs bend)."""
    xs = np.unique(np.concatenate([
        a.means, b.means,
        np.asarray([a.min, a.max, b.min, b.max], dtype=np.float64),
    ]))
    xs = xs[np.isfinite(xs)]
    if xs.size == 0:
        return math.nan
    return float(max(abs(a.cdf(float(x)) - b.cdf(float(x))) for x in xs))


def w1_from_digests(a: TDigest, b: TDigest) -> float:
    """Wasserstein-1 distance W1 = integral |F_a(x) - F_b(x)| dx,
    approximated on the merged centroid grid (trapezoid on |F_a - F_b|,
    which is piecewise-linear between centroids under the digests' own
    interpolation) — the 100 TB path matching :func:`ks_from_digests`:
    O(compression) driver work, no global sort."""
    xs = np.unique(np.concatenate([
        a.means, b.means,
        np.asarray([a.min, a.max, b.min, b.max], dtype=np.float64),
    ]))
    xs = xs[np.isfinite(xs)]
    if xs.size == 0:
        return math.nan
    if xs.size == 1:
        return 0.0
    d = np.asarray([abs(a.cdf(float(x)) - b.cdf(float(x))) for x in xs])
    return float(np.trapz(d, xs))
