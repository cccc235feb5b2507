"""Minimal merging t-digest (Dunning & Ertl's merging variant) in pure
numpy — the quantile sketch behind the drift operator (SURVEY.md §2.4:
"per-partition quantile sketches merged treewise, KS/PSI driver-side").

Public algorithm per the t-digest paper ("Computing Extremely Accurate
Quantiles Using t-Digests", Dunning & Ertl, 2019). Implementation is
from scratch: centroids kept as parallel (mean, weight) arrays; adding
a batch = concatenate + sort + greedy re-compress under the k1 scale
function k(q) = (δ/2π)·asin(2q−1), whose unit-k bins bound centroid
size to O(n/δ) with finer resolution at the tails.

Design constraints that matter here:
- ``merge`` is associative enough for treewise reduction (estimates
  vary by < the sketch's own error regardless of merge order — tests
  assert quantile tolerance, never byte equality);
- fixed-size binary serialization so sketches travel as a BINARY
  column through shuffles;
- numpy-vectorized compress: no per-value Python in the hot loop
  beyond the centroid pass (centroid count ≤ ~2δ, independent of
  batch size).
"""

from __future__ import annotations

import math
import struct

import numpy as np

_HEADER = struct.Struct("<dqd")  # compression, centroid count, total weight


class TDigest:
    __slots__ = ("compression", "means", "weights")

    def __init__(self, compression: float = 200.0):
        self.compression = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    # --- core -----------------------------------------------------------

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum()) if self.weights.size else 0.0

    def add(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        w = (
            np.ones_like(values)
            if weights is None
            else np.asarray(weights, dtype=np.float64)
        )
        self.means = np.concatenate([self.means, values])
        self.weights = np.concatenate([self.weights, w])
        # re-compress lazily but bound memory: compress when the buffer
        # exceeds ~8x the centroid budget
        if self.means.size > 8 * self.compression:
            self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(max(self.compression, other.compression))
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        out._compress()
        return out

    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.compression / (2 * math.pi)) * np.arcsin(2 * q - 1)

    def _k_inv(self, k: np.ndarray) -> np.ndarray:
        return (np.sin(k * (2 * math.pi) / self.compression) + 1) / 2

    def _compress(self) -> None:
        if self.means.size == 0:
            return
        order = np.argsort(self.means, kind="stable")
        means = self.means[order]
        weights = self.weights[order]
        total = weights.sum()
        new_means: list[float] = []
        new_weights: list[float] = []
        # greedy left-to-right fill under the k1 scale function
        w_so_far = 0.0
        cur_mean = means[0]
        cur_w = weights[0]
        q0 = 0.0
        q_limit = float(self._k_inv(self._k(np.array([q0])) + 1.0)[0]) * total
        for i in range(1, means.size):
            proposed = w_so_far + cur_w + weights[i]
            if proposed <= q_limit:
                # absorb into current centroid (weighted mean)
                cur_mean = (cur_mean * cur_w + means[i] * weights[i]) / (
                    cur_w + weights[i]
                )
                cur_w += weights[i]
            else:
                new_means.append(cur_mean)
                new_weights.append(cur_w)
                w_so_far += cur_w
                q0 = w_so_far / total
                q_limit = (
                    float(self._k_inv(self._k(np.array([q0])) + 1.0)[0]) * total
                )
                cur_mean = means[i]
                cur_w = weights[i]
        new_means.append(cur_mean)
        new_weights.append(cur_w)
        self.means = np.asarray(new_means)
        self.weights = np.asarray(new_weights)

    # --- queries ----------------------------------------------------------

    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        total = self.weights.sum()
        # centroid midpoint cumulative positions
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * total
        return float(np.interp(target, cum, self.means))

    def quantiles(self, qs: np.ndarray) -> np.ndarray:
        self._compress()
        if self.means.size == 0:
            return np.full(len(qs), np.nan)
        if self.means.size == 1:
            return np.full(len(qs), self.means[0])
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2
        return np.interp(np.asarray(qs) * total, cum, self.means)

    def cdf(self, xs: np.ndarray) -> np.ndarray:
        self._compress()
        if self.means.size == 0:
            return np.full(len(xs), np.nan)
        total = self.weights.sum()
        cum = (np.cumsum(self.weights) - self.weights / 2) / total
        means = self.means
        if means.size == 1:
            return np.where(
                np.asarray(xs) < means[0], 0.0, 1.0
            ).astype(np.float64)
        # NOT np.interp: it precomputes slopes (f2-f1)/(x2-x1), and a
        # subnormal gap between adjacent centroid means overflows the
        # slope to inf — the cdf then clips to 1.0 mid-range and is no
        # longer monotone (hypothesis-found; pinned in
        # test_tdigest_cdf_monotone_after_merge). Interpolate with the
        # bounded ratio t = (x-x1)/(x2-x1) ∈ [0,1] instead: both
        # numerator and denominator share the same scale, so the
        # division cannot overflow, and t·(f2-f1) ≤ f2-f1 keeps every
        # segment inside its endpoints — monotone by construction.
        x = np.asarray(xs, dtype=np.float64)
        idx = np.clip(
            np.searchsorted(means, x, side="left"), 1, means.size - 1
        )
        x1, x2 = means[idx - 1], means[idx]
        f1, f2 = cum[idx - 1], cum[idx]
        denom = x2 - x1
        t = np.clip(
            np.divide(
                x - x1,
                np.where(denom > 0, denom, 1.0),
                out=np.zeros_like(x),
                where=denom > 0,
            ),
            0.0,
            1.0,
        )
        # duplicate-mean runs (denom == 0): snap to the right endpoint
        # when x has reached x2, matching searchsorted's step there
        t = np.where((denom <= 0) & (x >= x2), 1.0, t)
        return np.clip(f1 + t * (f2 - f1), 0.0, 1.0)

    # --- serialization ------------------------------------------------------

    def to_bytes(self) -> bytes:
        self._compress()
        n = self.means.size
        return (
            _HEADER.pack(self.compression, n, self.total_weight)
            + self.means.astype("<f8").tobytes()
            + self.weights.astype("<f8").tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        compression, n, _total = _HEADER.unpack_from(data, 0)
        td = cls(compression)
        off = _HEADER.size
        td.means = np.frombuffer(data, dtype="<f8", count=n, offset=off).copy()
        td.weights = np.frombuffer(
            data, dtype="<f8", count=n, offset=off + 8 * n
        ).copy()
        return td


def merge_all(digests: list[TDigest], compression: float = 200.0) -> TDigest:
    out = TDigest(compression)
    if not digests:
        return out
    out.means = np.concatenate([d.means for d in digests])
    out.weights = np.concatenate([d.weights for d in digests])
    out._compress()
    return out


# --- drift statistics (driver-side, numpy only) ---------------------------


def psi(
    baseline_quantiles: np.ndarray,
    current: TDigest,
    n_buckets: int = 10,
    eps: float = 1e-6,
) -> float:
    """Population Stability Index of ``current`` vs a baseline described
    by its quantile grid (equi-probability buckets from the baseline,
    so baseline proportions are uniform 1/n)."""
    qs = np.linspace(0, 1, n_buckets + 1)
    edges = np.interp(qs, np.linspace(0, 1, len(baseline_quantiles)),
                      baseline_quantiles)
    cur_cdf = current.cdf(edges)
    cur_p = np.clip(np.diff(cur_cdf), eps, None)
    cur_p = cur_p / cur_p.sum()
    base_p = np.full(n_buckets, 1.0 / n_buckets)
    return float(np.sum((cur_p - base_p) * np.log(cur_p / base_p)))


def ks(baseline_quantiles: np.ndarray, current: TDigest) -> float:
    """Kolmogorov–Smirnov distance sup|F_cur − F_base| evaluated on the
    baseline quantile grid (F_base(grid_i) = i/(m−1) by construction)."""
    m = len(baseline_quantiles)
    base_cdf = np.linspace(0, 1, m)
    cur_cdf = current.cdf(np.asarray(baseline_quantiles, dtype=np.float64))
    return float(np.nanmax(np.abs(cur_cdf - base_cdf)))
