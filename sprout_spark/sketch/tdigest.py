"""t-digest (Dunning & Ertl) — mergeable quantile sketch.

No counterpart in the reference (north-rule addition; SURVEY.md §2.3).
This is the *merging* variant with fixed-boundary binning so the compress
step is fully vectorized (sort + cumsum + reduceat — no per-centroid
Python loop): after sorting incoming (centroid ∪ batch) points by mean,
each item is assigned to bin ``floor(delta * K(q_mid))`` where
``K(q) = asin(2q-1)/pi + 1/2`` is the usual k1 scale function normalized
to [0, 1]; consecutive items in a bin collapse into one weighted centroid.
The k1 scale makes tail bins tiny, giving the characteristic q(1-q)
accuracy profile.

Merge = concatenate centroid lists + recompress. Associative only up to
floating-point binning (estimates agree to within the digest's accuracy,
not bit-for-bit) — the statistical tests assert the rank-error bound, the
bitwise merge-law tests live with Bloom/HLL/CMS.
"""

from __future__ import annotations

import math

import numpy as np

from .base import MergeableSketch, register


@register
class TDigest(MergeableSketch):
    TYPE = "tdigest"

    def __init__(self, delta: int = 200):
        if delta < 10:
            raise ValueError("delta must be >= 10")
        self.delta = int(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.min = math.inf
        self.max = -math.inf
        self.count = 0  # total rows observed

    # -- compress ---------------------------------------------------------------
    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="stable")
        means = means[order]
        weights = weights[order]
        w_total = weights.sum()
        cum = np.cumsum(weights)
        qmid = (cum - weights / 2.0) / w_total
        knorm = np.arcsin(2.0 * qmid - 1.0) / math.pi + 0.5
        bins = np.floor(self.delta * knorm).astype(np.int64)
        np.clip(bins, 0, self.delta - 1, out=bins)
        starts = np.concatenate([[0], np.flatnonzero(np.diff(bins)) + 1])
        wsum = np.add.reduceat(weights, starts)
        msum = np.add.reduceat(means * weights, starts)
        self.means = msum / wsum
        self.weights = wsum

    # -- partial ----------------------------------------------------------------
    def update_array(self, values, weights=None) -> None:
        values = np.asarray(values, dtype=np.float64)
        keep = ~np.isnan(values)
        values = values[keep]
        if len(values) == 0:
            return
        if weights is None:
            weights = np.ones(len(values), dtype=np.float64)
        else:
            # drop the weights of NaN values too, keeping pairs aligned
            weights = np.asarray(weights, dtype=np.float64)[keep]
        self.min = min(self.min, float(values.min()))
        self.max = max(self.max, float(values.max()))
        self.count += len(values)
        self._compress(
            np.concatenate([self.means, values]),
            np.concatenate([self.weights, weights]),
        )

    def update_arrow(self, arr) -> None:
        import pyarrow as pa

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        self.update_array(arr.to_numpy(zero_copy_only=False))

    def update_values(self, values) -> None:
        self.update_array(np.asarray(list(values), dtype=np.float64))

    # -- final -------------------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        if not isinstance(other, TDigest) or other.delta != self.delta:
            raise ValueError("cannot merge t-digests with different delta")
        if other.count == 0:
            return self
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self.count += other.count
        self._compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
        )
        return self

    # -- query ---------------------------------------------------------------------
    def _interp_axes(self) -> tuple[np.ndarray, np.ndarray]:
        w_total = self.weights.sum()
        cum = np.cumsum(self.weights)
        cum_mid = cum - self.weights / 2.0
        xp = np.concatenate([[0.0], cum_mid, [w_total]])
        fp = np.concatenate([[self.min], self.means, [self.max]])
        return xp, fp

    def quantile(self, q) -> np.ndarray | float:
        """Quantile(s) by centroid interpolation (min/max anchored)."""
        if self.count == 0:
            raise ValueError("empty digest")
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        xp, fp = self._interp_axes()
        out = np.interp(qs * self.weights.sum(), xp, fp)
        return float(out[0]) if scalar else out

    def cdf(self, x) -> np.ndarray | float:
        """Approximate rank fraction of value(s) x."""
        if self.count == 0:
            raise ValueError("empty digest")
        scalar = np.isscalar(x)
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        xp, fp = self._interp_axes()
        w_total = self.weights.sum()
        out = np.interp(xs, fp, xp) / w_total
        return float(out[0]) if scalar else out

    def stats(self) -> dict:
        return {
            "type": self.TYPE,
            "delta": self.delta,
            "centroids": len(self.means),
            "count": self.count,
            "min": self.min,
            "max": self.max,
        }

    # -- wire format -------------------------------------------------------------------
    def _meta(self) -> dict:
        return {
            "delta": self.delta,
            "count": self.count,
            "min": self.min if self.count else None,
            "max": self.max if self.count else None,
            "n_centroids": len(self.means),
        }

    def _payload(self) -> bytes:
        return self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def _from_parts(cls, meta: dict, payload: bytes) -> "TDigest":
        td = cls(meta["delta"])
        n = int(meta["n_centroids"])
        td.means = np.frombuffer(payload, dtype=np.float64, count=n).copy()
        td.weights = np.frombuffer(
            payload, dtype=np.float64, count=n, offset=8 * n
        ).copy()
        td.count = int(meta["count"])
        if meta["min"] is not None:
            td.min = float(meta["min"])
            td.max = float(meta["max"])
        return td
