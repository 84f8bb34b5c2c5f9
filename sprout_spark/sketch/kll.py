"""KLL quantile sketch (Karnin, Lang, Liberty 2016) — mergeable ranks.

No counterpart in the reference (north-rule addition; SURVEY.md §2.3).
Compactor stack: level ``l`` holds items of weight ``2**l``; when a level
exceeds its capacity ``max(8, ceil(k * c**(H-1-l)))`` (c = 2/3, H = stack
height) it is sorted and every other item is promoted to level ``l+1``.

Determinism note: the paper flips a fair coin for the compaction offset;
test infrastructure here must be RNG-free at run time (FIXTURES.md), so we
alternate the offset per level (a standard deterministic variant). The
rank-error behaviour in practice matches the randomized version; the
statistical tests assert the ε bound with head-room.

Merge = level-wise concatenation + re-compaction (associative up to
compaction choices; rank estimates stay within bound).
"""

from __future__ import annotations

import math

import numpy as np

from .base import MergeableSketch, register


@register
class KLL(MergeableSketch):
    TYPE = "kll"

    C = 2.0 / 3.0

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.parity: list[int] = [0]
        self.n = 0  # total weight (rows observed)
        self.min = math.inf
        self.max = -math.inf

    # -- compaction -------------------------------------------------------------
    def _cap(self, level: int) -> int:
        depth = len(self.levels) - 1 - level
        return max(8, int(math.ceil(self.k * (self.C**depth))))

    def _compact_level(self, l: int) -> None:
        buf = np.sort(self.levels[l], kind="stable")
        o = self.parity[l]
        self.parity[l] ^= 1
        if len(buf) % 2 == 1:
            # keep one unpaired item at this level (weight conservation)
            if o == 0:
                retain, body = buf[-1:], buf[:-1]
            else:
                retain, body = buf[:1], buf[1:]
        else:
            retain, body = buf[:0], buf
        promoted = body[o::2] if len(body) else body
        if l + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.parity.append(0)
        self.levels[l] = retain.copy()
        self.levels[l + 1] = np.concatenate([self.levels[l + 1], promoted])

    def _compress(self) -> None:
        changed = True
        while changed:
            changed = False
            for l in range(len(self.levels)):
                if len(self.levels[l]) > self._cap(l) and len(self.levels[l]) >= 2:
                    self._compact_level(l)
                    changed = True
                    break

    # -- partial -----------------------------------------------------------------
    def update_array(self, values, weights=None) -> None:
        """Add values; with ``weights`` (non-negative int64), each value
        counts ``w`` times — inserted by binary decomposition of the
        weight (the bit-b copy goes straight into level ``b``, whose
        items weigh ``2**b``), the standard weighted-KLL construction
        (same technique as Apache DataSketches' weighted update): total
        inserted weight is exactly ``Σw`` and the published rank bound
        is unchanged, at ``popcount(w)`` row copies instead of ``w``."""
        values = np.asarray(values, dtype=np.float64)
        keep = ~np.isnan(values)
        values = values[keep]
        if weights is None:
            if len(values) == 0:
                return
            self.min = min(self.min, float(values.min()))
            self.max = max(self.max, float(values.max()))
            self.n += len(values)
            self.levels[0] = np.concatenate([self.levels[0], values])
            self._compress()
            return
        w = np.asarray(weights)[keep]
        if not np.issubdtype(w.dtype, np.integer):
            wi = np.asarray(w, dtype=np.int64)
            if not np.array_equal(wi, w):
                raise ValueError("KLL weights must be integers")
            w = wi
        else:
            w = w.astype(np.int64)
        if (w < 0).any():
            raise ValueError("KLL weights must be >= 0")
        pos = w > 0
        values, w = values[pos], w[pos]
        if len(values) == 0:
            return
        self.min = min(self.min, float(values.min()))
        self.max = max(self.max, float(values.max()))
        self.n += int(w.sum())
        for b in range(int(w.max()).bit_length()):
            m = ((w >> b) & 1) == 1
            if not m.any():
                continue
            while len(self.levels) <= b:
                self.levels.append(np.empty(0, dtype=np.float64))
                self.parity.append(0)
            self.levels[b] = np.concatenate([self.levels[b], values[m]])
        self._compress()

    def update_arrow(self, arr) -> None:
        import pyarrow as pa

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        self.update_array(arr.to_numpy(zero_copy_only=False))

    def update_values(self, values) -> None:
        self.update_array(np.asarray(list(values), dtype=np.float64))

    # -- final --------------------------------------------------------------------
    def merge(self, other: "KLL") -> "KLL":
        if not isinstance(other, KLL) or other.k != self.k:
            raise ValueError("cannot merge KLL sketches with different k")
        if other.n == 0:
            return self
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.parity.append(0)
        for l, buf in enumerate(other.levels):
            if len(buf):
                self.levels[l] = np.concatenate([self.levels[l], buf])
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compress()
        return self

    # -- query ----------------------------------------------------------------------
    def _items_weights(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for l, buf in enumerate(self.levels):
            if len(buf):
                items.append(buf)
                weights.append(np.full(len(buf), float(1 << l)))
        if not items:
            return np.empty(0), np.empty(0)
        items = np.concatenate(items)
        weights = np.concatenate(weights)
        order = np.argsort(items, kind="stable")
        return items[order], weights[order]

    def rank(self, x) -> np.ndarray | float:
        """Estimated fraction of items <= x."""
        if self.n == 0:
            raise ValueError("empty sketch")
        scalar = np.isscalar(x)
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        items, weights = self._items_weights()
        cum = np.cumsum(weights)
        pos = np.searchsorted(items, xs, side="right")
        est = np.where(pos > 0, cum[np.maximum(pos - 1, 0)], 0.0) / weights.sum()
        return float(est[0]) if scalar else est

    def quantile(self, q) -> np.ndarray | float:
        if self.n == 0:
            raise ValueError("empty sketch")
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        items, weights = self._items_weights()
        w_total = weights.sum()
        cum = np.cumsum(weights) - weights / 2.0
        out = np.interp(qs * w_total, np.concatenate([[0.0], cum, [w_total]]),
                        np.concatenate([[self.min], items, [self.max]]))
        return float(out[0]) if scalar else out

    def num_retained(self) -> int:
        return sum(len(b) for b in self.levels)

    def stats(self) -> dict:
        return {
            "type": self.TYPE,
            "k": self.k,
            "levels": len(self.levels),
            "retained": self.num_retained(),
            "n": self.n,
            "min": self.min,
            "max": self.max,
        }

    # -- wire format --------------------------------------------------------------------
    def _meta(self) -> dict:
        return {
            "k": self.k,
            "n": self.n,
            "min": self.min if self.n else None,
            "max": self.max if self.n else None,
            "parity": self.parity,
            "lens": [len(b) for b in self.levels],
        }

    def _payload(self) -> bytes:
        return b"".join(b.tobytes() for b in self.levels)

    @classmethod
    def _from_parts(cls, meta: dict, payload: bytes) -> "KLL":
        kll = cls(meta["k"])
        kll.levels = []
        off = 0
        for ln in meta["lens"]:
            kll.levels.append(
                np.frombuffer(payload, dtype=np.float64, count=ln, offset=off).copy()
            )
            off += 8 * ln
        kll.parity = [int(p) for p in meta["parity"]]
        kll.n = int(meta["n"])
        if meta["min"] is not None:
            kll.min = float(meta["min"])
            kll.max = float(meta["max"])
        return kll
