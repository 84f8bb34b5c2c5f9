"""Misra-Gries heavy-hitter summary — mergeable, candidate-free.

No counterpart in the reference (north-rule addition, companion to the
CMS per SURVEY.md §2.3): a CMS can *estimate* any key's frequency but
cannot *enumerate* the frequent keys — round 1's heavy-hitter query had
to collect the distinct values driver-side, which dies on a
high-cardinality column. Misra-Gries (Misra & Gries 1982) keeps at most
``k`` (value, count) counters; the merge rule is the Agarwal et al.
"Mergeable Summaries" (PODS 2012, §3) one: sum counters, then subtract
the (k+1)-th largest count from all and drop the non-positive.

Guarantees (N = total added weight):

* ``estimate(x)`` never over-counts:  est(x) ≤ true(x)
* under-count is bounded by the tracked ``deficit``:
  true(x) ≤ est(x) + deficit, and deficit ≤ N/(k+1)
* therefore every key with true(x) > N/(k+1) is present, and
  ``heavy_hitters(φ)`` (est + deficit ≥ φN) is a guaranteed SUPERSET of
  the true φ-heavy hitters — prune it exactly with one semi join, no
  driver-side candidate enumeration anywhere.

State is O(k) values + counts; the per-batch update touches each
*distinct* batch value once (Arrow ``value_counts`` does the per-row work
vectorized), so a skewed 10^12-row stream costs O(distinct-per-batch)
Python, never per-row.
"""

from __future__ import annotations

import json
import math
from collections import Counter

import numpy as np
import pyarrow as pa

from .base import MergeableSketch, register


def _norm_value(v):
    """JSON-safe canonical key: int stays int, str stays str, null None."""
    if v is None or isinstance(v, (str, bool)):
        return v
    if isinstance(v, (int, np.integer)):
        return int(v)
    raise TypeError(
        f"unsupported Misra-Gries key type {type(v).__name__}; cast float "
        "or binary keys to string or int first"
    )


@register
class MisraGries(MergeableSketch):
    TYPE = "mg"

    def __init__(self, k: int = 64):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.counters: dict = {}
        self.total = 0  # N: total added weight
        self.deficit = 0  # cumulative decrement: the max under-count

    # -- partial -------------------------------------------------------------
    def _prune(self) -> None:
        n = len(self.counters)
        if n <= self.k:
            return
        cnts = np.fromiter(self.counters.values(), dtype=np.int64, count=n)
        d = int(np.partition(cnts, n - self.k - 1)[n - self.k - 1])
        self.counters = {
            v: c - d for v, c in self.counters.items() if c > d
        }
        self.deficit += d

    def _add_counts(self, pairs) -> None:
        get = self.counters.get
        added = 0
        for v, c in pairs:
            self.counters[v] = get(v, 0) + c
            added += c
        self.total += added
        self._prune()

    def update_arrow(self, arr) -> None:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_dictionary(arr.type):
            arr = arr.dictionary_decode()
        if pa.types.is_floating(arr.type) or pa.types.is_decimal(arr.type):
            raise TypeError(
                "float/decimal keys are not supported by Misra-Gries; "
                "cast to string or int first"
            )
        vc = arr.value_counts()  # vectorized per-row work stays in Arrow
        self._add_counts(
            (_norm_value(v), int(c))
            for v, c in zip(
                vc.field("values").to_pylist(), vc.field("counts").to_pylist()
            )
        )

    def update_values(self, values) -> None:
        self._add_counts(
            (_norm_value(v), c) for v, c in Counter(values).items()
        )

    def update_weighted_arrow(self, arr, weights) -> None:
        """Weighted adds: each row contributes its (int64) weight, not 1
        — heavy hitters BY TOKEN/BYTE VOLUME instead of row count (the
        same shape the weighted CMS estimates; this enumerates them).
        The MG guarantees hold verbatim with N = Σweights: decrements
        are count-agnostic. Per-row work stays in Arrow (group-by-value
        weight sums); NULL/negative weights count 0."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_dictionary(arr.type):
            arr = arr.dictionary_decode()
        if pa.types.is_floating(arr.type) or pa.types.is_decimal(arr.type):
            raise TypeError(
                "float/decimal keys are not supported by Misra-Gries; "
                "cast to string or int first"
            )
        w = np.asarray(weights, dtype=np.int64)
        if len(w) != len(arr):
            raise ValueError("weights length must match values length")
        t = pa.table({"v": arr, "w": pa.array(np.maximum(w, 0), pa.int64())})
        g = t.group_by("v").aggregate([("w", "sum")])
        self._add_counts(
            (_norm_value(v), int(c))
            for v, c in zip(
                g.column("v").to_pylist(), g.column("w_sum").to_pylist()
            )
            if c
        )

    # -- final -----------------------------------------------------------------
    def merge(self, other: "MisraGries") -> "MisraGries":
        if not isinstance(other, MisraGries) or other.k != self.k:
            raise ValueError("cannot merge Misra-Gries with different k")
        get = self.counters.get
        for v, c in other.counters.items():
            self.counters[v] = get(v, 0) + c
        self.total += other.total
        self.deficit += other.deficit
        self._prune()
        return self

    # -- query --------------------------------------------------------------------
    def estimate(self, key) -> int:
        """Lower bound: est ≤ true ≤ est + deficit."""
        return int(self.counters.get(_norm_value(key), 0))

    def error_bound(self) -> int:
        """Max under-count (≤ N/(k+1))."""
        return int(self.deficit)

    def heavy_hitters(self, threshold: float) -> list[tuple]:
        """Guaranteed superset of keys with true count ≥ threshold·N:
        [(value, lower, upper)] sorted by lower bound descending.

        The superset guarantee requires threshold·N > deficit (a key can
        be evicted with true count up to the deficit, ≤ N/(k+1)); asking
        below that line would silently miss true hitters, so it raises —
        use a larger ``k`` instead."""
        if self.total and threshold * self.total <= self.deficit:
            raise ValueError(
                f"threshold {threshold} is not answerable: threshold*N "
                f"({threshold * self.total:.0f}) <= deficit "
                f"({self.deficit}); rebuild with k > "
                f"{math.ceil(1 / threshold)} to guarantee the superset"
            )
        cut = threshold * self.total
        out = [
            (v, int(c), int(c + self.deficit))
            for v, c in self.counters.items()
            if c + self.deficit >= cut
        ]
        return sorted(out, key=lambda t: (-t[1], str(t[0])))

    def stats(self) -> dict:
        return {
            "type": self.TYPE,
            "k": self.k,
            "n_counters": len(self.counters),
            "total": self.total,
            "deficit": self.deficit,
        }

    # -- wire format -------------------------------------------------------------------
    def _meta(self) -> dict:
        return {"k": self.k, "total": self.total, "deficit": self.deficit}

    def _payload(self) -> bytes:
        # values are JSON-safe by construction (_norm_value); null key
        # round-trips via a presence flag since JSON objects can't key None
        items = [[v, c] for v, c in self.counters.items()]
        return json.dumps(items, separators=(",", ":")).encode()

    @classmethod
    def _from_parts(cls, meta: dict, payload: bytes) -> "MisraGries":
        mg = cls(meta["k"])
        mg.total = int(meta["total"])
        mg.deficit = int(meta["deficit"])
        mg.counters = {
            (None if v is None else v): int(c)
            for v, c in json.loads(payload.decode())
        }
        return mg
