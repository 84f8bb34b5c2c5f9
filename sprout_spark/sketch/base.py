"""MergeableSketch — the abstract partial/final aggregation contract.

Every sketch in this library follows the same distributed skeleton the
reference's ``Add``/``Merge`` pair established (dsa0x/sprout
``bloom.go:164-187`` build, ``bloom.go:241-260`` combine):

* ``update_*`` — the *partial* step, run per Spark partition over Arrow
  batches (vectorized numpy; never per-row Python).
* ``merge`` — the *final* step: associative + commutative combine of two
  sketches with identical geometry, used in a tree reduction.
* ``to_bytes``/``from_bytes`` — the shuffle wire format (a BinaryType
  column in the sketch-row DataFrame).

The serialized envelope is ``MAGIC | type | meta-json | payload`` so a
single dispatcher can revive any sketch type on the merge side.

Wire-format compatibility contract: the envelope is extended by adding
OPTIONAL meta keys (readers ignore keys they don't know), which is
backward- but NOT forward-compatible — e.g. the sparse HLL/CMS payloads
(``nnz`` in meta, added r4) revive older dense payloads fine, but a
payload WRITTEN sparse cannot be read by a pre-r4 reader (it would
misparse the (indices, values) bytes as dense registers). Concretely: a
streaming checkpoint or sketch-store table written by this version fails
to load after a library rollback. Roll the library forward before
restoring such state, or rewrite stored sketches with the old version
first. A payload-layout change that an old reader would MISREAD silently
must instead bump ``_MAGIC`` (``SPSK1`` → ``SPSK2``) so old readers fail
loud.
"""

from __future__ import annotations

import json
import struct
from abc import ABC, abstractmethod

import numpy as np

_MAGIC = b"SPSK1\x00"

_REGISTRY: dict[str, type["MergeableSketch"]] = {}


def register(cls):
    """Class decorator: register a sketch type for deserialization."""
    _REGISTRY[cls.TYPE] = cls
    return cls


class MergeableSketch(ABC):
    """Abstract mergeable aggregator (partial/final UDAF shape)."""

    TYPE: str = "abstract"

    # -- partial -----------------------------------------------------------
    def update_arrow(self, arr) -> None:
        """Update from a pyarrow Array/ChunkedArray (hot path)."""
        raise NotImplementedError

    def update_values(self, values) -> None:
        """Update from a python sequence (tests / driver-side)."""
        raise NotImplementedError

    # -- final -------------------------------------------------------------
    @abstractmethod
    def merge(self, other: "MergeableSketch") -> "MergeableSketch":
        """In-place associative+commutative combine; returns self."""

    # -- wire format -------------------------------------------------------
    @abstractmethod
    def _meta(self) -> dict:
        """JSON-safe geometry + counters (no payload)."""

    @abstractmethod
    def _payload(self) -> bytes:
        """Raw numpy payload bytes."""

    @classmethod
    @abstractmethod
    def _from_parts(cls, meta: dict, payload: bytes) -> "MergeableSketch":
        """Rebuild from meta + payload."""

    def to_bytes(self) -> bytes:
        meta = json.dumps(self._meta(), separators=(",", ":")).encode()
        t = self.TYPE.encode()
        payload = self._payload()
        return b"".join(
            [
                _MAGIC,
                struct.pack("<HI", len(t), len(meta)),
                t,
                meta,
                payload,
            ]
        )

    @abstractmethod
    def stats(self) -> dict:
        """Snapshot of geometry + counters (parity with reference Stats())."""


def sketch_from_bytes(data: bytes) -> MergeableSketch:
    """Revive any registered sketch from its envelope."""
    if isinstance(data, (bytearray, memoryview, np.void)):
        data = bytes(data)
    if data[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not a sprout_spark sketch payload")
    off = len(_MAGIC)
    tlen, mlen = struct.unpack_from("<HI", data, off)
    off += struct.calcsize("<HI")
    typ = data[off : off + tlen].decode()
    off += tlen
    meta = json.loads(data[off : off + mlen].decode())
    off += mlen
    cls = _REGISTRY.get(typ)
    if cls is None:
        raise ValueError(f"unknown sketch type {typ!r}")
    return cls._from_parts(meta, data[off:])


def merge_serialized(payloads) -> bytes:
    """Merge an iterable of serialized sketches into one payload."""
    acc = None
    for p in payloads:
        sk = sketch_from_bytes(p)
        acc = sk if acc is None else acc.merge(sk)
    if acc is None:
        raise ValueError("no sketches to merge")
    return acc.to_bytes()
