"""Mergeable sketches (partial/final UDAF shape) — see SURVEY.md §2."""

from .base import MergeableSketch, merge_serialized, sketch_from_bytes
from .bloom import BloomCapacityError, BloomFilter, bloom_geometry
from .bottomk import BottomKSample
from .cms import CountMinSketch
from .hll import HyperLogLog
from .kll import KLL
from .misra_gries import MisraGries
from .scalable_bloom import GROWTH_LARGE, GROWTH_SMALL, ScalableBloomFilter
from .tdigest import TDigest

__all__ = [
    "MergeableSketch",
    "merge_serialized",
    "sketch_from_bytes",
    "BloomFilter",
    "BottomKSample",
    "MisraGries",
    "BloomCapacityError",
    "bloom_geometry",
    "ScalableBloomFilter",
    "GROWTH_SMALL",
    "GROWTH_LARGE",
    "HyperLogLog",
    "CountMinSketch",
    "TDigest",
    "KLL",
]
