"""sprout_spark — PySpark-native mergeable sketches + pipeline operators.

Public API (see README.md):

    from sprout_spark import (
        BloomFilter, ScalableBloomFilter, HyperLogLog, CountMinSketch,
        TDigest, KLL,
        build_sketch, build_sketches, build_grouped_sketches,
        might_contain, cms_estimate, bloom_semi_join,
    )
"""

from .sketch import (
    KLL,
    BottomKSample,
    BloomCapacityError,
    BloomFilter,
    CountMinSketch,
    HyperLogLog,
    MergeableSketch,
    ScalableBloomFilter,
    TDigest,
    merge_serialized,
    sketch_from_bytes,
)

__version__ = "0.1.0"

__all__ = [
    "BloomFilter",
    "BloomCapacityError",
    "BottomKSample",
    "ScalableBloomFilter",
    "HyperLogLog",
    "CountMinSketch",
    "TDigest",
    "KLL",
    "MergeableSketch",
    "merge_serialized",
    "sketch_from_bytes",
    "build_sketch",
    "build_sketches",
    "build_grouped_sketches",
    "grouped_estimate",
    "tree_merge",
    "might_contain",
    "cms_estimate",
    "quantile_rank",
    "bloom_semi_join",
    "build_sketch_resumable",
]


def __getattr__(name):
    # Spark-dependent symbols load lazily so the numpy-only sketch API
    # works without a JVM on the path.
    if name in {
        "build_sketch",
        "build_sketches",
        "build_grouped_sketches",
        "grouped_estimate",
        "tree_merge",
    }:
        from .spark import aggregate

        return getattr(aggregate, name)
    if name in {"might_contain", "cms_estimate", "quantile_rank", "bloom_semi_join"}:
        from .spark import probe

        return getattr(probe, name)
    if name == "build_sketch_resumable":
        from .spark.checkpoint import build_sketch_resumable

        return build_sketch_resumable
    raise AttributeError(name)
