"""Distributed build/merge/probe layer."""

from .aggregate import (
    build_grouped_sketches,
    build_sketch,
    build_sketches,
    grouped_estimate,
    partial_sketches,
    tree_merge,
)
from .checkpoint import build_sketch_resumable, checkpointed_partials, lineage
from .probe import bloom_semi_join, cms_estimate, might_contain, quantile_rank
from .rollup import SketchRollup, stream_rollup
from .sharded import (
    build_sharded_bloom,
    build_sharded_sketch,
    sharded_might_contain,
    sharded_semi_join,
)
