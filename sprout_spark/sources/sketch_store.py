"""Sketch persistence: parquet sink/source for sketch rows.

The serialized-sketch wire format doubles as the at-rest format, so a
merged sketch (or a whole DataFrame of per-key sketches) persists as a
normal parquet table and revives in a later job — the distributed
replacement for the reference's mmap'd filter file
(``bloom.go:410-425``): same role (state survives the process), but
schema'd, splittable, and readable by any Spark job.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..sketch.base import MergeableSketch, merge_serialized, sketch_from_bytes


def save_sketch(
    spark: SparkSession, sketch: MergeableSketch, path: str, name: str = "sketch"
) -> None:
    """Persist one merged sketch as a 1-row parquet table."""
    df = spark.createDataFrame(
        [(name, sketch.TYPE, bytearray(sketch.to_bytes()))],
        "name string, type string, payload binary",
    )
    df.write.mode("overwrite").parquet(path)


def load_sketch(spark: SparkSession, path: str, name: str = "sketch") -> MergeableSketch:
    """Revive a persisted sketch (merging rows if several share the name)."""
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(path)
        .where(F.col("name") == name)
        .select("payload")
        .collect()
    )
    if not rows:
        raise FileNotFoundError(f"no sketch named {name!r} at {path}")
    return sketch_from_bytes(merge_serialized([r["payload"] for r in rows]))


def save_grouped_sketches(sketches: DataFrame, path: str) -> None:
    """Persist a DataFrame[key, sketch, ...] of per-key sketches."""
    sketches.write.mode("overwrite").parquet(path)


def load_grouped_sketches(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
