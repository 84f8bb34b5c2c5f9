"""Sketch store (sink/source) + transcripts fixture invariants."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sprout_spark.sketch import BloomFilter, HyperLogLog
from sprout_spark.sources.sketch_store import (
    load_grouped_sketches,
    load_sketch,
    save_grouped_sketches,
    save_sketch,
)
from sprout_spark.sources.transcripts import generate_transcripts, verify_turn_ordering
from sprout_spark.spark.aggregate import (
    build_grouped_sketches,
    build_sketch,
    grouped_estimate,
)
from sprout_spark.spark.probe import might_contain


def test_sketch_store_roundtrip(spark, transcripts_path, tmp_path):
    df = spark.read.parquet(transcripts_path)
    n = df.count()
    bf = build_sketch(df, "conv_id", lambda: BloomFilter(n + 10, 0.01))
    path = str(tmp_path / "store")
    save_sketch(spark, bf, path, name="conv_bloom")
    back = load_sketch(spark, path, name="conv_bloom")
    assert isinstance(back, BloomFilter)
    assert (back.bits == bf.bits).all() and back.count == bf.count
    # a later job probes from the persisted sketch
    missing = df.where(~might_contain(spark, back, F.col("conv_id"))).count()
    assert missing == 0


def test_grouped_sketch_store_roundtrip(spark, transcripts_path, tmp_path):
    df = spark.read.parquet(transcripts_path).where(F.col("tool") != "")
    g = build_grouped_sketches(df, "tool", "conv_id", lambda: HyperLogLog(p=12), salt=4)
    path = str(tmp_path / "gstore")
    save_grouped_sketches(g, path)
    back = load_grouped_sketches(spark, path)
    e1 = {r["key"]: r["estimate"] for r in grouped_estimate(g, lambda s: s.estimate()).collect()}
    e2 = {r["key"]: r["estimate"] for r in grouped_estimate(back, lambda s: s.estimate()).collect()}
    assert e1 == e2


def test_transcripts_fixture_invariants(spark, transcripts_path):
    df = spark.read.parquet(transcripts_path)
    # input-hint shape
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    assert dict(df.dtypes)["turn_idx"] == "int"
    # stable turn ordering (the per-row invariant from input_hint)
    v = verify_turn_ordering(df)
    assert v == {"duplicate_turns": 0, "ordering_gaps": 0}
    # determinism: regeneration is byte-identical
    t1 = generate_transcripts(200, seed=42)
    t2 = generate_transcripts(200, seed=42)
    assert t1.equals(t2)
