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


def test_iceberg_branch_dispatches_to_iceberg_source(spark, monkeypatch):
    """io.load's `iceberg:` branch must route to the Iceberg data source
    with the `<catalog.db>.<table>` identifier. The sandbox has no
    iceberg-spark-runtime jar (checked: no iceberg jar under
    pyspark/jars), so the live read is exercised up to Spark's
    data-source lookup: it must fail with DATA_SOURCE_NOT_FOUND for
    'iceberg' specifically — proving the branch is real dispatch, not
    dead code. With the runtime jar on the classpath the same call
    performs the production read."""
    from sprout_spark.io import load

    calls = {}

    class FakeReader:
        def format(self, fmt):
            calls["format"] = fmt
            return self

        def load(self, ident):
            calls["ident"] = ident
            return "sentinel"

    class FakeSpark:
        read = FakeReader()

    out = load(FakeSpark(), "iceberg:prod_catalog.analytics", "lineitem")
    assert out == "sentinel"
    assert calls == {
        "format": "iceberg",
        "ident": "prod_catalog.analytics.lineitem",
    }

    # live dispatch against the real session: the failure must be the
    # missing iceberg DATA SOURCE (SparkClassNotFoundException /
    # DATA_SOURCE_NOT_FOUND), not a bug in our branch
    import pytest

    with pytest.raises(Exception) as ei:
        load(spark, "iceberg:nocat.db", "lineitem")
    msg = str(ei.value)
    assert "iceberg" in msg.lower()
    assert "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg
