"""Edge-case robustness: unicode, long keys, expression columns (the
JVM-prehash pattern), and mixed encodings through the full pipeline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sprout_spark.sketch import BloomFilter, HyperLogLog
from sprout_spark.spark.aggregate import build_sketch
from sprout_spark.spark.probe import might_contain


def test_unicode_keys_roundtrip():
    bf = BloomFilter(1000, 0.01)
    keys = ["héllo wörld", "日本語のテキスト", "🙂🙃", "mixed 中文 and ascii", "a" * 5000]
    bf.update_values(keys)
    assert bf.contains_values(keys).all()
    assert not bf.contains("hello world")  # different bytes
    # utf-8 canonical: probing the encoded bytes matches the str form
    assert bf.contains("日本語のテキスト".encode("utf-8"))


def test_unicode_keys_through_spark(spark):
    keys = ["héllo", "日本語", "🙂", "ascii"]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    bf = build_sketch(df, "k", lambda: BloomFilter(100, 0.01))
    assert bf.count == 4
    # driver-side probe of the same strings hits (UTF-8 both sides)
    assert bf.contains_values(keys).all()
    probed = df.where(might_contain(spark, bf, F.col("k"))).count()
    assert probed == 4


def test_very_long_keys():
    bf = BloomFilter(100, 0.01)
    long_keys = ["x" * (2 ** i) for i in range(6, 17)]  # 64B .. 64KB
    bf.update_values(long_keys)
    assert bf.contains_values(long_keys).all()
    assert not bf.contains("x" * 100)


def test_build_over_expression_column(spark, transcripts_path):
    """The JVM-prehash pattern: build and probe through the SAME wrapping
    expression (xxhash64 of the key), keeping all heavy bytes JVM-side."""
    df = spark.read.parquet(transcripts_path)
    n = df.count()
    expr = F.xxhash64("conv_id", "turn_idx")
    keyed = df.select(expr.alias("k"))
    bf = build_sketch(keyed, "k", lambda: BloomFilter(n + 10, 0.01))
    assert bf.count == n
    # probe with the identical expression: full recall
    missing = df.where(~might_contain(spark, bf, expr)).count()
    assert missing == 0
    # HLL over the prehash estimates distinct (conv_id, turn_idx) pairs
    hll = build_sketch(keyed, "k", lambda: HyperLogLog(p=14))
    exact = df.select("conv_id", "turn_idx").distinct().count()
    assert abs(hll.estimate() - exact) / exact <= 3 * 1.04 / np.sqrt(1 << 14)


def test_single_row_and_skewed_partitions(spark):
    one = spark.createDataFrame([("only",)], "k string").repartition(8)
    bf = build_sketch(one, "k", lambda: BloomFilter(100, 0.01), fanin=2)
    assert bf.count == 1 and bf.contains("only")
