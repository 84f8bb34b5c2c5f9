"""Skew handling (north rule / FIXTURES.md §4): the transcripts fixture's
Zipf conversation sizes create hot keys; salted grouped builds must give
exactly the same answers as unsalted (mergeability makes salting lossless)
and the salt must actually spread hot keys across tasks."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sprout_spark.sketch import TDigest
from sprout_spark.spark.aggregate import build_grouped_sketches, grouped_estimate


@pytest.fixture(scope="module")
def transcripts(spark, transcripts_path):
    return spark.read.parquet(transcripts_path)


def test_fixture_is_skewed(spark, transcripts):
    sizes = (
        transcripts.groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    )
    ns = sorted((r["n"] for r in sizes), reverse=True)
    # Zipf(1.3) clamped at 500: hot conversations dominate
    assert ns[0] >= 100 * ns[len(ns) // 2]


def test_salted_grouped_equals_unsalted(spark, transcripts):
    hot = (
        transcripts.groupBy("conv_id")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"))
        .limit(20)
    )
    df = transcripts.join(F.broadcast(hot.select("conv_id")), "conv_id", "left_semi")
    lens = df.select("conv_id", F.length("text").cast("double").alias("len"))

    plain = build_grouped_sketches(lens, "conv_id", "len", lambda: TDigest(100), salt=0)
    salted = build_grouped_sketches(
        lens, "conv_id", "len", lambda: TDigest(100), salt=16
    )
    rows_plain = {r["key"]: r["rows"] for r in plain.collect()}
    rows_salted = {r["key"]: r["rows"] for r in salted.collect()}
    assert rows_plain == rows_salted  # every row counted exactly once

    med_salted = {
        r["key"]: r["estimate"]
        for r in grouped_estimate(salted, lambda s: s.quantile(0.5)).collect()
    }
    exact = {
        r["conv_id"]: r["m"]
        for r in lens.groupBy("conv_id")
        .agg(F.expr("percentile(len, 0.5)").alias("m"))
        .collect()
    }
    for conv, m in exact.items():
        lo, hi = (
            lens.where(F.col("conv_id") == conv)
            .agg(
                F.expr("percentile(len, 0.4)").alias("lo"),
                F.expr("percentile(len, 0.6)").alias("hi"),
            )
            .collect()[0]
        )
        assert lo <= med_salted[conv] <= hi, conv


def test_salt_spreads_hot_key(spark, transcripts):
    # phase 1 of a salted build groups on (key, salt): a hot conversation
    # must occupy >1 salt bucket, i.e. >1 task-side group
    hot_id = (
        transcripts.groupBy("conv_id")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"))
        .limit(1)
        .collect()[0]["conv_id"]
    )
    df = transcripts.where(F.col("conv_id") == hot_id)
    n_buckets = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.col("text")), F.lit(16)))
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_buckets > 8  # spread across most of the 16 salt buckets
