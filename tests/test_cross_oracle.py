"""Cross-oracle sanity (SURVEY.md §5.2 item 7): our sketches vs Spark's
built-in approximate aggregates on the same data. Bands, not equality —
different algorithms/parameters, same answers within tolerance."""

import math

import pytest
from pyspark.sql import functions as F

from sprout_spark.sketch import KLL, CountMinSketch, HyperLogLog, TDigest
from sprout_spark.spark.aggregate import build_sketch


@pytest.fixture(scope="module")
def transcripts(spark, transcripts_path):
    return spark.read.parquet(transcripts_path)


def test_hll_vs_approx_count_distinct(spark, transcripts):
    ours = build_sketch(transcripts, "conv_id", lambda: HyperLogLog(p=14)).estimate()
    theirs = transcripts.agg(
        F.approx_count_distinct("conv_id", 0.01).alias("d")
    ).collect()[0]["d"]
    exact = transcripts.select("conv_id").distinct().count()
    assert abs(ours - exact) / exact <= 0.01
    assert abs(theirs - exact) / exact <= 0.05
    assert abs(ours - theirs) / exact <= 0.06


def test_cms_vs_builtin_count_min_sketch(spark, transcripts):
    tool_rows = transcripts.where(F.col("tool") != "")
    cms = build_sketch(tool_rows, "tool", lambda: CountMinSketch(0.001, 0.01))
    # Spark's built-in CMS aggregate over the same column
    row = tool_rows.agg(
        F.expr("count_min_sketch(tool, 0.001d, 0.01d, 42)").alias("s")
    ).collect()[0]
    assert row["s"] is not None  # built-in produced a sketch payload
    exact = {
        r["tool"]: r["cnt"]
        for r in tool_rows.groupBy("tool").agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(exact.values())
    for tool, cnt in exact.items():
        est = cms.estimate(tool)
        assert cnt <= est <= cnt + 0.001 * n  # same guarantee the built-in gives


def test_quantiles_vs_percentile_approx(spark, transcripts):
    lens = transcripts.select(F.length("text").cast("double").alias("len"))
    td = build_sketch(lens, "len", lambda: TDigest(200))
    kll = build_sketch(lens, "len", lambda: KLL(200))
    approx = lens.agg(
        F.percentile_approx("len", [0.25, 0.5, 0.75, 0.95], 10000).alias("p")
    ).collect()[0]["p"]
    exact = lens.agg(
        F.expr("percentile(len, array(0.25, 0.5, 0.75, 0.95))").alias("p")
    ).collect()[0]["p"]
    for q, a, e in zip([0.25, 0.5, 0.75, 0.95], approx, exact):
        for ours in (td.quantile(q), kll.quantile(q)):
            # all three estimators agree with the exact answer within a
            # few percent of the value's local scale
            assert abs(ours - e) <= max(0.05 * e, 3.0), (q, ours, e)
        assert abs(a - e) <= max(0.05 * e, 3.0)
