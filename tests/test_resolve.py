"""Duplicate resolution (dedup.resolve_duplicates): keep-best-per-
cluster semantics, NULL quality, ties, singletons, guards, and the
map-side top-1 plan."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sprout_spark.operators.dedup import resolve_duplicates


def _corpus(spark):
    rows = [
        Row(doc_id=1, q=10), Row(doc_id=2, q=30), Row(doc_id=3, q=20),
        Row(doc_id=5, q=7), Row(doc_id=6, q=7),
        Row(doc_id=8, q=None), Row(doc_id=9, q=1),
        Row(doc_id=11, q=None),  # singleton with NULL quality
        Row(doc_id=12, q=4),     # singleton
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, q int")
    cl = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5), (8, 8), (9, 8)],
        "id bigint, cluster bigint",
    )
    return df, cl


def test_keep_best_semantics(spark):
    df, cl = _corpus(spark)
    got = {r["doc_id"] for r in resolve_duplicates(df, "doc_id", cl, "q").collect()}
    # cluster 1: best q=30 -> 2; cluster 5: tie q=7 -> smaller id 5;
    # cluster 8: NULL sorts last -> 9; singletons 11, 12 survive
    assert got == {2, 5, 9, 11, 12}


def test_all_columns_preserved_and_custom_tie(spark):
    df, cl = _corpus(spark)
    out = resolve_duplicates(df, "doc_id", cl, "q", tie_col="doc_id")
    assert out.columns == ["doc_id", "q"]
    # inverse tie: break ties on -id via a derived column
    df2 = df.withColumn("neg", -F.col("doc_id"))
    got = {
        r["doc_id"]
        for r in resolve_duplicates(df2, "doc_id", cl, "q", tie_col="neg").collect()
    }
    assert 6 in got and 5 not in got  # q tie now keeps the LARGER id


def test_guards(spark):
    df, cl = _corpus(spark)
    with pytest.raises(ValueError, match="clusters"):
        resolve_duplicates(df, "doc_id", cl.withColumnRenamed("id", "x"), "q")
    with pytest.raises(ValueError, match="reserved"):
        resolve_duplicates(df.withColumn("__grp", F.lit(1)), "doc_id", cl, "q")


def test_parallelism_invariance_and_topk_plan(spark):
    df, cl = _corpus(spark)
    a = sorted(
        r["doc_id"]
        for r in resolve_duplicates(df.repartition(7), "doc_id", cl, "q").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in resolve_duplicates(df.repartition(1), "doc_id", cl, "q").collect()
    )
    assert a == b
    plan = (
        resolve_duplicates(df, "doc_id", cl, "q")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # rank<=1 must run as a map-side group-limit before the exchange
    assert "WindowGroupLimit" in plan, plan
