"""Deterministic corpus split + shuffle-shard (operators/corpus.py)."""

import pytest
from pyspark.sql import functions as F

from sprout_spark.operators.corpus import shuffle_shards, split_corpus


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


FR = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_deterministic_and_total(docs):
    a = split_corpus(docs, "doc_id", FR).select("doc_id", "split")
    b = split_corpus(docs, "doc_id", FR).select("doc_id", "split")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    n = docs.count()
    counts = {r["split"]: r["c"] for r in a.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}  # sum==1: no NULL band
    assert sum(counts.values()) == n
    # rates within a loose binomial band on the small fixture
    assert abs(counts["train"] / n - 0.8) < 0.15


def test_split_stable_under_growth(spark, docs):
    """Existing docs never move when new docs arrive — the property that
    keeps eval membership stable as the corpus grows."""
    half = docs.where(F.col("doc_id") % 2 == 0)
    full_map = {
        r["doc_id"]: r["split"]
        for r in split_corpus(docs, "doc_id", FR).select("doc_id", "split").collect()
    }
    for r in split_corpus(half, "doc_id", FR).select("doc_id", "split").collect():
        assert full_map[r["doc_id"]] == r["split"]


def test_split_salt_redeals(docs):
    a = split_corpus(docs, "doc_id", FR, salt="v1")
    b = split_corpus(docs, "doc_id", FR, salt="v2")
    joined = a.select("doc_id", F.col("split").alias("sa")).join(
        b.select("doc_id", F.col("split").alias("sb")), "doc_id"
    )
    moved = joined.where(F.col("sa") != F.col("sb")).count()
    assert moved > 0  # different salt = a different deal


def test_split_holdout_band_is_null(docs):
    r = split_corpus(docs, "doc_id", {"train": 0.5}).groupBy("split").count()
    got = {row["split"]: row["count"] for row in r.collect()}
    assert set(got) == {"train", None}


def test_split_guards(docs):
    with pytest.raises(ValueError, match="non-empty"):
        split_corpus(docs, "doc_id", {})
    with pytest.raises(ValueError, match="negative"):
        split_corpus(docs, "doc_id", {"a": -0.1, "b": 0.5})
    with pytest.raises(ValueError, match="> 1"):
        split_corpus(docs, "doc_id", {"a": 0.8, "b": 0.4})
    with pytest.raises(ValueError, match="hash_mode"):
        split_corpus(docs, "doc_id", FR, hash_mode="sha1")


def test_split_is_map_only(docs):
    plan = (
        split_corpus(docs, "doc_id", FR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_shuffle_shards_permutation(docs):
    n = docs.count()
    out = shuffle_shards(docs, "doc_id", 8)
    rows = out.select("doc_id", "shard", "pos").collect()
    assert len(rows) == n
    # every (shard, pos) unique; pos contiguous 0..size-1 per shard
    cells = {(r["shard"], r["pos"]) for r in rows}
    assert len(cells) == n
    sizes: dict[int, int] = {}
    for r in rows:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
    assert set(sizes) == set(range(8))
    for s, sz in sizes.items():
        assert {p for (sh, p) in cells if sh == s} == set(range(sz))


def test_shuffle_shards_deterministic_and_salted(docs):
    a = shuffle_shards(docs, "doc_id", 4).select("doc_id", "shard", "pos")
    b = shuffle_shards(docs, "doc_id", 4).select("doc_id", "shard", "pos")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    c = shuffle_shards(docs, "doc_id", 4, salt="s2").select("doc_id", "shard", "pos")
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))


def test_shuffle_shards_xxhash64_mode(docs):
    out = shuffle_shards(docs, "doc_id", 4, hash_mode="xxhash64")
    n = docs.count()
    assert out.select("shard", "pos").distinct().count() == n


def test_shuffle_shards_one_exchange(docs):
    plan = (
        shuffle_shards(docs, "doc_id", 8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
