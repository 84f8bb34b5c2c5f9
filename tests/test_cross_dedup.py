"""Cross-corpus near-dup (operators/dedup.py::near_dup_pairs_between):
equality with the exact cross-Jaccard all-pairs on disjoint slices,
self-identity when both sides are the same corpus, and the product-cap
hot-bucket guard."""

import os

import pytest
from pyspark.sql import functions as F

from sprout_spark.operators.dedup import (
    lsh_candidate_pairs_between,
    minhash_band_rows,
    near_dup_pairs_between,
    token_sets,
)


@pytest.fixture(scope="module")
def halves(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    left = docs.where(F.col("doc_id") % 3 != 0)
    right = docs.where(F.col("doc_id") % 3 == 0)
    return docs, left, right


def _exact_cross(spark, left, right, threshold):
    """Exact cross Jaccard via collected token sets (fixture-sized)."""
    lt = {r["id"]: set(r["tokens"]) for r in token_sets(left, "doc_id", "text").collect()}
    rt = {r["id"]: set(r["tokens"]) for r in token_sets(right, "doc_id", "text").collect()}
    out = set()
    for a, ta in lt.items():
        if not ta:
            continue
        for b, tb in rt.items():
            if not tb:
                continue
            j = len(ta & tb) / len(ta | tb)
            if j >= threshold:
                out.add((a, b))
    return out


def test_matches_exact_cross_jaccard(spark, halves):
    _, left, right = halves
    got = {
        (r["a"], r["b"])
        for r in near_dup_pairs_between(
            left, right, "doc_id", "text", threshold=0.9, max_bucket=None
        ).collect()
    }
    want = _exact_cross(spark, left, right, 0.9)
    assert got == want
    assert want, "fixture must contain true cross pairs"


def test_same_corpus_self_identity(halves):
    docs, _, _ = halves
    small = docs.limit(30)
    pairs = near_dup_pairs_between(
        small, small, "doc_id", "text", threshold=1.0, max_bucket=None
    )
    ids = {r["doc_id"] for r in small.where(
        F.length(F.regexp_replace(F.col("text"), r"\s", "")) > 0
    ).select("doc_id").collect()}
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert {(i, i) for i in ids} <= got  # every doc matches itself


def test_product_cap_guard_star_and_drop(halves):
    _, left, right = halves
    lb = minhash_band_rows(left, "doc_id", "text")
    rb = minhash_band_rows(right, "doc_id", "text")
    full = lsh_candidate_pairs_between(lb, rb, max_bucket=None)
    starred = lsh_candidate_pairs_between(lb, rb, max_bucket=1, oversize_mode="star")
    dropped = lsh_candidate_pairs_between(lb, rb, max_bucket=1, oversize_mode="drop")
    n_full, n_star, n_drop = full.count(), starred.count(), dropped.count()
    # cap=1: only 1x1 buckets join all-pairs; star bounds candidates
    assert n_star <= n_full
    assert n_drop <= n_star
    # star keeps every left band-row holder connected to something
    left_ids = {r["id"] for r in lb.select("id").distinct().collect()}
    star_lefts = {r["a"] for r in starred.collect()}
    assert left_ids <= star_lefts
    with pytest.raises(ValueError, match="oversize_mode"):
        lsh_candidate_pairs_between(lb, rb, max_bucket=4, oversize_mode="split")
