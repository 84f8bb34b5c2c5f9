"""Heavy-hitter n-grams (operators/ngrams.py): exactness vs brute force,
multiplicity, sub-k docs, and the no-false-negative sizing guard."""

from collections import Counter

import pytest
from pyspark.sql import Row

from sprout_spark.operators.ngrams import heavy_ngrams, ngram_rows


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=0, text="the quick brown fox jumps over the quick brown fox"),
        Row(doc_id=1, text="the quick brown cat"),
        Row(doc_id=2, text="  the   quick  "),  # 2 tokens: no 3-grams
        Row(doc_id=3, text="lorem ipsum dolor sit amet"),
        Row(doc_id=4, text=None),
        Row(doc_id=5, text="   "),
    ] + [Row(doc_id=10 + i, text="the quick brown fox runs") for i in range(10)]
    return spark.createDataFrame(rows)


def _brute(docs_rows, k):
    c = Counter()
    for r in docs_rows:
        if not r["text"]:
            continue
        toks = r["text"].split()
        for i in range(len(toks) - k + 1):
            c[" ".join(toks[i : i + k])] += 1
    return c


def test_ngram_rows_multiplicity_and_short_docs(docs):
    got = Counter(r["ngram"] for r in ngram_rows(docs, "text", 3).collect())
    assert got == _brute(docs.collect(), 3)
    # doc 0 contributes "the quick brown" twice; doc 2/4/5 contribute 0
    assert got["the quick brown"] >= 2


@pytest.mark.parametrize("phi", [0.05, 0.2])
def test_heavy_ngrams_exact(docs, phi):
    rows = docs.collect()
    c = _brute(rows, 3)
    total = sum(c.values())
    want = {(g, n) for g, n in c.items() if n >= phi * total}
    got = {(r["ngram"], r["cnt"]) for r in heavy_ngrams(docs, "text", 3, phi).collect()}
    assert got == want
    assert want, "fixture must have heavy grams"


def test_guards(docs):
    with pytest.raises(ValueError, match="phi must be"):
        heavy_ngrams(docs, "text", 3, 0.0)
    with pytest.raises(ValueError, match="silently missed"):
        heavy_ngrams(docs, "text", 3, phi=0.01, mg_k=10)
    with pytest.raises(ValueError, match="k must be"):
        ngram_rows(docs, "text", 0)


def test_no_heavy_grams_empty_result(spark):
    df = spark.createDataFrame(
        [Row(text=f"unique{i} tokens{i} here{i}") for i in range(50)]
    )
    out = heavy_ngrams(df, "text", 3, phi=0.5)
    assert out.count() == 0
    assert out.columns == ["ngram", "cnt"]
