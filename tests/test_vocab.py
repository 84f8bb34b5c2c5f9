"""Vocabulary + encoding (operators/vocab.py): deterministic id
assignment, min_count/max_size cuts, OOV, blank handling, array
re-assembly, parallelism invariance, and a DuckDB replay."""

import random

import duckdb
import pytest
from pyspark.sql import Row

from sprout_spark.operators.vocab import build_vocab, collect_ids, encode_tokens


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )


def test_vocab_order_and_cuts(spark):
    df = _df(spark, ["b b b a a c", "a c  d", ""])
    v = {r["term"]: (r["term_id"], r["count"])
         for r in build_vocab(df, "text", max_size=3, min_count=2).collect()}
    # counts: a=3, b=3, c=2, d=1; order (count desc, term): a(0), b(1), c(2)
    assert v == {"a": (0, 3), "b": (1, 3), "c": (2, 2)}
    v2 = build_vocab(df, "text", max_size=2, min_count=1).collect()
    assert {r["term"] for r in v2} == {"a", "b"}


def test_encode_and_oov_and_blank(spark):
    df = _df(spark, ["b a zz", "", None, "  "])
    vocab = build_vocab(df, "text", max_size=2)  # a, b survive; zz OOV
    enc = encode_tokens(df, "doc_id", "text", vocab, oov_id=-1).collect()
    got = sorted((r["doc_id"], r["pos"], r["token_id"]) for r in enc)
    # vocab: count a=1,b=1,zz=1 -> order a(0), b(1); max_size=2 drops zz
    assert got == [(0, 0, 1), (0, 1, 0), (0, 2, -1)]


def test_collect_ids_order_proof(spark):
    texts = [" ".join(f"w{i % 7}" for i in range(50))]
    df = _df(spark, texts).repartition(8)
    vocab = build_vocab(df, "text")
    arr = collect_ids(
        encode_tokens(df, "doc_id", "text", vocab), "doc_id"
    ).first()["token_ids"]
    v = {r["term"]: r["term_id"] for r in vocab.collect()}
    assert arr == [v[f"w{i % 7}"] for i in range(50)]


def test_parallelism_invariance(spark):
    rng = random.Random(3)
    texts = [" ".join(f"t{rng.randrange(40)}" for _ in range(rng.randrange(1, 60)))
             for _ in range(60)]
    a = sorted(map(tuple, build_vocab(_df(spark, texts).repartition(1), "text", 25, 2).collect()))
    b = sorted(map(tuple, build_vocab(_df(spark, texts).repartition(16), "text", 25, 2).collect()))
    assert a == b and len(a) == 25


def test_guards(spark):
    df = _df(spark, ["a"])
    with pytest.raises(ValueError, match="max_size"):
        build_vocab(df, "text", max_size=0)
    with pytest.raises(ValueError, match="min_count"):
        build_vocab(df, "text", min_count=0)
    with pytest.raises(ValueError, match="vocab"):
        encode_tokens(df, "doc_id", "text", df)


def test_duckdb_replay(spark):
    rng = random.Random(41)
    texts = [" ".join(f"t{rng.randrange(80)}" for _ in range(rng.randrange(0, 80)))
             for _ in range(70)]
    df = _df(spark, texts)
    vocab = build_vocab(df, "text", max_size=30, min_count=2)
    got = sorted(map(tuple, encode_tokens(df, "doc_id", "text", vocab).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", list(enumerate(texts)))
    want = sorted(
        map(
            tuple,
            con.execute(
                r"""
WITH tok AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) - 1 AS pos
  FROM (SELECT doc_id, string_split_regex(
          regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks
        FROM documents
        WHERE text IS NOT NULL
          AND length(regexp_replace(text, '\s', '', 'g')) > 0)
),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY count(*) DESC, term) - 1 AS term_id
  FROM tok GROUP BY term HAVING count(*) >= 2
  QUALIFY row_number() OVER (ORDER BY count(*) DESC, term) <= 30
)
SELECT doc_id, pos, coalesce(term_id, -1) AS token_id
FROM tok LEFT JOIN vocab USING (term)
"""
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 1000
