"""Token-window chunking (operators/chunking.py): coverage/overlap
invariants, reconstruction, blank/NULL handling, guards, no-shuffle
plan, and a DuckDB replay equivalence."""

import random

import duckdb
import pytest
from pyspark.sql import Row

from sprout_spark.operators.chunking import chunk_text


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )


def test_semantics_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    rows = sorted(
        chunk_text(_df(spark, [text]), "doc_id", "text", size=4, overlap=2).collect(),
        key=lambda r: r["chunk_idx"],
    )
    spans = [(r["tok_from"], r["tok_to"], r["chunk_text"]) for r in rows]
    assert spans == [
        (0, 4, "t0 t1 t2 t3"),
        (2, 6, "t2 t3 t4 t5"),
        (4, 8, "t4 t5 t6 t7"),
        (6, 10, "t6 t7 t8 t9"),
    ]


def test_short_final_chunk_and_single(spark):
    rows = sorted(
        chunk_text(_df(spark, ["a b c d e"]), "doc_id", "text", 3, 1).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [(r["tok_from"], r["tok_to"]) for r in rows] == [(0, 3), (2, 5)]
    one = chunk_text(_df(spark, ["solo"]), "doc_id", "text", 8, 4).collect()
    assert len(one) == 1 and one[0]["chunk_text"] == "solo"


def test_every_token_covered(spark):
    rng = random.Random(9)
    texts = [" ".join(f"w{i}" for i in range(rng.randrange(1, 300))) for _ in range(40)]
    out = chunk_text(_df(spark, texts), "doc_id", "text", 32, 8).collect()
    cover = {}
    for r in out:
        cover.setdefault(r["doc_id"], set()).update(range(r["tok_from"], r["tok_to"]))
    for i, t in enumerate(texts):
        assert cover[i] == set(range(len(t.split()))), i
    # chunk sizes: full except possibly the last
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["chunk_idx"])
        for r in rows[:-1]:
            assert r["tok_to"] - r["tok_from"] == 32
        assert 1 <= rows[-1]["tok_to"] - rows[-1]["tok_from"] <= 32


def test_blank_null_and_whitespace_collapse(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text=""), Row(doc_id=1, text="  \n\t "),
         Row(doc_id=2, text=None), Row(doc_id=3, text="  a \n b\tc  ")],
        "doc_id bigint, text string",
    )
    rows = chunk_text(df, "doc_id", "text", 2, 0).collect()
    assert {r["doc_id"] for r in rows} == {3}
    got = sorted((r["chunk_idx"], r["chunk_text"]) for r in rows)
    assert got == [(0, "a b"), (1, "c")]


def test_guards(spark):
    df = _df(spark, ["a"])
    with pytest.raises(ValueError, match="size"):
        chunk_text(df, "doc_id", "text", 0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_text(df, "doc_id", "text", 4, 4)
    with pytest.raises(ValueError, match="reserved"):
        chunk_text(df.withColumn("chunk_idx", df.doc_id), "doc_id", "text", 4)


def test_no_shuffle_plan(spark):
    plan = (
        chunk_text(_df(spark, ["a b c"]), "doc_id", "text", 2, 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_duckdb_replay_equivalence(spark):
    rng = random.Random(21)
    texts = []
    for _ in range(60):
        n = rng.randrange(0, 200)
        texts.append(
            "  ".join(f"w{rng.randrange(50)}" for i in range(n))
            + rng.choice(["", "  ", "\n"])
        )
    df = _df(spark, texts)
    got = sorted(map(tuple, chunk_text(df, "doc_id", "text", 16, 4).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                r"""
WITH d AS (
  SELECT doc_id,
         string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks
  FROM documents
  WHERE text IS NOT NULL AND length(regexp_replace(text, '\s', '', 'g')) > 0
),
n AS (SELECT doc_id, toks, len(toks) AS n FROM d),
c AS (SELECT doc_id, toks, n,
             CAST(CASE WHEN n <= 16 THEN 1
                  ELSE 1 + ceil((n - 16) / 12.0) END AS BIGINT) AS k
      FROM n)
SELECT doc_id, i AS chunk_idx, i * 12 AS tok_from,
       least(i * 12 + 16, n) AS tok_to,
       array_to_string(list_slice(toks, i * 12 + 1, least(i * 12 + 16, n)), ' ')
         AS chunk_text
FROM c, UNNEST(generate_series(0, k - 1)) AS t(i)
"""
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 100
