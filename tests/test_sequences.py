"""Sequence assembly (operators/sequences.py): order proof across
partitions, tie/NULL policy, guards, and a DuckDB replay."""

import random

import duckdb
import pytest
from pyspark.sql import Row

from sprout_spark.operators.sequences import assemble_sequences


def test_order_proof_across_partitions(spark):
    rows = [Row(k=1, o=i, v=f"t{i}") for i in range(40)]
    random.Random(3).shuffle(rows)
    df = spark.createDataFrame(rows, "k int, o int, v string").repartition(8)
    got = assemble_sequences(df, "k", "o", "v").first()
    assert got["seq"] == " ".join(f"t{i}" for i in range(40)) and got["n"] == 40


def test_ties_null_values_and_multi_order(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, a=1, b=2, v="x"),
            Row(k=1, a=1, b=1, v="z"),
            Row(k=1, a=1, b=1, v="y"),  # tie on (a, b): value breaks it
            Row(k=1, a=0, b=9, v=None),  # NULL value: counted, not joined
        ],
        "k int, a int, b int, v string",
    )
    got = assemble_sequences(df, "k", ["a", "b"], "v", sep="|").first()
    assert got["seq"] == "y|z|x" and got["n"] == 4


def test_guards(spark):
    df = spark.createDataFrame([Row(k=1, o=1, v="a")], "k int, o int, v string")
    with pytest.raises(ValueError, match="column"):
        assemble_sequences(df, "k", "missing", "v")
    with pytest.raises(ValueError, match="at least one"):
        assemble_sequences(df, "k", [], "v")


def test_duckdb_replay(spark):
    rng = random.Random(11)
    rows = [
        (rng.randrange(12), rng.randrange(1000), rng.randrange(50),
         f"e{rng.randrange(6)}")
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, "k int, o1 int, o2 int, v string")
    got = sorted(map(tuple, assemble_sequences(df, "k", ["o1", "o2"], "v").collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k INT, o1 INT, o2 INT, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    want = sorted(
        map(
            tuple,
            con.execute(
                "SELECT k, string_agg(v, ' ' ORDER BY o1 NULLS FIRST, "
                "o2 NULLS FIRST, v) AS seq, count(*) AS n FROM t GROUP BY k"
            ).fetchall(),
        )
    )
    assert got == want and len(got) == 12
