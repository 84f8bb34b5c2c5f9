"""Distribution diagnostics (operators/stats.py): skew top-k semantics,
histogram exactness vs numpy, edge/NULL/degenerate handling, guards,
and DuckDB replays for both."""

import random

import duckdb
import numpy as np
import pytest
from pyspark.sql import Row

from sprout_spark.operators.stats import column_histogram, key_skew_stats


def test_key_skew_semantics(spark):
    rows = [Row(u=0)] * 50 + [Row(u=1)] * 30 + [Row(u=2)] * 15 + [Row(u=3)] * 5
    df = spark.createDataFrame(rows, "u int").repartition(6)
    got = [tuple(r) for r in key_skew_stats(df, "u", k=3).orderBy("rank").collect()]
    assert got == [("0", 50, 0.5, 1), ("1", 30, 0.3, 2), ("2", 15, 0.15, 3)]


def test_key_skew_multi_and_nulls(spark):
    df = spark.createDataFrame(
        [Row(a="x", b=1), Row(a="x", b=1), Row(a=None, b=2), Row(a="y", b=None)],
        "a string, b int",
    )
    got = {r["key"]: r["n"] for r in key_skew_stats(df, ["a", "b"], k=10).collect()}
    # concat_ws skips NULL parts (SQL semantics)
    assert got == {"x|1": 2, "2": 1, "y": 1}


def test_histogram_matches_numpy(spark):
    rng = random.Random(7)
    xs = [rng.gauss(0, 1) for _ in range(5000)]
    df = spark.createDataFrame([Row(x=v) for v in xs], "x double").repartition(8)
    got = {r["bin"]: r for r in column_histogram(df, "x", 16).collect()}
    lo, hi = min(xs), max(xs)
    w = (hi - lo) / 16.0
    ref = [0] * 16
    for v in xs:
        ref[min(int((v - lo) // w), 15)] += 1
    assert [got[i]["n"] for i in range(16)] == ref
    assert got[0]["lo_edge"] == lo and got[15]["hi_edge"] == hi
    assert got[3]["lo_edge"] == pytest.approx(lo + 3 * w, abs=0)


def test_histogram_bounds_nulls_degenerate(spark):
    df = spark.createDataFrame(
        [Row(x=v) for v in [None, float("nan"), -5.0, 0.0, 3.0, 10.0, 11.0]],
        "x double",
    )
    got = {r["bin"]: r["n"] for r in column_histogram(df, "x", 2, lo=0.0, hi=10.0).collect()}
    # -5 and 11 excluded (explicit bounds); NULL/NaN excluded; 10 == hi
    # lands in the LAST bin (closed top edge)
    assert got == {0: 2, 1: 1}
    one = spark.createDataFrame([Row(x=4.2), Row(x=4.2)], "x double")
    rows = column_histogram(one, "x", 4).collect()
    assert {r["bin"]: r["n"] for r in rows}[0] == 2  # degenerate hi == lo
    assert sum(r["n"] for r in rows) == 2


def test_guards(spark):
    df = spark.createDataFrame([Row(x=1.0)], "x double")
    with pytest.raises(ValueError, match="bins"):
        column_histogram(df, "x", 0)
    with pytest.raises(ValueError, match="both lo and hi"):
        column_histogram(df, "x", 2, lo=0.0)
    with pytest.raises(ValueError, match="hi < lo"):
        column_histogram(df, "x", 2, lo=1.0, hi=0.0)
    with pytest.raises(ValueError, match="key column"):
        key_skew_stats(df, "nope")
    with pytest.raises(ValueError, match="k must"):
        key_skew_stats(df, "x", 0)


def test_duckdb_replays(spark):
    rng = random.Random(19)
    rows = [(rng.randrange(40), rng.gauss(10, 3)) for _ in range(4000)]
    df = spark.createDataFrame(rows, "u int, x double")
    con = duckdb.connect()
    con.execute("CREATE TABLE t(u INT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = sorted(map(tuple, key_skew_stats(df, "u", k=10).collect()))
    want = sorted(
        map(
            tuple,
            con.execute(
                "SELECT key, n, n * 1.0 / (SELECT count(*) FROM t) AS share, "
                "row_number() OVER (ORDER BY n DESC, key) AS rank FROM ("
                "SELECT CAST(u AS VARCHAR) AS key, count(*) AS n FROM t "
                "GROUP BY 1) QUALIFY rank <= 10"
            ).fetchall(),
        )
    )
    # share division: Spark computes n/total, oracle n*1.0/total — same
    # IEEE op on the same ints
    assert got == want
    goth = sorted(map(tuple, column_histogram(df, "x", 12).collect()))
    wanth = sorted(
        map(
            tuple,
            con.execute(
                """
WITH b AS (SELECT min(x) AS lo, max(x) AS hi FROM t),
binned AS (
  SELECT CAST(least(floor((x - lo) / ((hi - lo) / 12.0)), 11) AS BIGINT) AS bin
  FROM t, b
),
bins AS (SELECT unnest(generate_series(0, 11)) AS bin)
SELECT bins.bin, lo + bins.bin * ((hi - lo) / 12.0) AS lo_edge,
       CASE WHEN bins.bin = 11 THEN hi
            ELSE lo + (bins.bin + 1) * ((hi - lo) / 12.0) END AS hi_edge,
       coalesce(n, 0) AS n
FROM bins CROSS JOIN b
LEFT JOIN (SELECT bin, count(*) AS n FROM binned GROUP BY 1) c
  ON bins.bin = c.bin
"""
            ).fetchall(),
        )
    )
    assert goth == wanth
