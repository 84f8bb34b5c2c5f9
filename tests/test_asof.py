"""As-of join (operators/asof.py): DuckDB ASOF LEFT JOIN equivalence
(randomized, with ties), inclusive-boundary semantics, tolerance,
NULL handling, numeric-ts path, and the one-Exchange/no-Join plan."""

import random
from datetime import datetime, timedelta

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sprout_spark.operators.asof import asof_join

BASE = datetime(2024, 1, 1)


def _ts(s):
    return BASE + timedelta(seconds=s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_basic_semantics(spark):
    left = _mk(
        spark,
        [(1, _ts(2), "l1"), (1, _ts(5), "l2"), (1, _ts(10), "l3"), (2, _ts(7), "l4")],
        "k int, ts timestamp, lv string",
    )
    right = _mk(
        spark,
        [(1, _ts(5), "x"), (1, _ts(8), "y"), (3, _ts(1), "z")],
        "k int, ts timestamp, s string",
    )
    got = {
        (r["k"], r["lv"], r["s"])
        for r in asof_join(left, right, "k", "ts").collect()
    }
    # inclusive at equal ts (l2 matches x), latest prior (l3 matches y),
    # no prior (l1) and no right key at all (l4) -> NULL
    assert got == {(1, "l1", None), (1, "l2", "x"), (1, "l3", "y"), (2, "l4", None)}


def test_matched_ts_and_tolerance(spark):
    left = _mk(spark, [(1, _ts(100), "a"), (1, _ts(200), "b")], "k int, ts timestamp, lv string")
    right = _mk(spark, [(1, _ts(95), "r1")], "k int, ts timestamp, s string")
    rows = {
        r["lv"]: r
        for r in asof_join(
            left, right, "k", "ts", tolerance_s=10.0, matched_ts_col="m_us"
        ).collect()
    }
    # 5s old: within tolerance; 105s old: nulled out (including m_us)
    assert rows["a"]["s"] == "r1" and rows["a"]["m_us"] == _epoch_us(_ts(95))
    assert rows["b"]["s"] is None and rows["b"]["m_us"] is None


def _epoch_us(dt):
    return int((dt - datetime(1970, 1, 1)).total_seconds() * 1_000_000)


def test_numeric_ts_path(spark):
    left = _mk(spark, [(1, 10, "a"), (1, 3, "b")], "k int, t bigint, lv string")
    right = _mk(spark, [(1, 4, 99)], "k int, t bigint, v int")
    rows = {r["lv"]: r["v"] for r in asof_join(left, right, "k", "t").collect()}
    assert rows == {"a": 99, "b": None}
    # tolerance in raw units on numeric ts: gap is 10-4=6
    for tol, want_a in ((6, 99), (5, None)):
        rows = {
            r["lv"]: r["v"]
            for r in asof_join(left, right, "k", "t", tolerance_s=tol).collect()
        }
        assert rows == {"a": want_a, "b": None}, tol


def test_null_handling(spark):
    left = _mk(
        spark,
        [(1, _ts(5), "a"), (1, None, "b"), (None, _ts(5), "c")],
        "k int, ts timestamp, lv string",
    )
    right = _mk(
        spark,
        [(1, _ts(1), "x"), (1, None, "bad_ts"), (None, _ts(0), "bad_key")],
        "k int, ts timestamp, s string",
    )
    rows = {r["lv"]: r["s"] for r in asof_join(left, right, "k", "ts").collect()}
    # left rows all preserved; NULL-ts/NULL-key left rows match nothing;
    # NULL-ts/NULL-key right rows never match anything
    assert rows == {"a": "x", "b": None, "c": None}


def test_collision_suffix_and_guards(spark):
    left = _mk(spark, [(1, _ts(1), "L")], "k int, ts timestamp, s string")
    right = _mk(spark, [(1, _ts(0), "R")], "k int, ts timestamp, s string")
    out = asof_join(left, right, "k", "ts")
    assert "s_r" in out.columns and out.first()["s_r"] == "R"
    with pytest.raises(ValueError, match="value_cols"):
        asof_join(left, right, "k", "ts", value_cols=["nope"])
    with pytest.raises(ValueError, match="key column"):
        asof_join(left, right, "missing", "ts")
    with pytest.raises(ValueError, match="collides"):
        asof_join(left, right, "k", "ts", matched_ts_col="s_r")


def test_plan_one_exchange_no_join(spark):
    left = _mk(spark, [(1, _ts(1), "a")], "k int, ts timestamp, lv string")
    right = _mk(spark, [(1, _ts(0), "x")], "k int, ts timestamp, s string")
    plan = (
        asof_join(left, right, "k", "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_randomized_duckdb_asof_equivalence(spark):
    """~600 left x 300 right rows with engineered ties (both at equal
    left/right ts and duplicate left ts) across 8 keys, two value
    columns, equality against DuckDB's native ASOF LEFT JOIN."""
    rng = random.Random(7)
    lrows = [
        (rng.randrange(8), _ts(rng.randrange(0, 5000)), i)
        for i in range(600)
    ]
    # right timestamps unique per key (ASOF is ambiguous otherwise)
    seen = set()
    rrows = []
    for i in range(300):
        k, t = rng.randrange(8), rng.randrange(0, 5000)
        if (k, t) in seen:
            continue
        seen.add((k, t))
        rrows.append((k, _ts(t), f"s{i}", float(i)))
    left = _mk(spark, lrows, "k int, ts timestamp, lid int")
    right = _mk(spark, rrows, "k int, ts timestamp, s string, v double")
    got = sorted(
        (r["k"], r["lid"], r["s"], r["v"], r["m"])
        for r in asof_join(
            left, right, "k", "ts", matched_ts_col="m"
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k INT, ts TIMESTAMP, lid INT)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", lrows)
    con.execute("CREATE TABLE r(k INT, ts TIMESTAMP, s VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO r VALUES (?, ?, ?, ?)", rrows)
    want = sorted(
        tuple(row)
        for row in con.execute(
            "SELECT l.k, l.lid, r.s, r.v, epoch_us(r.ts) "
            "FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    )
    assert got == want and len(got) == 600
