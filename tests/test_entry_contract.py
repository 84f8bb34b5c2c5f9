"""Mimics the driver's oracle gate: every queries() entry at sf0.01 must
match its oracle_sql() DuckDB result on row count, column names, and
order-insensitive values (SURVEY.md §5.2 item 6)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in entrymod.queries.__globals__["load"].__globals__["TABLES"]:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def _rows_to_set(cols, rows):
    return sorted(tuple(_norm(r[c]) for c in cols) for r in rows)


@pytest.mark.parametrize("name", list(entrymod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    df = q(spark, SF_DIR)
    cols = sorted(df.columns)
    got = _rows_to_set(cols, [r.asDict() for r in df.collect()])
    if sql is None:
        assert len(got) >= 0  # rows-only check
        return
    res = ddb.execute(sql).fetchdf()
    assert sorted(res.columns.tolist()) == cols, (name, res.columns, cols)
    want = _rows_to_set(cols, res.to_dict("records"))
    assert len(got) == len(want), (name, len(got), len(want))
    assert got == want, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
