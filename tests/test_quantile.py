"""Sketch-guided exact quantiles (operators/quantile.py): exactness vs
numpy/DuckDB type-1 semantics, forced multi-pass narrowing, massive-tie
early exit, trim band, and guards."""

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from sprout_spark.operators.quantile import exact_quantile, trim_by_quantile


def _type1(values, q):
    """kth smallest, k = ceil(q*n) — the operator's rank definition."""
    s = np.sort(np.asarray(values, dtype=np.float64))
    k = min(max(int(math.ceil(q * len(s))), 1), len(s))
    return float(s[k - 1])


@pytest.fixture(scope="module")
def skewed(spark):
    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [rng.lognormal(3, 1.5, 20_000), rng.uniform(0, 5, 5_000)]
    )
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"]).repartition(8)
    return df, vals


@pytest.mark.parametrize("q", [0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0])
def test_exact_on_continuous(skewed, q):
    df, vals = skewed
    # tiny bracket forces several narrowing passes on 25k rows
    got = exact_quantile(df, "x", q, max_bracket_rows=500)
    assert got == _type1(vals, q), q


def test_matches_duckdb_quantile_disc(skewed):
    df, vals = skewed
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?::DOUBLE[]) AS x", [list(vals)])
    for q in (0.05, 0.5, 0.95):
        want = con.execute(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
        assert exact_quantile(df, "x", q, max_bracket_rows=500) == want, q


def test_massive_ties_terminate(spark):
    # one value carries 90% of the mass: the bracket cannot shrink past
    # it; the on-estimate rank check must return it exactly
    vals = [5.0] * 9000 + [float(i) for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"]).repartition(8)
    # rank 5000 lands inside the 9001-copy run of 5.0 (early exit);
    # rank 9500 lands past it, in the sparse upper tail
    for q in (0.5, 0.95):
        assert exact_quantile(df, "x", q, max_bracket_rows=100) == _type1(vals, q), q
    assert _type1(vals, 0.5) == 5.0  # the tie case really is exercised


def test_nulls_and_nans_excluded(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,), (float("nan"),)], ["x"]
    )
    assert exact_quantile(df, "x", 0.5) == 2.0


def test_small_input_no_iteration(spark):
    df = spark.createDataFrame([(float(i),) for i in range(10)], ["x"])
    assert exact_quantile(df, "x", 0.3) == 2.0  # k=ceil(3)=3 -> 3rd smallest


def test_guards(spark):
    df = spark.createDataFrame([(1.0,)], ["x"])
    with pytest.raises(ValueError, match="q must be"):
        exact_quantile(df, "x", 1.5)
    empty = df.where(F.col("x") < 0)
    with pytest.raises(ValueError, match="no non-null"):
        exact_quantile(empty, "x", 0.5)
    with pytest.raises(ValueError, match="lo_q <= hi_q"):
        trim_by_quantile(df, "x", 0.9, 0.1)


def test_trim_band(skewed):
    df, vals = skewed
    kept = trim_by_quantile(df, "x", 0.05, 0.95, max_bracket_rows=500)
    lo, hi = _type1(vals, 0.05), _type1(vals, 0.95)
    got = np.sort(np.array([r["x"] for r in kept.collect()]))
    want = np.sort(vals[(vals >= lo) & (vals <= hi)])
    assert np.array_equal(got, want)
