"""Table profiler (operators/profile.py): exact facts, estimate bounds,
column typing (float distinct abstention, non-numeric p50), NULL
semantics, and guards."""

import math
import random

import pytest
from pyspark.sql import Row

from sprout_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def fixture_df(spark):
    rng = random.Random(17)
    rows = []
    for i in range(2000):
        rows.append(
            Row(
                k=i,
                s=f"s{rng.randrange(300)}" if rng.random() > 0.1 else None,
                x=float(rng.gauss(50, 10)) if rng.random() > 0.25 else None,
                grp=rng.randrange(7),
            )
        )
    return spark.createDataFrame(rows, "k bigint, s string, x double, grp int").repartition(8)


def test_exact_facts_and_nulls(spark, fixture_df):
    prof = {r["column"]: r for r in profile_table(fixture_df).collect()}
    raw = fixture_df.collect()
    assert prof["k"]["n_rows"] == 2000 and prof["k"]["n_null"] == 0
    assert prof["s"]["n_null"] == sum(1 for r in raw if r["s"] is None)
    assert prof["x"]["n_null"] == sum(1 for r in raw if r["x"] is None)
    assert prof["k"]["min_str"] == "0" and prof["k"]["max_str"] == "1999"
    xs = [r["x"] for r in raw if r["x"] is not None]
    assert float(prof["x"]["min_str"]) == pytest.approx(min(xs))
    assert float(prof["x"]["max_str"]) == pytest.approx(max(xs))


def test_estimate_bounds(spark, fixture_df):
    prof = {r["column"]: r for r in profile_table(fixture_df).collect()}
    raw = fixture_df.collect()
    bound = 3 * 1.04 / math.sqrt(1 << 14)
    for c, exact in (
        ("k", 2000),
        ("s", len({r["s"] for r in raw if r["s"] is not None})),
        ("grp", 7),
    ):
        est = prof[c]["distinct_est"]
        assert abs(est - exact) <= bound * exact + 1, (c, est, exact)
    xs = sorted(r["x"] for r in raw if r["x"] is not None)
    p50 = prof["x"]["p50_est"]
    rank = sum(1 for v in xs if v <= p50) / len(xs)
    assert 0.45 <= rank <= 0.55
    ks = prof["k"]["p50_est"]
    assert abs(ks - 999.5) <= 0.05 * 2000


def test_column_typing(spark, fixture_df):
    prof = {r["column"]: r for r in profile_table(fixture_df).collect()}
    assert prof["x"]["distinct_est"] is None  # float: abstain
    assert prof["s"]["p50_est"] is None  # non-numeric: no quantile
    assert prof["grp"]["p50_est"] is not None


def test_null_not_conflated_with_empty(spark):
    df = spark.createDataFrame(
        [Row(s=""), Row(s=None), Row(s=None), Row(s="a")], "s string"
    )
    prof = profile_table(df).collect()[0]
    # distinct over non-null values {'', 'a'} = 2; NULLs counted apart
    assert prof["distinct_est"] == 2 and prof["n_null"] == 2


def test_subset_and_guards(spark, fixture_df):
    out = profile_table(fixture_df, cols=["k", "x"]).collect()
    assert {r["column"] for r in out} == {"k", "x"}
    with pytest.raises(ValueError, match="not in DataFrame"):
        profile_table(fixture_df, cols=["nope"])
    with pytest.raises(ValueError, match="no columns"):
        profile_table(fixture_df, cols=[])


def test_unsupported_types_abstain_not_crash(spark):
    # nested (array<float>) and decimal columns must abstain (NULL
    # distinct_est) instead of crashing the scan kernel; bool/date/
    # timestamp columns get real estimates through their casts
    import datetime
    from decimal import Decimal

    df = spark.createDataFrame(
        [
            Row(
                k=i,
                emb=[float(i), 1.0],
                flag=i % 2 == 0,
                d=datetime.date(2024, 1, 1 + i % 5),
                ts=datetime.datetime(2024, 1, 1, i % 24),
                dec=Decimal(i),
            )
            for i in range(100)
        ],
        "k bigint, emb array<float>, flag boolean, d date, "
        "ts timestamp, dec decimal(10,2)",
    ).repartition(4)
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["emb"]["distinct_est"] is None
    assert prof["dec"]["distinct_est"] is None
    assert prof["flag"]["distinct_est"] == 2
    assert prof["d"]["distinct_est"] == 5
    assert prof["ts"]["distinct_est"] == 24
    # exact facts still cover every column
    assert prof["emb"]["n_rows"] == 100 and prof["emb"]["n_null"] == 0
