"""Distribution diagnostics — the two tables you look at BEFORE sizing
a shuffle: which keys are hot (`key_skew_stats` — every groupBy/join in
this package documents its skew story; this is the operator that
measures one), and how a numeric column is shaped (`column_histogram` —
the exact companion to the profiler's sketch estimates).

Both are single-aggregation plans whose outputs are parameter-sized
(top-k rows / ``bins`` rows), and both use only count arithmetic and
IEEE division/floor, so the SQL oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_stats(
    df: DataFrame, key_cols: str | list[str], k: int = 20
) -> DataFrame:
    """Top-``k`` hottest keys: ``(key, n, share, rank)`` — ``key`` is
    the string form (multi-column keys join with ``'|'`` via
    ``concat_ws``, which skips NULL parts — the SQL function's own
    semantics), ``share`` is ``n / total`` (the fraction of all rows a
    single reduce task would receive), ``rank`` the 1-based position in
    the total (n desc, key asc) order. Plan: one map-side-combined
    groupBy + TakeOrdered; the total rides a broadcast 1-row cross
    join. A top share near 1/parallelism or above is the signal to salt
    (`spark/aggregate.py` grouped builds) or split (`operators/dedup.py`
    hot-bucket modes)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    for c in keys:
        if c not in df.columns:
            raise ValueError(f"key column {c!r} not in {df.columns}")
    key = (
        F.col(keys[0]).cast("string")
        if len(keys) == 1
        else F.concat_ws("|", *[F.col(c).cast("string") for c in keys])
    )
    counts = df.select(key.alias("key")).groupBy("key").agg(
        F.count("*").alias("n")
    )
    total = counts.agg(F.sum("n").alias("__total"))
    top = counts.orderBy(F.col("n").desc(), F.col("key")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("key"))
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n") / F.col("__total"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select("key", "n", "share", "rank")
    )


def column_histogram(
    df: DataFrame,
    col: str,
    bins: int,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Exact equi-width histogram: ``bins`` rows ``(bin, lo_edge,
    hi_edge, n)`` (empty bins included with n=0). Bounds default to the
    column's min/max (computed in the same job via a broadcast 1-row
    cross join — no driver action); explicit bounds EXCLUDE
    out-of-range rows. The top edge is closed (x == hi lands in the
    last bin); NULLs are excluded. Bin arithmetic is the literal
    ``floor((x - lo) / ((hi - lo) / bins))`` — the SQL mirror must use
    the identical expression for bit-equal IEEE results. Degenerate
    ``hi == lo`` puts everything in bin 0."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if col not in df.columns:
        raise ValueError(f"column {col!r} not in {df.columns}")
    if (lo is None) != (hi is None):
        raise ValueError("pass both lo and hi, or neither")
    x = F.col(col).cast("double")
    vals = df.select(x.alias("__x")).where(
        F.col("__x").isNotNull() & ~F.isnan("__x")
    )
    if lo is None:
        bounds = vals.agg(
            F.min("__x").alias("__lo"), F.max("__x").alias("__hi")
        )
        src = vals.crossJoin(F.broadcast(bounds))
    else:
        if hi < lo:
            raise ValueError(f"hi < lo: {hi} < {lo}")
        src = vals.withColumn("__lo", F.lit(float(lo))).withColumn(
            "__hi", F.lit(float(hi))
        )
        src = src.where((F.col("__x") >= F.col("__lo")) & (F.col("__x") <= F.col("__hi")))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    raw_bin = F.floor((F.col("__x") - F.col("__lo")) / width)
    b = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(raw_bin, F.lit(bins - 1))
    )
    counted = (
        src.select(
            b.cast("bigint").alias("bin"), "__lo", "__hi"
        )
        .groupBy("bin", "__lo", "__hi")
        .agg(F.count("*").alias("n"))
    )
    # densify: every bin present even when empty (edges need lo/hi, so
    # carry them through a 1-row cross join of the bounds)
    spark = df.sparkSession
    all_bins = spark.range(bins).select(F.col("id").cast("bigint").alias("bin"))
    if lo is None:
        edges = all_bins.crossJoin(F.broadcast(bounds))
    else:
        edges = all_bins.withColumn("__lo", F.lit(float(lo))).withColumn(
            "__hi", F.lit(float(hi))
        )
    width_e = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    return (
        edges.join(counted.select("bin", "n"), "bin", "left")
        .select(
            "bin",
            (F.col("__lo") + F.col("bin") * width_e).alias("lo_edge"),
            F.when(
                F.col("bin") == bins - 1, F.col("__hi")
            ).otherwise(F.col("__lo") + (F.col("bin") + 1) * width_e).alias(
                "hi_edge"
            ),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )
