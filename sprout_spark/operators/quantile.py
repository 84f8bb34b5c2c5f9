"""Sketch-guided EXACT quantiles — and quantile-band trimming.

Exact percentiles at 10^12 rows normally cost a global sort. This
operator gets the exact answer in a handful of scans, no sort, bounded
memory, by letting a t-digest do the navigation and paying exactness
only inside a sketch-sized bracket:

1. build a t-digest over the current bracket (one ``mapInArrow``
   partial pass + tree merge — the library's standard build);
2. ask it for the (q−δ, q+δ) quantile estimates; the digest's rank
   error ≪ δ, so the true kth value lies between them;
3. ONE filtered aggregation counts rows ≤ each estimate, shrinking the
   bracket to the segment that contains rank k (~2δ of the bracket);
4. repeat until the bracket fits in one task, then resolve the exact
   kth element among the bracketed values.

Each pass shrinks the candidate set by ~2δ (δ=0.02 → 25× per pass), so
10^12 rows need 3-4 passes to reach a 2M-row bracket: total cost ≈ 4
column scans (each pushed-down to one numeric column), versus a full
shuffle-sort. The final resolution collects ONLY the bracket — at most
``max_bracket_rows`` float64s (16 MB at the default), a documented,
configured bound, not data-sized.

Rank definition: the kth smallest with k = ceil(q·n) over non-null
values — type-1 inverse CDF, identical to DuckDB/Postgres
``quantile_disc``/``percentile_disc``, so the oracle compares the
returned value EXACTLY (it is an element of the data, not an
interpolation).

Duplicate-heavy columns are the classic selection-algorithm trap (a
value carrying > 2δ of the mass stops the bracket shrinking); the
count step detects rank-k landing ON an estimate and returns it
exactly, so massive ties terminate early rather than stall.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sprout_spark.sketch.tdigest import TDigest
from sprout_spark.spark.aggregate import build_sketch


def exact_quantile(
    df: DataFrame,
    col: str,
    q: float,
    delta: float = 0.02,
    max_bracket_rows: int = 2_000_000,
    max_iters: int = 12,
    compression: int = 200,
) -> float:
    """Exact q-quantile (type-1, kth smallest, k = ceil(q·n)) of a
    numeric column via t-digest-guided bracket narrowing. Returns the
    exact value as float. Raises on an empty column or (pathological)
    non-convergence."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    vals = df.select(F.col(col).cast("double").alias("v")).where(
        F.col("v").isNotNull() & ~F.isnan("v")
    )
    n = vals.count()
    if n == 0:
        raise ValueError(f"exact_quantile: no non-null values in {col!r}")
    k = min(max(int(math.ceil(q * n)), 1), n)

    lo: float | None = None  # kth value v satisfies lo < v <= hi
    hi: float | None = None
    n_le_lo = 0  # exact count of rows <= lo (global)

    def bracket_df() -> DataFrame:
        b = vals
        if lo is not None:
            b = b.where(F.col("v") > lo)
        if hi is not None:
            b = b.where(F.col("v") <= hi)
        return b

    m = n
    for _ in range(max_iters):
        if m <= max_bracket_rows:
            break
        td = build_sketch(bracket_df(), "v", lambda: TDigest(compression))
        q_rel = (k - n_le_lo) / m
        a = float(td.quantile(max(0.0, q_rel - delta)))
        b = float(td.quantile(min(1.0, q_rel + delta)))
        # one aggregation: counts <= a, < a, <= b within the bracket
        row = bracket_df().agg(
            F.sum(F.when(F.col("v") <= a, 1).otherwise(0)).alias("le_a"),
            F.sum(F.when(F.col("v") < a, 1).otherwise(0)).alias("lt_a"),
            F.sum(F.when(F.col("v") <= b, 1).otherwise(0)).alias("le_b"),
        ).collect()[0]
        le_a, lt_a, le_b = int(row["le_a"]), int(row["lt_a"]), int(row["le_b"])
        target = k - n_le_lo  # rank within the bracket
        if lt_a < target <= le_a:
            return a  # rank-k lands ON the estimate: exact, tie-proof
        if target <= lt_a:
            hi, m_new = a, lt_a
        elif target <= le_b:
            lo, hi, m_new = a, b, le_b - le_a
            n_le_lo += le_a
        else:
            lo, m_new = b, m - le_b
            n_le_lo += le_b
        if m_new >= m:
            # the digest failed to shrink the bracket (rank error > δ —
            # should not happen at these compressions); widen δ rather
            # than loop forever
            delta = min(0.25, delta * 2)
        m = m_new

    if m > max_bracket_rows:
        raise RuntimeError(
            f"exact_quantile did not converge: bracket still {m} rows "
            f"after {max_iters} passes (max_bracket_rows={max_bracket_rows})"
        )
    bracket = [r["v"] for r in bracket_df().collect()]
    bracket.sort()
    return float(bracket[k - n_le_lo - 1])


def trim_by_quantile(
    df: DataFrame,
    col: str,
    lo_q: float = 0.0,
    hi_q: float = 1.0,
    **kwargs,
) -> DataFrame:
    """Keep rows whose ``col`` lies within the EXACT [lo_q, hi_q]
    quantile band — the standard outlier trim (drop the pathological
    length tails before training) with reproducible, engine-portable
    boundaries instead of approximate ones. Two sketch-guided
    selections + one map-only filter; rows with NULL/NaN ``col`` are
    dropped (they have no rank)."""
    if not 0.0 <= lo_q <= hi_q <= 1.0:
        raise ValueError(f"need 0 <= lo_q <= hi_q <= 1, got {lo_q}, {hi_q}")
    v = F.col(col).cast("double")
    out = df.where(v.isNotNull() & ~F.isnan(v))
    if lo_q > 0.0:
        out = out.where(v >= exact_quantile(df, col, lo_q, **kwargs))
    if hi_q < 1.0:
        out = out.where(v <= exact_quantile(df, col, hi_q, **kwargs))
    return out
