"""Gap-based sessionization — the transcript/event primitive.

"Group each user's events into sessions separated by >= gap of
inactivity" is the first step of almost every transcript analysis
(conversation turns -> conversations, clickstream -> visits). The
batch plan is the classic one-shuffle sessionizer: hash-partition by
the session key, per-key event-time order, ``lag`` marks the breaks,
a running sum numbers the sessions — one Exchange on the key, window
work entirely in-task. At 100 TB the shuffle carries the event rows
once; the only skew unit is a single key's event count (a window
over one key sorts in one task — the standard bound for any
sessionizer, including Spark's own ``session_window``).

Boundary semantics match ``F.session_window`` exactly: two
consecutive events stay in one session iff their gap is <= ``gap_s``
(measured: the native window merges an event landing exactly on
``last + gap``; only a strictly larger gap breaks), so the
window-function plan here and the native streaming aggregation in
:mod:`sprout_spark.streaming.sessions` produce identical sessions
and can share one SQL oracle. All arithmetic is integer
microseconds (:func:`event_us`) — engine-portable with DuckDB's
``epoch_us`` with no float rounding anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def event_us(c: Column) -> Column:
    """Integer microseconds for an event timestamp, timezone-FREE: the
    column is cast to TIMESTAMP_NTZ and subtracted from the NTZ epoch —
    a day-time interval whose DECIMAL cast is exact fractional seconds
    (the long cast would truncate to whole seconds), scaled to micros
    in decimal arithmetic. For the NTZ columns the test tables carry
    this is the literal stored value (``epoch_us`` in DuckDB) on any
    box timezone; ``unix_micros`` after a ``cast("timestamp")`` would
    shift with the session zone."""
    epoch = F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00"))
    iv = c.cast("timestamp_ntz") - epoch
    return (iv.cast("decimal(25,6)") * 1_000_000).cast("long")


def _gap_us(gap_s: float) -> int:
    gap = int(round(gap_s * 1_000_000))
    if gap <= 0:
        raise ValueError(f"gap_s must be > 0, got {gap_s}")
    return gap


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_s: float,
    out_col: str = "session_idx",
) -> DataFrame:
    """Add ``out_col``: the 1-based per-key session number in event-time
    order. A new session starts when the gap since the key's previous
    event EXCEEDS ``gap_s`` (delta == gap still merges — the measured
    ``session_window`` boundary rule; ties at the same timestamp always
    share a session, whatever their internal order). One shuffle on
    ``key_col``; the lag + running-sum pair runs in the same window
    partition (one Window node, no second exchange)."""
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists")
    brk_col = out_col + "__brk"
    if brk_col in df.columns:
        raise ValueError(f"column {brk_col!r} already exists")
    us = event_us(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(us)
    prev = F.lag(us).over(w)
    brk = (prev.isNull() | ((us - prev) > F.lit(_gap_us(gap_s)))).cast("bigint")
    cum = Window.partitionBy(key_col).orderBy(us).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # brk materializes first (window functions cannot nest); both specs
    # share (partition, order), so they run off ONE exchange. RANGE
    # frame on the cumsum: timestamp ties see the same cumulative break
    # count, so tied rows share a session whatever their tie order.
    return (
        df.withColumn(brk_col, brk)
        .withColumn(out_col, F.sum(brk_col).over(cum))
        .drop(brk_col)
    )


def session_stats(
    df: DataFrame, key_col: str, ts_col: str, gap_s: float
) -> DataFrame:
    """One row per session: (key, session_idx, session_start_us,
    n_events, duration_us). The groupBy lands on data already
    partitioned by key with a map-side partial, so its exchange moves
    session-count rows, not event rows."""
    us = event_us(F.col(ts_col))
    s = sessionize(df, key_col, ts_col, gap_s).withColumn("_us", us)
    return (
        s.groupBy(key_col, "session_idx")
        .agg(
            F.min("_us").alias("session_start_us"),
            F.count("*").alias("n_events"),
            (F.max("_us") - F.min("_us")).alias("duration_us"),
        )
        .select(
            key_col, "session_idx", "session_start_us", "n_events", "duration_us"
        )
    )
