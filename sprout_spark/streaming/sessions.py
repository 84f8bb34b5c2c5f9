"""Streaming sessionization via Spark's native ``session_window``.

The streaming twin of :mod:`sprout_spark.operators.sessions`: the same
gap rule (events merge iff their gap is <= the session gap — the
native boundary is endpoint-inclusive, measured), run as a real
Structured Streaming aggregation so late/out-of-order events within
the watermark MERGE sessions exactly. State per open session is one
(min, max, count) triple — session-sized, not event-sized.

Session-window aggregations support only APPEND output (Spark refuses
update mode: ``STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION``), so a
session row is emitted exactly once — fully merged — when the
watermark passes its window end. That is also the operational
contract: a session "closes" when no event can legally join it
anymore. The flip side is that sessions still open when a bounded
replay ends never emit; the standard flush is one sentinel event far
enough in the future (> max event time + gap + watermark delay) under
a reserved key, delivered in the final file — the watermark then
ratchets past every real session's end and the closing no-data
micro-batch drains them all. :func:`flush_threshold_us` computes the
sentinel's minimum timestamp; callers filter the sentinel key out of
the result AFTER the sink (e.g. in the query over the sink table) —
NOT with a ``where`` on the streaming DataFrame: a predicate on the
grouping key is pushed below the aggregation into the source scan,
so the sentinel row would be filtered before the watermark tracker
ever sees its event time and no session would flush (measured).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sessions import event_us


def stream_session_stats(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "8 hours",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-session stats over an event stream: one APPEND row per
    CLOSED session with (key, session_start_us, n_events, duration_us).
    Bounds come from min/max aggregates (the window struct's end
    includes the +gap slack, so it is not used)."""
    us = event_us(F.col(ts_col))
    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col, F.session_window(ts_col, gap).alias("_w"))
        .agg(
            F.min(us).alias("session_start_us"),
            F.count("*").alias("n_events"),
            (F.max(us) - F.min(us)).alias("duration_us"),
        )
        .select(key_col, "session_start_us", "n_events", "duration_us")
    )


def flush_threshold_us(max_event_us: int, gap_s: float, delay_s: float) -> int:
    """Smallest sentinel timestamp (integer micros) guaranteed to close
    every session over events up to ``max_event_us``: the watermark
    must pass max_event + gap (the latest possible open window end), so
    the sentinel sits beyond max_event + gap + delay, with a 1s margin
    for the watermark's own subtraction."""
    return (
        max_event_us
        + int(round(gap_s * 1_000_000))
        + int(round(delay_s * 1_000_000))
        + 1_000_000
    )
