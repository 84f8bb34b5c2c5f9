"""As-of join — "for each left row, the latest right row at or before
its timestamp, per key" (point-in-time enrichment: join each event to
the dimension state that was current when it happened; each turn to the
latest prior tool result; each trade to the prevailing quote).

Spark has no native as-of join, and the naive range join
(``l.ts >= r.ts`` + window re-rank) explodes to the full per-key cross
product before pruning — a job-killer on a 100-TB fact table. The plan
here is the classic ONE-SHUFFLE union sessionizer shape:

  union(tagged left, tagged right)
    -> Exchange on the key (the only shuffle; union is free)
    -> in-task sort by (ts, tag)   [right rows first at equal ts]
    -> running ``last(right payload, ignorenulls)`` carries each right
       row forward to every later left row in the same key
    -> filter back to the left rows.

The shuffle moves each input row exactly once (left payload rides the
same exchange instead of paying a second join shuffle), there is no
Join node at all, and per-key skew degrades to an in-task sort — the
same bound as any windowed operator.

Semantics match DuckDB's ``ASOF LEFT JOIN`` (the oracle engine)
exactly: the match is inclusive (``l.ts >= r.ts``), per equality key;
left rows with no prior right row (or none within ``tolerance_s``)
keep NULL right columns; right rows with a NULL key or NULL timestamp
never match (SQL equality/comparison semantics — they are dropped
before the union). Ties BETWEEN the sides at equal ts match (the right
row sorts first); duplicate right rows at the SAME (key, ts) are
ambiguous in ASOF JOIN too — deduplicate the right side first if that
can occur (the oracle query aggregates to one row per (key, ts)).

Timestamps are compared as exact integer microseconds via
:func:`sprout_spark.operators.sessions.event_us` (timezone-free,
engine-portable); numeric ``ts_col`` types are compared as-is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from .sessions import event_us

_TS_TYPES = ("timestamp", "timestamp_ntz", "date")


def _ord_col(df: DataFrame, ts_col: str) -> Column:
    """Ordering/arithmetic key for the as-of comparison: exact integer
    microseconds for timestamp-ish columns, the raw value otherwise."""
    dt = dict(df.dtypes).get(ts_col)
    if dt is None:
        raise ValueError(f"ts_col {ts_col!r} not in {df.columns}")
    if dt in _TS_TYPES:
        return event_us(F.col(ts_col))
    return F.col(ts_col)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str,
    value_cols: list[str] | None = None,
    *,
    right_ts_col: str | None = None,
    tolerance_s: float | None = None,
    matched_ts_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``value_cols`` from the
    latest ``right`` row with the same ``on`` key and
    ``right.ts <= left.ts`` (inclusive), NULL when there is none.

    ``right_ts_col`` names the right side's timestamp when it differs
    from ``ts_col``. ``tolerance_s`` (seconds, timestamp columns only —
    raw units otherwise) nulls out matches older than the bound, like
    ``pandas.merge_asof(tolerance=)``. ``matched_ts_col`` additionally
    emits the matched right row's timestamp-ordinal under that name
    (integer microseconds for timestamp columns).

    Output columns: all of ``left``'s, then ``value_cols`` (suffixed
    ``_r`` on collision with a left name), then ``matched_ts_col`` if
    requested.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts_col or ts_col
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"key column {k!r} must exist on both sides")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*keys, rts)]
    missing = [c for c in value_cols if c not in right.columns]
    if missing:
        raise ValueError(f"value_cols not on right side: {missing}")
    if "ord" in value_cols:
        raise ValueError(
            "value column name 'ord' is reserved (the match-ordinal field "
            "of the carried payload struct); rename it on the right side"
        )
    out_names = {}
    for c in value_cols:
        name = f"{c}_r" if c in left.columns else c
        if name in left.columns or name in out_names.values():
            raise ValueError(f"output column {name!r} collides; rename inputs")
        out_names[c] = name
    if matched_ts_col is not None and (
        matched_ts_col in left.columns or matched_ts_col in out_names.values()
    ):
        raise ValueError(f"matched_ts_col {matched_ts_col!r} collides")

    ORD, TAG, PAY, MATCH = "__asof_ord", "__asof_tag", "__asof_pay", "__asof_m"
    for tmp in (ORD, TAG, PAY, MATCH):
        if tmp in left.columns or tmp in right.columns:
            raise ValueError(f"reserved column name {tmp!r} in input")

    # right rows: keys + ordinal + payload struct (ordinal inside the
    # struct so tolerance/matched-ts come from the SAME matched row);
    # NULL keys / NULL ts can never match — drop them before the union
    r_ord = _ord_col(right, rts)
    r_rows = right.where(r_ord.isNotNull())
    for k in keys:
        r_rows = r_rows.where(F.col(k).isNotNull())
    pay = F.struct(
        r_ord.alias("ord"), *[F.col(c).alias(c) for c in value_cols]
    )
    r_side = r_rows.select(
        *keys,
        r_ord.alias(ORD),
        F.lit(0).alias(TAG),
        pay.alias(PAY),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    )
    l_side = left.select(
        *keys,
        _ord_col(left, ts_col).alias(ORD),
        F.lit(1).alias(TAG),
        F.lit(None).cast(r_side.schema[PAY].dataType).alias(PAY),
        *[c for c in left.columns if c not in keys],
    )

    # (ord, tag) order puts a right row BEFORE left rows at the same
    # timestamp => inclusive match; running last() carries it forward
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ORD).asc_nulls_first(), F.col(TAG))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_side.unionByName(r_side)
    matched = unioned.withColumn(MATCH, F.last(PAY, ignorenulls=True).over(w))

    m = F.col(MATCH)
    if tolerance_s is not None:
        dt = dict(left.dtypes)[ts_col]
        tol = (
            int(round(tolerance_s * 1_000_000)) if dt in _TS_TYPES
            else tolerance_s
        )
        m = F.when(F.col(ORD) - F.col(MATCH)["ord"] <= F.lit(tol), m)
    out_cols = list(left.columns) + [
        m[c].alias(out_names[c]) for c in value_cols
    ]
    if matched_ts_col is not None:
        out_cols.append(m["ord"].alias(matched_ts_col))
    # left NULL-ts rows sort before every right row, so their running
    # last() is already NULL — no extra guard needed
    return matched.where(F.col(TAG) == 1).select(*out_cols)
