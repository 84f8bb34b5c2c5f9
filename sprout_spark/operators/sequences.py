"""Sequence assembly — rows -> ordered per-key sequences (the
transcript primitive in the other direction: `sessionize` cuts an event
stream INTO conversations; this re-assembles a key's rows into one
ordered document — turns into a conversation text for dedup/quality
scoring, a user's events into a behavioral sequence for mining).

One shuffle on the key; ordering is enforced INSIDE the aggregation by
sorting (order-cols, value) structs — ``collect_list`` order is shuffle
nondeterministic, so the proof of order lives in ``array_sort``, not in
any upstream ``sortWithinPartitions`` (which an optimizer may drop).
Ties on the order columns break on the value itself, making the output
a pure function of the data at any parallelism.

NULL handling matches the SQL the oracle runs: NULL values are skipped
by ``array_join`` exactly as ``string_agg`` skips them; rows whose
order key is NULL sort FIRST (Spark ``array_sort`` struct semantics) —
the SQL mirror must say ``NULLS FIRST``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_sequences(
    df: DataFrame,
    key_col: str,
    order_cols: str | list[str],
    value_col: str,
    sep: str = " ",
) -> DataFrame:
    """One row per key: ``(key, seq, n)`` — ``seq`` is the key's
    ``value_col`` strings joined by ``sep`` in (order_cols, value)
    order; ``n`` counts the rows (including NULL-value rows, which the
    join skips — ``n`` is the row count, not the token count)."""
    order = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    for c in (*order, value_col, key_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in {df.columns}")
    if not order:
        raise ValueError("order_cols must name at least one column")
    packed = F.struct(
        *[F.col(c).alias(f"o{i}") for i, c in enumerate(order)],
        F.col(value_col).cast("string").alias("v"),
    )
    return (
        df.groupBy(key_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(packed)), lambda x: x["v"]
                ),
                sep,
            ).alias("seq"),
            F.count("*").alias("n"),
        )
    )
