"""Scale-adaptive input spreading for expensive one-pass kernels.

A parquet ROW GROUP is the minimum real split unit: a small table
written as one row group lands entirely in one scan task no matter how
many byte-split partitions the scan plans (the other tasks' byte ranges
contain no row-group start and produce zero rows). Every downstream
mapInArrow kernel then runs serially on one core — measured at sf0.1:
the containment fingerprint kernel spent 2.5s in ONE task of a 33-task
stage while 31 cores idled.

:func:`spread_small_input` is the guide-§2.5 "repartition immediately
after the read" hedge made scale-adaptive: when the optimizer's size
estimate (plan statistics — no job runs) says the whole input is at
most ``spark.sprout.spread.maxBytes`` (default 256 MB), the input is
round-robin repartitioned to the session's default parallelism — a
shuffle that costs well under a second at that size. Larger inputs are
left untouched: they necessarily span many row groups, their scans are
already wide, and repartitioning them would shuffle the corpus. The
threshold is session-configurable (set 0 to disable).

Row order is not preserved (round-robin repartition); callers are the
order-insensitive kernel operators (signatures, fingerprints, sketch
partials), whose outputs are per-row or merge-associative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CONF_KEY = "spark.sprout.spread.maxBytes"
_DEFAULT_MAX_BYTES = 256 << 20


def spread_small_input(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition a provably-small input to default parallelism; pass
    anything large (or of unknown size) through unchanged."""
    spark = df.sparkSession
    try:
        max_bytes = int(spark.conf.get(_CONF_KEY, str(_DEFAULT_MAX_BYTES)))
    except Exception:
        max_bytes = _DEFAULT_MAX_BYTES
    if max_bytes <= 0:
        return df
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        # the size estimate is only trustworthy for scan-shaped plans
        # (project/filter over file sources, where it is bounded by the
        # file bytes). Row-multiplying operators make it a fiction —
        # a 16x explode estimates at its CHILD's size — and spreading
        # on a fiction would shuffle a corpus, so refuse them.
        text = plan.toString()
        # Generate/Join: row-multiplying — the estimate is a fiction.
        # Aggregate/Window/Sort/Repartition/Union: the input already
        # went (or will go) through an exchange that spreads it; a
        # second repartition would be a pure extra shuffle.
        if any(
            k in text
            for k in (
                "Generate", "Join", "Aggregate", "Window", "Sort",
                "Repartition", "Union",
            )
        ):
            return df
        size = int(str(plan.stats().sizeInBytes()))
    except Exception:
        return df  # size unknown: never risk shuffling a corpus
    if size > max_bytes:
        return df
    want = min_parts or spark.sparkContext.defaultParallelism
    # hash-repartition on the row content where possible: round-robin
    # repartition pays a per-partition sort (sortBeforeRepartition, the
    # SPARK-23207 retry fix) that serializes on the one populated input
    # partition — hash partitioning is retry-safe without it (the keys
    # are deterministic row values). Map-typed columns can't hash;
    # xxhash64 of the remaining columns spreads fine (load balance only
    # — correctness never depends on the assignment).
    from pyspark.sql import functions as F

    hashable = [c for c, t in df.dtypes if "map<" not in t]
    if hashable:
        return df.repartition(want, F.xxhash64(*hashable))
    return df.repartition(want)
