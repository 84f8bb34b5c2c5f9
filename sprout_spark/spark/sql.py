"""SQL surface: register sketch probes as Spark SQL functions.

The DataFrame API (``spark/probe.py``) covers PySpark users; this module
covers the ``spark.sql(...)`` users — after
``register_sketch_sql(spark, "seen", bloom)`` any SQL statement (or JDBC
/ notebook session sharing the SparkSession) can write

    SELECT * FROM events WHERE seen_might_contain(user_id)
    SELECT event_type, seen_cms_estimate(tool) FROM events
    SELECT seen_quantile_rank(value) FROM events

Each registered function closes over ONE broadcast of the serialized
sketch (same memoized broadcast cache as the Column API, so registering
and probing via both surfaces shares a single copy per executor) and
probes through the same Arrow-native vectorized kernels — registration
adds a name, not a slower path. Functions registered on a session last
for the session; re-registering the same name replaces the sketch (the
standard way to roll a nightly-rebuilt filter under a stable SQL name).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DoubleType, LongType

from ..sketch.base import MergeableSketch
from .probe import _broadcast_payload, _chunked, _revive


def register_sketch_sql(
    spark: SparkSession, prefix: str, sketch: MergeableSketch
) -> list[str]:
    """Register SQL probe functions for ``sketch`` under ``prefix``.

    Registers whichever probes the sketch supports:
    ``<prefix>_might_contain`` (membership — bloom/SBF),
    ``<prefix>_cms_estimate`` (frequency — CMS), and
    ``<prefix>_quantile_rank`` (rank fraction — t-digest ``cdf`` / KLL
    ``rank``). Returns the list of names registered."""
    bc = _broadcast_payload(spark, sketch.to_bytes())
    names: list[str] = []

    if hasattr(sketch, "contains_arrow"):

        @F.arrow_udf(BooleanType())
        def _contains(a: pa.Array) -> pa.Array:
            sk = _revive(bc.value)
            return pa.array(sk.contains_arrow(_chunked(a)), pa.bool_())

        name = f"{prefix}_might_contain"
        spark.udf.register(name, _contains)
        names.append(name)

    if hasattr(sketch, "estimate_arrow"):

        @F.arrow_udf(LongType())
        def _estimate(a: pa.Array) -> pa.Array:
            sk = _revive(bc.value)
            return pa.array(
                sk.estimate_arrow(_chunked(a)).astype("int64"), pa.int64()
            )

        name = f"{prefix}_cms_estimate"
        spark.udf.register(name, _estimate)
        names.append(name)

    if hasattr(sketch, "cdf") or hasattr(sketch, "rank"):

        @F.arrow_udf(DoubleType())
        def _rank(a: pa.Array) -> pa.Array:
            sk = _revive(bc.value)
            vals = _chunked(a).to_numpy(zero_copy_only=False).astype(np.float64)
            out = sk.cdf(vals) if hasattr(sk, "cdf") else sk.rank(vals)
            return pa.array(np.atleast_1d(out), pa.float64())

        name = f"{prefix}_quantile_rank"
        spark.udf.register(name, _rank)
        names.append(name)

    if not names:
        raise ValueError(
            f"sketch {type(sketch).__name__} exposes no Arrow probe kernel"
        )
    return names
