"""SQL surface: register sketch probes as Spark SQL functions.

The DataFrame API (``spark/probe.py``) covers PySpark users; this module
covers the ``spark.sql(...)`` users — after
``register_sketch_sql(spark, "seen", bloom)`` any SQL statement (or JDBC
/ notebook session sharing the SparkSession) can write

    SELECT * FROM events WHERE seen_might_contain(user_id)
    SELECT event_type, seen_cms_estimate(tool) FROM events
    SELECT seen_quantile_rank(value) FROM events

Registration reuses the probe UDF factories from ``spark/probe.py`` —
one shared kernel and one memoized broadcast per sketch across both
surfaces, so registering adds a name, not a slower path or a second
payload copy. Functions registered on a session last for the session;
re-registering the same name replaces the sketch (the standard way to
roll a nightly-rebuilt filter under a stable SQL name).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sketch.base import MergeableSketch
from .probe import contains_udf, estimate_udf, rank_udf


def register_sketch_sql(
    spark: SparkSession, prefix: str, sketch: MergeableSketch
) -> list[str]:
    """Register SQL probe functions for ``sketch`` under ``prefix``.

    Registers whichever probes the sketch supports:
    ``<prefix>_might_contain`` (membership — bloom/SBF),
    ``<prefix>_cms_estimate`` (frequency — CMS), and
    ``<prefix>_quantile_rank`` (rank fraction — t-digest ``cdf`` / KLL
    ``rank``). Returns the list of names registered."""
    names: list[str] = []
    if hasattr(sketch, "contains_arrow"):
        name = f"{prefix}_might_contain"
        spark.udf.register(name, contains_udf(spark, sketch))
        names.append(name)
    if hasattr(sketch, "estimate_arrow"):
        name = f"{prefix}_cms_estimate"
        spark.udf.register(name, estimate_udf(spark, sketch))
        names.append(name)
    if hasattr(sketch, "cdf") or hasattr(sketch, "rank"):
        name = f"{prefix}_quantile_rank"
        spark.udf.register(name, rank_udf(spark, sketch))
        names.append(name)
    if not names:
        raise ValueError(
            f"sketch {type(sketch).__name__} exposes no Arrow probe kernel"
        )
    return names
