"""Table loading helpers.

Tests/bench read the driver-generated parquet at /root/testdata/sf*/
(TESTDATA.md). In production the same code reads an Iceberg catalog
table — the scan is the only part that changes:
``spark.read.format("iceberg").load("catalog.db.transcripts")``.
Everything downstream consumes a DataFrame, so Catalyst still gets to
prune columns/partitions either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table (parquet dir layout) or an Iceberg table if
    ``sf_dir`` is an ``iceberg:`` URI."""
    if sf_dir.startswith("iceberg:"):
        return spark.read.format("iceberg").load(f"{sf_dir[8:]}.{name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
