"""Resumability tests (SURVEY.md §5.2 item 5 / FIXTURES.md §4): a build
interrupted after some partitions checkpointed must resume to the exact
uninterrupted result, with complete per-partition lineage."""

import pytest
from pyspark.sql import functions as F

from sprout_spark.sketch import BloomFilter, sketch_from_bytes
from sprout_spark.spark.aggregate import build_sketch
from sprout_spark.spark.checkpoint import (
    build_sketch_resumable,
    checkpointed_partials,
    lineage,
)


@pytest.fixture(scope="module")
def transcripts(spark, transcripts_path):
    return spark.read.parquet(transcripts_path).repartition(8)


def test_resume_matches_uninterrupted(spark, transcripts, tmp_path):
    n = transcripts.count()
    factory = lambda: BloomFilter(n + 10, 0.01)

    # ground truth: uninterrupted build
    truth = build_sketch(transcripts, "conv_id", factory)

    # simulate an interrupted run: checkpoint only partitions 0-3 by
    # building on a filtered half... instead, run the full checkpointed
    # partial step once, then DELETE half the partition rows to mimic a
    # crash after 4 of 8 partials were durably written.
    ckpt = str(tmp_path / "ckpt")
    checkpointed_partials(transcripts, "conv_id", factory, ckpt, spark)
    kept = spark.read.parquet(ckpt).where(F.col("part_id") < 4)
    half = str(tmp_path / "ckpt_half")
    kept.write.parquet(half)

    # resume from the half checkpoint: partitions 0-3 load, 4-7 recompute
    resumed = build_sketch_resumable(transcripts, "conv_id", factory, half, spark)
    assert resumed.count == truth.count == n
    assert (resumed.bits == truth.bits).all()  # bit-identical final sketch

    # lineage covers every partition exactly once after dedup
    lin = lineage(spark, half)
    parts = sorted(r["part_id"] for r in lin.select("part_id").distinct().collect())
    assert parts == list(range(8))
    assert lin.agg(F.sum("rows")).collect()[0][0] == n


def test_rerun_skips_completed_partitions(spark, transcripts, tmp_path):
    n = transcripts.count()
    factory = lambda: BloomFilter(n + 10, 0.01)
    ckpt = str(tmp_path / "ckpt2")

    first = build_sketch_resumable(transcripts, "conv_id", factory, ckpt, spark)
    n_rows_after_first = spark.read.parquet(ckpt).count()

    # second run: all partitions already done -> no new checkpoint rows
    second = build_sketch_resumable(transcripts, "conv_id", factory, ckpt, spark)
    assert spark.read.parquet(ckpt).count() == n_rows_after_first
    assert (second.bits == first.bits).all()
    assert second.count == n


def test_duplicate_attempts_deduplicated(spark, transcripts, tmp_path):
    n = transcripts.count()
    factory = lambda: BloomFilter(n + 10, 0.01)
    ckpt = str(tmp_path / "ckpt3")
    checkpointed_partials(transcripts, "conv_id", factory, ckpt, spark)
    # simulate a speculative duplicate: re-append partition 0's row
    dup = spark.read.parquet(ckpt).where(F.col("part_id") == 0)
    dup.write.mode("append").parquet(ckpt)

    resumed = build_sketch_resumable(transcripts, "conv_id", factory, ckpt, spark)
    truth = build_sketch(transcripts, "conv_id", factory)
    assert resumed.count == n == truth.count
    assert (resumed.bits == truth.bits).all()


def test_resume_refuses_repartitioned_source(spark, transcripts_path, tmp_path):
    """Resume skips by partition id, so a resume whose partition ids no
    longer mean the same rows (repartitioned df) must be refused, not
    silently merged into a wrong sketch."""
    import pytest

    from sprout_spark.spark.checkpoint import build_sketch_resumable

    df = spark.read.parquet(transcripts_path)
    n = df.count()
    ck = str(tmp_path / "ck_fp")
    fac = lambda: BloomFilter(n + 10, 0.01)
    build_sketch_resumable(df, "conv_id", fac, ck, spark)
    with pytest.raises(ValueError, match="holds partials for"):
        build_sketch_resumable(df.repartition(13), "conv_id", fac, ck, spark)
