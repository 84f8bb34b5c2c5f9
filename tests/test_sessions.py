"""Sessionization (operators/sessions.py + streaming/sessions.py):
boundary semantics, native-session_window equivalence, the one-exchange
plan, and the streaming twin's multi-batch merge + reconciliation."""

import os
import random
import tempfile
from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sprout_spark.operators.sessions import event_us, session_stats, sessionize
from sprout_spark.streaming.sessions import flush_threshold_us, stream_session_stats

BASE = datetime(2024, 1, 1)
GAP = 28800  # 8 hours


def _mk(spark, specs):
    """specs: list of (user, seconds) or (user, (seconds, micros))."""
    rows = []
    for u, s in specs:
        sec, us = s if isinstance(s, tuple) else (s, 0)
        rows.append(Row(user_id=u, ts=BASE + timedelta(seconds=sec, microseconds=us)))
    return spark.createDataFrame(rows)


def test_boundary_semantics(spark):
    # delta == gap merges (the measured native rule); delta just over breaks
    df = _mk(spark, [(1, 0), (1, GAP), (2, 0), (2, (GAP, 1)), (3, 0), (3, GAP - 1)])
    got = {
        (r["user_id"], r["session_idx"])
        for r in sessionize(df, "user_id", "ts", GAP).collect()
    }
    assert got == {(1, 1), (2, 1), (2, 2), (3, 1)}


def test_session_stats_values(spark):
    df = _mk(spark, [(1, 0), (1, 10), (1, 10 + GAP + 1), (1, 10 + GAP + 11)])
    rows = {
        r["session_idx"]: r
        for r in session_stats(df, "user_id", "ts", GAP).collect()
    }
    e0 = event_us(F.lit(BASE).cast("timestamp_ntz"))
    base_us = df.sparkSession.range(1).select(e0.alias("u")).first()["u"]
    assert rows[1]["n_events"] == 2 and rows[1]["duration_us"] == 10_000_000
    assert rows[1]["session_start_us"] == base_us
    assert rows[2]["n_events"] == 2 and rows[2]["duration_us"] == 10_000_000
    assert rows[2]["session_start_us"] == base_us + (10 + GAP + 1) * 1_000_000


def test_equivalence_with_native_session_window(spark):
    rng = random.Random(11)
    rows = []
    for u in range(6):
        t = BASE
        for _ in range(50):
            t = t + timedelta(
                seconds=rng.choice([5, 300, GAP - 1, GAP, GAP + 1, 4 * GAP]),
                microseconds=rng.choice([0, 1, 999999]),
            )
            rows.append(Row(user_id=u, ts=t))
    df = spark.createDataFrame(rows)
    mine = {
        tuple(r)
        for r in session_stats(df, "user_id", "ts", GAP)
        .select("user_id", "session_start_us", "n_events", "duration_us")
        .collect()
    }
    native = {
        tuple(r)
        for r in df.groupBy("user_id", F.session_window("ts", "8 hours"))
        .agg(
            F.min(event_us(F.col("ts"))).alias("s"),
            F.count("*").alias("n"),
            (F.max(event_us(F.col("ts"))) - F.min(event_us(F.col("ts")))).alias("d"),
        )
        .select("user_id", "s", "n", "d")
        .collect()
    }
    assert mine == native and len(mine) > 20


def test_single_exchange_plan(spark):
    df = _mk(spark, [(1, 0), (1, 10), (2, 0)])
    plan = sessionize(df, "user_id", "ts", GAP)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_guards(spark):
    df = _mk(spark, [(1, 0)])
    with pytest.raises(ValueError, match="gap_s"):
        sessionize(df, "user_id", "ts", 0)
    with pytest.raises(ValueError, match="already exists"):
        sessionize(df.withColumn("session_idx", F.lit(1)), "user_id", "ts", GAP)


def test_streaming_twin_matches_batch(spark):
    """Multi-batch replay (1 file per trigger) merges sessions across
    micro-batches; a flush sentinel closes every real session; the
    append emissions == batch stats exactly."""
    rng = random.Random(23)
    rows = []
    for u in range(4):
        t = BASE
        for _ in range(30):
            t = t + timedelta(seconds=rng.choice([60, 1800, GAP + 60, 3 * GAP]))
            rows.append(Row(user_id=u, ts=t))
    df = spark.createDataFrame(rows)
    want = {
        tuple(r)
        for r in session_stats(df, "user_id", "ts", GAP)
        .select("user_id", "session_start_us", "n_events", "duration_us")
        .collect()
    }
    # every replayed file spans the whole event range, so the delay must
    # exceed the full span (~45 days) or later batches would drop their
    # old events as late; the sentinel then still closes everything
    delay_s = 60 * 86400
    max_us = df.select(F.max(event_us(F.col("ts")))).first()[0]
    flush_us = flush_threshold_us(max_us, GAP, delay_s)
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "src")
        df.repartition(5).write.parquet(src)
        # the file source replays oldest-mtime first; writes can share an
        # mtime second, so bump the sentinel files' mtime explicitly to
        # guarantee the sentinel lands in the FINAL micro-batch (a
        # sentinel replayed early ratchets the watermark past every real
        # event and the whole corpus is dropped as late)
        before = set(os.listdir(src))
        spark.createDataFrame(
            [Row(user_id=-1, ts=datetime(1970, 1, 1) + timedelta(microseconds=flush_us))]
        ).coalesce(1).write.mode("append").parquet(src)
        import time as _time
        early, late = _time.time() - 60, _time.time() - 30
        for name in before:
            os.utime(os.path.join(src, name), (early, early))
        for name in set(os.listdir(src)) - before:
            os.utime(os.path.join(src, name), (late, late))
        stream = (
            spark.readStream.schema("user_id bigint, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        # NOTE: the sentinel must be filtered AFTER the sink — a filter on
        # the grouping key inside the streaming plan pushes below the
        # aggregation into the file scan, so the sentinel row never
        # reaches the watermark tracker and nothing ever flushes
        out = stream_session_stats(
            stream, "user_id", "ts", gap="8 hours",
            watermark_delay=f"{delay_s} seconds",
        )
        q = (
            out.writeStream.format("memory")
            .queryName("sess_twin")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(td, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not finish"
        emitted = [
            r.asDict()
            for r in spark.sql(
                "SELECT * FROM sess_twin WHERE user_id >= 0"
            ).collect()
        ]
    got = {
        (r["user_id"], r["session_start_us"], r["n_events"], r["duration_us"])
        for r in emitted
    }
    assert got == want and len(got) == len(emitted)  # each session once
