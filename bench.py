#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling evidence).

Runs the headline sketch builds at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Scaling evidence (north rule: throughput efficiency >= 0.8 from N to 4N
executors; sandbox stand-in per the driver instruction): the flagship
build runs at local[N] and local[4N] (SCALING_LEVELS) on identical input;
efficiency = (T_N/T_4N)/4. Levels default to 4/16 rather than 8/32 because
this sandbox VM shows ~20% hypervisor steal — local[32] can never obtain
32 real cores, which would understate the engine's scaling, not measure
it. Results also land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING_LEVELS = (4, 16)


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"sprout-spark-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .getOrCreate()
    )


TRANSCRIPTS_CONVS = 20_000  # "small" fixture (FIXTURES.md): ~200k turns
EXPLODE_FACTOR = 16  # -> ~3.2M distinct turns in the flagship build


def ensure_transcripts(tmp_dir: str) -> tuple[str, int]:
    """Generate the transcripts fixture once (untimed)."""
    from sprout_spark.sources.transcripts import write_transcripts_parquet

    path = os.path.join(tmp_dir, f"transcripts_{TRANSCRIPTS_CONVS}.parquet")
    marker = path + ".rows"
    if os.path.exists(marker):
        with open(marker) as f:
            return path, int(f.read())
    rows = write_transcripts_parquet(path, n_convs=TRANSCRIPTS_CONVS, seed=42)
    with open(marker, "w") as f:
        f.write(str(rows))
    return path, rows


def flagship_build(spark, transcripts_path: str, base_rows: int, parts: int) -> int:
    """The scaling workload (north-star shape): ONE pass over a
    transcripts table building Bloom-over-text + HLL-distinct-conv +
    CMS-tool-frequencies + t-digest text-length quantiles simultaneously.
    The input is tiled EXPLODE_FACTOR× with distinct suffixes so the hash
    kernels (not fixed job overhead) dominate, as they would at 100 TB."""
    from pyspark.sql import functions as F

    from sprout_spark.sketch import BloomFilter, CountMinSketch, HyperLogLog, TDigest
    from sprout_spark.spark.aggregate import build_sketches

    n_total = base_rows * EXPLODE_FACTOR
    t = (
        spark.read.parquet(transcripts_path)
        .repartition(parts)
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(EXPLODE_FACTOR - 1))))
        .select(
            F.concat_ws("-", "text", "rep").alias("text"),
            F.concat_ws("-", "conv_id", "rep").alias("conv_id"),
            "tool",
            F.length("text").cast("double").alias("text_len"),
        )
    )
    sks = build_sketches(
        t,
        {
            "bloom_text": ("text", lambda: BloomFilter(n_total + 1000, 0.01)),
            "hll_conv": ("conv_id", lambda: HyperLogLog(p=14)),
            "cms_tool": ("tool", lambda: CountMinSketch(0.0005, 0.01)),
            "tdigest_len": ("text_len", lambda: TDigest(200)),
        },
        fanin=16,
    )
    assert sks["bloom_text"].count == n_total
    assert sks["tdigest_len"].count == n_total
    return n_total


def run_suite(spark, sf_dir: str) -> tuple[dict, int]:
    """Headline per-query timings at the main parallelism level."""
    from pyspark.sql import functions as F

    from sprout_spark.sketch import (
        KLL,
        BloomFilter,
        CountMinSketch,
        HyperLogLog,
        TDigest,
    )
    from sprout_spark.spark.aggregate import build_grouped_sketches, build_sketch
    from sprout_spark.spark.probe import might_contain

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n_li = li.count()
    n_ev = ev.count()

    times: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        times[name] = round(time.perf_counter() - t0, 3)

    bf_holder = {}

    def bloom_build():
        bf_holder["bf"] = build_sketch(
            li, "l_orderkey", lambda: BloomFilter(n_li + 10, 0.001), fanin=16
        )

    timed("bloom_build_lineitem", bloom_build)
    timed(
        "bloom_probe_lineitem",
        lambda: li.where(
            might_contain(spark, bf_holder["bf"], F.col("l_orderkey"))
        ).count(),
    )
    timed(
        "hll_build_lineitem",
        lambda: build_sketch(li, "l_orderkey", lambda: HyperLogLog(p=14), fanin=16),
    )
    timed(
        "cms_build_events",
        lambda: build_sketch(
            ev, "event_type", lambda: CountMinSketch(0.0005, 0.01), fanin=16
        ),
    )
    timed(
        "tdigest_build_lineitem",
        lambda: build_sketch(
            li.select(F.col("l_extendedprice").cast("double").alias("v")),
            "v",
            lambda: TDigest(200),
            fanin=16,
        ),
    )
    timed(
        "kll_build_lineitem",
        lambda: build_sketch(
            li.select(F.col("l_extendedprice").cast("double").alias("v")),
            "v",
            lambda: KLL(200),
            fanin=16,
        ),
    )
    timed(
        "grouped_hll_by_event_type",
        lambda: build_grouped_sketches(
            ev, "event_type", "user_id", lambda: HyperLogLog(p=12), salt=8
        ).count(),
    )
    return times, n_li


def main() -> None:
    import tempfile

    tmp_dir = os.environ.get("SPARK_GRAFT_BENCH_TMP", tempfile.gettempdir())
    tpath, base_rows = ensure_transcripts(tmp_dir)

    # --- scaling evidence: identical flagship job at two parallelism levels
    scaling = {}
    rows_flagship = 0
    for cpus in SCALING_LEVELS:
        spark = make_spark(cpus)
        try:
            # warmup (JVM + python workers), then timed run
            flagship_build(spark, tpath, base_rows, parts=64)
            t0 = time.perf_counter()
            rows_flagship = flagship_build(spark, tpath, base_rows, parts=64)
            scaling[cpus] = time.perf_counter() - t0
        finally:
            spark.stop()

    t_small, t_big = scaling[SCALING_LEVELS[0]], scaling[SCALING_LEVELS[1]]
    ratio = SCALING_LEVELS[1] / SCALING_LEVELS[0]
    efficiency = (t_small / t_big) / ratio

    # --- headline suite at the main level
    spark = make_spark(CPUS)
    try:
        times, n_li = run_suite(spark, SF_DIR)
    finally:
        spark.stop()

    total = round(sum(times.values()), 3)
    throughput = round(rows_flagship / t_big, 1)
    result = {
        "metric": "headline_sketch_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "rows_lineitem": n_li,
        "flagship_turns": rows_flagship,
        "flagship_turns_per_sec": throughput,
        "scaling": {
            f"local[{SCALING_LEVELS[0]}]_sec": round(t_small, 3),
            f"local[{SCALING_LEVELS[1]}]_sec": round(t_big, 3),
            "efficiency": round(efficiency, 3),
        },
    }
    print(json.dumps(result))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    with open(md, "w") as f:
        f.write(
            "# BENCH — measured results\n\n"
            f"Input: `{SF_DIR}` (lineitem rows: {n_li}).\n\n"
            "## Scaling (north rule: efficiency >= 0.8 from N to 4N)\n\n"
            "Sandbox stand-in per driver instruction: the identical flagship "
            "job — ONE pass over a transcripts table "
            f"({rows_flagship:,} turns) building Bloom-over-text + "
            "HLL-distinct-conv + CMS-tool-frequencies + t-digest "
            "text-length quantiles simultaneously (64 input partitions, "
            "fanin-16 tree merge) — at two parallelism levels on the same "
            "input.\n\n"
            f"| level | wall sec | throughput (rows/s) |\n|---|---|---|\n"
            f"| local[{SCALING_LEVELS[0]}] | {t_small:.3f} | "
            f"{rows_flagship / t_small:,.0f} |\n"
            f"| local[{SCALING_LEVELS[1]}] | {t_big:.3f} | "
            f"{rows_flagship / t_big:,.0f} |\n\n"
            f"**Scaling efficiency (T{SCALING_LEVELS[0]}/T{SCALING_LEVELS[1]})"
            f"/{ratio:.0f} = {efficiency:.3f}**\n\n"
            "## Headline suite (local[%d])\n\n" % CPUS
            + "| query | sec |\n|---|---|\n"
            + "".join(f"| {k} | {v} |\n" for k, v in times.items())
            + f"| **total** | **{total}** |\n"
        )


if __name__ == "__main__":
    main()
