"""Streaming novelty filter — the reference's bloom-gated KV lookup
(`/root/reference/bloom.go:220-236`: probe the filter before touching the
store; a miss means "definitely never seen", skipping the expensive read)
lifted to Structured Streaming as EXACT first-occurrence dedup.

Per micro-batch:

1. distinct keys within the batch (micro-batch-local dedup);
2. probe the running Bloom — rows where it says NO are **definitely
   novel** (zero false negatives), no store lookup at all; at a typical
   novelty-heavy stream this is almost every row;
3. only the bloom-maybe subset (true repeats + an ε-fraction of false
   positives) anti-joins against the persisted seen-keys table — the
   exact check that makes the output exact, gated to a tiny slice of the
   stream exactly like the reference gates its KV `Get`;
4. novel keys append to the seen-keys table (one parquet dir per epoch —
   a replayed micro-batch overwrites its own dir, so replays are
   idempotent) and fold into the Bloom, which persists atomically with
   the epoch watermark (same commit protocol as
   :class:`~sprout_spark.streaming.accumulate.StreamingSketchAccumulator`).

Exactness: false negatives are impossible (novel rows can never be
wrongly dropped) and false positives are caught by the exact anti-join,
so the accumulated seen-keys table is EXACTLY the stream's distinct key
set — order-independent, hence SQL-oracle-able (`streaming_novel_docs`).

Scale notes (100 TB): the anti-join input is bloom-maybe rows only —
``ε·batch + true-repeats``, not the batch — and the seen-keys store is
HASH-BUCKETED by ``pmod(xxhash64(key), n_buckets)``: every epoch dir and
the compacted generation are written ``partitionBy("bucket")``, and each
micro-batch first computes which buckets its suspects fall in (a
``<= n_buckets``-row collect) and prunes the store read to those bucket
directories (Catalyst partition pruning — directory-level, not
scan+filter). A batch whose suspects hit ``b`` buckets therefore reads
``b/n_buckets`` of the key history instead of shuffling all of it; the
anti-join itself keys on ``(bucket, key)`` so matching store slices
co-locate with their suspects. The Bloom should be sized for the
expected total distinct cardinality (or swapped for the SBF/sharded
variants this library already provides when one filter outgrows a
single payload — the ``factory`` accepts either).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sketch.base import MergeableSketch
from ..spark.aggregate import build_sketch
from ..spark.probe import might_contain
from .accumulate import StreamingSketchAccumulator


class StreamingNoveltyFilter(StreamingSketchAccumulator):
    """foreachBatch hook: exact streaming first-occurrence dedup with a
    Bloom negative-cache in front of the seen-keys store."""

    def __init__(
        self,
        key_col: str,
        factory: Callable[[], MergeableSketch],
        state_dir: str,
        fanin: int = 64,
        n_buckets: int = 64,
    ):
        super().__init__(key_col, factory, state_dir, fanin)
        self.seen_dir = os.path.join(state_dir, "seen")
        self.n_buckets = self._pin_n_buckets(int(n_buckets))

    def _pin_n_buckets(self, n_buckets: int) -> int:
        """The bucket count is part of the on-disk layout: a restart with
        a different value would prune against the wrong directories and
        silently re-admit seen keys. Pin it in the store on first use and
        fail loud on any later mismatch."""
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        import json

        bpath = os.path.join(self.seen_dir, "buckets.json")
        if not os.path.exists(bpath) and os.path.isdir(self.seen_dir):
            # a seen store from before bucketing (flat epoch dirs, no
            # buckets.json): reading it through the bucketed schema
            # would give bucket=NULL rows that never match the (bucket,
            # key) anti-join — every seen key would silently re-admit
            # as novel. Refuse instead of corrupting.
            legacy = [
                d
                for d in os.listdir(self.seen_dir)
                if d.startswith(("epoch=", "compact-"))
            ]
            if legacy:
                raise ValueError(
                    f"seen store at {self.seen_dir!r} uses the legacy "
                    "un-bucketed layout; rebuild it (or migrate by "
                    "rewriting each dir partitioned by "
                    "pmod(xxhash64(key), n_buckets)) before restarting"
                )
        if os.path.exists(bpath):
            with open(bpath) as f:
                pinned = int(json.load(f)["n_buckets"])
            if pinned != n_buckets:
                raise ValueError(
                    f"seen store at {self.seen_dir!r} was built with "
                    f"n_buckets={pinned}; got {n_buckets}. Re-bucketing "
                    "requires rewriting the store (compact + migrate)."
                )
            return pinned
        os.makedirs(self.seen_dir, exist_ok=True)
        tmp = bpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n_buckets": n_buckets}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, bpath)
        return n_buckets

    def _bucket_expr(self):
        return F.pmod(F.xxhash64(F.col(self.col)), F.lit(self.n_buckets)).cast(
            "int"
        )

    @property
    def _seen_schema(self) -> str:
        # explicit schema: a bucketed epoch with zero novel keys writes no
        # partition dirs at all, and a schema-less read of that empty dir
        # would fail inference instead of returning an empty frame
        return f"{self.col} string, bucket int"

    # -- committed-state reads -------------------------------------------
    # The COMMIT POINT for an epoch's novel keys is _save(epoch) (the
    # atomic bloom+watermark replace), NOT the parquet write that precedes
    # it. _seen therefore reads only epoch dirs <= last_epoch: a crash
    # between the epoch-N parquet write and _save(N) leaves a stale
    # epoch=N dir on disk, and reading it during N's replay would
    # anti-join away that batch's bloom-false-positive novel keys —
    # silently losing ~epsilon of them forever. Compaction state rides in
    # a manifest (atomic os.replace) so mid-compaction crashes are also
    # invisible to readers.

    def _manifest(self) -> dict:
        mpath = os.path.join(self.seen_dir, "manifest.json")
        if os.path.exists(mpath):
            import json

            with open(mpath) as f:
                return json.load(f)
        return {"compacted_upto": -1, "dir": None}

    def _seen(self, spark, buckets: list[int] | None = None) -> DataFrame | None:
        """The committed seen-keys store as (key, bucket). With
        ``buckets`` the read is pruned PER STORE DIRECTORY to matching
        ``bucket=K`` subdirs before any union — a filter on the partition
        column, so Catalyst prunes at the directory level and only
        matching-bucket files are ever listed in the scan."""
        if self.last_epoch < 0 or not os.path.isdir(self.seen_dir):
            return None
        man = self._manifest()
        paths = []
        if man["dir"] is not None:
            paths.append(os.path.join(self.seen_dir, man["dir"]))
        for d in sorted(os.listdir(self.seen_dir)):
            if not d.startswith("epoch="):
                continue
            epoch = int(d.split("=", 1)[1])
            # committed AND not already folded into the compacted dir
            if man["compacted_upto"] < epoch <= self.last_epoch:
                paths.append(os.path.join(self.seen_dir, d))
        if not paths:
            return None
        parts = []
        for p in paths:
            d = spark.read.schema(self._seen_schema).parquet(p)
            if buckets is not None:
                d = d.where(F.col("bucket").isin([int(b) for b in buckets]))
            parts.append(d)
        out = parts[0]
        for d in parts[1:]:
            out = out.unionByName(d)
        return out

    def novel_keys(self, spark) -> DataFrame:
        """The accumulated novel keys — exactly the stream's distinct
        ``key_col`` set, one row per key (committed epochs only)."""
        seen = self._seen(spark)
        if seen is None:
            return spark.createDataFrame([], f"{self.col} string")
        return seen.select(self.col)

    def compact(self, spark, n_files: int = 8) -> int:
        """Offline maintenance (run with the stream STOPPED): fold the
        committed per-epoch seen-keys dirs into one — long streams
        otherwise accumulate one small parquet dir per micro-batch (the
        classic streaming small-files problem). Returns the key count.

        Crash-safe via the manifest: (1) the consolidated dir is fully
        written under a generation name readers ignore, (2) the manifest
        is atomically os.replace'd to point at it, (3) only then are the
        superseded epoch dirs deleted. A crash after (1) leaves readers
        on the old epoch dirs; after (2) readers use the consolidated
        dir and treat the old dirs as folded-in, so a partial (3) is
        harmless. On an object store, swap the manifest via its
        conditional-put equivalent."""
        import glob
        import json
        import shutil

        import pyarrow.parquet as pq

        man = self._manifest()
        if man["compacted_upto"] >= self.last_epoch:
            # nothing new to fold — and rewriting the committed generation
            # dir IN PLACE (gen name would collide with man['dir']) would
            # destroy the only copy of the store before any commit point
            return sum(
                pq.read_metadata(p).num_rows
                for p in glob.glob(
                    os.path.join(self.seen_dir, man["dir"] or "", "**", "*.parquet"),
                    recursive=True,
                )
            )
        seen = self._seen(spark)
        if seen is None:
            return 0
        gen = f"compact-{self.last_epoch}"
        gen_path = os.path.join(self.seen_dir, gen)
        # hash-repartition on bucket: each bucket lands wholly in one of
        # the n_files tasks, so the consolidated store keeps ONE file per
        # bucket dir (no small-file regrowth) and stays prunable
        seen.repartition(n_files, "bucket").write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(gen_path)
        # count from the written files' parquet footers: no second scan
        n = sum(
            pq.read_metadata(p).num_rows
            for p in glob.glob(
                os.path.join(gen_path, "**", "*.parquet"), recursive=True
            )
        )
        mpath = os.path.join(self.seen_dir, "manifest.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"compacted_upto": self.last_epoch, "dir": gen}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, mpath)  # the compaction commit point
        for d in os.listdir(self.seen_dir):
            folded = (
                d.startswith("epoch=") and int(d.split("=", 1)[1]) <= self.last_epoch
            )
            # also sweep superseded/orphaned generations (a crash between a
            # gen write and its manifest swap would otherwise leak a full
            # store copy forever)
            stale_gen = d.startswith("compact-") and d != gen
            if folded or stale_gen:
                shutil.rmtree(os.path.join(self.seen_dir, d), ignore_errors=True)
        return n

    def _fold_epoch(
        self, novel_committed: DataFrame, epoch_path: str
    ) -> None:
        """Fold an epoch's novel keys into the running filter.

        Fixed sketches (Bloom, HLL, ...) keep the partial-build + merge
        path. A ScalableBloomFilter gate instead FOLDS one fixed Bloom
        stage per epoch (``fold_stage``): the r4 path built a fresh SBF
        partial per epoch and stage-merged it, so every epoch's stage 0
        OR'd into the running stage 0 — after E epochs the gate's real
        FPR drifted to ~E× the budget (an efficiency leak: every false
        positive is an unnecessary store read; exactness was never at
        risk). The folded stage is sized for the epoch's ACTUAL novel
        count (read from the just-written parquet footers — no extra
        scan) at the schedule's next ε, so ``prob()`` tracks the organic
        growth schedule and stays ≤ the configured ε for a
        ``strict=True`` SBF, with no overload warning ever fired."""
        from ..sketch.bloom import BloomFilter
        from ..sketch.scalable_bloom import ScalableBloomFilter

        if not isinstance(self.sketch, ScalableBloomFilter):
            partial = build_sketch(
                novel_committed, self.col, self.factory, fanin=self.fanin
            )
            self.sketch = self.sketch.merge(partial)
            return
        import glob

        import pyarrow.parquet as pq

        n_new = sum(
            pq.read_metadata(p).num_rows
            for p in glob.glob(
                os.path.join(epoch_path, "**", "*.parquet"), recursive=True
            )
        )
        if n_new == 0:
            return  # nothing novel: no stage, schedule doesn't advance
        eps = self.sketch.next_stage_err()
        cap = max(n_new, 11)  # bloom geometry floor
        stage = build_sketch(
            novel_committed,
            self.col,
            lambda: BloomFilter(cap, eps),
            fanin=self.fanin,
        )
        self.sketch.fold_stage(stage)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= self.last_epoch:
            return  # replayed micro-batch after restart: already committed
        spark = batch_df.sparkSession
        keys = (
            batch_df.select(F.col(self.col).cast("string").alias(self.col))
            .where(F.col(self.col).isNotNull())
            .distinct()
            .withColumn("bucket", self._bucket_expr())
        )
        keys.persist()  # reused by the bucket collect, the write, the build
        try:
            if self.last_epoch >= 0:  # state exists: gate with the bloom
                maybe = might_contain(spark, self.sketch, F.col(self.col))
                fresh = keys.where(~maybe)
                suspects = keys.where(maybe)
                # which store buckets can the suspects possibly live in?
                # <= n_buckets rows — a bounded driver collect that lets
                # the anti-join read ONLY matching bucket directories
                hit = [
                    r["bucket"]
                    for r in suspects.select("bucket").distinct().collect()
                ]
                if hit:
                    seen = self._seen(spark, buckets=hit)
                    if seen is not None:
                        # join on (bucket, key): the pruned store slices
                        # co-locate with their suspects on the same keys
                        suspects = suspects.join(
                            seen, ["bucket", self.col], "left_anti"
                        )
                    novel = fresh.unionByName(suspects)
                else:
                    novel = fresh
            else:
                novel = keys
            # epoch-scoped dir: a replayed epoch overwrites itself, never
            # double-appends (static partitionOverwriteMode truncates the
            # whole dir). The dir is UNCOMMITTED until _save(epoch_id)
            # below — _seen ignores it on replay (see commit-point note),
            # so a crash here cannot lose bloom-false-positive novel keys.
            epoch_path = os.path.join(self.seen_dir, f"epoch={epoch_id}")
            # truncate any stale replay remnant ourselves: a session with
            # partitionOverwriteMode=dynamic would otherwise only replace
            # the buckets this replay writes, leaving crashed-write debris
            import shutil

            shutil.rmtree(epoch_path, ignore_errors=True)
            novel.write.mode("overwrite").partitionBy("bucket").parquet(
                epoch_path
            )
            novel_committed = spark.read.schema(self._seen_schema).parquet(
                epoch_path
            )
            self._fold_epoch(novel_committed, epoch_path)
            self.last_epoch = epoch_id
            self._save(epoch_id)
        finally:
            keys.unpersist()


def stream_novelty_filter(
    stream_df: DataFrame,
    key_col: str,
    factory: Callable[[], MergeableSketch],
    state_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    fanin: int = 64,
    n_buckets: int = 64,
):
    """Start a streaming query that accumulates the EXACT distinct-key
    set of the stream, bloom-gating the per-batch exact check against a
    hash-bucketed seen store (``n_buckets`` partition dirs; size it so
    one bucket of the expected total key set fits an executor's scan
    budget — the value is pinned to the store on first use).

    Returns (StreamingQuery, StreamingNoveltyFilter); read
    ``flt.novel_keys(spark)`` after the run.
    """
    flt = StreamingNoveltyFilter(key_col, factory, state_dir, fanin, n_buckets)
    writer = (
        stream_df.writeStream.foreachBatch(flt)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start(), flt
