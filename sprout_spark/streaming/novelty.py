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
``ε·batch + true-repeats``, not the batch; the seen-keys table is the
big side and at cluster scale should be bucketed by ``xxhash64(key)``
(bucketed Iceberg/parquet table) so the per-batch anti-join co-locates
instead of shuffling the full key history every batch; the Bloom should
be sized for the expected total distinct cardinality (or swapped for the
SBF/sharded variants this library already provides when one filter
outgrows a single payload).
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
    ):
        super().__init__(key_col, factory, state_dir, fanin)
        self.seen_dir = os.path.join(state_dir, "seen")

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

    def _seen(self, spark) -> DataFrame | None:
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
        return spark.read.parquet(*paths)

    def novel_keys(self, spark) -> DataFrame:
        """The accumulated novel keys — exactly the stream's distinct
        ``key_col`` set, one row per key (committed epochs only)."""
        seen = self._seen(spark)
        if seen is None:
            return spark.createDataFrame([], f"{self.col} string")
        return seen

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
                    os.path.join(self.seen_dir, man["dir"] or "", "*.parquet")
                )
            )
        seen = self._seen(spark)
        if seen is None:
            return 0
        gen = f"compact-{self.last_epoch}"
        gen_path = os.path.join(self.seen_dir, gen)
        seen.repartition(n_files).write.mode("overwrite").parquet(gen_path)
        # count from the written files' parquet footers: no second scan
        n = sum(
            pq.read_metadata(p).num_rows
            for p in glob.glob(os.path.join(gen_path, "*.parquet"))
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

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= self.last_epoch:
            return  # replayed micro-batch after restart: already committed
        spark = batch_df.sparkSession
        keys = (
            batch_df.select(F.col(self.col).cast("string").alias(self.col))
            .where(F.col(self.col).isNotNull())
            .distinct()
        )
        if self.last_epoch >= 0:  # state exists: gate with the bloom
            maybe = might_contain(spark, self.sketch, F.col(self.col))
            fresh = keys.where(~maybe)
            suspects = keys.where(maybe)
            seen = self._seen(spark)
            if seen is not None:
                suspects = suspects.join(seen, self.col, "left_anti")
            novel = fresh.unionByName(suspects)
        else:
            novel = keys
        # epoch-scoped dir: a replayed epoch overwrites itself, never
        # double-appends. The dir is UNCOMMITTED until _save(epoch_id)
        # below — _seen ignores it on replay (see commit-point note), so
        # a crash here cannot lose bloom-false-positive novel keys.
        novel.write.mode("overwrite").parquet(
            os.path.join(self.seen_dir, f"epoch={epoch_id}")
        )
        novel_committed = spark.read.parquet(
            os.path.join(self.seen_dir, f"epoch={epoch_id}")
        )
        partial = build_sketch(
            novel_committed, self.col, self.factory, fanin=self.fanin
        )
        self.sketch = self.sketch.merge(partial)
        self.last_epoch = epoch_id
        self._save(epoch_id)


def stream_novelty_filter(
    stream_df: DataFrame,
    key_col: str,
    factory: Callable[[], MergeableSketch],
    state_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    fanin: int = 64,
):
    """Start a streaming query that accumulates the EXACT distinct-key
    set of the stream, bloom-gating the per-batch exact check.

    Returns (StreamingQuery, StreamingNoveltyFilter); read
    ``flt.novel_keys(spark)`` after the run.
    """
    flt = StreamingNoveltyFilter(key_col, factory, state_dir, fanin)
    writer = (
        stream_df.writeStream.foreachBatch(flt)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start(), flt
