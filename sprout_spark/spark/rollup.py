"""Persisted sketch ROLLUP tables — per-time-grain sketch partials at
rest, arbitrary-range queries answered by merging partials (the
timeseries-OLAP "continuous aggregate" / materialized-rollup shape:
build once per ingest batch, answer "distinct users in any [t0, t1)"
forever without rescanning raw rows).

Why this is the right 10^12-row design: the rollup TABLE is tiny (one
row per grain window per ingest epoch — KB-sized sketch payloads), so
every query-time cost is bounded by the number of windows, never by the
number of raw rows. Appends are BLIND — a new ingest epoch writes its
own per-window partials next to the old ones and never reads, locks, or
rewrites existing data; mergeability (``merge(a,b) == merge(b,a)``,
SURVEY.md §2.3) makes duplicate window rows across epochs exactly
equivalent to one big build, so merge-on-read is correct by algebra,
not by coordination. ``compact()`` is an optional read-cost
optimization, never a correctness step.

Skew note (the one non-obvious scale hazard): grain windows are
low-cardinality, deliberately hot keys — at 10^12 rows/year every
day-window holds ~2.7e9 rows, which would funnel into ONE task under a
plain groupBy. The build therefore defaults to the salted two-phase
grouped build (``build_grouped_sketches(salt=64)``): phase 1 spreads a
window's rows over 64 tasks by value hash, phase 2 merges the ≤64
per-salt partials — exact, again by mergeability.

Commit discipline (the package convention — sources/kv_store.py,
sources/corpus_shards.py): epoch parquet lands first under a dir
readers ignore, then one fsync'd ``manifest.json`` swapped via
``os.replace`` is the single commit point; a torn append leaves an
orphan dir that readers never see and the next mutation sweeps.
Mutations are single-writer (advisory flock + staleness re-check), so
concurrent appends fail loud instead of racing the epoch counter.

Reference parity: the reference persists one mmap'd filter per path
(``/root/reference/bloom.go:428-443`` holds its fslock for the same
single-writer reason); a rollup table is that idea lifted to many
time-keyed sketches behind one commit point.
"""

from __future__ import annotations

import json
import os
import shutil
from contextlib import contextmanager
from typing import Callable

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sketch.base import MergeableSketch, merge_serialized, sketch_from_bytes
from .aggregate import build_grouped_sketches, collect_merged, tree_merge

_GRAINS = ("minute", "hour", "day", "week", "month", "quarter", "year")
_VERSION = 1
_ROW_SCHEMA = "wstart string, sketch binary, rows bigint"
# part_id fan for the range-merge tree: 2 rounds of fanin-64 tasks
_MERGE_PARTS = 4096


def _merge_window_kernel(tbl: pa.Table) -> pa.Table:
    return pa.table(
        {
            "wstart": pa.array([tbl.column("wstart")[0].as_py()], pa.string()),
            "sketch": pa.array(
                [merge_serialized(tbl.column("sketch").to_pylist())],
                pa.binary(),
            ),
            "rows": pa.array(
                [pa.compute.sum(tbl.column("rows")).as_py()], pa.int64()
            ),
        }
    )


def _norm_bound(t) -> str:
    """Normalize a range bound to the stored wstart string form.

    Accepts ``datetime``/``date`` (rendered without timezone) or a
    string; a bare ``YYYY-MM-DD`` gets midnight appended so string
    comparison against the fixed-width ``YYYY-MM-DD HH:MM:SS`` window
    keys is exact, not lexicographic-by-luck."""
    s = t if isinstance(t, str) else str(t)
    if len(s) == 10:
        s += " 00:00:00"
    return s


class SketchRollup:
    """A persisted per-grain sketch table with blind appends.

    Open an existing rollup with ``SketchRollup(path)`` (config comes
    from the manifest) or create one with ``SketchRollup(path,
    factory=..., grain=...)``. The sketch config (class + parameters)
    and grain are PINNED at creation: an append through a mismatched
    factory would silently produce unmergeable or wrong-width partials,
    so both refuse loudly instead.
    """

    def __init__(
        self,
        path: str,
        factory: Callable[[], MergeableSketch] | None = None,
        grain: str | None = None,
    ):
        self.path = path
        man = self._manifest()
        if man is None:
            if factory is None:
                raise ValueError(
                    f"no rollup at {path!r}; pass factory= to create one"
                )
            grain = grain or "hour"
            if grain not in _GRAINS:
                raise ValueError(f"grain must be one of {_GRAINS}, got {grain!r}")
            probe = factory()
            self.grain = grain
            self.pin = {
                "cls": type(probe).__name__,
                "meta": probe._meta(),
            }
            self.factory = factory
            self.epochs: list[int] = []
            self.base: str | None = None
            self.last_epoch = -1
            os.makedirs(path, exist_ok=True)
            self._save_manifest()
            return
        if int(man.get("version", -1)) != _VERSION:
            raise ValueError(
                f"rollup manifest version {man.get('version')!r} at {path!r} "
                f"not supported (this library reads version {_VERSION})"
            )
        self.grain = man["grain"]
        self.pin = man["sketch"]
        self.epochs = [int(e) for e in man["epochs"]]
        self.base = man.get("base")
        self.last_epoch = int(man["epoch"])
        if factory is not None:
            probe = factory()
            got = {"cls": type(probe).__name__, "meta": probe._meta()}
            if got != self.pin:
                raise ValueError(
                    f"sketch config mismatch at {path!r}: rollup is pinned "
                    f"to {self.pin}, factory builds {got} — partials would "
                    "not merge; open without factory= or match the pin"
                )
        self.factory = factory
        if grain is not None and grain != self.grain:
            raise ValueError(
                f"rollup at {path!r} is pinned to grain {self.grain!r}; "
                f"got grain={grain!r}"
            )

    # -- manifest / locking (the package commit discipline) -----------------

    def _manifest_path(self) -> str:
        return os.path.join(self.path, "manifest.json")

    def _manifest(self) -> dict | None:
        mp = self._manifest_path()
        if not os.path.exists(mp):
            return None
        with open(mp) as f:
            return json.load(f)

    def _save_manifest(self) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": _VERSION,
                    "grain": self.grain,
                    "sketch": self.pin,
                    "epoch": self.last_epoch,
                    "epochs": self.epochs,
                    "base": self.base,
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path())  # the commit point

    @contextmanager
    def _write_lock(self):
        import fcntl

        lf = open(os.path.join(self.path, ".lock"), "w")
        try:
            fcntl.flock(lf, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            lf.close()
            raise RuntimeError(
                f"another writer holds the lock on {self.path!r}; "
                "concurrent mutations would race the commit point"
            )
        try:
            man = self._manifest()
            if man is not None and int(man["epoch"]) != self.last_epoch:
                raise RuntimeError(
                    f"rollup at {self.path!r} advanced to epoch "
                    f"{man['epoch']} (this instance loaded "
                    f"{self.last_epoch}) — another writer committed; "
                    "reopen before mutating"
                )
            yield
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)
            lf.close()

    def _sweep_orphans(self) -> None:
        live = {f"epoch={e}" for e in self.epochs}
        if self.base:
            live.add(self.base)
        for d in os.listdir(self.path):
            if (d.startswith("epoch=") or d.startswith("compact-")) and (
                d not in live
            ):
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    # -- append -------------------------------------------------------------

    def append(
        self,
        df: DataFrame,
        ts_col: str,
        val_col: str,
        salt: int = 64,
        weight_col: str | None = None,
    ) -> int:
        """Build this batch's per-window partials and commit them as one
        epoch. Never reads existing data — duplicate windows across
        epochs are resolved at read time by mergeability. Rows with a
        NULL timestamp are dropped (a window key cannot be NULL; the
        SQL mirror is ``WHERE ts IS NOT NULL``). Returns the number of
        window rows written."""
        if self.factory is None:
            raise ValueError(
                "append needs the sketch factory; reopen with factory= "
                "matching the pinned config"
            )
        with self._write_lock():
            epoch = self.last_epoch + 1
            keyed = (
                df.where(F.col(ts_col).isNotNull())
                .withColumn(
                    "_wstart",
                    F.date_trunc(self.grain, F.col(ts_col)).cast("string"),
                )
            )
            grouped = build_grouped_sketches(
                keyed,
                "_wstart",
                val_col,
                self.factory,
                salt=salt,
                weight_col=weight_col,
            ).withColumnRenamed("key", "wstart")
            edir = os.path.join(self.path, f"epoch={epoch}")
            # parquet first; the manifest swap below is the commit point
            grouped.write.mode("overwrite").parquet(edir)
            spark = df.sparkSession
            n = spark.read.parquet(edir).count()
            self.last_epoch = epoch
            self.epochs.append(epoch)
            self._save_manifest()
            self._sweep_orphans()
            return n

    # -- read ---------------------------------------------------------------

    def _committed(self, spark: SparkSession) -> DataFrame | None:
        dirs = [os.path.join(self.path, f"epoch={e}") for e in self.epochs]
        if self.base:
            dirs.append(os.path.join(self.path, self.base))
        if not dirs:
            return None
        return spark.read.schema(_ROW_SCHEMA).parquet(*dirs)

    def windows(
        self, spark: SparkSession, t0=None, t1=None
    ) -> DataFrame:
        """One MERGED row per grain window in ``[t0, t1)`` (bounds on
        the window START; None = unbounded): ``(wstart string, sketch
        binary, rows bigint)``. The range filter lands on the epoch
        parquet scan (fixed-width timestamp strings make min/max
        row-group pruning exact), so a narrow query over years of
        windows reads only the matching row groups."""
        raw = self._committed(spark)
        if raw is None:
            return spark.createDataFrame([], _ROW_SCHEMA)
        if t0 is not None:
            raw = raw.where(F.col("wstart") >= _norm_bound(t0))
        if t1 is not None:
            raw = raw.where(F.col("wstart") < _norm_bound(t1))
        return raw.groupBy("wstart").applyInArrow(
            _merge_window_kernel, _ROW_SCHEMA
        )

    def query(self, spark: SparkSession, t0=None, t1=None) -> MergeableSketch:
        """The range-merged sketch over ``[t0, t1)`` as a driver-side
        object (ask it for the estimate/probe). Merging runs as a
        bounded tree — each task folds ≤64 payloads, two rounds over a
        4096-way hash fan — so a minute-grain rollup spanning years
        never funnels every window through the driver."""
        if self.factory is None:
            raise ValueError("query needs the sketch factory; reopen with factory=")
        raw = self._committed(spark)
        if raw is None:
            return self.factory()
        if t0 is not None:
            raw = raw.where(F.col("wstart") >= _norm_bound(t0))
        if t1 is not None:
            raw = raw.where(F.col("wstart") < _norm_bound(t1))
        partials = raw.select(
            F.pmod(F.xxhash64("wstart"), F.lit(_MERGE_PARTS)).alias("part_id"),
            "sketch",
            "rows",
            F.lit(0.0).alias("build_ms"),
        )
        merged = tree_merge(partials, _MERGE_PARTS)
        return collect_merged(merged, self.factory)

    def estimate(
        self,
        spark: SparkSession,
        estimator: Callable[[MergeableSketch], float],
        t0=None,
        t1=None,
    ) -> tuple[float, int]:
        """``(estimator(range-merged sketch), exact row count)`` over
        ``[t0, t1)`` — the row count is exact by construction (epoch
        counts are exact and sum)."""
        raw = self._committed(spark)
        rows = 0
        if raw is not None:
            f = raw
            if t0 is not None:
                f = f.where(F.col("wstart") >= _norm_bound(t0))
            if t1 is not None:
                f = f.where(F.col("wstart") < _norm_bound(t1))
            agg = f.agg(F.sum("rows").alias("n")).collect()[0]["n"]
            rows = int(agg) if agg is not None else 0
        return estimator(self.query(spark, t0, t1)), rows

    # -- compact ------------------------------------------------------------

    def compact(self, spark: SparkSession) -> int:
        """Fold all committed epochs into one base generation with one
        merged row per window (a read-cost optimization only — answers
        are unchanged by mergeability). Crash-safe: the generation is
        fully written under a name readers ignore, the manifest swap is
        the commit point, superseded dirs are swept after. Returns the
        number of window rows in the new base."""
        with self._write_lock():
            merged = self.windows(spark)
            gen = f"compact-g{self.last_epoch + 1}"
            gdir = os.path.join(self.path, gen)
            merged.repartition(1).write.mode("overwrite").parquet(gdir)
            n = spark.read.parquet(gdir).count()
            # compaction consumes an epoch id so a concurrent stale
            # writer's staleness check trips on it
            self.last_epoch += 1
            self.epochs = []
            self.base = gen
            self._save_manifest()
            self._sweep_orphans()
            return n
