"""Deterministic corpus organization: train/val/test splits and
shuffled training shards.

The two bookend steps of every training-data pipeline:

* **Split** — assign each document to train/val/test by a hash of its
  key, so membership is a pure function of (key, salt): stable across
  runs, across engines, and under corpus growth (new docs land in
  splits at the configured rates; existing docs never move — the
  property that keeps eval sets uncontaminated as the corpus evolves).
  Map-only, zero shuffle.
* **Shuffle-shard** — the "write N shuffled shard files" step: a
  deterministic global permutation of the corpus, materialized as
  (shard, pos). Training jobs stream shards in filename order and rows
  in ``pos`` order and see a reproducible pseudorandom document order
  with no coordination.

Scale shape: the split is a projection (whole-stage codegen, no
exchange). The shard assignment shuffles each row ONCE on its 4-byte
shard id, and the per-shard position is an in-partition sort — Catalyst
plans the window as Exchange(shard) -> Sort -> Window with no second
exchange. One shard = one reduce task = one output file, which is
exactly the unit a training loader wants; pick ``n_shards`` so a shard
(corpus/n_shards rows) fits a task — at 10^12 turns and 100k shards
that is 10^7 rows/task, the normal shard-file size. Row values (the
text) ride the one shuffle they would ride anyway to be written.

Hash portability follows ``operators/sampling.py``: the default
``hash_mode="portable"`` derives the unit-interval coordinate from the
first 12 hex chars of ``md5(cast(key as string))`` — a 48-bit integer
divided by 2^48, which is EXACT in binary floating point (power-of-two
denominator), so Spark and DuckDB compute bit-identical doubles and the
oracle gate compares split assignment exactly. ``hash_mode="xxhash64"``
is the JVM-codegen throughput path for production runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SCALE = float(1 << 48)  # 16^12: md5 12-hex-char prefix denominator


def _keyed_md5(key_col: str, salt: str) -> Column:
    base = F.col(key_col).cast("string")
    if salt:
        base = F.concat(F.lit(f"{salt}:"), base)
    return F.md5(base)


def _unit_hash(key_col: str, salt: str, hash_mode: str) -> Column:
    """Deterministic u in [0, 1): exact-double in portable mode."""
    if hash_mode == "portable":
        h48 = F.conv(F.substring(_keyed_md5(key_col, salt), 1, 12), 16, 10)
        return h48.cast("double") / F.lit(_SCALE)
    if hash_mode == "xxhash64":
        h = F.xxhash64(F.col(key_col), F.lit(salt))
        return F.pmod(h, F.lit(1 << 48)).cast("double") / F.lit(_SCALE)
    raise ValueError("hash_mode must be 'portable' or 'xxhash64'")


def split_corpus(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "",
    out_col: str = "split",
    hash_mode: str = "portable",
) -> DataFrame:
    """Assign a deterministic split label per row: the unit-interval
    hash coordinate falls into consecutive bands sized by ``fractions``
    (insertion order). Fractions summing below 1 leave a holdout band
    whose rows get a NULL label (kept, not silently dropped — the
    caller decides). ``salt`` re-deals the split without touching any
    other salted assignment. Map-only: no shuffle at any scale."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    bad = {k: v for k, v in fractions.items() if v < 0}
    if bad:
        raise ValueError(f"negative fractions: {bad}")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    u = _unit_hash(key_col, salt, hash_mode)
    expr: Column | None = None
    hi = 0.0
    for name, frac in fractions.items():
        hi += frac
        cond = u < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return df.withColumn(out_col, expr.otherwise(F.lit(None)))


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "",
    hash_mode: str = "portable",
) -> DataFrame:
    """Deterministic global shuffle materialized as (shard, pos): shard
    = 48-bit key hash mod ``n_shards`` (bias < 2^-35 per shard), pos =
    0-based rank within the shard by (hash, key) — the key tie-break
    keeps the permutation total even under a hash collision. Reading
    shards in id order and rows in pos order replays one fixed
    pseudorandom permutation of the corpus.

    One exchange on the shard id + one in-task sort per shard (see
    module docstring for the n_shards sizing rule). To land shard
    files: ``.repartition(n_shards, "shard").sortWithinPartitions(
    "shard", "pos").write.partitionBy("shard")`` — same shuffle, no
    extra pass."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if hash_mode == "portable":
        h: Column = F.conv(
            F.substring(_keyed_md5(key_col, salt), 1, 12), 16, 10
        ).cast("long")
    elif hash_mode == "xxhash64":
        h = F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), F.lit(1 << 48))
    else:
        raise ValueError("hash_mode must be 'portable' or 'xxhash64'")
    tmp = "__shard_order"
    while tmp in df.columns:
        tmp += "_"
    with_h = df.withColumn(tmp, h)
    w = Window.partitionBy(F.pmod(F.col(tmp), F.lit(n_shards))).orderBy(
        F.col(tmp), F.col(key_col)
    )
    return (
        with_h.withColumn(
            "shard", F.pmod(F.col(tmp), F.lit(n_shards)).cast("int")
        )
        .withColumn("pos", F.row_number().over(w).cast("long") - 1)
        .drop(tmp)
    )
