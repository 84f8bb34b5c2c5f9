"""Sequence packing — documents -> fixed-budget training sequences.

The last step of a pretraining data pipeline: a training loader wants
fixed-length sequences (e.g. 2048/4096/8192 tokens), not variable-length
documents. Two standard constructions, both deterministic functions of
(id, salt) so a re-run — or a different cluster size — produces the
identical packing:

``pack_spans`` — the GPT-style CONCAT-AND-SPLIT packing: within a
shard, documents are laid end-to-end in a deterministic pseudorandom
order and the concatenation is cut every ``budget`` tokens; a document
crossing a cut contributes one span per sequence it touches. Zero
padding waste (every sequence except a shard's last is exactly full),
pure JVM (window cumsum + span explode), ONE exchange on the shard id.
This is the packing used by GPT/LLaMA-style pretraining; the output is
the (doc, seq, token-range) manifest a tokenizing writer consumes.

``pack_greedy`` — NO-SPLIT packing (documents are atomic; used when
truncation at cut points is unacceptable, e.g. instruction tuning):
within a shard, walk the same deterministic order and close a pack
when the next document would overflow ``budget``. Inherently
sequential per shard, so it runs as a per-shard Arrow kernel whose
loop is per PACK, not per row (each boundary is one ``searchsorted``
over the prefix-sum array); a shard is the unit a training loader
streams, so shards are sized to fit a task by construction. Documents
larger than ``budget`` fail loud unless ``oversize='own_pack'``.

Weights are abstract token counts (the tokenizer-count column a real
pipeline already carries — see ``functions.text.with_text_stats``);
packing moves (id, weight) pairs only, never text. NULL or
non-positive weights are rejected loudly — silently dropping rows from
a training manifest is the one thing this operator must never do.

Sharding matches the rest of the corpus family (`shuffle_shards`):
``shard = pmod(xxhash64(id), n_shards)`` (or the md5 prefix in
portable mode — bit-identical in DuckDB for the oracle), order within
a shard by (hash, id).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HASH_MODES = ("xxhash64", "md5")


def _shard_and_order(df: DataFrame, id_col: str, n_shards: int, hash_mode: str):
    """(shard, order-key) columns for the deterministic pseudorandom
    per-shard layout; md5 mode is the engine-portable oracle twin."""
    if hash_mode not in _HASH_MODES:
        raise ValueError(f"hash_mode must be one of {_HASH_MODES}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    sid = F.col(id_col).cast("string")
    if hash_mode == "xxhash64":
        h = F.xxhash64(sid)
        shard = F.pmod(h, F.lit(n_shards)).cast("int")
        okey = h
    else:
        # 48-bit md5 prefix: exact in int64, reproducible in DuckDB as
        # ('0x' || substr(md5(id), 1, 12))::BIGINT — the same ordinal
        # convention shuffle_shards/split_corpus use
        h48 = F.conv(F.substring(F.md5(sid), 1, 12), 16, 10).cast("bigint")
        shard = F.pmod(h48, F.lit(n_shards)).cast("int")
        okey = h48
    return shard, okey


def _checked_weight(id_col: str, weight_col: str):
    """Weight column with an IN-TASK guard: a NULL/non-positive weight
    fails the job on the row that carries it (no extra validation scan —
    at 10^12 rows a driver-side pre-check would cost a full pass)."""
    w = F.col(weight_col).cast("bigint")
    return F.when(
        F.col(weight_col).isNull() | (w <= 0),
        F.raise_error(
            F.concat(
                F.lit(
                    f"NULL/non-positive {weight_col!r} (id="
                ),
                F.col(id_col).cast("string"),
                F.lit(
                    "): a packing manifest must account for every row — "
                    "filter explicitly upstream"
                ),
            )
        ).cast("bigint"),
    ).otherwise(w)


def pack_spans(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    n_shards: int,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Concat-and-split packing manifest: one row per (document, sequence)
    span — ``(id, shard, seq, doc_from, doc_to)`` meaning tokens
    ``[doc_from, doc_to)`` of the document land in per-shard sequence
    ``seq`` (0-based; every seq except a shard's last holds exactly
    ``budget`` tokens). Plan: ONE exchange on the shard id; the window
    cumsum and the span explode run in-task. The shuffle carries
    (id, weight) — never text."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    shard, okey = _shard_and_order(df, id_col, n_shards, hash_mode)
    w = _checked_weight(id_col, weight_col)
    base = df.select(
        F.col(id_col), shard.alias("shard"), okey.alias("__okey"), w.alias("__w")
    )
    win = (
        Window.partitionBy("shard")
        .orderBy("__okey", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn("__end", F.sum("__w").over(win)).withColumn(
        "__start", F.col("__end") - F.col("__w")
    )
    first_seq = F.floor(F.col("__start") / budget)
    last_seq = F.floor((F.col("__end") - 1) / budget)
    spans = cum.select(
        id_col,
        "shard",
        "__start",
        "__w",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq"),
    )
    a = F.greatest(F.col("seq") * budget - F.col("__start"), F.lit(0))
    b = F.least((F.col("seq") + 1) * budget - F.col("__start"), F.col("__w"))
    return spans.select(
        id_col,
        "shard",
        F.col("seq").cast("bigint").alias("seq"),
        a.cast("bigint").alias("doc_from"),
        b.cast("bigint").alias("doc_to"),
    )


def pack_greedy(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    n_shards: int,
    hash_mode: str = "xxhash64",
    oversize: str = "error",
) -> DataFrame:
    """No-split packing manifest: ``(id, shard, pack, pos)`` — documents
    are atomic; within a shard's deterministic order a pack closes when
    the next document would push it past ``budget``. ``oversize``:
    ``'error'`` (default) fails loud on any document > budget;
    ``'own_pack'`` gives it a single-document pack (the loader handles
    truncation). The per-shard kernel's loop is per PACK (searchsorted
    boundary hops over the prefix-sum array), not per row."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if oversize not in ("error", "own_pack"):
        raise ValueError("oversize must be 'error' or 'own_pack'")
    shard, okey = _shard_and_order(df, id_col, n_shards, hash_mode)
    base = df.select(
        F.col(id_col), shard.alias("shard"), okey.alias("__okey"),
        _checked_weight(id_col, weight_col).alias("__w"),
    )
    id_type = base.schema[id_col].dataType.simpleString()

    import numpy as np

    def kernel(tbl: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(
            tbl, sort_keys=[("__okey", "ascending"), (id_col, "ascending")]
        )
        tbl = tbl.take(order)
        w = tbl.column("__w").to_numpy(zero_copy_only=False)
        n = len(w)
        if n and int(w.max()) > budget and oversize == "error":
            raise ValueError(
                f"document weight {int(w.max())} > budget {budget}; "
                "pass oversize='own_pack' or pre-split"
            )
        S = np.empty(n + 1, dtype=np.int64)
        S[0] = 0
        np.cumsum(w, out=S[1:])
        # boundary hops: one searchsorted per PACK, not per row
        bounds = []
        i = 0
        while i < n:
            j = int(np.searchsorted(S, S[i] + budget, side="right")) - 1
            if j <= i:  # oversize doc: its own (overfull) pack
                j = i + 1
            bounds.append(j)
            i = j
        bnd = np.asarray(bounds, dtype=np.int64)
        starts = np.concatenate([[0], bnd[:-1]]) if n else bnd
        sizes = bnd - starts
        pack = np.repeat(np.arange(len(bnd), dtype=np.int64), sizes)
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
        return pa.table(
            {
                id_col: tbl.column(id_col),
                "shard": tbl.column("shard"),
                "pack": pa.array(pack),
                "pos": pa.array(pos),
            }
        )

    out_schema = f"{id_col} {id_type}, shard int, pack bigint, pos bigint"
    return base.groupBy("shard").applyInArrow(kernel, schema=out_schema)
