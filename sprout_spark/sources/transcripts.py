"""Deterministic synthetic transcripts table (FIXTURES.md §1).

Exactly the north-rule input shape (BASELINE.json:input_hint):

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Every value is a pure function of (seed, row index) — no wall clock, no
external data. Conversation sizes are Zipf(a=1.3)-skewed (clamped to
[1, 500]) so a few hot conversations exercise the salted-repartition
path; tools are Zipf(a=1.5)-skewed over 20 names (heavy-hitter targets);
text lengths are lognormal (quantile targets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array([f"tool_{i:02d}" for i in range(20)])
_VOCAB = None


def _vocab(rng: np.random.RandomState) -> np.ndarray:
    global _VOCAB
    if _VOCAB is None:
        letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        words = []
        for i in range(1000):
            ln = 2 + (i * 7919) % 9
            idx = (i * 104729 + np.arange(ln) * 1299709) % 26
            words.append("".join(letters[idx]))
        _VOCAB = np.array(words)
    return _VOCAB


def generate_transcripts(n_convs: int, seed: int = 42) -> pa.Table:
    """Build the transcripts table as a pyarrow Table."""
    rng = np.random.RandomState(seed)
    sizes = np.clip(rng.zipf(1.3, n_convs), 1, 500).astype(np.int64)
    total = int(sizes.sum())

    conv_ids = np.repeat(np.array([f"conv-{i:08d}" for i in range(n_convs)]), sizes)
    conv_row = np.repeat(np.arange(n_convs), sizes)
    turn_idx = (np.arange(total) - np.repeat(np.cumsum(sizes) - sizes, sizes)).astype(
        np.int32
    )

    role_perturb = rng.randint(0, 3, total)
    roles = _ROLES[(turn_idx + (role_perturb == 0).astype(np.int32)) % 3]

    vocab = _vocab(rng)
    n_chars = np.clip(rng.lognormal(4.0, 1.0, total), 1, 4000).astype(np.int64)
    # text: seeded token sampling; build from per-row word counts (~6 chars/word)
    n_words = np.maximum(1, n_chars // 6)
    word_idx_start = rng.randint(0, 1000, total)
    texts = []
    # vectorized-ish join: cap words per row to keep fixture generation fast
    capped = np.minimum(n_words, 64)
    for i in range(total):
        w0 = word_idx_start[i]
        idx = (w0 + np.arange(capped[i]) * 31) % 1000
        texts.append(" ".join(vocab[idx]))

    tool_draw = np.clip(rng.zipf(1.5, total), 1, 20) - 1
    is_tool_turn = roles == "tool"
    tools = np.where(is_tool_turn, _TOOLS[tool_draw], "")

    base = np.int64(1767225600_000_000)  # 2026-01-01T00:00:00Z in micros
    conv_offset = conv_row.astype(np.int64) * 3_600_000_000
    ts = base + conv_offset + turn_idx.astype(np.int64) * 5_000_000

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
        }
    )


def verify_turn_ordering(df) -> dict:
    """Check the input-hint per-row invariant: stable turn ordering —
    (conv_id, turn_idx) unique, turn_idx dense from 0 within each
    conversation. Returns violation counts (all zero for a valid table).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    dup = (
        df.groupBy("conv_id", "turn_idx")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = (
        df.select("conv_id", "turn_idx", F.row_number().over(w).alias("rn"))
        .where(F.col("turn_idx") != F.col("rn") - 1)
        .count()
    )
    return {"duplicate_turns": dup, "ordering_gaps": gaps}


def write_transcripts_parquet(path: str, n_convs: int, seed: int = 42) -> int:
    """Write the fixture to parquet; returns row count."""
    import pyarrow.parquet as pq

    table = generate_transcripts(n_convs, seed)
    pq.write_table(table, path)
    return table.num_rows
