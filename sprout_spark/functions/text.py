"""Text-analysis column functions for training-data pipelines.

Everything here is either pure ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen, SQL-oracle-able) or one vectorized ``mapInArrow``
pass (fingerprinting). No per-row Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..hashing import murmur3_64_packed

# A BPE-ish word/number/punctuation segmentation: word pieces, numbers,
# single punctuation marks — deterministic and SQL-expressible.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = {
    "en": "the of and to a in is it you that was for on are with as at be this".split(),
    "es": "el la de que y a en un ser se no por con para como su al lo".split(),
    "fr": "le la de et les des en un une du que est pour qui dans par sur".split(),
    "de": "der die das und ist von den zu mit sich des auf für im nicht ein".split(),
}


def ws_token_count(text: Column) -> Column:
    """Whitespace token count: spaces+1 on trimmed text, 0 for blank.
    Exact and trivially SQL-oracle-able."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count via the BPE-ish regex (JVM regexp)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def with_text_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Add exact quality-signal columns: n_chars, n_ws_tokens,
    n_bpe_tokens, n_punct, n_digits, n_upper (all ints → safe oracles)."""
    t = F.col(text_col)
    return (
        df.withColumn("n_chars", F.length(t))
        .withColumn("n_ws_tokens", ws_token_count(t))
        .withColumn("n_bpe_tokens", bpe_ish_token_count(t))
        .withColumn(
            "n_punct", F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
        )
        .withColumn(
            "n_digits", F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
        )
        .withColumn(
            "n_upper", F.length(t) - F.length(F.regexp_replace(t, r"[A-Z]", ""))
        )
    )


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Heuristic quality score in [0,1]: penalize very short/very long
    docs, high punctuation density, high digit density. Deterministic
    arithmetic over the exact stats (JVM-side)."""
    d = with_text_stats(df, text_col)
    len_score = F.least(F.col("n_chars") / F.lit(200.0), F.lit(1.0)) * F.least(
        F.lit(4000.0) / F.greatest(F.col("n_chars"), F.lit(1)), F.lit(1.0)
    )
    punct_pen = F.greatest(
        F.lit(0.0),
        F.lit(1.0) - F.col("n_punct") / F.greatest(F.col("n_chars"), F.lit(1)) * 5.0,
    )
    digit_pen = F.greatest(
        F.lit(0.0),
        F.lit(1.0) - F.col("n_digits") / F.greatest(F.col("n_chars"), F.lit(1)) * 3.0,
    )
    return d.withColumn(
        "quality", (len_score * punct_pen * digit_pen).cast("double")
    )


def language_id(df: DataFrame, text_col: str, min_hits: int = 2) -> DataFrame:
    """Stopword-ratio language ID over {en, es, fr, de}; 'und' when no
    language reaches ``min_hits`` stopword matches. Pure array ops."""
    toks = F.array_distinct(
        F.split(F.lower(F.trim(F.col(text_col))), r"[^a-zàâçéèêëîïôûùüÿñöäß']+")
    )
    d = df.withColumns(
        {
            f"_hits_{lang}": F.size(
                F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
            )
            for lang, words in _STOPWORDS.items()
        }
    )
    langs = list(_STOPWORDS)
    best = F.greatest(*[F.col(f"_hits_{l}") for l in langs])
    guess = F.when(best < min_hits, F.lit("und"))
    for l in langs:
        guess = guess.when(F.col(f"_hits_{l}") == best, F.lit(l))
    out = d.withColumn("lang_guess", guess)
    return out.drop(*[f"_hits_{l}" for l in langs])


def document_fingerprints(
    df: DataFrame, id_col: str, text_col: str, gram: int = 8, keep: int = 4
) -> DataFrame:
    """Winnowing-style fingerprints: min-``keep`` rolling hashes of
    byte ``gram``-grams per document, one vectorized pass.

    Output: (id, fp bigint) — ``keep`` rows per non-trivial doc. Shared
    fingerprints indicate copied spans (containment, where token-level
    Jaccard misses reordered boilerplate)."""

    def fn(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ids) == 0:
                continue
            texts = batch.column(1)
            out_ids, out_fps = [], []
            # per-row numpy rolling hash over byte windows; rows are
            # independent but windows within a row are vectorized
            for rid, txt in zip(ids, texts):
                s = (txt.as_py() or "").encode("utf-8")
                if len(s) < gram:
                    continue
                b = np.frombuffer(s, dtype=np.uint8)
                w = np.lib.stride_tricks.sliding_window_view(b, gram)
                mat = np.ascontiguousarray(w)
                lens = np.full(len(mat), gram, dtype=np.int64)
                # pad to 16-byte matrix for the murmur kernel
                padded = np.zeros((len(mat), 16), dtype=np.uint8)
                padded[:, :gram] = mat
                h = murmur3_64_packed(padded, lens, 1)
                kk = min(keep, len(h))
                sel = np.partition(h, kk - 1)[:kk]
                out_ids.extend([rid] * kk)
                out_fps.extend(sel.view(np.int64).tolist())
            yield pa.RecordBatch.from_pydict(
                {
                    "id": pa.array(out_ids, pa.int64()),
                    "fp": pa.array(out_fps, pa.int64()),
                }
            )

    return df.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(text_col).alias("t")
    ).mapInArrow(fn, "id bigint, fp bigint")
