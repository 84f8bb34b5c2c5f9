"""Corpus-level heavy-hitter n-grams — sketch proposes, exact confirms.

"What are the most frequent word k-grams in the corpus?" is the
standard corpus-analysis probe for templates, boilerplate, and memorized
spans (the Gopher/C4 reports tabulate exactly this). Exact global
k-gram counts are a giant groupBy on a key set ~ the token count of the
corpus; a Misra-Gries sketch shrinks that to one tree-merged partial
pass, and — because MG admits NO false negatives for any key with
frequency ≥ total/k — a phi-heavy-hitter query needs the exact count
only for the ≤ k proposed candidates. One broadcast semi-join confirms,
so the final answer is EXACT (the oracle is plain SQL), while the full
shuffle only ever carries candidate grams.

The k-gram generation is pure JVM (``transform(sequence)`` windows
joined by single spaces — the same construction as ``shingle_sets``,
but WITH multiplicity: corpus frequency counts occurrences, not
per-document membership).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sprout_spark.sketch.misra_gries import MisraGries
from sprout_spark.spark.aggregate import build_sketch


def ngram_rows(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """One row per k-gram OCCURRENCE (column ``ngram``): whitespace
    tokens, k-token windows joined by single spaces, multiplicity
    preserved. Docs with fewer than k tokens contribute nothing."""
    if k < 1:
        raise ValueError("k must be >= 1")
    t = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
    toks = F.when(F.length(t) == 0, F.array()).otherwise(F.split(t, r"\s+"))
    n = F.size(toks)
    grams = F.when(n < k, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )
    return df.select(F.explode(grams).alias("ngram"))


def heavy_ngrams(
    df: DataFrame,
    text_col: str,
    k: int = 3,
    phi: float = 0.001,
    mg_k: int | None = None,
) -> DataFrame:
    """Exact (ngram, cnt) for every k-gram with corpus frequency ≥
    phi·total occurrences. ``mg_k`` (the sketch's counter budget)
    defaults to ceil(1/phi) — the smallest size at which Misra-Gries
    provably proposes every phi-heavy key; passing a smaller one is
    refused rather than silently dropping hitters."""
    if not 0.0 < phi <= 1.0:
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    need = int(math.ceil(1.0 / phi))
    if mg_k is None:
        mg_k = max(need, 64)
    elif mg_k < need:
        raise ValueError(
            f"mg_k={mg_k} cannot guarantee phi={phi} proposals "
            f"(needs >= {need}): heavy keys could be silently missed"
        )
    grams = ngram_rows(df, text_col, k)
    mg = build_sketch(grams, "ngram", lambda: MisraGries(k=mg_k))
    cands = mg.heavy_hitters(phi)
    spark = df.sparkSession
    if not cands:
        return spark.createDataFrame([], "ngram string, cnt bigint")
    cand_df = spark.createDataFrame([(v,) for v, _, _ in cands], "ngram string")
    return (
        grams.join(F.broadcast(cand_df), "ngram", "left_semi")
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= phi * mg.total)
        .select("ngram", "cnt")
    )
