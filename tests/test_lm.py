"""Unigram LM quality scoring (operators/lm.py): hand-computed exact
scores, OOV accounting, blank/NULL documents, reference-slice training,
independent-path agreement, and parallelism invariance."""

import math
import re

import pytest
from pyspark.sql import functions as F

from sprout_spark.operators.lm import train_unigram_lm, unigram_logprob_scores


def _score_py(text, counts, total, vsize, alpha=1.0):
    """Independent reference: Python tokenizer + math.log."""
    toks = re.split(r"\s+", text.strip()) if text and text.strip() else []
    if not toks:
        return 0, 0, None
    denom = math.log(total + alpha * (vsize + 1))
    s = sum(math.log(counts.get(t, 0) + alpha) for t in toks)
    oov = sum(1 for t in toks if t not in counts)
    return len(toks), oov, denom - s / len(toks)


def test_unigram_scores_hand_computed(spark):
    ref = spark.createDataFrame(
        [(0, "a a a b b c"), (1, "a b d")],
        "doc_id bigint, text string",
    )
    model = train_unigram_lm(ref, "text", vocab_size=3)
    got = {r["term"]: r["count"] for r in model.collect()}
    # top-3 by (count desc, term asc): a=4, b=3, c=1 (c beats d on the tie)
    assert got == {"a": 4, "b": 3, "c": 1}
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a zzz"), (2, "   "), (3, None)],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in unigram_logprob_scores(docs, "doc_id", "text", model).collect()
    }
    assert set(out) == {0, 1, 2, 3}  # 1:1 with the input, blanks included
    total, vsize = 8, 3
    for did, text in [(0, "a b c"), (1, "a zzz")]:
        n, oov, score = _score_py(text, got, total, vsize)
        assert out[did]["n_tokens"] == n and out[did]["oov"] == oov
        assert out[did]["score"] == pytest.approx(score, abs=1e-12)
    for did in (2, 3):
        assert out[did]["n_tokens"] == 0 and out[did]["oov"] == 0
        assert out[did]["score"] is None
    # lower score = more reference-like
    assert out[0]["score"] < out[1]["score"]


def test_unigram_validation(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id bigint, text string")
    model = train_unigram_lm(docs, "text")
    with pytest.raises(ValueError, match="alpha"):
        unigram_logprob_scores(docs, "doc_id", "text", model, alpha=0)
    with pytest.raises(ValueError, match="term, count"):
        unigram_logprob_scores(docs, "doc_id", "text", docs)


def test_unigram_reference_slice_and_parallelism_invariance(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(300):
        src = "ref" if i % 3 == 0 else "web"
        words = [vocab[rng.randrange(50 if src == "ref" else 40)] for _ in range(30)]
        if src == "web" and i % 5 == 0:
            words += [f"junk{i}_{j}" for j in range(5)]
        rows.append((i, " ".join(words), src))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    model = train_unigram_lm(
        docs.where(F.col("source") == "ref"), "text", vocab_size=64
    )
    counts = {r["term"]: r["count"] for r in model.collect()}
    total, vsize = sum(counts.values()), len(counts)
    out = unigram_logprob_scores(docs, "doc_id", "text", model)
    got = {r["doc_id"]: r for r in out.collect()}
    for did, text, _ in rows:
        n, oov, score = _score_py(text, counts, total, vsize)
        assert got[did]["n_tokens"] == n and got[did]["oov"] == oov
        assert got[did]["score"] == pytest.approx(score, rel=1e-9)
    # junk-bearing web docs score worse than the ref median
    ref_scores = sorted(
        got[i]["score"] for i, _, s in rows if s == "ref"
    )
    med = ref_scores[len(ref_scores) // 2]
    for i, _, s in rows:
        if s == "web" and i % 5 == 0:
            assert got[i]["score"] > med
    # parallelism invariance: 1 vs 7 partitions agree to float tolerance
    alt = {
        r["doc_id"]: r
        for r in unigram_logprob_scores(
            docs.repartition(7), "doc_id", "text", model
        ).collect()
    }
    for did in got:
        assert alt[did]["n_tokens"] == got[did]["n_tokens"]
        assert alt[did]["oov"] == got[did]["oov"]
        if got[did]["score"] is None:
            assert alt[did]["score"] is None
        else:
            assert alt[did]["score"] == pytest.approx(got[did]["score"], rel=1e-9)
