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


def test_quality_buckets_semantics(spark):
    """percent_rank bucketing: per-group cuts at 1/3 and 2/3; ties share
    a rank (all tied rows land in one bucket — the ntile-refusal
    property); single-row groups are head; NULL scores keep their row
    with a NULL bucket; guards refuse bad cuts/labels."""
    from sprout_spark.operators.lm import quality_buckets

    rows = [
        # group g1: scores 1..6 -> pr = 0, .2, .4, .6, .8, 1.0
        (1, "g1", 1.0), (2, "g1", 2.0), (3, "g1", 3.0),
        (4, "g1", 4.0), (5, "g1", 5.0), (6, "g1", 6.0),
        # group g2: a 4-way tie + one higher -> tied rows share pr=0
        (7, "g2", 9.0), (8, "g2", 9.0), (9, "g2", 9.0),
        (10, "g2", 9.0), (11, "g2", 99.0),
        # singleton group + a NULL score
        (12, "g3", 42.0), (13, "g1", None),
    ]
    df = spark.createDataFrame(rows, "id bigint, grp string, score double")
    got = {r["id"]: r["bucket"] for r in
           quality_buckets(df, "score", by="grp").collect()}
    assert got[1] == got[2] == "head"          # pr 0, .2 < 1/3
    assert got[3] == got[4] == "middle"        # .4, .6 < 2/3
    assert got[5] == got[6] == "tail"          # .8, 1.0
    assert got[7] == got[8] == got[9] == got[10] == "head"  # tie shares pr=0
    assert got[11] == "tail"                   # pr=1.0
    assert got[12] == "head"                   # singleton: pr=0
    assert got[13] is None                     # NULL score -> NULL bucket
    assert len(got) == len(rows)               # no silent drops
    with pytest.raises(ValueError, match="labels"):
        quality_buckets(df, "score", labels=("a", "b"), cuts=(0.2, 0.6))
    with pytest.raises(ValueError, match="cuts"):
        quality_buckets(df, "score", cuts=(0.6, 0.2))
    with pytest.raises(ValueError, match="cuts"):
        quality_buckets(df, "score", cuts=(0.0, 0.5))


def test_quality_buckets_composes_with_lm_scores(spark):
    """The CCNet chain: unigram LM scores -> per-lang percentile
    buckets. Reference-like docs land in head, junk in tail, within
    each language group."""
    from sprout_spark.operators.lm import quality_buckets

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(8)],
        "doc_id bigint, text string",
    )
    model = train_unigram_lm(ref, "text", vocab_size=100)
    rows = []
    for lang in ("en", "de"):
        base = 100 if lang == "en" else 200
        for i in range(6):
            rows.append((base + i, lang, "the quick brown fox jumps"))
        for i in range(3):
            rows.append((base + 10 + i, lang, f"zzz{i} qqq{i} xxx{i} vvv{i}"))
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    scored = unigram_logprob_scores(docs, "doc_id", "text", model).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    got = quality_buckets(scored, "score", by="lang")
    for r in got.collect():
        if r["doc_id"] % 100 < 10:
            assert r["bucket"] == "head", r      # in-vocab docs: best ranks
        else:
            assert r["bucket"] == "tail", r      # junk: worst ranks
