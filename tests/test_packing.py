"""Sequence packing (operators/packing.py): span-partition invariants,
full-sequence guarantees, greedy reference equivalence, determinism /
parallelism invariance, guards, and the one-Exchange plan."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sprout_spark.operators.packing import pack_greedy, pack_spans

BUDGET = 100


def _docs(spark, weights, prefix="d"):
    return spark.createDataFrame(
        [Row(doc_id=f"{prefix}{i}", w=int(wt)) for i, wt in enumerate(weights)]
    )


def test_pack_spans_invariants(spark):
    import random

    rng = random.Random(3)
    df = _docs(spark, [rng.randrange(1, 250) for _ in range(200)])
    out = pack_spans(df, "doc_id", "w", BUDGET, n_shards=4).collect()
    w_by_id = {r["doc_id"]: r["w"] for r in df.collect()}
    # every doc's spans partition [0, w) contiguously
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(w_by_id)
    for did, spans in by_doc.items():
        spans.sort(key=lambda r: r["seq"])
        assert spans[0]["doc_from"] == 0
        assert spans[-1]["doc_to"] == w_by_id[did]
        for a, b in zip(spans, spans[1:]):
            assert a["doc_to"] == b["doc_from"] and b["seq"] == a["seq"] + 1
        assert all(s["doc_to"] > s["doc_from"] for s in spans)
    # every sequence except each shard's last is exactly full
    fill = {}
    for r in out:
        fill[(r["shard"], r["seq"])] = fill.get((r["shard"], r["seq"]), 0) + (
            r["doc_to"] - r["doc_from"]
        )
    last = {}
    for sh, seq in fill:
        last[sh] = max(last.get(sh, -1), seq)
    for (sh, seq), tot in fill.items():
        if seq < last[sh]:
            assert tot == BUDGET, (sh, seq, tot)
        else:
            assert 0 < tot <= BUDGET
    # sequences are contiguous from 0 per shard
    for sh in last:
        assert {s for (s2, s) in fill if s2 == sh} == set(range(last[sh] + 1))


def test_pack_spans_parallelism_invariance_and_determinism(spark):
    df = _docs(spark, range(1, 120))
    a = sorted(map(tuple, pack_spans(df.repartition(1), "doc_id", "w", 64, 3).collect()))
    b = sorted(map(tuple, pack_spans(df.repartition(16), "doc_id", "w", 64, 3).collect()))
    c = sorted(map(tuple, pack_spans(df, "doc_id", "w", 64, 3, hash_mode="md5").collect()))
    assert a == b and len(a) > 0
    assert {t[0] for t in c} == {t[0] for t in a}  # same docs, md5 layout differs


def test_pack_greedy_matches_python_reference(spark):
    import random

    rng = random.Random(11)
    weights = [rng.randrange(1, 90) for _ in range(300)]
    df = _docs(spark, weights)
    got = {
        r["doc_id"]: (r["shard"], r["pack"], r["pos"])
        for r in pack_greedy(df, "doc_id", "w", BUDGET, n_shards=3).collect()
    }
    # reference: same hash (from Spark), same order, greedy in Python
    hashed = df.select(
        "doc_id", "w", F.xxhash64(F.col("doc_id").cast("string")).alias("h")
    ).collect()
    want = {}
    for shard in range(3):
        rows = sorted(
            ((r["h"], r["doc_id"], r["w"]) for r in hashed if r["h"] % 3 == shard),
            key=lambda t: (t[0], t[1]),
        )
        pack = pos = acc = 0
        for h, did, wt in rows:
            if acc + wt > BUDGET and acc > 0:
                pack, pos, acc = pack + 1, 0, 0
            want[did] = (shard, pack, pos)
            pos, acc = pos + 1, acc + wt
    assert got == want and len(got) == 300


def test_pack_greedy_budget_and_maximality(spark):
    import random

    rng = random.Random(5)
    df = _docs(spark, [rng.randrange(1, 100) for _ in range(150)])
    rows = pack_greedy(df, "doc_id", "w", BUDGET, n_shards=2).collect()
    w_by_id = {r["doc_id"]: r["w"] for r in df.collect()}
    packs = {}
    for r in rows:
        packs.setdefault((r["shard"], r["pack"]), []).append(r)
    for (sh, pk), members in packs.items():
        members.sort(key=lambda r: r["pos"])
        assert [m["pos"] for m in members] == list(range(len(members)))
        assert sum(w_by_id[m["doc_id"]] for m in members) <= BUDGET
        nxt = packs.get((sh, pk + 1))
        if nxt:  # greedy maximality: the next pack's head would overflow
            head = min(nxt, key=lambda r: r["pos"])
            assert (
                sum(w_by_id[m["doc_id"]] for m in members)
                + w_by_id[head["doc_id"]]
                > BUDGET
            )
    assert len(rows) == 150


def test_pack_greedy_oversize(spark):
    df = _docs(spark, [10, 500, 20])
    with pytest.raises(Exception, match="budget"):
        pack_greedy(df, "doc_id", "w", BUDGET, 1).collect()
    rows = pack_greedy(df, "doc_id", "w", BUDGET, 1, oversize="own_pack").collect()
    w_by_id = {"d0": 10, "d1": 500, "d2": 20}
    packs = {}
    for r in rows:
        packs.setdefault(r["pack"], []).append(w_by_id[r["doc_id"]])
    big = [p for p, ws in packs.items() if 500 in ws]
    assert len(big) == 1 and packs[big[0]] == [500]  # oversize doc alone


def test_guards(spark):
    df = _docs(spark, [10, 20])
    with pytest.raises(ValueError, match="budget"):
        pack_spans(df, "doc_id", "w", 0, 1)
    with pytest.raises(ValueError, match="n_shards"):
        pack_spans(df, "doc_id", "w", 10, 0)
    with pytest.raises(ValueError, match="hash_mode"):
        pack_spans(df, "doc_id", "w", 10, 1, hash_mode="crc")
    with pytest.raises(ValueError, match="oversize"):
        pack_greedy(df, "doc_id", "w", 10, 1, oversize="drop")
    bad = _docs(spark, [10, 0])
    with pytest.raises(Exception, match="non-positive"):
        pack_spans(bad, "doc_id", "w", 10, 1).collect()
    nulls = spark.createDataFrame([Row(doc_id="a", w=None)], "doc_id string, w int")
    with pytest.raises(Exception, match="non-positive"):
        pack_greedy(nulls, "doc_id", "w", 10, 1).collect()


def test_pack_spans_plan_one_exchange(spark):
    df = _docs(spark, range(1, 50))
    plan = (
        pack_spans(df, "doc_id", "w", 64, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
