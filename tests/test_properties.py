"""Property-based tests (hypothesis): hash equivalence and merge laws
hold for arbitrary inputs, not just the fixture corpus."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sprout_spark.hashing import murmur3_64_batch, murmur3_64_scalar
from sprout_spark.sketch import BloomFilter, CountMinSketch, HyperLogLog

keys_strategy = st.lists(
    st.binary(min_size=0, max_size=80), min_size=1, max_size=40
)


@settings(max_examples=60, deadline=None)
@given(keys=keys_strategy, seed=st.integers(min_value=0, max_value=2**63 - 1))
def test_batch_hash_equals_scalar(keys, seed):
    batch = murmur3_64_batch(keys, seed)
    for k, got in zip(keys, batch):
        assert int(got) == murmur3_64_scalar(k, seed)


@settings(max_examples=30, deadline=None)
@given(
    keys=st.lists(st.text(min_size=0, max_size=40), min_size=2, max_size=60),
    split=st.integers(min_value=1, max_value=59),
)
def test_bloom_merge_laws_hold(keys, split):
    split = min(split, len(keys) - 1)
    a_keys, b_keys = keys[:split], keys[split:]

    def build(part):
        bf = BloomFilter(1000, 0.01)
        if part:
            bf.update_values(part)
        return bf

    ab = build(a_keys).merge(build(b_keys))
    ba = build(b_keys).merge(build(a_keys))
    whole = build(keys)
    assert (ab.bits == ba.bits).all()
    assert (ab.bits == whole.bits).all()
    assert ab.contains_values(keys).all()  # zero false negatives


@settings(max_examples=30, deadline=None)
@given(keys=st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=50))
def test_hll_merge_idempotent_and_monotone(keys):
    h1 = HyperLogLog(p=8)
    h1.update_values(keys)
    h2 = HyperLogLog(p=8)
    h2.update_values(keys)
    merged = HyperLogLog(p=8).merge(h1).merge(h2)
    assert (merged.registers == h1.registers).all()  # idempotent


@settings(max_examples=30, deadline=None)
@given(
    keys=st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=50),
)
def test_cms_never_undercounts_property(keys):
    c = CountMinSketch(eps=0.01, delta=0.05)
    c.update_values(keys)
    from collections import Counter

    exact = Counter(keys)
    for k, cnt in exact.items():
        assert c.estimate(k) >= cnt


# ------------------------------------------------------------- Misra-Gries

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=4),
)
def test_mg_bounds_hold_under_any_split(stream, k, n_parts):
    """For ANY stream, ANY k, ANY partitioning: merged Misra-Gries never
    over-counts, under-counts by at most the tracked deficit, and the
    deficit respects N/(k+1)."""
    from sprout_spark.sketch import MisraGries

    parts = [stream[i::n_parts] for i in range(n_parts)]
    sks = []
    for p in parts:
        m = MisraGries(k=k)
        if p:
            m.update_values(p)
        sks.append(m)
    merged = sks[0]
    for s in sks[1:]:
        merged = merged.merge(s)
    truth = Counter(stream)
    assert merged.total == len(stream)
    assert merged.deficit <= len(stream) // (k + 1)
    for v, c in truth.items():
        est = merged.estimate(v)
        assert est <= c
        assert c <= est + merged.deficit
    assert len(merged.counters) <= k


@settings(max_examples=40, deadline=None)
@given(
    keys=st.lists(st.text(min_size=1, max_size=24), min_size=0, max_size=400),
    p=st.integers(min_value=4, max_value=12),
)
def test_hll_wire_roundtrip_any_fill(keys, p):
    """Serialization must be lossless at EVERY fill level — below and
    above the sparse/dense breakeven the revived registers, count, and
    estimate are identical, and a roundtripped sketch merges exactly
    like the original."""
    from sprout_spark.sketch import sketch_from_bytes

    h = HyperLogLog(p=p)
    if keys:
        h.update_values(keys)
    back = sketch_from_bytes(h.to_bytes())
    assert (back.registers == h.registers).all()
    assert back.count == h.count and back.estimate() == h.estimate()
    other = HyperLogLog(p=p)
    other.update_values(["x", "y", "z"])
    m1 = sketch_from_bytes(h.to_bytes()).merge(other)
    m2 = HyperLogLog(p=p)
    if keys:
        m2.update_values(keys)
    m2.merge(other)
    assert (m1.registers == m2.registers).all()


@settings(max_examples=40, deadline=None)
@given(
    keys=st.lists(st.text(min_size=1, max_size=16), min_size=0, max_size=200),
    eps=st.sampled_from([0.1, 0.01, 0.001]),
)
def test_cms_wire_roundtrip_any_fill(keys, eps):
    from sprout_spark.sketch import sketch_from_bytes

    c = CountMinSketch(eps=eps, delta=0.05)
    if keys:
        c.update_values(keys)
    back = sketch_from_bytes(c.to_bytes())
    assert (back.counts == c.counts).all()
    assert back.total == c.total
    if keys:
        assert (back.estimate_values(keys) == c.estimate_values(keys)).all()


@settings(max_examples=40, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=300,
    ),
    n_parts=st.integers(min_value=1, max_value=5),
)
def test_weighted_kll_rank_bounds_any_split(data, n_parts):
    """Weighted KLL (round-5 binary-decomposition path) under ARBITRARY
    values/weights and any partition split: total weight exact, and
    rank(x) tracks the exact WEIGHTED rank within the k=200 tolerance at
    every distinct data value. rank() is the interpolation-free surface
    (quantile() midpoint-interpolates between retained items, which is
    meaningless to bound on two-point discrete streams)."""
    from sprout_spark.sketch import KLL

    vals = np.array([v for v, _ in data], dtype=np.float64)
    w = np.array([x for _, x in data], dtype=np.int64)
    parts = np.array_split(np.arange(len(vals)), n_parts)
    merged = KLL(200)
    for idx in parts:
        part = KLL(200)
        if len(idx):
            part.update_array(vals[idx], w[idx])
        merged.merge(part)
    total = int(w.sum())
    assert merged.n == total
    if total == 0:
        return
    ww = w.astype(np.float64)
    probes = np.unique(vals[w > 0])[:64]
    est = np.atleast_1d(merged.rank(probes))
    for x, r in zip(probes, est):
        exact = ww[vals <= x].sum() / total
        assert abs(r - exact) <= 0.025, (x, r, exact)


@settings(max_examples=40, deadline=None)
@given(
    epoch_sizes=st.lists(
        st.integers(min_value=1, max_value=300), min_size=1, max_size=6
    )
)
def test_sbf_fold_schedule_any_epochs(epoch_sizes):
    """fold_stage under ANY epoch-size sequence: every folded stage is
    sized for its epoch's actual key count at the schedule's ε, so no
    stage ever exceeds capacity, the strict compound FPR stays ≤ the
    configured bound, zero false negatives across all epochs, and the
    wire format revives the folded filter bit-for-bit."""
    from sprout_spark.sketch import BloomFilter
    from sprout_spark.sketch.base import sketch_from_bytes
    from sprout_spark.sketch.scalable_bloom import ScalableBloomFilter

    err = 0.01
    sbf = ScalableBloomFilter(err_rate=err, initial_capacity=32, strict=True)
    all_keys = []
    for e, n in enumerate(epoch_sizes):
        keys = [f"e{e}-k{i}".encode() for i in range(n)]
        stage = BloomFilter(max(n, 11), sbf.next_stage_err())
        stage.update_values(keys)
        sbf.fold_stage(stage)
        all_keys.extend(keys)
    assert sbf.prob() <= err + 1e-12
    for s in sbf.stages:
        assert s.count <= s.capacity
    assert all(sbf.contains_values(all_keys))
    revived = sketch_from_bytes(sbf.to_bytes())
    assert revived.prob() == sbf.prob()
    assert all(revived.contains_values(all_keys))
