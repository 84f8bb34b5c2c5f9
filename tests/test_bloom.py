"""Bloom / ScalableBloom semantics tests — ports of the reference suite
(/root/reference/bloom_test.go, scalable_bloom_test.go) plus the gaps the
north rule demands: FPR measurement, zero-false-negative sweep, merge
commutativity/associativity (SURVEY.md §5).
"""

import math

import numpy as np
import pytest

from sprout_spark.sketch.base import merge_serialized, sketch_from_bytes
from sprout_spark.sketch.bloom import BloomCapacityError, BloomFilter, bloom_geometry
from sprout_spark.sketch.scalable_bloom import ScalableBloomFilter


def keys(prefix, n, start=0):
    return [f"{prefix}-{i:08d}" for i in range(start, start + n)]


# ---------------------------------------------------------------- geometry


@pytest.mark.parametrize(
    "err,cap,k,M,m",
    [
        # expected values from the reference formulas (bloom.go:100-114)
        (0.01, 1000, 7, 9585, 1369),
        (0.01, 100, 7, 958, 136),
        (0.001, 2_000_000, 10, 28755175, 2875517),
        (0.001, 100_000, 10, 1437758, 143775),
    ],
)
def test_geometry_table(err, cap, k, M, m):
    geo = bloom_geometry(cap, err)
    assert geo["k"] == k
    assert geo["M"] == M
    assert geo["m"] == m
    assert list(geo["seeds"][:3]) == [128, 256, 512]  # 64 << (i+1)


def test_storage_size_matches_readme_claim():
    # readme.md:15-16: ~3.4 MB / ~14 bits per element at cap=2M, eps=0.001
    bf = BloomFilter(2_000_000, 0.001)
    bits_per_elem = bf.nbits / 2_000_000
    assert 13.5 < bits_per_elem < 14.5
    assert 3.0e6 < bf.filter_size() < 3.7e6


def test_validation():
    with pytest.raises(ValueError):
        BloomFilter(1000, 0.0)
    with pytest.raises(ValueError):
        BloomFilter(1000, 1.0)
    with pytest.raises(ValueError):
        BloomFilter(10, 0.01)  # capacity must be > 10 (bloom.go:95)
    with pytest.raises(ValueError):
        ScalableBloomFilter(0, 0.01)
    with pytest.raises(ValueError):
        ScalableBloomFilter(10, 0.01)  # bloom geometry needs > 10


def test_sbf_small_capacity_grows_without_crashing():
    """Regression: the growth schedule can compute a stage capacity <= 10
    for small m0; growing mid-add must clamp, not raise (a partial build
    dying partway is a lost-rows hazard)."""
    sbf = ScalableBloomFilter(11, 0.01)
    keys = [f"k{i}" for i in range(500)]
    sbf.update_values(keys)  # forces several grows through tiny stages
    assert all(sbf.contains(k) for k in keys)  # zero false negatives


def test_sbf_concat_merge_does_not_alias_other():
    """Regression: concat-mode merge must not share stage objects with
    the merge argument — later adds to the merged filter previously
    flipped bits inside the other filter (phantom membership)."""
    a = ScalableBloomFilter(100, 0.01, merge_mode="concat")
    b = ScalableBloomFilter(100, 0.01, merge_mode="concat")
    a.update_values(["a1"])
    b.update_values(["b1"])
    a.merge(b)
    before_bits = [st.bits.copy() for st in b.stages]
    before_count = b.count
    a.update_values([f"z{i}" for i in range(200)])  # mutate merged filter
    assert b.count == before_count
    for st, bits in zip(b.stages, before_bits):
        assert (st.bits == bits).all()  # b untouched by a's later adds
    assert a.contains("a1") and a.contains("b1")


# ---------------------------------------------------------------- add/contains


def test_add_count_and_recall():
    # bloom_test.go:34-74: count equals number of Adds; all added found
    bf = BloomFilter(100_000, 0.01)
    ks = keys("k", 50_000)
    bf.update_values(ks)
    assert bf.count == 50_000
    assert bf.contains_values(ks).all()  # zero false negatives


def test_add_past_capacity_errors():
    # bloom_test.go:76-98 / bloom.go:170-172
    bf = BloomFilter(100, 0.01)
    bf.update_values(keys("k", 100))
    with pytest.raises(BloomCapacityError):
        bf.add("one-more")


@pytest.mark.parametrize("hash_mode", ["km", "seeded"])
def test_observed_fpr_within_bound(hash_mode):
    # SURVEY.md §5.2 item 3: insert capacity keys, probe disjoint keys
    for err in (0.01, 0.001):
        cap = 20_000
        bf = BloomFilter(cap, err, hash_mode=hash_mode)
        bf.update_values(keys("in", cap))
        probe = keys("out", 50_000)
        fp = int(bf.contains_values(probe).sum())
        fpr = fp / len(probe)
        # 95% binomial CI slack
        slack = 1.96 * math.sqrt(err * (1 - err) / len(probe))
        assert fpr <= err + slack, (err, fpr)


def test_single_key_api():
    bf = BloomFilter(1000, 0.01)
    bf.add(b"\x01\x02\x03")
    assert bf.contains(b"\x01\x02\x03")
    assert not bf.contains(b"\x01\x02\x04")
    bf.clear()
    assert bf.count == 0
    assert not bf.contains(b"\x01\x02\x03")


# ---------------------------------------------------------------- merge laws


def test_merge_geometry_mismatch_errors():
    # bloom_test.go:151-169
    a = BloomFilter(1000, 0.01)
    b = BloomFilter(2000, 0.01)
    with pytest.raises(ValueError):
        a.merge(b)
    # hash-mode mismatch is a geometry mismatch too
    c = BloomFilter(1000, 0.01, hash_mode="seeded")
    with pytest.raises(ValueError):
        a.merge(c)


def test_merge_no_false_negatives_and_counts():
    # bloom_test.go:171-196 + Q2 fix (counts sum)
    a = BloomFilter(10_000, 0.01)
    b = BloomFilter(10_000, 0.01)
    ka, kb = keys("a", 3000), keys("b", 3000)
    a.update_values(ka)
    b.update_values(kb)
    a.merge(b)
    assert a.count == 6000
    assert a.contains_values(ka + kb).all()


@pytest.mark.parametrize("hash_mode", ["km", "seeded"])
def test_merge_commutative_associative_bitwise(hash_mode):
    ks = keys("m", 9000)
    parts = [ks[0:3000], ks[3000:6000], ks[6000:9000]]

    def build(part):
        bf = BloomFilter(10_000, 0.01, hash_mode=hash_mode)
        bf.update_values(part)
        return bf

    ab = build(parts[0]).merge(build(parts[1]))
    ba = build(parts[1]).merge(build(parts[0]))
    assert (ab.bits == ba.bits).all() and ab.count == ba.count

    abc1 = build(parts[0]).merge(build(parts[1])).merge(build(parts[2]))
    bc = build(parts[1]).merge(build(parts[2]))
    abc2 = build(parts[0]).merge(bc)
    assert (abc1.bits == abc2.bits).all() and abc1.count == abc2.count

    whole = build(ks)
    assert (abc1.bits == whole.bits).all()  # merged == single build, bit-identical


def test_serialization_roundtrip():
    bf = BloomFilter(5000, 0.01)
    bf.update_values(keys("s", 1000))
    data = bf.to_bytes()
    bf2 = sketch_from_bytes(data)
    assert isinstance(bf2, BloomFilter)
    assert (bf2.bits == bf.bits).all()
    assert bf2.count == bf.count
    assert bf2.contains_values(keys("s", 1000)).all()
    merged = sketch_from_bytes(merge_serialized([data, data]))
    assert (merged.bits == bf.bits).all()
    assert merged.count == 2000


# ---------------------------------------------------------------- scalable


def test_sbf_grows_and_keeps_recall():
    # scalable_bloom_test.go:53-81: 10x capacity adds succeed; capacity >= 1000
    sbf = ScalableBloomFilter(100, 0.01)
    ks = keys("g", 1000)
    sbf.update_values(ks)
    assert sbf.count() == 1000
    assert sbf.capacity() >= 1000
    assert len(sbf.stages) > 1
    assert sbf.contains_values(ks).all()


def test_sbf_growth_schedule_q5():
    # Q5: cap=100, eps=0.01 -> m0=136 -> next caps 94, 188, 377 (SURVEY.md §1.5)
    sbf = ScalableBloomFilter(100, 0.01)
    assert sbf.m0 == 136
    assert [sbf._stage_params(s)[0] for s in range(4)] == [100, 94, 188, 377]
    # stage error tightening eps_i = eps0 * 0.9^i (scalable_bloom.go:161)
    errs = [sbf._stage_params(s)[1] for s in range(3)]
    assert errs == pytest.approx([0.01, 0.009, 0.0081])


def test_sbf_geometry_matches_fixed_before_growth():
    # scalable_bloom_test.go:83-130: un-grown SBF stage 0 == fixed filter
    bf = BloomFilter(1000, 0.01)
    sbf = ScalableBloomFilter(1000, 0.01)
    assert sbf.top.filter_size() == bf.filter_size()
    sbf.update_values(keys("w", 5000))
    assert sbf.top.filter_size() > bf.filter_size()  # top grew wider


def test_sbf_compound_prob():
    sbf = ScalableBloomFilter(100, 0.01)
    sbf.update_values(keys("p", 500))
    n = len(sbf.stages)
    expect = 1.0 - np.prod([1 - 0.01 * 0.9**i for i in range(n)])
    assert sbf.prob() == pytest.approx(expect)
    assert sbf.stats()["stages"] == n


def test_sbf_stage_aligned_merge():
    ks = keys("d", 4000)
    parts = [ks[i::4] for i in range(4)]

    def build(part):
        s = ScalableBloomFilter(200, 0.01)
        s.update_values(part)
        return s

    merged = build(parts[0])
    for p in parts[1:]:
        merged = merged.merge(build(p))
    assert merged.count() == 4000
    assert merged.contains_values(ks).all()  # zero FN through distributed merge

    # commutativity of the stage-aligned merge (probe-equivalent and bitwise
    # per shared stage)
    m1 = build(parts[0]).merge(build(parts[1]))
    m2 = build(parts[1]).merge(build(parts[0]))
    assert len(m1.stages) == len(m2.stages)
    for a, b in zip(m1.stages, m2.stages):
        assert (a.bits == b.bits).all() and a.count == b.count


def test_sbf_stage_merge_overload_is_detected():
    # stage-aligned merge of 8 partitions x 500 keys into cap-200 stages
    # overloads early stages; prob_observed() must report the saturation
    parts = [keys(f"p{i}", 500) for i in range(8)]
    merged = None
    for p in parts:
        s = ScalableBloomFilter(200, 0.01)
        s.update_values(p)
        merged = s if merged is None else merged.merge(s)
    assert merged.contains_values([k for p in parts for k in p]).all()  # zero FN
    probe = keys("absent", 20000)
    fpr = merged.contains_values(probe).mean()
    est = merged.prob_observed()
    assert est >= 0.5 * fpr  # honest saturation reporting


def test_sbf_concat_merge_keeps_global_fpr_bound():
    # concat merge with per-partition eps0 = eps/P keeps the global bound
    # even with unknown cardinality (each partition grows independently)
    P, eps = 8, 0.01
    parts = [keys(f"p{i}", 500) for i in range(P)]
    merged = None
    for p in parts:
        # strict mode bounds each partition's *compound* error by eps/P
        # (quirk Q4: non-strict compounding converges to ~10x eps0)
        s = ScalableBloomFilter(200, eps / P, merge_mode="concat", strict=True)
        s.update_values(p)
        merged = s if merged is None else merged.merge(s)
    assert merged.count() == 4000
    assert merged.contains_values([k for p in parts for k in p]).all()
    probe = keys("absent", 50000)
    fpr = merged.contains_values(probe).mean()
    assert fpr <= eps + 1.96 * math.sqrt(eps * (1 - eps) / len(probe))
    assert merged.prob() <= eps  # union of per-partition compound bounds


def test_sbf_serialization_roundtrip():
    sbf = ScalableBloomFilter(100, 0.01)
    ks = keys("z", 777)
    sbf.update_values(ks)
    back = sketch_from_bytes(sbf.to_bytes())
    assert isinstance(back, ScalableBloomFilter)
    assert back.count() == 777
    assert len(back.stages) == len(sbf.stages)
    assert back.contains_values(ks).all()
    for a, b in zip(back.stages, sbf.stages):
        assert (a.bits == b.bits).all()


def test_sbf_strict_mode_tightens():
    loose = ScalableBloomFilter(100, 0.01)
    strict = ScalableBloomFilter(100, 0.01, strict=True)
    assert strict._eps0 == pytest.approx(0.001)
    assert strict.top.k > loose.top.k


def test_unpadded_pre_r2_payload_still_loads():
    """r1 payloads are exactly (nbits+7)//8 bytes; the r2 word-padded
    layout must keep loading them (checkpoints/stores from older runs)."""
    import json
    import struct

    import numpy as np

    from sprout_spark.sketch import BloomFilter
    from sprout_spark.sketch.base import _MAGIC, sketch_from_bytes

    bf = BloomFilter(64, 0.001, enforce_capacity=False)
    bf.update_values([f"k{i}" for i in range(50)])
    unpadded = (bf.nbits + 7) // 8
    assert unpadded != len(bf.bits)  # this capacity really exercises the pad
    # reserialize with the OLD (unpadded) payload length
    meta = json.dumps(bf._meta(), separators=(",", ":")).encode()
    t = bf.TYPE.encode()
    old_wire = b"".join(
        [_MAGIC, struct.pack("<HI", len(t), len(meta)), t, meta,
         bf.bits[:unpadded].tobytes()]
    )
    back = sketch_from_bytes(old_wire)
    assert (back.bits == bf.bits).all()
    assert back.contains_values([b"k1"])[0] or back.contains("k1")
