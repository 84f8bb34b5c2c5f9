"""Hash equivalence tests (SURVEY.md §5.2 item 1).

The scalar port is a line-by-line transcription of the public MurmurHash3
x64-128 algorithm (the reference's hash, /root/reference/pkg/murmur/
murmur3.go:10-139). The vectorized kernel must match it bit-for-bit over
all tail lengths 0..64 and a fuzz corpus.
"""

import numpy as np
import pytest

from sprout_spark.hashing import (
    murmur3_64_batch,
    murmur3_64_packed,
    murmur3_64_scalar,
    pack_any,
)

# Known-good vectors for MurmurHash3 x64-128 h1 (seed 0), cross-checked
# against the widely used mmh3 package's hash64 results.
KNOWN = [
    (b"hello", 0xCBD8A7B341BD9B02),
    (b"hello, world", 0x342FAC623A5EBC8E),
    (b"The quick brown fox jumps over the lazy dog", 0xE34BBC7BBC071B6C),
    (b"", 0x0000000000000000),
]


@pytest.mark.parametrize("key,expect", KNOWN)
def test_known_vectors_scalar(key, expect):
    assert murmur3_64_scalar(key, 0) == expect


@pytest.mark.parametrize("key,expect", KNOWN)
def test_known_vectors_batch(key, expect):
    got = murmur3_64_batch([key], 0)
    assert int(got[0]) == expect


def test_all_tail_lengths_match_scalar():
    # lengths 0..64 cover every branch of the 15-way tail switch plus
    # multi-block bodies (murmur3.go:55-108)
    rng = np.random.RandomState(42)
    keys = [bytes(rng.randint(0, 256, size=n, dtype=np.uint8)) for n in range(65)]
    for seed in [0, 1, 128, 256, 2**17, 0xDEADBEEF]:
        batch = murmur3_64_batch(keys, seed)
        for k, got in zip(keys, batch):
            assert int(got) == murmur3_64_scalar(k, seed), (len(k), seed)


def test_fuzz_random_lengths():
    rng = np.random.RandomState(7)
    keys = [
        bytes(rng.randint(0, 256, size=rng.randint(0, 200), dtype=np.uint8))
        for _ in range(500)
    ]
    batch = murmur3_64_batch(keys, 12345)
    for k, got in zip(keys, batch):
        assert int(got) == murmur3_64_scalar(k, 12345)


def test_reference_seed_schedule():
    # seeds[i] = 64 << (i+1)  (bloom.go:111-114)
    keys = [b"conv-00000001", b"x" * 33]
    for i in range(12):
        seed = 64 << (i + 1)
        batch = murmur3_64_batch(keys, seed)
        for k, got in zip(keys, batch):
            assert int(got) == murmur3_64_scalar(k, seed)


def test_pack_any_layout():
    mat, lens = pack_any(["ab", b"", b"0123456789abcdef0"])
    assert mat.shape == (3, 32)
    assert list(lens) == [2, 0, 17]
    assert mat[0, 0] == ord("a") and mat[0, 1] == ord("b") and mat[0, 2] == 0
    assert (mat[1] == 0).all()
    assert mat[2, 16] == ord("0")


def test_pack_arrow_matches_pack_any():
    import pyarrow as pa

    from sprout_spark.hashing import pack_arrow

    vals = ["conv-%05d" % i for i in range(100)] + ["", "x" * 40]
    arr = pa.array(vals, type=pa.string())
    m1, l1 = pack_arrow(arr)
    m2, l2 = pack_any(vals)
    assert (l1 == l2).all()
    assert (m1 == m2).all()
    # sliced arrays (non-zero offset) must pack correctly too
    m3, l3 = pack_arrow(arr.slice(50, 30))
    m4, l4 = pack_any(vals[50:80])
    assert (l3 == l4).all()
    assert (m3[:, : m4.shape[1]] == m4).all()
    h3 = murmur3_64_packed(m3, l3, 99)
    h4 = murmur3_64_packed(m4, l4, 99)
    assert (h3 == h4).all()


def test_pack_arrow_rejects_unhashable_key_types():
    """Float/decimal/dict-of-float columns must fail loudly, not be
    reinterpreted as string offsets (ADVICE r1: silent mis-hash risk)."""
    import pyarrow as pa
    import pytest

    from sprout_spark.hashing import pack_arrow

    for bad in (
        pa.array([1.5, 2.5], pa.float64()),
        pa.array([1.5], pa.float32()),
        pa.array([True, False], pa.bool_()),
    ):
        with pytest.raises(TypeError, match="unsupported key column type"):
            pack_arrow(bad)
    # dictionary-encoded STRING decodes fine (common parquet encoding)
    d = pa.array(["a", "b", "a"]).dictionary_encode()
    mat, lens = pack_arrow(d)
    assert list(lens) == [1, 1, 1]
