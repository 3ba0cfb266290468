"""Native codec round-trip tests (xbc block codec + id codec)."""
import random

import pytest

from spring_tpu.codecs import bsc, idcodec


@pytest.mark.parametrize("data", [
    b"",
    b"x",
    b"abracadabra" * 3,
    b"A" * 100000,
    b"ACGT" * 25000,
    bytes(range(256)) * 64,
])
def test_xbc_roundtrip(data):
    assert bsc.decompress(bsc.compress(data)) == data


def test_xbc_random_roundtrip():
    rng = random.Random(42)
    for n in (1, 2, 63, 64, 65, 1000, 100000):
        data = bytes(rng.randrange(256) for _ in range(n))
        assert bsc.decompress(bsc.compress(data)) == data


def test_xbc_multiblock():
    data = b"the quick brown fox " * 20000  # 400 KB
    z = bsc.compress(data, block_size=65536)  # forces ~7 blocks
    assert bsc.decompress(z) == data
    assert len(z) < len(data) // 10


def test_xbc_compresses_dna():
    rng = random.Random(1)
    genome = bytes(rng.choice(b"ACGT") for _ in range(100000))
    z = bsc.compress(genome)
    assert len(z) < len(genome) / 3  # < 2.7 bits/base on random DNA


def test_xbc_corrupt_raises():
    z = bytearray(bsc.compress(b"hello world" * 100))
    with pytest.raises(RuntimeError):
        bsc.decompress(bytes(z[:8]))


def test_str_array_roundtrip():
    strs = [b"", b"a", b"hello", b"x" * 1000, bytes([0, 1, 2, 255, 10])]
    assert bsc.decompress_str_array(bsc.compress_str_array(strs)) == strs


def test_idcodec_roundtrip_typical():
    ids = [f"SRR554369.{i} {i}/1".encode() for i in range(1, 501)]
    z = idcodec.compress_ids(ids)
    assert idcodec.decompress_ids(z, len(ids)) == ids
    assert len(z) < len(ids)  # < 8 bits/id on sequential ids


def test_idcodec_roundtrip_adversarial():
    rng = random.Random(7)
    ids = [b"", b"007", b"7", b"a b c 123", b"0" * 30, b"x" * 300]
    ids += [bytes(rng.randrange(33, 127) for _ in range(rng.randrange(0, 40)))
            for _ in range(200)]
    ids += [f"inst:{rng.randrange(10**9)}:{rng.randrange(100):03d}".encode()
            for _ in range(200)]
    z = idcodec.compress_ids(ids)
    assert idcodec.decompress_ids(z, len(ids)) == ids


def test_idcodec_leading_zero_deltas():
    # zero-padded counters must round-trip exactly
    ids = [f"run_{i:05d}".encode() for i in range(0, 3000, 7)]
    z = idcodec.compress_ids(ids)
    assert idcodec.decompress_ids(z, len(ids)) == ids
