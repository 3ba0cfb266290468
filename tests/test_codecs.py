"""Native codec round-trip tests (xbc block codec + id codec)."""
import numpy as np
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


def test_idcodec_template_wire():
    # a fully affine block collapses to the template wire: O(1) bytes
    # (the reference's token models pay ~0.7 KB per 1M such ids)
    ids = [f"@SYN.{i + 1} {i + 1} length=100".encode() for i in range(20000)]
    z = idcodec.compress_ids(ids)
    assert len(z) < 128
    assert idcodec.decompress_ids(z, len(ids)) == ids
    # one deviating id anywhere must force the fallback coder, losslessly
    ids[13579] = b"@WEIRD"
    z2 = idcodec.compress_ids(ids)
    assert idcodec.decompress_ids(z2, len(ids)) == ids
    # truncated / corrupted template wires must raise, not crash
    import pytest
    for cut in (5, 9, 12, len(z) - 1):
        with pytest.raises(RuntimeError):
            idcodec.decompress_ids(z[:cut], len(ids))
    bad = bytearray(z)
    bad[8] = 0xFF  # token count claim
    with pytest.raises(RuntimeError):
        idcodec.decompress_ids(bytes(bad), len(ids))


def test_dna_str_array_modes():
    # long-mode read wire: per-block min of the raw str-array encoding and
    # 2-bit packed ACGT; both must round-trip, N forces the raw mode
    from spring_tpu.codecs import bsc
    rng = np.random.default_rng(3)
    seqs = [rng.choice(list(b"ACGT"),
                       rng.integers(50, 200)).astype(np.uint8).tobytes()
            for _ in range(2000)]
    z = bsc.compress_dna_str_array(seqs, num_threads=2)
    assert bsc.decompress_dna_str_array(z, num_threads=2) == seqs
    seqs_n = [s[:10] + b"N" + s[10:] for s in seqs]
    z_n = bsc.compress_dna_str_array(seqs_n, num_threads=2)
    assert z_n[0] == 0  # N cannot 2-bit pack
    assert bsc.decompress_dna_str_array(z_n, num_threads=2) == seqs_n
    assert bsc.decompress_dna_str_array(bsc.compress_dna_str_array([])) == []
    # block scale, genome-sampled reads (the bench shape): the packed mode
    # caps the rate at ~2 bits/base where BWT+MTF pays ~2.03
    genome = rng.choice(list(b"ACGT"), 2_000_000).astype(np.uint8)
    starts = rng.integers(0, len(genome) - 100, 10_000)
    big = [genome[s:s + 100].tobytes() for s in starts]
    # (which mode wins is data-dependent: error-free overlaps favor BWT,
    # noisy reads favor packing — the pick is simply the smaller)
    z_b = bsc.compress_dna_str_array(big, num_threads=4)
    assert len(z_b) * 8 / 1_000_000 < 2.01
    assert bsc.decompress_dna_str_array(z_b, num_threads=4) == big
    # both wire modes must round-trip regardless of which the race picks
    for force in (0, 1):
        z_f = bsc.compress_dna_str_array(big, _force=force, num_threads=4)
        assert z_f[0] == force
        assert bsc.decompress_dna_str_array(z_f, num_threads=4) == big


def test_dna_str_array_corrupt_raises():
    import pytest
    from spring_tpu.codecs import bsc
    rng = np.random.default_rng(9)
    seqs = [rng.choice(list(b"ACGT"), 100).astype(np.uint8).tobytes()
            for _ in range(200)]
    z = bytearray(bsc.compress_dna_str_array(seqs, _force=1))
    assert z[0] == 1
    with pytest.raises(RuntimeError):
        bsc.decompress_dna_str_array(b"\x02" + bytes(z[1:]))  # bad mode
    with pytest.raises(RuntimeError):
        bsc.decompress_dna_str_array(bytes(z[:12]))           # truncated
    bad = z.copy()
    bad[1] ^= 0xFF  # total mismatches the shipped payload
    with pytest.raises(RuntimeError):
        bsc.decompress_dna_str_array(bytes(bad))
    bad = z.copy()
    bad[9] = 0xFF  # lens_z length runs past the body
    with pytest.raises(RuntimeError):
        bsc.decompress_dna_str_array(bytes(bad))


# ---------------- qv quality codec ----------------

def test_qv_matrix_roundtrip():
    from spring_tpu.codecs import qv
    rng = np.random.default_rng(3)
    n, L = 2000, 90
    mat = rng.integers(35, 75, size=(n, L)).astype(np.uint8)
    lens = rng.integers(0, L + 1, size=n).astype(np.int32)
    valid = np.arange(L)[None, :] < lens[:, None]
    mat = np.where(valid, mat, 0).astype(np.uint8)
    z = qv.compress_rows(mat, lens)
    m2, l2 = qv.decompress_rows(z, max_len=L)
    np.testing.assert_array_equal(l2, lens)
    np.testing.assert_array_equal(m2, mat)


def test_qv_beats_bwt_on_quality_shaped_data():
    from spring_tpu.codecs import qv
    rng = np.random.default_rng(4)
    n, L = 20000, 100
    qlevels = np.frombuffer(b"#,7<BFIJ", dtype=np.uint8)
    qidx = np.clip(rng.normal(6.0 - np.arange(L) / 40.0, 1.2,
                              size=(n, L)).astype(np.int32), 0, 7)
    mat = qlevels[qidx]
    lens = np.full(n, L, np.int32)
    z_qv = qv.compress_rows(mat, lens)
    z_bw = bsc.compress_rows(mat, lens, num_threads=1)
    assert len(z_qv) < len(z_bw)


def test_qv_edge_cases():
    from spring_tpu.codecs import qv
    # empty input
    z = qv.compress_rows(np.zeros((0, 1), np.uint8), np.zeros(0, np.int32))
    m, l = qv.decompress_rows(z)
    assert len(l) == 0
    # single-symbol alphabet
    mat = np.full((10, 5), ord("I"), np.uint8)
    lens = np.full(10, 5, np.int32)
    m2, l2 = qv.decompress_rows(qv.compress_rows(mat, lens), max_len=5)
    np.testing.assert_array_equal(m2, mat)
    # alphabet wider than 64 symbols (q1 context halving path)
    rng = np.random.default_rng(5)
    mat = rng.integers(33, 127, size=(500, 40)).astype(np.uint8)
    lens = np.full(500, 40, np.int32)
    m3, _ = qv.decompress_rows(qv.compress_rows(mat, lens), max_len=40)
    np.testing.assert_array_equal(m3, mat)


def test_qv_const_prefix_fast_path():
    # QVZ-collapsed quality (every row a prefix of one master row) takes
    # the constant-prefix wire mode: size ~= master row + length stream,
    # not the adaptive coder's ~0.045 bits/sym determinism floor.
    from spring_tpu.codecs import qv
    n, L = 50_000, 100
    master = (np.arange(L) % 5 + 40).astype(np.uint8)
    mat = np.tile(master, (n, 1))
    lens = np.full(n, L, np.int64)
    z = qv.compress_rows(mat, lens, num_threads=2, fine_pos=True)
    assert len(z) < 2000  # was ~30 KB through the generic model
    m, l = qv.decompress_rows(z, max_len=L, num_threads=2)
    np.testing.assert_array_equal(m, mat)
    np.testing.assert_array_equal(l, lens)
    # ragged prefixes of the master still qualify
    lens_r = np.linspace(10, L, n).astype(np.int64)
    mat_r = np.where(np.arange(L)[None, :] < lens_r[:, None],
                     master[None, :], 0).astype(np.uint8)
    z_r = qv.compress_rows(mat_r, lens_r, num_threads=2, fine_pos=True)
    m_r, l_r = qv.decompress_rows(z_r, max_len=L, num_threads=2)
    np.testing.assert_array_equal(m_r, mat_r)
    np.testing.assert_array_equal(l_r, lens_r)
    # one mismatching row must force the generic path (and round-trip)
    mat_g = mat.copy()
    mat_g[123, 50] ^= 1
    z_g = qv.compress_rows(mat_g, lens, num_threads=2, fine_pos=True)
    assert len(z_g) > len(z)
    m_g, _ = qv.decompress_rows(z_g, max_len=L, num_threads=2)
    np.testing.assert_array_equal(m_g, mat_g)


def test_qv_multishard_parallel_roundtrip():
    # >4 MB of chars forces multiple independent shards; decode must
    # reassemble rows exactly regardless of thread count.
    from spring_tpu.codecs import qv
    rng = np.random.default_rng(7)
    n, L = 90_000, 101  # ~9 MB -> 3 shards
    mat = (rng.integers(0, 8, (n, L)) * 4 + 33).astype(np.uint8)
    lens = np.full(n, L, np.int32)
    lens[::17] = 63  # ragged rows across shard boundaries
    mat[np.arange(L)[None, :] >= lens[:, None]] = 0
    z = qv.compress_rows(mat, lens, num_threads=4)
    assert int.from_bytes(z[:4], "little") >= 2
    m1, l1 = qv.decompress_rows(z, max_len=L, num_threads=1)
    m4, l4 = qv.decompress_rows(z, max_len=L, num_threads=4)
    np.testing.assert_array_equal(l1, lens)
    np.testing.assert_array_equal(m1, mat)
    np.testing.assert_array_equal(m4, mat)
    # serial compress produces identical framing (thread count only
    # affects scheduling, not the partition)
    z1 = qv.compress_rows(mat, lens, num_threads=1)
    assert z1 == z


def test_qv_corrupt_stream_raises():
    from spring_tpu.codecs import qv
    import pytest
    rng = np.random.default_rng(11)
    mat = rng.integers(35, 70, size=(100, 20)).astype(np.uint8)
    lens = np.full(100, 20, np.int32)
    z = bytearray(qv.compress_rows(mat, lens))
    z[len(z) // 2] ^= 0x5A  # corrupt a payload byte
    with pytest.raises(RuntimeError):
        # the FNV checksum must catch it; never return wrong data
        qv.decompress_rows(bytes(z))


def test_qv_fine_pos_flag_roundtrip():
    """fine_pos rides the shard header (Lmax bit 31): quantizer output with
    a mid-size alphabet must round-trip under fine position contexts and
    compress tighter than the coarse default on column-deterministic data."""
    from spring_tpu.codecs import qv
    rng = np.random.default_rng(7)
    n, L = 20_000, 100
    # column-deterministic ramp over 12 symbols (like unsnapped qvz output)
    ramp = (70 - np.arange(L) // 9).astype(np.uint8)
    mat = np.broadcast_to(ramp, (n, L)).copy()
    # a little prev-dependent variation
    first = rng.integers(0, 2, n).astype(np.uint8)
    mat[:, 0] = 70 + first
    lens = np.full(n, L, np.int64)
    c_fine = qv.compress_rows(mat, lens, fine_pos=True)
    c_coarse = qv.compress_rows(mat, lens, fine_pos=False)
    m2, l2 = qv.decompress_rows(c_fine, L)
    assert np.array_equal(m2, mat)
    m3, _ = qv.decompress_rows(c_coarse, L)
    assert np.array_equal(m3, mat)
    assert len(c_fine) < len(c_coarse)
