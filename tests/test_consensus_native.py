"""Native encoder kernels (csrc/encoder.cpp) vs the numpy reference path."""
import numpy as np
import pytest

from spring_tpu.encode import consensus as cons


def _random_layout(rng, n_reads=4000, L=64, n_contigs=37, with_n=False):
    """Random contig-major layout + code rows mimicking the real encoder."""
    hi = 5 if with_n else 4
    codes = rng.integers(0, hi, (n_reads, L)).astype(np.uint8)
    lengths = rng.integers(32, L + 1, n_reads).astype(np.int32)
    # contig-major: split reads into contigs, cumulative offsets
    cid = np.sort(rng.integers(0, n_contigs, n_reads))
    pos_in = rng.integers(0, 200, n_reads).astype(np.int64)
    order = np.lexsort((pos_in, cid))
    cid, pos_in = cid[order], pos_in[order]
    # per-contig min -> 0
    first = np.searchsorted(cid, np.arange(cid[-1] + 1))
    pos_in = pos_in - pos_in[np.repeat(first, np.bincount(cid))]
    ext = pos_in + lengths[order]
    clen = np.maximum.reduceat(ext, first)
    base = np.concatenate([[0], np.cumsum(clen)[:-1]])
    gpos = pos_in + base[cid]
    layout = cons.ContigLayout(
        rids=order.astype(np.int32), gpos=gpos,
        rc=rng.integers(0, 2, n_reads).astype(np.uint8),
        seq_len=int(clen.sum()))
    return layout, codes, lengths


@pytest.mark.parametrize("with_n", [False, True])
def test_consensus_noise_parity(with_n):
    rng = np.random.default_rng(7)
    # consensus is only ever built from clean (N-free) reads; N-containing
    # reads hit extract_noise via the second-chance path
    layout, codes, lengths = _random_layout(rng, with_n=False)
    ref = cons.build_consensus_np(layout, codes, lengths)
    got = cons.build_consensus(layout, codes, lengths)
    np.testing.assert_array_equal(got, ref)

    if with_n:
        mask = rng.random(codes.shape) < 0.02
        codes = np.where(mask, np.uint8(4), codes)
    nn_r, npos_r, nchar_r = cons.extract_noise_np(layout, ref, codes, lengths)
    nn_g, npos_g, nchar_g = cons.extract_noise(layout, ref, codes, lengths)
    np.testing.assert_array_equal(nn_g, nn_r)
    np.testing.assert_array_equal(npos_g, npos_r)
    np.testing.assert_array_equal(nchar_g, nchar_r)


@pytest.mark.parametrize("with_n", [False, True])
def test_packed_kernels_parity(with_n):
    """Packed-row kernel variants match the matrix kernels bit for bit."""
    from spring_tpu.io import fastq_native
    rng = np.random.default_rng(13)
    layout, codes, lengths = _random_layout(rng, with_n=False)
    packed = fastq_native.pack_2bit(codes)
    ref = cons.build_consensus(layout, codes, lengths)
    got = cons.build_consensus_packed(layout, packed, lengths)
    np.testing.assert_array_equal(got, ref)

    if with_n:
        mask = rng.random(codes.shape) < 0.02
        codes = np.where(mask, np.uint8(4), codes)
        packed = fastq_native.pack_2bit(codes)   # N packs as A
    overlay = cons.NOverlay.from_codes(codes)
    assert (len(overlay.rows) > 0) == with_n
    nn_r, npos_r, nchar_r = cons.extract_noise(layout, ref, codes, lengths)
    nn_g, npos_g, nchar_g = cons.extract_noise_packed(
        layout, ref, packed, lengths, overlay)
    np.testing.assert_array_equal(nn_g, nn_r)
    np.testing.assert_array_equal(npos_g, npos_r)
    np.testing.assert_array_equal(nchar_g, nchar_r)

    # unpack_rows restores the byte rows including N positions
    sel = rng.choice(len(codes), 200, replace=False).astype(np.int64)
    sel.sort()
    rows = cons.unpack_rows(packed, sel, codes.shape[1], overlay)
    np.testing.assert_array_equal(rows, codes[sel])


def test_reconstruct_parity():
    rng = np.random.default_rng(11)
    layout, codes, lengths = _random_layout(rng, n_reads=2000)
    seq = cons.build_consensus(layout, codes, lengths)
    nn, npos, nchar = cons.extract_noise(layout, seq, codes, lengths)
    rl = lengths[layout.rids]
    ref = cons.reconstruct_reads_np(seq, layout.gpos, rl, layout.rc,
                                    nn, npos, nchar)
    got = cons.reconstruct_reads(seq, layout.gpos, rl, layout.rc,
                                 nn, npos, nchar)
    np.testing.assert_array_equal(got, ref)
    # and the reconstruction is exact vs the original reads
    W = got.shape[1]
    valid = np.arange(W)[None, :] < rl[:, None]
    np.testing.assert_array_equal(got[valid], codes[layout.rids][:, :W][valid])


def test_reconstruct_corrupt_raises():
    seq = np.zeros(100, np.uint8)
    with pytest.raises(IndexError):
        cons.reconstruct_reads(seq, np.array([90], np.int64),
                               np.array([32], np.int32),
                               np.zeros(1, np.uint8), np.zeros(1, np.int32),
                               np.empty(0, np.int32), np.empty(0, np.uint8))


def test_empty_layout():
    lay = cons.ContigLayout(np.empty(0, np.int32), np.empty(0, np.int64),
                            np.empty(0, np.uint8), 0)
    codes = np.zeros((0, 8), np.uint8)
    lengths = np.zeros(0, np.int32)
    assert len(cons.build_consensus(lay, codes, lengths)) == 0
    nn, npos, nchar = cons.extract_noise(lay, np.zeros(0, np.uint8),
                                         codes, lengths)
    assert len(nn) == 0 and len(npos) == 0 and len(nchar) == 0
