"""Contig stitching: merged layouts must stay exactly consistent (noise 0
on error-free reads) across forward, reverse-complement, and chained
merges, and must shrink the consensus by the overlap."""
import numpy as np
import pytest

from spring_tpu.encode import consensus as cons
from spring_tpu.encode import stitch
from spring_tpu.io import packing

L = 100


def _revcomp(c):
    return (3 - c[::-1]).astype(np.uint8)


def _make_layout(genome, contig_specs, rng):
    """contig_specs: list of (window_start, window_len, orient).
    Reads every 20 bases across the window; orient=1 builds the contig
    over revcomp(genome window)."""
    read_mat, gpos, rc = [], [], []
    cbase, clen, ccount = [], [], []
    base = 0
    for w, wl, orient in contig_specs:
        starts = list(range(w, w + wl - L + 1, 20))
        ccount.append(len(starts))
        for s in starts:
            r_rc = int(rng.integers(0, 2))
            r = genome[s:s + L]
            read_mat.append(r if r_rc == 0 else _revcomp(r))
            if orient == 0:
                gpos.append(base + (s - w))
                rc.append(r_rc)
            else:
                gpos.append(base + (w + wl) - s - L)
                rc.append(1 - r_rc)
        cbase.append(base)
        clen.append(wl)
        base += wl
    n = len(read_mat)
    lay = cons.ContigLayout(
        rids=np.arange(n, dtype=np.int32),
        gpos=np.array(gpos, np.int64), rc=np.array(rc, np.uint8),
        seq_len=base, cbase=np.array(cbase, np.int64),
        clen=np.array(clen, np.int64), ccount=np.array(ccount, np.int64))
    packed = packing.pack_codes(np.stack(read_mat))
    lengths = np.full(n, L, np.int32)
    return lay, packed, lengths


def _noise_total(lay, packed, lengths):
    seq = cons.build_consensus_packed(lay, packed, lengths)
    nn, _, _ = cons.extract_noise_packed(lay, seq, packed, lengths)
    return seq, int(nn.sum())


@pytest.mark.parametrize("orient", [0, 1])
def test_stitch_two_contig_overlap(orient):
    rng = np.random.default_rng(3)
    genome = rng.integers(0, 4, 700).astype(np.uint8)
    # B forward over [300, 700); A over [100, 500) in either orientation —
    # A's head region overlaps B either way only when A is reversed, and
    # overlaps directly when forward (B first so A's head has a target)
    specs = [(100, 400, 0), (300 if orient == 0 else 300, 400, 0)]
    if orient == 1:
        specs = [(300, 400, 0), (100, 400, 1)]
    else:
        specs = [(0, 400, 0), (200, 400, 0)]
    lay, packed, lengths = _make_layout(genome, specs, rng)
    seq, n0 = _noise_total(lay, packed, lengths)
    assert n0 == 0
    lay2, ns = stitch.stitch_layout(lay, seq, lengths)
    assert ns == 1
    assert lay2.seq_len == 600
    _, n1 = _noise_total(lay2, packed, lengths)
    assert n1 == 0


def test_stitch_fuzz_chained():
    for seed in range(4):
        rng = np.random.default_rng(seed)
        genome = rng.integers(0, 4, 3000).astype(np.uint8)
        specs = [(int(rng.integers(0, 2700)), 300, int(rng.integers(0, 2)))
                 for _ in range(25)]
        lay, packed, lengths = _make_layout(genome, specs, rng)
        seq, n0 = _noise_total(lay, packed, lengths)
        assert n0 == 0
        lay2, ns = stitch.stitch_layout(lay, seq, lengths)
        seq2, n1 = _noise_total(lay2, packed, lengths)
        # merges must never introduce noise and must only shrink seq
        assert n1 == 0
        assert lay2.seq_len <= lay.seq_len
        # read multiset preserved
        assert sorted(lay2.rids.tolist()) == sorted(lay.rids.tolist())


def test_stitch_boundary_crosser_rejected_or_truncated():
    # a head whose verified window would cross into an unrelated segment
    # must not merge on the unrelated bases: post-stitch noise stays 0
    rng = np.random.default_rng(9)
    genome = rng.integers(0, 4, 1200).astype(np.uint8)
    # owner contig ends 40 bases after the match start: trunc < 48 -> drop
    specs = [(0, 140, 0), (600, 400, 0), (100, 400, 0)]
    lay, packed, lengths = _make_layout(genome, specs, rng)
    seq, n0 = _noise_total(lay, packed, lengths)
    lay2, ns = stitch.stitch_layout(lay, seq, lengths)
    _, n1 = _noise_total(lay2, packed, lengths)
    assert n1 == 0
