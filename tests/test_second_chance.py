"""Second-chance singleton aligner (encode/second_chance.py).

Reference analog: the encoder's singleton re-alignment accept criterion
(Hamming <= THRESH_ENCODER, src/encoder.h:242-351). The multi-window test
covers the case the original 2-window scheme could not place: one error in
each of the first two 16-mers.
"""
import numpy as np

from spring_tpu.encode import second_chance as sc
from spring_tpu.io import packing


def _consensus_and_reads(rng, total=5000, n=64, L=100):
    seq = rng.integers(0, 4, total).astype(np.uint8)
    pos = rng.integers(0, total - L, n)
    codes = seq[pos[:, None] + np.arange(L)[None, :]].copy()
    return seq, codes, pos


def test_exact_and_rc_placement():
    rng = np.random.default_rng(0)
    seq, codes, pos = _consensus_and_reads(rng)
    n, L = codes.shape
    rc = rng.random(n) < 0.5
    lens = np.full(n, L, np.int32)
    codes[rc] = packing.revcomp_codes(codes[rc], lens[rc])
    gpos, grc, placed = sc.align_leftovers(seq, codes, lens)
    # tiny inputs build tiny hash tables whose overflow keys are dropped
    # by design (logged) — a handful of misses is fine, wrong placements
    # are not
    assert placed.sum() >= n - 2
    np.testing.assert_array_equal(gpos[placed], pos[placed])
    np.testing.assert_array_equal(grc[placed], rc.astype(np.uint8)[placed])


def test_errors_in_first_windows_still_place():
    """One error inside EACH of windows [0,16) and [16,32): only the
    added 32/48 windows can seed these placements."""
    rng = np.random.default_rng(1)
    seq, codes, pos = _consensus_and_reads(rng)
    n, L = codes.shape
    codes[:, 5] = (codes[:, 5] + 1) % 4
    codes[:, 20] = (codes[:, 20] + 1) % 4
    lens = np.full(n, L, np.int32)
    assert len(sc.windows_for(L)) == 4
    gpos, grc, placed = sc.align_leftovers(seq, codes, lens)
    assert placed.sum() >= n - 2
    np.testing.assert_array_equal(gpos[placed], pos[placed])


def test_over_threshold_not_placed():
    rng = np.random.default_rng(2)
    seq, codes, pos = _consensus_and_reads(rng, n=16)
    n, L = codes.shape
    # scatter > THRESH_ENCODER errors through every window
    bad = rng.choice(L, 40, replace=False)
    codes[:, bad] = (codes[:, bad] + 1) % 4
    lens = np.full(n, L, np.int32)
    _gpos, _grc, placed = sc.align_leftovers(seq, codes, lens)
    assert not placed.any()


def test_n_bases_count_as_mismatch():
    rng = np.random.default_rng(3)
    seq, codes, pos = _consensus_and_reads(rng, n=8)
    n, L = codes.shape
    codes[:, 40:80] = packing.N      # 40 Ns > THRESH_ENCODER
    lens = np.full(n, L, np.int32)
    _gpos, _grc, placed = sc.align_leftovers(seq, codes, lens)
    assert not placed.any()


def test_second_chance_long_reads():
    """Reads > 128 bases (W > 8): the consensus word fetch needs three
    8-word rows — two truncated the offset select chain (grid varlen
    failure, round 3)."""
    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, size=3000).astype(np.uint8)
    L = 151
    starts = np.arange(0, len(genome) - L, 13)
    codes = np.stack([genome[s:s + L] for s in starts])
    lengths = np.full(len(codes), L, np.int32)
    gpos, rc, placed = sc.align_leftovers(genome, codes, lengths)
    assert placed.all()
    np.testing.assert_array_equal(gpos, starts)
    assert not rc.any()
