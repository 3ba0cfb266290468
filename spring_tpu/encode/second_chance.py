"""Second-chance alignment: place leftover reads against the consensus.

Reference analog: the encoder's singleton re-alignment — dictionaries are
built over the unplaced reads (singletons + N-containing reads, 3-bit
bitsets so N never matches) and every contig position probes them, accepting
Hamming <= THRESH_ENCODER=24 (src/encoder.h:242-351, dicts at
src/encoder.h:610-624).

TPU-first design: the roles make this embarrassingly parallel — every
consensus position p extracts a 16-mer key (funnel shift from the packed
sequence), probes hash dicts built over two windows of the oriented reads
(bases [0,16) and [16,32) — an error in one window still matches via the
other), and verifies all candidates in one fixed-shape jitted pass over
position chunks. N bases ride along as a second 2-bit plane that forces a
mismatch. Multiple positions matching the same read are resolved on the
host (lowest position wins). No iteration, no locks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import params as P
from ..io import packing
from ..ops import bits
from ..reorder import dictionary as dct

_ODD = jnp.uint32(0x55555555)
_BIG = jnp.iinfo(jnp.int32).max
CHUNK = 1 << 20      # consensus positions per device pass
CANDS = 8
WINDOWS = (0, 16)    # minimum window set (reads >= 32 bases)


def windows_for(max_len: int) -> tuple[int, ...]:
    """Read-local key windows, 16-base aligned (the verify funnel shifts
    are word-aligned), spread across the read so a read stays placeable
    unless EVERY window carries an error. The reference uses two 21-base
    windows at 0-20/21-41 (src/encoder.h:610-620); at 1% error four
    16-mers miss ~0.05% of reads vs ~3.6% for the reference pair."""
    ws = [0, 16]
    for st in (32, 48):
        if max_len >= st + 16:
            ws.append(st)
    return tuple(ws)


def _pack_with_nmask(codes: np.ndarray) -> np.ndarray:
    """(n, L) codes (0..4) -> (n, 2W+1) uint32: 2-bit packed (N as A),
    N-mask plane (lane 1 where N), plus a length slot."""
    n, L = codes.shape
    W = bits.words_per_read(L)
    pk = packing.pack_codes(codes)                   # masks to 2 bits
    nm = packing.pack_codes((codes == packing.N).astype(np.uint8))
    out = np.zeros((n, 2 * W + 1), np.uint32)
    out[:, :W] = pk
    out[:, W:2 * W] = nm
    return out


_PAD = 16        # leading pad bases so window word -1 is addressable


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def _match_all(seq_j, rows_j, btabs, encs, total_j, n_reads, W: int,
               thresh: int, windows: tuple = WINDOWS):
    """All consensus positions probe the leftover-read dicts in ONE
    dispatch: a fori_loop with a data-dependent trip count walks CHUNK-
    sized position blocks, and matches land in a device-resident per-read
    scatter-min (value = pos<<1 | rc, so the lowest position wins). Only
    that (nr+1,) array crosses back to the host — the previous per-chunk
    transfer of (CHUNK,) results cost ~0.5 s each over the tunnel.

    All arrays are arguments (closure constants would be baked into the
    HLO and force a recompile per compress call); seq/rows are pow2-padded
    by the caller so the compiled program is shared across datasets.
    """
    nr = rows_j.shape[0]
    max_woff = max(st // 16 for st in windows)

    def chunk_body(ci, best):
        p = ci * CHUNK + jnp.arange(CHUNK)
        pv = p < total_j - dct.KEY_BASES + 1
        wi = (p >> 4) + (_PAD // 16)     # word index of p in padded seq
        r2 = (2 * (p & 15)).astype(jnp.uint32)

        def win_word(off):   # seq word at base position p + 16*off
            nw = seq_j.shape[0]
            lo = seq_j[jnp.clip(wi + off, 0, nw - 1)]
            hi = seq_j[jnp.clip(wi + off + 1, 0, nw - 1)]
            return jnp.where(r2 > 0, (lo >> r2) | (hi << (32 - r2)), lo)

        fw = {off: win_word(off) for off in range(-max_woff - 1, W)}
        key = fw[0]

        best_pr = jnp.full((CHUNK,), _BIG, jnp.int32)
        best_rid = jnp.full((CHUNK,), -1, jnp.int32)
        best_p = jnp.zeros((CHUNK,), jnp.int32)
        for di, st in enumerate(windows):
            woff = st // 16
            cand, hit = dct.probe_hash(btabs[di], encs[di], key, CANDS)
            ok0 = hit & (cand >= 0) & pv[:, None] & (p >= st)[:, None]
            safe = jnp.clip(cand, 0, nr - 1)
            crows = rows_j[safe]                # (P, C, 2W+1)
            clen = crows[..., 2 * W].astype(jnp.int32)
            ham = jnp.zeros(cand.shape, jnp.int32)
            for w in range(W):
                dd = fw[w - woff][:, None] ^ crows[..., w]
                m = ((dd | (dd >> 1)) | crows[..., W + w]) & _ODD
                k = jnp.clip(clen - 16 * w, 0, 16)
                full = jnp.uint32(0xFFFFFFFF) >> (
                    32 - 2 * jnp.clip(k, 1, 16)).astype(jnp.uint32)
                mw = jnp.where(k > 0, full, jnp.uint32(0))
                ham = ham + jax.lax.population_count(m & mw).astype(
                    jnp.int32)
            p_al = (p - st)[:, None]
            fits = (p_al >= 0) & ((p_al + clen) <= total_j)
            ok = ok0 & fits & (ham <= thresh)
            pr = jnp.where(ok, ham, _BIG)
            sel = jnp.argmin(pr, axis=1)
            prs = jnp.take_along_axis(pr, sel[:, None], axis=1)[:, 0]
            rids = jnp.take_along_axis(cand, sel[:, None], axis=1)[:, 0]
            better = prs < best_pr
            best_pr = jnp.where(better, prs, best_pr)
            best_rid = jnp.where(better, rids, best_rid)
            best_p = jnp.where(better, (p - st).astype(jnp.int32), best_p)

        valid = best_rid >= 0
        ridx = jnp.where(best_rid >= n_reads, best_rid - n_reads, best_rid)
        rcb = jnp.where(best_rid >= n_reads, 1, 0)
        val = jnp.where(valid, (best_p << 1) | rcb, _BIG)
        return best.at[jnp.where(valid, ridx, nr)].min(val)

    nchunks = (jnp.maximum(total_j - dct.KEY_BASES, 0)) // CHUNK + 1
    best0 = jnp.full((nr + 1,), _BIG, jnp.int32)
    return jax.lax.fori_loop(0, nchunks, chunk_body, best0)


def align_leftovers(seq_codes: np.ndarray, codes: np.ndarray,
                    lengths: np.ndarray, thresh: int = P.THRESH_ENCODER
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Try to place each read (rows of codes/lengths) on the consensus.

    Returns (gpos, rc, placed) per input read; gpos is the start of the
    oriented read in seq coordinates, -1 if unplaced.
    """
    n = len(codes)
    out_pos = np.full(n, -1, np.int64)
    out_rc = np.zeros(n, np.uint8)
    total = len(seq_codes)
    if n == 0 or total < dct.KEY_BASES:
        return out_pos, out_rc, out_pos >= 0

    # both orientations; dict rid = 2*read + orientation
    windows = windows_for(int(lengths.max()) if n else 32)
    rcods = packing.revcomp_codes(codes, lengths)
    # row r < n is read r forward, row n + r is its reverse complement;
    # dict candidates are row indices, used DIRECTLY to gather rows in the
    # verify (a 2*r+orient remap here once desynced candidates from rows
    # and silently killed nearly all placements)
    both = np.concatenate([codes, rcods], axis=0)
    lens2 = np.concatenate([lengths, lengths])
    dicts = dct.build_hash_dicts(both, lens2,
                                 [dct.DictSpec(st) for st in windows],
                                 pad_to_pow2=True)
    enc = [d.rids for d in dicts]

    L = codes.shape[1]
    W = bits.words_per_read(L)
    rows = _pack_with_nmask(both)
    rows[:, 2 * W] = lens2.astype(np.uint32)
    # pow2-pad rows and seq so the compiled program is shared across runs
    nr = max(1 << max(len(rows) - 1, 1).bit_length(), 64)
    rows_p = np.zeros((nr, rows.shape[1]), np.uint32)
    rows_p[: len(rows)] = rows
    rows_j = jnp.asarray(rows_p)

    seq_pk = packing.pack_codes(np.concatenate(
        [np.zeros(_PAD, np.uint8), seq_codes,
         np.zeros((W + 2) * 16, np.uint8)])[None, :])[0]
    nw = max(1 << max(len(seq_pk) - 1, 1).bit_length(), 64)
    seq_p = np.zeros(nw, np.uint32)
    seq_p[: len(seq_pk)] = seq_pk
    seq_j = jnp.asarray(seq_p)

    btabs = tuple(d.btab for d in dicts)
    total_j = jnp.asarray(total, jnp.int32)
    best = np.asarray(_match_all(seq_j, rows_j, btabs, tuple(enc), total_j,
                                 jnp.asarray(n, jnp.int32), W, thresh,
                                 windows))[:n]
    placed = best != _BIG
    out_pos[placed] = (best[placed] >> 1).astype(np.int64)
    out_rc[placed] = (best[placed] & 1).astype(np.uint8)
    return out_pos, out_rc, out_pos >= 0
