"""Read k-mer dictionaries: host-side construction, device-side probing.

Reference analog: ``bbhashdict`` — a BooPHF minimal perfect hash over 64-bit
keys plus a CSR (startpos / read_id) bin layout with lock-striped deletion
(src/bitset_util.h:74-221, src/bitset_util.cpp:20-63). SPRING builds
NUM_DICTS=2 dictionaries over fixed base windows around the read midpoint
(src/reorder.h:752-759) and deletes reads from the bins as they are claimed.

TPU-first redesign: pointer-chasing MPHF lookups don't map to the VPU, so a
dictionary here is a *sorted key table*:
  * keys: (n,) uint32 — the 16-base window of each indexed read, sorted
  * rids: (n,) int32 — read id owning each key, same order
Probing q is a vectorized binary search (jnp.searchsorted) giving the bin
[lo, hi); candidates are a bounded gather rids[lo : lo+C] masked by hi.
Deletion is replaced by a global ``claimed`` bitmap checked after the gather —
no mutation, no locks, race-free by construction.

Key width is 16 bases = 32 bits (exact, no hashing): keys stay uint32 end to
end so no x64 mode is needed; rare 16-mer collisions only add candidates that
Hamming verification rejects.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

KEY_BASES = 16  # bases per dictionary key (uint32, 2 bits/base)


@dataclass
class DictSpec:
    """Base window [start, start+KEY_BASES) indexed by one dictionary."""
    start: int

    @property
    def end(self) -> int:
        return self.start + KEY_BASES


def default_windows(max_len: int) -> list[DictSpec]:
    """Two windows flanking the read midpoint (reference src/reorder.h:752-759
    places its dictionaries around maxlen/2 so both survive left/right shifts).
    For short reads fall back to the front of the read."""
    mid = max_len // 2
    if max_len >= 2 * KEY_BASES:
        lo = min(mid - KEY_BASES, max_len - 2 * KEY_BASES)
        return [DictSpec(lo), DictSpec(min(mid, max_len - KEY_BASES))]
    if max_len >= KEY_BASES:
        return [DictSpec(0)]
    return []


@dataclass
class SortedDict:
    """Device arrays of one sorted-key dictionary."""
    keys: jnp.ndarray      # (n,) uint32, sorted
    rids: jnp.ndarray      # (n,) int32
    start: int             # window start (base offset within a read)

    @property
    def size(self) -> int:
        return int(self.keys.shape[0])


def _window_keys_np(codes: np.ndarray, start: int) -> np.ndarray:
    window = codes[:, start:start + KEY_BASES].astype(np.uint32)
    shifts = (2 * np.arange(KEY_BASES, dtype=np.uint32))[None, :]
    return np.bitwise_or.reduce(window << shifts, axis=1)


def build_dicts(codes: np.ndarray, lengths: np.ndarray,
                windows: list[DictSpec] | None = None,
                pad_to_pow2: bool = False) -> list[SortedDict]:
    """Build sorted-key dictionaries from host code arrays (n, L).

    Reads shorter than a window are excluded from that dictionary
    (reference src/bitset_util.h:99-105). With pad_to_pow2, arrays are padded
    to the next power of two with sentinel entries (key 0xFFFFFFFF, rid -1)
    so similarly-sized datasets share compiled programs.
    """
    if windows is None:
        windows = default_windows(codes.shape[1])
    out = []
    for spec in windows:
        ok = lengths >= spec.end
        rids = np.nonzero(ok)[0].astype(np.int32)
        keys = _window_keys_np(codes[ok], spec.start)
        order = np.argsort(keys, kind="stable")
        keys, rids = keys[order], rids[order]
        if pad_to_pow2:
            n = max(1 << max(len(keys) - 1, 1).bit_length(), 64)
            keys = np.concatenate(
                [keys, np.full(n - len(keys), 0xFFFFFFFF, np.uint32)])
            rids = np.concatenate(
                [rids, np.full(n - len(rids), -1, np.int32)])
        out.append(SortedDict(
            keys=jnp.asarray(keys),
            rids=jnp.asarray(rids),
            start=spec.start,
        ))
    return out


def _searchsorted_left(keys: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Vectorized binary search (first index where keys[i] >= q).

    A fori_loop over log2(n) halving steps — compiles to a tiny program
    (jnp.searchsorted's unrolled scan is prohibitively slow to compile for
    multi-million-key tables) and runs as log2(n) gathers.
    """
    n = keys.shape[0]
    nbits = max(int(n - 1).bit_length(), 1) if n else 1

    def body(i, lo):
        step = jnp.int32(1) << (nbits - 1 - i)
        probe_idx = lo + step
        ok = (probe_idx <= n) & (keys[jnp.minimum(probe_idx - 1, n - 1)]
                                 < q)
        return jnp.where(ok, probe_idx, lo)

    lo0 = jnp.zeros(q.shape, jnp.int32)
    return jax.lax.fori_loop(0, nbits, body, lo0)


def probe(d: SortedDict, queries: jnp.ndarray, max_candidates: int
          ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Look up a batch of uint32 keys.

    Returns (cand_rids, cand_valid), both (*queries.shape, max_candidates).
    Candidates are the first ``max_candidates`` entries of each bin (the
    reference caps its bin scan at MAX_SEARCH too, src/params.h:31).
    """
    flat = queries.reshape(-1)
    lo = _searchsorted_left(d.keys, flat)
    offs = jnp.arange(max_candidates, dtype=jnp.int32)
    idx = lo[:, None] + offs[None, :]
    n = d.keys.shape[0]
    safe = jnp.minimum(idx, n - 1)
    valid = (idx < n) & (jnp.take(d.keys, safe, axis=0) == flat[:, None])
    rids = jnp.take(d.rids, safe, axis=0)
    shape = (*queries.shape, max_candidates)
    return rids.reshape(shape), valid.reshape(shape)
