"""Pallas TPU kernels for the hot compute ops.

The flagship kernel is the packed masked-Hamming verification: given
pre-gathered candidate rows (packed reads + length word) and per-probe
comparison frames, count base mismatches over a dynamic [lo, hi) window.
This is the inner loop of SPRING's matching (reference
``((ref^read)&mask).count()``, src/reorder.h:292-301) expressed as a
single VMEM-resident kernel: per grid step a (BLK, K) tile of candidates
is XOR-folded and popcounted across the W packed words with the range
masks computed in registers.

The XLA lowering of the same math is already well fused; this kernel
exists to (a) pin the op to known-good tiling, (b) serve as the template
for deeper fusions (gather+verify) and (c) be benchmarked against the XLA
path via ``bench_hamming`` — the engine picks whichever wins.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _prefix_word(nb):
    ones = jnp.uint32(0xFFFFFFFF)
    full = ones >> (32 - 2 * jnp.clip(nb, 1, 16)).astype(jnp.uint32)
    return jnp.where(nb > 0, full, jnp.uint32(0))


def _ham_kernel(W: int, frames_ref, rows_ref, lo_ref, hi_ref, out_ref):
    lo = lo_ref[...]
    hi = hi_ref[...]
    odd = jnp.uint32(0x55555555)
    acc = jnp.zeros(lo.shape, jnp.int32)
    for w in range(W):
        d = frames_ref[w] ^ rows_ref[w]
        m = (d | (d >> 1)) & odd
        mw = _prefix_word(jnp.clip(hi - 16 * w, 0, 16)) \
            & ~_prefix_word(jnp.clip(lo - 16 * w, 0, 16))
        acc = acc + jax.lax.population_count(m & mw).astype(jnp.int32)
    out_ref[...] = acc


def masked_hamming(frames: jnp.ndarray, rows: jnp.ndarray,
                   lo: jnp.ndarray, hi: jnp.ndarray,
                   block: int = 256) -> jnp.ndarray:
    """Pallas masked Hamming, word-major layout.

    frames/rows: (W, B, K) uint32 packed words (word axis leading so every
    tile is a clean (block, K) lane plane); lo/hi: (B, K) int32 base
    ranges. Returns (B, K) int32 mismatch counts.
    """
    W, B, K = rows.shape
    grid = (max(B // block, 1),)
    kern = functools.partial(_ham_kernel, W)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, block, K), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, block, K), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.int32),
    )(frames, rows, lo, hi)


def bench_hamming(B: int = 16384, K: int = 128, W: int = 7,
                  iters: int = 20) -> dict:
    """Compare the pallas kernel vs the XLA lowering of the same math."""
    import time
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 2**32, (W, B, K), dtype=np.uint64).astype(np.uint32))
    rows = jnp.asarray(
        rng.integers(0, 2**32, (W, B, K), dtype=np.uint64).astype(np.uint32))
    lo = jnp.zeros((B, K), jnp.int32)
    hi = jnp.full((B, K), 100, jnp.int32)

    def xla_ref(f, r, lo, hi):
        acc = jnp.zeros(lo.shape, jnp.int32)
        for w in range(W):
            d = f[w] ^ r[w]
            m = (d | (d >> 1)) & jnp.uint32(0x55555555)
            mw = _prefix_word(jnp.clip(hi - 16 * w, 0, 16)) \
                & ~_prefix_word(jnp.clip(lo - 16 * w, 0, 16))
            acc = acc + jax.lax.population_count(m & mw).astype(jnp.int32)
        return acc

    out = {}
    for name, fn in [("pallas", masked_hamming), ("xla", xla_ref)]:
        jf = jax.jit(fn)
        r0 = jax.block_until_ready(jf(frames, rows, lo, hi))
        t = time.time()
        for _ in range(iters):
            r0 = jf(frames, rows, lo, hi)
        jax.block_until_ready(r0)
        out[name] = (time.time() - t) / iters * 1000
    a = np.asarray(jax.jit(masked_hamming)(frames, rows, lo, hi))
    b = np.asarray(jax.jit(xla_ref)(frames, rows, lo, hi))
    out["match"] = bool(np.array_equal(a, b))
    return out
