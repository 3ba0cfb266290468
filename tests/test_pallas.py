"""Pallas kernel correctness (interpret mode on CPU)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from spring_tpu.ops import pallas_kernels as pk


def test_masked_hamming_matches_reference():
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.default_rng(3)
    B, K, W = 16, 32, 7
    a = rng.integers(0, 2**32, (W, B, K), dtype=np.uint64).astype(np.uint32)
    b = a.copy()
    # flip some 2-bit lanes
    b[rng.integers(0, W, 50), rng.integers(0, B, 50), rng.integers(0, K, 50)] ^= 3
    lo = rng.integers(0, 20, (B, K)).astype(np.int32)
    hi = rng.integers(40, 100, (B, K)).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pk.masked_hamming(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(lo), jnp.asarray(hi),
            block=8))
    # reference in plain numpy over unpacked codes (word-major -> row-major)
    def unpack(x):
        xm = np.moveaxis(x, 0, -1)             # (B, K, W)
        sh = (2 * np.arange(16, dtype=np.uint32))
        return ((xm[..., None] >> sh) & 3).reshape(*xm.shape[:-1], -1)
    ca, cb = unpack(a), unpack(b)
    idx = np.arange(ca.shape[-1])
    mask = (idx[None, None, :] >= lo[..., None]) & (idx[None, None, :] < hi[..., None])
    want = ((ca != cb) & mask).sum(-1).astype(np.int32)
    np.testing.assert_array_equal(got, want)
