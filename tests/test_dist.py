"""Multi-device (virtual 8-CPU-device mesh) tests for the sharded reorder."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from spring_tpu.io import packing
from spring_tpu.parallel import dist
from spring_tpu.reorder import engine as eng


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return dist.make_mesh(8)


def test_dist_round_executes_and_places_all_reads(mesh8):
    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, size=2000).astype(np.uint8)
    L = 64
    starts = rng.integers(0, len(genome) - L, size=600)
    codes = np.stack([genome[s:s + L] for s in starts])
    lengths = np.full(len(codes), L, np.int32)
    packed = packing.pack_codes(codes)
    e = dist.DistReorderEngine(packed, lengths,
                               dist.DistConfig(max_readlen=L), mesh=mesh8)
    em = e.run()
    contigs = eng.assemble_contigs(em, e.B, lengths)
    placed = np.concatenate([c["rids"] for c in contigs]) if contigs else []
    assert len(placed) == len(codes)
    assert len(np.unique(placed)) == len(codes)
    # overlapping synthetic reads must actually match across shards
    multi = sum(len(c["rids"]) for c in contigs if len(c["rids"]) > 1)
    assert multi > len(codes) // 2
