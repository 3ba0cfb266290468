"""Super-shard container tests (PARITY.md "Beyond 2^31 reads").

The per-shard read cap is int32-bounded in production; these tests lower
it with SPRING_TPU_SHARD_READS so the shard writer/reader machinery is
exercised at small n (multi-shard archives, per-shard manifests, routed
random access, PE pair-aligned shard boundaries).
"""
import filecmp
import os

import numpy as np
import pytest

from spring_tpu import api
from spring_tpu.io.container import ArchiveReader
from spring_tpu.io import fastq_native
from spring_tpu.utils import synth


@pytest.fixture
def shard_cap(monkeypatch):
    stride = fastq_native.ckpt_stride()
    cap = 2 * stride          # SE: 2 strides/shard; PE: 1 stride per file
    monkeypatch.setenv("SPRING_TPU_SHARD_READS", str(cap))
    return cap


def _reads_of(path):
    with open(path, "rb") as f:
        lines = f.read().split(b"\n")
    return lines[1::4]


def test_se_sharded_roundtrip(tmp_path, shard_cap):
    n = 5 * shard_cap // 2 + 37          # 3 shards, ragged tail
    fq = str(tmp_path / "a.fastq")
    synth.make_se(fq, n, read_len=100, genome_size=50_000, seed=11)
    arc = str(tmp_path / "a.stpu")
    api.compress([fq], arc, api.CompressOptions(num_threads=4,
                                                verbose=False))
    with ArchiveReader(arc) as r:
        cp = r.params
        assert len(cp.shard_reads) == 3
        assert sum(cp.shard_reads) == cp.num_reads == n
        # per-shard manifests exist
        for j in range(3):
            assert f"sh{j}/params.json" in list(r.names())
    out = str(tmp_path / "a.out.fastq")
    api.decompress(arc, [out], verbose=False, num_threads=4)
    assert filecmp.cmp(fq, out, shallow=False)


def test_se_sharded_range(tmp_path, shard_cap):
    n = 2 * shard_cap + 5
    fq = str(tmp_path / "a.fastq")
    synth.make_se(fq, n, read_len=100, genome_size=50_000, seed=12)
    arc = str(tmp_path / "a.stpu")
    api.compress([fq], arc, api.CompressOptions(num_threads=4,
                                                verbose=False))
    # a range straddling the shard-0/shard-1 boundary
    lo, hi = shard_cap - 3, shard_cap + 7
    out = str(tmp_path / "a.rng.fastq")
    api.decompress(arc, [out], verbose=False, num_threads=4,
                   read_range=(lo, hi))
    got = _reads_of(out)
    want = _reads_of(fq)[lo:hi]
    assert got == want


def test_pe_sharded_roundtrip(tmp_path, shard_cap):
    per_file = shard_cap + shard_cap // 4      # 2 PE shards
    f1 = str(tmp_path / "r1.fastq")
    f2 = str(tmp_path / "r2.fastq")
    synth.make_pe(f1, f2, per_file, read_len=100, genome_size=50_000,
                  seed=13)
    arc = str(tmp_path / "p.stpu")
    api.compress([f1, f2], arc, api.CompressOptions(num_threads=4,
                                                    verbose=False))
    with ArchiveReader(arc) as r:
        cp = r.params
        # cap counts TOTAL reads: a PE shard holds cap/2 pairs
        assert len(cp.shard_reads) == 3
        assert sum(cp.shard_reads) == 2 * per_file
        assert all(s % 2 == 0 for s in cp.shard_reads)
    o1 = str(tmp_path / "o1.fastq")
    o2 = str(tmp_path / "o2.fastq")
    api.decompress(arc, [o1, o2], verbose=False, num_threads=4)
    assert filecmp.cmp(f1, o1, shallow=False)
    assert filecmp.cmp(f2, o2, shallow=False)


def test_pe_sharded_range(tmp_path, shard_cap):
    # PE range decode straddling BOTH a shard boundary (file-1 side) and
    # the file-1/file-2 boundary of the global index space
    per_file = shard_cap + 9                 # shards of cap/2 pairs
    f1 = str(tmp_path / "r1.fastq")
    f2 = str(tmp_path / "r2.fastq")
    synth.make_pe(f1, f2, per_file, read_len=100, genome_size=50_000,
                  seed=18)
    arc = str(tmp_path / "p.stpu")
    api.compress([f1, f2], arc, api.CompressOptions(num_threads=4,
                                                    verbose=False))
    lo, hi = per_file - 4, per_file + 6      # last 4 of f1 + first 6 of f2
    o1 = str(tmp_path / "o1.fastq")
    o2 = str(tmp_path / "o2.fastq")
    api.decompress(arc, [o1, o2], verbose=False, num_threads=4,
                   read_range=(lo, hi))
    assert _reads_of(o1) == _reads_of(f1)[per_file - 4:]
    assert _reads_of(o2) == _reads_of(f2)[:6]
    # and a range inside file 1 straddling the shard boundary
    b = shard_cap // 2                       # pairs per shard
    api.decompress(arc, [o1, o2], verbose=False, num_threads=4,
                   read_range=(b - 3, b + 5))
    assert _reads_of(o1) == _reads_of(f1)[b - 3:b + 5]
    assert _reads_of(o2) == []


def test_pe_sharded_single_out(tmp_path, shard_cap):
    per_file = shard_cap + 11
    f1 = str(tmp_path / "r1.fastq")
    f2 = str(tmp_path / "r2.fastq")
    synth.make_pe(f1, f2, per_file, read_len=100, genome_size=50_000,
                  seed=14)
    arc = str(tmp_path / "p.stpu")
    api.compress([f1, f2], arc, api.CompressOptions(num_threads=4,
                                                    verbose=False))
    out = str(tmp_path / "o.fastq")
    api.decompress(arc, [out], verbose=False, num_threads=4)
    # single output = file-1 reads then file-2 reads (unsharded layout)
    got = _reads_of(out)
    want = _reads_of(f1) + _reads_of(f2)
    assert got == want


def test_se_sharded_reorder_mode(tmp_path, shard_cap):
    # -r (non-order-preserving) per shard: the read MULTISET round-trips
    # and shard routing still holds (reference test_script.sh verifies
    # -r order-insensitively the same way)
    n = 2 * shard_cap + 19
    fq = str(tmp_path / "a.fastq")
    synth.make_se(fq, n, read_len=100, genome_size=50_000, seed=16)
    arc = str(tmp_path / "a.stpu")
    api.compress([fq], arc, api.CompressOptions(num_threads=4,
                                                verbose=False,
                                                reorder=True))
    out = str(tmp_path / "a.out.fastq")
    api.decompress(arc, [out], verbose=False, num_threads=4)
    assert sorted(_reads_of(out)) == sorted(_reads_of(fq))


def test_sharded_with_dist_engine(tmp_path, shard_cap, monkeypatch):
    # super-shards compose with the distributed engine: each shard runs
    # the sharded reorder over the device mesh (conftest pins an
    # 8-virtual-device CPU mesh)
    monkeypatch.setenv("SPRING_TPU_DIST", "1")
    n = shard_cap + shard_cap // 2           # 2 shards
    fq = str(tmp_path / "a.fastq")
    synth.make_se(fq, n, read_len=100, genome_size=50_000, seed=17)
    arc = str(tmp_path / "a.stpu")
    api.compress([fq], arc, api.CompressOptions(num_threads=4,
                                                verbose=False))
    with ArchiveReader(arc) as r:
        assert len(r.params.shard_reads) == 2
    out = str(tmp_path / "a.out.fastq")
    api.decompress(arc, [out], verbose=False, num_threads=4)
    assert filecmp.cmp(fq, out, shallow=False)


def test_sharded_deterministic(tmp_path, shard_cap):
    n = 2 * shard_cap + 3
    fq = str(tmp_path / "a.fastq")
    synth.make_se(fq, n, read_len=100, genome_size=50_000, seed=15)
    a1 = str(tmp_path / "a1.stpu")
    a2 = str(tmp_path / "a2.stpu")
    for a in (a1, a2):
        api.compress([fq], a, api.CompressOptions(num_threads=4,
                                                  verbose=False))
    assert filecmp.cmp(a1, a2, shallow=False)
