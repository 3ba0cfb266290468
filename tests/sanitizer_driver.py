"""Exercise every native-code path for the sanitizer tests.

Run in a subprocess with LD_PRELOAD=<libasan/libtsan> and
SPRING_TPU_SO=<sanitized .so> (tests/test_sanitizers.py). Covers the
OpenMP-parallel paths (xbc multi-block, fastq parse/pack) and the
sequential codecs (id, qv), plus corrupt-stream decodes which must fail
cleanly (error codes, not crashes).
"""
import os
import random

import numpy as np

SCALE = float(os.environ.get("SAN_SCALE", "1"))  # tsan runs ~10x slower


def sc(n):
    return max(int(n * SCALE), 100)


NT = int(os.environ.get("SAN_OMP", "4"))

from spring_tpu.codecs import bsc, idcodec, qv
from spring_tpu.io import fastq_native

rng = np.random.default_rng(0)
random.seed(0)

# xbc: multi-block (OpenMP) round-trip + corrupt decode
data = (b"the quick brown fox " * sc(50000)
        + rng.integers(0, 256, size=sc(200_000)).astype(np.uint8).tobytes())
z = bsc.compress(data, block_size=1 << 18, num_threads=NT)
assert bsc.decompress(z, num_threads=NT) == data
for flip in (20, len(z) // 2, len(z) - 3):
    bad = bytearray(z)
    bad[flip] ^= 0xA5
    try:
        out = bsc.decompress(bytes(bad), num_threads=NT)
    except RuntimeError:
        pass

# id codec round-trip
ids = [f"SRR554369.{i} {i}/1".encode() for i in range(1, sc(20000) + 1)]
zi = idcodec.compress_ids(ids)  # affine -> template wire
assert idcodec.decompress_ids(zi, len(ids)) == ids
ids_p = list(reversed(ids))  # non-affine -> adaptive fallback
ids_p[0] = b"@WEIRD 007"
zp = idcodec.compress_ids(ids_p)
assert idcodec.decompress_ids(zp, len(ids_p)) == ids_p
try:
    idcodec.decompress_ids(zi[: len(zi) // 2], len(ids))
except RuntimeError:
    pass

# qv codec round-trip + corrupt decode
mat = rng.integers(35, 75, size=(sc(20000), 100)).astype(np.uint8)
lens = np.full(sc(20000), 100, np.int32)
zq = qv.compress_rows(mat, lens)
m2, l2 = qv.decompress_rows(zq, max_len=100)
assert (m2 == mat).all()
bad = bytearray(zq)
bad[len(bad) // 2] ^= 0x5A
try:
    qv.decompress_rows(bytes(bad))
except RuntimeError:
    pass

# qv constant-prefix wire mode (memcpy fan-out path) + corrupt decode
cmat = np.tile((np.arange(100) % 5 + 40).astype(np.uint8), (sc(20000), 1))
clens = np.linspace(10, 100, sc(20000)).astype(np.int32)
cmat[np.arange(100)[None, :] >= clens[:, None]] = 0
zc = qv.compress_rows(cmat, clens, fine_pos=True)
mc, lc = qv.decompress_rows(zc, max_len=100)
assert (mc == cmat).all() and (lc == clens).all()
badc = bytearray(zc)
badc[-3] ^= 0x5A
try:
    qv.decompress_rows(bytes(badc))
except RuntimeError:
    pass

# fastq parse + pack (OpenMP)
recs = []
for i in range(sc(20000)):
    seq = "".join(random.choice("ACGTN") for _ in range(100))
    recs.append(f"@r{i}\n{seq}\n+\n{'I' * 100}\n")
buf = "".join(recs).encode()
import os
import tempfile
with tempfile.NamedTemporaryFile(suffix=".fastq", delete=False) as f:
    f.write(buf)
    path = f.name
try:
    arrs = fastq_native.load_file(path, want_quals=True)
    assert arrs.n == sc(20000)
    packed = fastq_native.pack_2bit(arrs.codes % 4, NT)
    assert packed.shape[0] == sc(20000)
finally:
    os.unlink(path)

# pthread-level concurrency: Python threads calling every codec at once
# with OpenMP forced serial — catches shared-state races in OUR code with
# proper happens-before (gcc's libgomp is invisible to TSan, so OMP-region
# races are tested by the deterministic/ASan paths instead)
if os.environ.get("SAN_PTHREADS"):
    import threading

    def worker(seed):
        r = np.random.default_rng(seed)
        blob = r.integers(0, 256, size=sc(100_000)).astype(np.uint8).tobytes()
        assert bsc.decompress(bsc.compress(blob, num_threads=1),
                              num_threads=1) == blob
        ids_w = [f"t{seed}.{i}".encode() for i in range(sc(2000))]
        assert idcodec.decompress_ids(idcodec.compress_ids(ids_w),
                                      len(ids_w)) == ids_w
        qm = r.integers(35, 75, size=(sc(2000), 100)).astype(np.uint8)
        ql = np.full(sc(2000), 100, np.int32)
        m_, l_ = qv.decompress_rows(qv.compress_rows(qm, ql), max_len=100)
        assert (m_ == qm).all()

    ts = [threading.Thread(target=worker, args=(s,)) for s in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()

print("SANITIZER-DRIVER-OK")
